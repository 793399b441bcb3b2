ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rdfmicrodataspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default (was 8g): local[32] runs 32 concurrent tasks against ONE
  // unified memory pool — at 8g that is <150 MB of execution memory per
  // task slot, so the wide aggregations/joins of the suite spill, and the
  // bench loop's localCheckpoint blocks (3 samples x ~80 queries) evict
  // each other into a GC spiral (BENCH_r05: doc_dedup_groups 4s -> 88s
  // across samples in one JVM). The sandbox has 128 GiB; a cluster
  // deployment sizes executor memory to cores the same way (guide §5).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The suite generates hundreds of whole-stage-codegen classes; the JDK
  // default 240 MB code cache fills, JIT compilation stops, and fresh
  // generated code runs interpreted (measured up to 13x inflation —
  // Bench.scala's extraction/LSH ordering comments). 512 MB keeps every
  // plan's generated code compiled.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
) ++
  // Faithful N-core proxy for scaling runs: cap what the JVM believes the
  // machine has (GC threads, common pools) — otherwise a local[8] run
  // borrows the idle cores for GC and inflates its throughput.
  sys.env.get("GRAFT_ACTIVE_CPUS").map(n => s"-XX:ActiveProcessorCount=$n").toSeq
