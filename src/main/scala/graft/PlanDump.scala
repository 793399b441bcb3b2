package graft

import graft.spark.GraftSession

/** Plan-evidence dumper: write `explain("formatted")` of named queries to
  * `<outDir>/<query><suffix>.txt` (the round's plans/r06 before/after
  * deliverable — plan claims are checked against these files without
  * running Spark). Usage:
  *   sbt "runMain graft.PlanDump <outDir> <q1,q2,...> [suffix]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val suffix = if (args.length > 2) args(2) else ""
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n$suffix.txt"), plan)
      println(s"[plandump] wrote $n (${plan.length} chars)")
    }
    spark.stop()
  }
}
