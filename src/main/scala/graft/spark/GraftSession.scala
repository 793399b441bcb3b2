package graft.spark

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults the pipeline assumes:
  * AQE (runtime coalescing + skew-join splitting, the north rule's skew
  * answer for joins), UTC session time (oracle parity), and shuffle
  * partitions sized to the actual core count instead of the 200 default.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft-kg")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // static conf: the generated-class cache defaults to 100 entries —
      // a ~55-query suite (3+ codegen stages each) thrashes that LRU, so
      // every repeated run re-compiles its classes and the JVM code cache
      // fills with dead generated code until JIT deoptimizes (measured 13x
      // on the extraction stage when it ran after the full bench loop)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Session for spark-submit entry points. The launcher owns master and any
    * explicitly-passed conf (it sets them as system properties before main
    * runs), so this builder adds only the graft defaults and never overrides
    * a setting the submit command supplied. Shuffle partitions left at
    * Spark's static 200 default are re-sized to the cluster's actual
    * parallelism — the one setting that must track executor count to keep
    * post-shuffle partitions constant-sized as the cluster grows (a 200-part
    * shuffle on a 1000-core cluster idles 80% of it; an explicit
    * `--conf spark.sql.shuffle.partitions=N` still wins).
    */
  def fromSubmit(localFallbackCpus: Int): SparkSession = {
    val graftDefaults = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.session.timeZone" -> "UTC")
    val submitted = sys.props.contains("spark.master")
    var b = SparkSession.builder().appName("graft-kg")
    graftDefaults.foreach { case (k, v) =>
      if (!sys.props.contains(k)) b = b.config(k, v)
    }
    if (!submitted) sys.env.get("SPARK_MASTER") match {
      // plain-java launches targeting a cluster set SPARK_MASTER instead of
      // the spark.master system property — honor it rather than silently
      // running local on the driver machine
      case Some(master) => b = b.master(master)
      case None =>
        b = b.master(s"local[$localFallbackCpus]")
          .config("spark.sql.shuffle.partitions", localFallbackCpus.toString)
          .config("spark.ui.enabled", "false")
    }
    val s = b.getOrCreate()
    val clustered = submitted || sys.env.contains("SPARK_MASTER")
    if (clustered && !sys.props.contains("spark.sql.shuffle.partitions")) {
      // Prefer executor conf over defaultParallelism: right after
      // getOrCreate() on a real cluster NO executors have registered yet,
      // so defaultParallelism reads max(0 cores, 2) = 2 — pinning shuffle
      // partitions to 2 would be far worse than the 200 default (AQE can
      // coalesce partitions but never split them). Conf-derived core count
      // is known before registration; without it, only trust a
      // defaultParallelism that is plausibly real (> 2).
      val conf = s.sparkContext.getConf
      val fromConf = for {
        execs <- conf.getOption("spark.executor.instances").map(_.toInt)
        cores <- conf.getOption("spark.executor.cores").map(_.toInt)
      } yield execs * cores
      fromConf.orElse(Some(s.sparkContext.defaultParallelism).filter(_ > 2))
        .foreach(p => s.conf.set("spark.sql.shuffle.partitions", math.max(p, 1).toString))
    }
    s
  }
}
