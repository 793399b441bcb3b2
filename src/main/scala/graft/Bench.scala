package graft

import graft.spark.{ExtractPipeline, GraftSession, Transcripts}
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * plus the headline triple-extraction throughput, printed as ONE JSON line.
  */
object Bench {
  def timeIt[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Headline metric: extraction throughput (triples/sec) over synthetic
    * transcripts sized to the sf directory.
    */
  def extractionThroughput(spark: SparkSession, nTurns: Long): (Long, Double) = {
    val transcripts = Transcripts.synthetic(spark, nTurns, math.max(nTurns / 20, 1))
    // one untimed warmup so the measured run reflects steady-state JIT
    ExtractPipeline.extract(
      Transcripts.synthetic(spark, nTurns / 5, math.max(nTurns / 100, 1))).count()
    val (n, secs) = timeIt {
      ExtractPipeline.extract(transcripts).count()
    }
    (n, secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)

    // steady-state warmup (flagship pipeline on sf0.001): JIT + codegen for
    // the operator surface, so the first measured query doesn't absorb
    // session warmup (round-1 bench charged ~4s of it to doc_exact_dups)
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, secs) = timeIt {
        try fn(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      }
      name -> secs
    }
    // headline: synthetic-transcript extraction, ~sf-scaled turn count
    val nTurns = if (sfDir.contains("sf0.001")) 20000L
                 else if (sfDir.contains("sf0.01")) 100000L else 500000L
    val (triples, extractSecs) = extractionThroughput(spark, nTurns)
    val tps = (triples / extractSecs).toLong

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + extractSecs
    val totalStr = f"$total%.3f"
    val exStr = f"$extractSecs%.3f"
    val json =
      s"""{"metric":"total","value":$totalStr,"unit":"sec","queries":$qs,"sf":"$sfDir","extract_turns":$nTurns,"extract_triples":$triples,"extract_secs":$exStr,"triples_per_sec":$tps}"""
    // machine-readable in two redundant ways (round-1 driver parse failed
    // on sbt log prefixes): a fixed file, and a bare final stdout line
    // printed after spark.stop() so no shutdown logging trails it
    val benchFile =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/root/repo")))
        "/root/repo/BENCH_SELF.json"
      else "BENCH_SELF.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(benchFile), json + "\n")
    spark.stop()
    println(json)
    System.out.flush()
  }
}
