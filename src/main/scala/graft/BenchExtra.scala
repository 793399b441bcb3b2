package graft

import graft.spark.GraftSession

/** Noop-sink isolation bench (optimization guide §1.4): time each named
  * query with `df.write.format("noop")` — every column of every row is
  * computed and discarded, so the measurement excludes any sink cost and
  * cannot be narrowed by count-style column pruning. NOT part of the
  * driver contract (`Bench` stays the canonical artifact with its frozen
  * count-based methodology); this main exists for §1.4-faithful
  * computation-only numbers, cited in OPTIMIZATION_r06.md.
  *
  * Usage: sbt "runMain graft.BenchExtra [q1,q2,...]"   (default: the
  * round's heavy set), env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS /
  * SPARK_GRAFT_SAMPLES as in Bench.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val samples = sys.env.get("SPARK_GRAFT_SAMPLES").map(_.toInt).getOrElse(3)
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("kg_entail_trans", "kg_link_incr", "doc_cross_dedup",
        "kg_canonical_contacts", "doc_train_set", "doc_jaccard_pairs",
        "kg_entail", "doc_dedup_groups", "sim_topk", "kg_path_incr")
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.toSeq.sorted.mkString(",")}")
    val spark = GraftSession.local(cpus)
    try SparkEntry.entry(spark).count() // same JIT warmup as Bench
    catch { case e: Throwable => System.err.println(s"[benchextra] warmup: $e") }
    val results = names.map { n =>
      spark.sparkContext.setJobDescription(s"benchextra: $n")
      val times = (0 until samples).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      n -> Bench.median(times)
    }
    spark.sparkContext.setJobDescription(null)
    val qs = results.map(t => "\"" + t._1 + "\":" + f"${t._2}%.3f").mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"noop_sink","unit":"sec","samples":$samples,"queries":$qs,"sf":"$sfDir"}""")
  }
}
