package graft

import graft.spark.{ExtractPipeline, GraftSession, Transcripts}
import java.nio.file.{Files, Paths}

/** Two-parallelism scaling evidence (BASELINE.md): the same extraction job
  * on the same synthetic input at local[8] (N) and local[32] (4N), the
  * sandbox proxy for N vs 4N executors.
  *
  * Modes:
  *  - `runMain graft.ScalingBench single <cpus> <turns>` — one measurement
  *    in THIS JVM, prints one JSON line. Combine with GRAFT_ACTIVE_CPUS=<cpus>
  *    (build.sbt maps it to -XX:ActiveProcessorCount) so the JVM's GC and
  *    pool sizing also see only <cpus> cores — the faithful N-core proxy.
  *    `scripts/scaling_bench.sh` orchestrates both levels and writes BENCH.md.
  *  - no args — both levels sequentially in one JVM (quick look; the
  *    local[8] run then borrows idle cores for GC, so efficiency reads low
  *    or high depending on job length — prefer the script).
  */
object ScalingBench {

  /** Equal per-level JIT warmup, then the median of five measured runs
    * (the single-box proxy is noisy; median is robust to one bad run).
    */
  def run(cpus: Int, nTurns: Long): (Long, Double) = {
    val spark = GraftSession.local(cpus)
    try {
      (1 to 2).foreach { _ =>
        ExtractPipeline.extract(Transcripts.synthetic(spark, nTurns / 4, nTurns / 80)).count()
      }
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val n = ExtractPipeline.extract(
          Transcripts.synthetic(spark, nTurns, math.max(nTurns / 20, 1))).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      runs.sortBy(_._2)(Ordering.Double.TotalOrdering)(runs.size / 2)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "single" :: cpus :: turns :: Nil =>
      val (n, s) = run(cpus.toInt, turns.toLong)
      println(f"""{"cpus":$cpus,"turns":$turns,"triples":$n,"secs":$s%.3f,"tps":${(n / s).toLong}}""")
    case _ =>
      val nTurns = sys.env.getOrElse("SPARK_GRAFT_SCALE_TURNS", "1000000").toLong
      val (n8, s8) = run(8, nTurns)
      val (n32, s32) = run(32, nTurns)
      report(nTurns, n32, s8, s32, n8 / s8, n32 / s32)
  }

  def report(nTurns: Long, triples: Long, s8: Double, s32: Double,
             tps8: Double, tps32: Double): Unit = {
    val eff = (tps32 / tps8) / 4.0
    val md =
      f"""# BENCH — two-parallelism scaling evidence
         |
         |Same job (synthetic transcripts → triple extraction, `Transcripts.synthetic`
         |→ `ExtractPipeline.extract` → count), same input ($nTurns%,d turns,
         |$triples%,d triples). local[8] vs local[32] is the sandbox proxy for N vs 4N
         |executors (BASELINE.md:16); each level runs in its own JVM with
         |`-XX:ActiveProcessorCount=<cpus>` so GC/pool parallelism scales with the
         |simulated executor size (see scripts/scaling_bench.sh).
         |
         || parallelism | wall (s) | triples/sec |
         ||---|---|---|
         || local[8]  (N)  | $s8%.2f | ${tps8.toLong}%,d |
         || local[32] (4N) | $s32%.2f | ${tps32.toLong}%,d |
         |
         |**Scaling efficiency (N→4N)** = (tps32/tps8)/4 = **$eff%.3f** (target ≥ 0.8)
         |
         |Extraction is row-local (no shuffle): the plan is scan → pushed markup
         |filter → mapPartitions extract. Scaling is bounded only by input split
         |granularity and shared-memory-bandwidth effects of the single-box proxy.
         |""".stripMargin
    Files.writeString(Paths.get("BENCH.md"), md)
    println(md)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"tps8":${tps8.toLong},"tps32":${tps32.toLong},"turns":$nTurns}""")
  }
}
