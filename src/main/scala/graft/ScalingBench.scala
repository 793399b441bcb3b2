package graft

import graft.spark.{ExtractPipeline, GraftSession, Transcripts}
import java.nio.file.{Files, Paths}

/** Two-parallelism scaling evidence (BASELINE.md): the same extraction job
  * on the same synthetic input at local[8] (N) and local[32] (4N), the
  * sandbox proxy for N vs 4N executors. Writes triples/sec at both levels
  * and the scaling efficiency (T8_throughput ratio / 4) into BENCH.md.
  *
  * Sessions are created sequentially — the first is stopped before the
  * second starts (one JVM).
  */
object ScalingBench {
  def run(cpus: Int, nTurns: Long): (Long, Double) = {
    val spark = GraftSession.local(cpus)
    try {
      // equal JIT warmup per parallelism level: two untimed runs at 1/4 scale
      (1 to 2).foreach { _ =>
        ExtractPipeline.extract(Transcripts.synthetic(spark, nTurns / 4, nTurns / 80)).count()
      }
      // best of two measured runs (steady state)
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = ExtractPipeline.extract(
          Transcripts.synthetic(spark, nTurns, math.max(nTurns / 20, 1))).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      runs.minBy(_._2)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_SCALE_TURNS", "1000000").toLong
    val (n8, s8) = run(8, nTurns)
    val (n32, s32) = run(32, nTurns)
    val tps8 = n8 / s8
    val tps32 = n32 / s32
    val eff = (tps32 / tps8) / 4.0
    val md =
      f"""# BENCH — two-parallelism scaling evidence
         |
         |Same job (synthetic transcripts → triple extraction, `Transcripts.synthetic`
         |→ `ExtractPipeline.extract` → count), same input ($nTurns%,d turns,
         |${n32}%,d triples), one JVM, sessions sequential. local[8] vs local[32] is
         |the sandbox proxy for N vs 4N executors (BASELINE.md:16).
         |
         || parallelism | wall (s) | triples/sec |
         ||---|---|---|
         || local[8]  (N)  | $s8%.2f | ${tps8.toLong}%,d |
         || local[32] (4N) | $s32%.2f | ${tps32.toLong}%,d |
         |
         |**Scaling efficiency (N→4N)** = (tps32/tps8)/4 = **$eff%.3f** (target ≥ 0.8)
         |
         |Extraction is row-local (no shuffle), so scaling is bounded only by input
         |split granularity and JVM/GC shared-core effects.
         |""".stripMargin
    Files.writeString(Paths.get("BENCH.md"), md)
    println(md)
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"tps8":${tps8.toLong},"tps32":${tps32.toLong},"turns":$nTurns}""")
  }
}
