package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 blocking guarantees: the permuted multi-table simhash blocking is
  * complete (finds the SAME pair set as brute force and as every other valid
  * nBlocks), and the IVF assignment's physical plan switches from the
  * literal-model fold to a BroadcastHashJoin past the literal ceiling
  * without changing results.
  */
class BlockingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("simhash permuted blocking: identical complete pair set for every valid nBlocks") {
    def pairs(nBlocks: Int) =
      TextOps.simhashPairs(docs, maxHamming = 3, nBlocks = nBlocks).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val p4 = pairs(4) // the d+1 pigeonhole layout (also the oracle's)
    val p5 = pairs(5)
    val p6 = pairs(6) // the default
    assert(p6 == p4 && p5 == p4)
    assert(p4.nonEmpty)

    // and the set is exactly the brute-force hamming ≤ 3 pairs
    val hashes = TextOps.simhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(p6 == brute)
  }

  test("simhash permuted tables: key widths and table counts follow C(B,d)") {
    val t6 = TextOps.simhashPermutedTables(maxHamming = 3, nBlocks = 6)
    assert(t6.size == 20) // C(6,3)
    // every table keys on exactly nBlocks - d = 3 blocks, ~31 bits total
    assert(t6.forall(_.size == 3))
    assert(t6.forall(blks => blks.map(_._2).sum >= 30 && blks.map(_._2).sum <= 33))
    val t4 = TextOps.simhashPermutedTables(maxHamming = 3, nBlocks = 4)
    assert(t4.size == 4 && t4.forall(_.size == 1)) // degenerates to pigeonhole
  }

  test("IVF assign: plan switches to BroadcastHashJoin past the literal ceiling; results identical") {
    val cents = VectorOps.ivfCentroids(embs, 200)
    val lit = VectorOps.ivfAssign(embs, cents, nProbe = 2, literalMaxCentroids = 1000)
    val bc = VectorOps.ivfAssign(embs, cents, nProbe = 2, literalMaxCentroids = 0)

    val litPlan = lit.queryExecution.executedPlan.toString
    val bcPlan = bc.queryExecution.executedPlan.toString
    assert(!litPlan.contains("Join"), "literal path must not join")
    assert(bcPlan.contains("BroadcastHashJoin"), "broadcast path must be a hash join")
    assert(!bcPlan.contains("BroadcastNestedLoopJoin") && !bcPlan.contains("CartesianProduct"))
    // the broadcast build side is the bounded centroid model, never the corpus
    assert(bcPlan.contains("BroadcastExchange"))
    assert(bc.queryExecution.optimizedPlan.toString.contains("ResolvedHint") ||
      bcPlan.contains("BroadcastExchange"))

    val litSet = lit.collect().map(r => (r.get(0).toString, r.getString(1))).toSet
    val bcSet = bc.collect().map(r => (r.get(0).toString, r.getString(1))).toSet
    assert(litSet == bcSet)
    // the driver query's m=256 exceeds the default ceiling → broadcast path
    val dflt = VectorOps.ivfAssign(embs, VectorOps.ivfCentroids(embs, 256), nProbe = 2)
    assert(dflt.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("IVF assign: zero-norm (NaN-cosine) centroids rank identically on both paths") {
    import spark.implicits._
    // vec "000" is all-zero → cosine NaN against everything; as a centroid
    // it must NEVER be probed, on the literal AND the broadcast path (they
    // previously ranked NaN oppositely: sort_array put −NaN last, the
    // TopKByScore total order put NaN first)
    val rows = (0 until 40).map { i =>
      val v = if (i == 0) Array.fill(8)(0f)
              else Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)
      (f"$i%03d", v.toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val cents = VectorOps.ivfCentroids(e, 4) // includes the zero vector ("000")
    val nonZero = e.filter($"vec_id" =!= "000")
    val lit = VectorOps.ivfAssign(nonZero, cents, nProbe = 2, literalMaxCentroids = 128)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val bc = VectorOps.ivfAssign(nonZero, cents, nProbe = 2, literalMaxCentroids = 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(lit == bc)
    assert(!lit.exists(_._2 == "000"), "dead (zero-norm) cell must never be probed")
    // a zero-norm QUERY degrades to the deterministic all-ties cell-asc order
    val zq = e.filter($"vec_id" === "000")
    val zl = VectorOps.ivfAssign(zq, cents, nProbe = 2, literalMaxCentroids = 128)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val zb = VectorOps.ivfAssign(zq, cents, nProbe = 2, literalMaxCentroids = 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(zl == zb && zl.nonEmpty)
  }

  test("kmeans: fixed-point updates make training partition-order independent; paths agree") {
    def assignOf(df: org.apache.spark.sql.DataFrame, lmc: Int) =
      VectorOps.kmeansAssignment(df, m = 8, iters = 2, literalMaxCentroids = lmc)
        .collect().map(r => (r.get(0).toString, r.getString(1))).toSet
    val a = assignOf(embs, 128)
    // a float avg() would drift across partitionings; the long sums must not
    val b = assignOf(embs.repartition(13), 128)
    val c = assignOf(embs.coalesce(1), 128)
    assert(a == b && b == c)
    assert(a.size == embs.count())
    // broadcast assignment path (m > ceiling) produces the identical model
    val d = assignOf(embs, 0)
    assert(d == a)
    // cells are actually populated (training moved the centroids somewhere real)
    assert(a.map(_._2).size >= 2)
  }
}
