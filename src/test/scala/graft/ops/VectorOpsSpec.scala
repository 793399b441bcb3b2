package graft.ops

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality on the planted-near-dup corpus (originals ∪ deterministic
  * perturbed copies, cos ≈ 0.999): both scale paths must find every planted
  * duplicate. The raw embeddings are isotropic noise (max pair cos ≈ 0.6),
  * so threshold 0.9 isolates exactly the planted pairs.
  */
class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def corpus = {
    val e = embs
    e.select(col("vec_id").cast("string").as("vec_id"), col("embedding"))
      .unionByName(VectorOps.perturbed(e, eps = 0.05, seed = 999983, idSuffix = "_p"))
  }

  test("multi-table LSH recall is 1.0 on planted near-dups") {
    val r = VectorOps.lshRecall(embs, nBits = 8, nTables = 4, threshold = 0.9).head()
    assert(r.getLong(0) == embs.count())   // exact pairs == planted pairs
    assert(r.getDouble(2) == 1.0)
  }

  test("IVF top-1 neighbor of every original is its planted copy") {
    // nProbe=4: the 5% perturbation can shift near-tied centroid rankings,
    // so a copy's home cell can sit at probe rank 3-4 of its original
    // (measured: nProbe=2 → recall 0.992, nProbe=4 → 1.0 at every sf)
    val top1 = VectorOps.ivfTopK(corpus, m = 16, nProbe = 4, k = 1)
      .filter(!col("vec_a").endsWith("_p"))
      .select(col("vec_a"), col("vec_b")).collect()
    assert(top1.length == embs.count())
    assert(top1.forall(r => r.getString(1) == r.getString(0) + "_p"))
  }

  test("near-dup groups pair every original with exactly its copy") {
    val groups = VectorOps.nearDupGroups(corpus, nBits = 8, nTables = 4, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = embs.count()
    assert(groups.length == 2 * n)
    assert(groups.forall { case (v, keep) => keep == v.stripSuffix("_p") })
  }
}
