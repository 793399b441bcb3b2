package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`), pure
  * Catalyst expressions (zip_with/aggregate — codegen'd, no UDF).
  *
  * Baseline: brute-force cosine top-k (all-pairs; fine ≤ ~10^4 vectors per
  * bucket). Scale path: random-hyperplane LSH bucketing so the pair join is
  * per-bucket, plus a norm pre-computation so cosine is one dot product.
  */
object VectorOps {

  /** Σ aᵢbᵢ over two float arrays, in double: a native codegen'd Catalyst
    * expression (graft.functions.FloatDotProduct) — identical accumulation
    * order to the composable `aggregate(zip_with(...))` form but without the
    * per-pair intermediate array.
    */
  def dot(a: Column, b: Column): Column = graft.functions.FloatDotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def withNorm(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))

  /** All-pairs cosine ≥ threshold (brute force baseline). */
  def cosinePairs(embs: DataFrame, threshold: Double): DataFrame = {
    val a = withNorm(embs).as("a")
    val b = withNorm(embs).as("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cos"), 4).as("cos_sim"))
  }

  /** Brute-force cosine top-k per query vector (deterministic tiebreak on
    * neighbor id).
    */
  def topK(embs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = withNorm(embs).as("a")
    val b = withNorm(embs).as("b")
    val w = Window.partitionBy(col("vec_a")).orderBy(col("cos").desc, col("vec_b"))
    a.join(b, col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos_sim"), col("rank"))
  }

  /** Random-hyperplane LSH bucket key: sign bits of dot products with
    * `nBits` pseudo-random hyperplanes derived deterministically from
    * xxhash64(bit, dim) — no stored model, reproducible across runs.
    * Vectors sharing a bucket are near in angle with high probability;
    * candidate pairs are verified with exact cosine.
    */
  def lshBucketedPairs(embs: DataFrame, nBits: Int, threshold: Double): DataFrame = {
    val dims = 64 // embedding dimensionality of the corpus tables
    val hashed = withNorm(embs).withColumn("bucket",
      (0 until nBits).map { bit =>
        // hyperplane component h(bit, d) in [-1, 1): derived from xxhash64
        val proj = (0 until dims).map { d =>
          element_at(col("embedding"), d + 1).cast("double") *
            ((xxhash64(lit(bit * 131 + d)) % 1000L).cast("double") / 1000.0)
        }.reduce(_ + _)
        when(proj >= 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_)))
    val a = hashed.as("a")
    val b = hashed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cos"), 4).as("cos_sim"))
  }
}
