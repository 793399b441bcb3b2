package graft.functions

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FloatDotProductSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches the composable aggregate(zip_with) form bit-for-bit") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def composable(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val p = embs.as("a").join(embs.as("b"), $"a.vec_id" < $"b.vec_id").limit(5000)
      .select(
        FloatDotProduct(col("a.embedding"), col("b.embedding")).as("native"),
        composable(col("a.embedding"), col("b.embedding")).as("composed"))
    assert(p.filter($"native" =!= $"composed").count() == 0)
    assert(p.count() > 0)
  }

  test("participates in whole-stage codegen") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = embs.select(FloatDotProduct($"embedding", $"embedding").as("n2"))
    val plan = q.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage;
    // the projection containing float_dot must carry it (no CodegenFallback)
    assert(plan.linesIterator.exists(l => l.contains("float_dot") && l.trim.startsWith("*(")))
    // sanity: ‖v‖² positive
    assert(q.filter($"n2" <= 0).count() == 0)
  }

  test("null and empty arrays behave") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    val r = df.select(FloatDotProduct($"a", $"b")).as[Double].collect()
    assert(r.toSeq == Seq(11.0, 0.0))
  }

  test("ragged lengths and null elements yield NULL, matching the zip_with form") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](3.0f, 4.0f, 5.0f)), // ragged
      (Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](2.0f, 3.0f)),        // null elem
      (Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](3.0f, 4.0f)))        // clean
      .toDF("a", "b")
    val native = df.select(FloatDotProduct($"a", $"b").as("d")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val composed = df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (s, v) => s + v).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(native.toSeq == composed.toSeq)
    assert(native.toSeq == Seq(None, None, Some(11.0)))
  }
}
