package graft.functions

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKByScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("top_k_by_score equals window top-k across many partitions (bounded buffers)") {
    // 3 groups x 500 rows, deliberately shuffled over 13 partitions so the
    // partial-buffer compaction and merge paths both run
    val rows = for (g <- 0 until 3; i <- 0 until 500)
      yield (s"g$g", (i * 37 % 100).toDouble, f"id$i%04d")
    val df = rows.toDF("grp", "score", "pid").repartition(13)

    val got = df.groupBy($"grp")
      .agg(TopKByScore($"score", $"pid", 5).as("top"))
      .select($"grp", posexplode($"top"))
      .select($"grp", $"pos", $"col.score", $"col.payload")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"pid")
    val want = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"grp", ($"rn" - 1).as("pos"), $"score", $"pid")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet

    assert(got == want)
    assert(got.size == 15)
  }

  test("top_k_by_score ignores nulls and handles groups smaller than k") {
    val df = Seq(("a", Some(1.0), "x"), ("a", None, "y"), ("b", Some(2.0), "z"))
      .toDF("grp", "score", "pid")
    val out = df.groupBy($"grp")
      .agg(TopKByScore($"score", $"pid", 3).as("top"))
      .select($"grp", size($"top").as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(out == Map("a" -> 1, "b" -> 1))
  }

  test("top_k_by_score survives NaN scores with a deterministic total order") {
    // raw >/== comparisons make NaN "equal" to everything, breaking the
    // strict-weak-ordering sortWith relies on; Double.compare keeps a total
    // order (NaN sorts as the largest score)
    val rows = (0 until 200).map(i =>
      ("g", if (i % 7 == 0) Double.NaN else i.toDouble, f"id$i%03d"))
    val df = rows.toDF("grp", "score", "pid").repartition(9)
    val got = df.groupBy($"grp").agg(TopKByScore($"score", $"pid", 4).as("top"))
      .select(posexplode($"top")).select($"col.payload")
      .collect().map(_.getString(0)).toList
    // NaN > every real score under Double.compare; payload breaks NaN ties
    assert(got == List("id000", "id007", "id014", "id021"))
    val again = df.groupBy($"grp").agg(TopKByScore($"score", $"pid", 4).as("top"))
      .select(posexplode($"top")).select($"col.payload")
      .collect().map(_.getString(0)).toList
    assert(again == got)
  }
}
