package graft.spark

import org.scalatest.funsuite.AnyFunSuite

class GraphRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pagerank: hand-computed micro-unit ranks on a 2-node chain") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    // r0 = 1,000,000 each. iter1: b += (1e6*0.85)//1 = 850,000 → b
    // 1,000,000; a (dangling source of nothing inbound) → 150,000.
    // iter2: contrib from a = (150,000*850,000)//1,000,000 = 127,500 →
    // b = 277,500; a stays 150,000.
    val r = GraphRank.pagerank(edges, iters = 2).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 150000L, "b" -> 277500L))
  }

  test("pagerank: out-degree splits mass with per-edge floor division") {
    // a → b, a → c: each edge carries (1e6*850000)//(2*1e6) = 425,000
    val edges = Seq(("a", "b"), ("a", "c")).toDF("src", "dst")
    val r = GraphRank.pagerank(edges, iters = 1).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 150000L, "b" -> 575000L, "c" -> 575000L))
  }

  test("pagerank: bit-identical under different partitionings (fixed-point)") {
    val edges = (1 to 200).map(i => (s"n$i", s"n${i / 2}")).toDF("src", "dst")
    val a = GraphRank.pagerank(edges.repartition(1), iters = 4)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val b = GraphRank.pagerank(edges.repartition(13), iters = 4)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(a == b)
  }

  test("pagerank over a persisted graph slices one predicate's edges only") {
    val df = Seq(
      ("a", "boss", "b", null: String),
      ("a", "knows", "z", null: String), // different predicate: excluded
      ("b", "boss", "c", null: String))
      .toDF("subj", "pred", "obj_iri", "obj_lexical")
    val g = GraphQuery.PersistedGraph(df, 0, Map.empty)
    val nodes = GraphRank.pagerank(g, Some("boss"), iters = 1)
      .collect().map(_.getString(0)).toSet
    assert(nodes == Set("a", "b", "c")) // no z
  }
}
