package graft.spark

import graft.model.Triple
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Two-physical-strategy parity, DISTRIBUTED side: every size-adaptive
  * operator (closures, incremental closure, entailment fixpoint,
  * pagerank) is forced through its distributed path by dropping the
  * single-task threshold to 0, and the result must equal the single-task
  * path's bit-for-bit. Without this, the distributed loops — the shapes
  * that actually run at scale — would only execute on >threshold data.
  */
class DistributedPathParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def edgeDf(es: (String, String)*): DataFrame =
    es.toDF("s", "o")

  private def pairs(df: DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  private def forcedDistributedClosure[A](body: => A): A = {
    val prev = GraphQuery.SingleTaskClosureMaxEdges
    GraphQuery.SingleTaskClosureMaxEdges = 0L
    try body finally GraphQuery.SingleTaskClosureMaxEdges = prev
  }

  test("closePairs: doubling distributed path equals the single-task path (chain, diamond, cycle)") {
    val graphs = Seq(
      edgeDf("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "e" -> "f"),
      edgeDf("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d", "d" -> "e"),
      edgeDf("a" -> "b", "b" -> "c", "c" -> "a"))
    graphs.foreach { g =>
      val single = pairs(GraphQuery.closePairs(g))
      val dist = forcedDistributedClosure(pairs(GraphQuery.closePairs(g)))
      assert(single == dist)
      assert(single.nonEmpty)
    }
  }

  test("pathPlusIncremental: distributed decomposition equals the single-task path") {
    val closed = GraphQuery.closePairs(edgeDf("a" -> "b", "b" -> "c", "x" -> "y"))
    val delta = edgeDf("c" -> "x", "y" -> "z")
    val single = pairs(GraphQuery.pathPlusIncremental(closed, delta))
    val dist = forcedDistributedClosure(
      pairs(GraphQuery.pathPlusIncremental(closed, delta)))
    assert(single == dist)
    // sanity: the bridge closes across old components
    assert(single.contains("a" -> "z"))
  }

  test("owlEntail / owlEntailIncremental: distributed fixpoint equals the single-task path") {
    def t(s: String, p: String, o: String) = Triple(s, p, o, null, null, null, "c", 0)
    val base = Seq(
      t("x", "p", "y"), t("y", "p", "z"),
      t("x", Entailment.RdfType, "A"),
      t("q", "meta", "r"),
      t("meta", Entailment.SubPropertyOf, Entailment.SubPropertyOf),
      t("x", "q", "y")).toDS()
    val delta = Seq(
      t("p", Entailment.SubPropertyOf, "pp"),
      t("A", Entailment.SubClassOf, "B")).toDS()
    def ids(ds: org.apache.spark.sql.Dataset[Triple]) = ds.collect()
      .map(x => (x.subj, x.pred, x.obj_iri, x.obj_lexical, x.obj_datatype, x.obj_lang)).toSet
    val single = ids(Entailment.owlEntail(base))
    val singleIncr = ids(Entailment.owlEntailIncremental(Entailment.owlEntail(base), delta))
    val (prevF, prevR) = (Entailment.SingleTaskMaxFacts, Entailment.SingleTaskMaxResult)
    Entailment.SingleTaskMaxFacts = 0L
    try {
      val dist = ids(Entailment.owlEntail(base))
      val distIncr = ids(Entailment.owlEntailIncremental(Entailment.owlEntail(base), delta))
      assert(single == dist)
      assert(singleIncr == distIncr)
    } finally {
      Entailment.SingleTaskMaxFacts = prevF
      Entailment.SingleTaskMaxResult = prevR
    }
    // the derived-schema-edge replay fired on both paths
    assert(single.contains(("x", "r", "y", null, null, null)))
    assert(singleIncr.contains(("x", "pp", "y", null, null, null)))
  }

  test("pagerank: distributed loop equals the single-task path bit-for-bit") {
    val edges = edgeDf("a" -> "b", "b" -> "c", "c" -> "a", "d" -> "a", "e" -> "a")
      .select(org.apache.spark.sql.functions.col("s").as("src"),
        org.apache.spark.sql.functions.col("o").as("dst"))
    def ranks(df: DataFrame) = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val single = ranks(GraphRank.pagerank(edges, iters = 4))
    val prev = GraphRank.SingleTaskMaxEdges
    GraphRank.SingleTaskMaxEdges = 0L
    val dist = try ranks(GraphRank.pagerank(edges, iters = 4))
      finally GraphRank.SingleTaskMaxEdges = prev
    assert(single == dist)
    assert(single.nonEmpty)
  }

  test("oversized delta overflows the incremental single task and falls back, same result") {
    // a tiny cap forces the in-task overflow -> distributed fallback path
    val closed = GraphQuery.closePairs(edgeDf("a" -> "b", "b" -> "c"))
    val delta = edgeDf("c" -> "d", "d" -> "e", "e" -> "f")
    val normal = pairs(GraphQuery.pathPlusIncremental(closed, delta))
    val prev = GraphQuery.SingleTaskClosureMaxEdges
    GraphQuery.SingleTaskClosureMaxEdges = 2L // c fits nothing; count guard trips first
    val fallback = try pairs(GraphQuery.pathPlusIncremental(closed, delta))
      finally GraphQuery.SingleTaskClosureMaxEdges = prev
    assert(normal == fallback)
    assert(normal.contains("a" -> "f"))
  }
}
