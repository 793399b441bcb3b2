package graft.functions

import graft.core.NTriples
import graft.model.{Term, Triple}
import graft.spark.{ExtractPipeline, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NTriplesEscapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the row-local core escapers are the single source of truth (pinned by
  // the golden suite); the column expression must agree byte-for-byte
  private val hostile = Seq(
    "",
    "plain ascii",
    "quote \" inside",
    "back\\slash",
    "tab\there\nnewline\rret",
    " low controls",
    "multibyte é 中 𝄞 ok", // é, 中, 𝄞 (non-BMP)
    "angle <a> braces {b} pipe | caret ^ tick ` space",
    "mixed \\ \" \n  ÿ")

  test("literal and IRI escape agree with graft.core.NTriples on hostile strings") {
    val df = hostile.toDF("s").select(
      col("s"),
      NTriplesEscapeExpr.literal(col("s")).as("lit"),
      NTriplesEscapeExpr.iri(col("s")).as("iri"))
    df.collect().foreach { r =>
      val s = r.getString(0)
      assert(r.getString(1) == NTriples.escape(s), s"literal mismatch for ${s.getBytes.toSeq}")
      assert(r.getString(2) == NTriples.escapeIri(s), s"iri mismatch for ${s.getBytes.toSeq}")
    }
  }

  test("null input stays null; clean strings come back unchanged") {
    val df = Seq[(String, String)]((null, "clean")).toDF("a", "b")
      .select(NTriplesEscapeExpr.literal(col("a")).as("a"),
        NTriplesEscapeExpr.iri(col("b")).as("b"))
    val r = df.head()
    assert(r.isNullAt(0) && r.getString(1) == "clean")
  }

  // the reason this expression exists: the regexp_replace-chain form of the
  // sink projection generated a method past janino's 64 KB limit, so the
  // WHOLE serialization stage silently ran interpreted. With fallback
  // disabled, a codegen failure now throws instead — this test fails on any
  // regression that pushes the sink projection out of codegen.
  test("toNTriples sink projection compiles under codegen with fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val lex = "lex \"x\"\n" + 3.toChar // quote, named escape, bare control
      val rows = Seq(
        Triple("http://s/a b", "http://p", "did:skolem:ab12", null, null, null, "c", 0),
        Triple("did:skolem:ff00", "http://p", null, lex, null, "en", "c", 1),
        Triple("http://s", "http://p<q>", null, "5",
          "http://www.w3.org/2001/XMLSchema#integer", null, "c", 2))
      val nt = ExtractPipeline.toNTriples(rows.toDS()).as[String].collect().toSet
      // expected lines from the row-local core serializer (source of truth)
      val expected = Set(
        s"<${NTriples.escapeIri("http://s/a b")}> <http://p> _:ab12 .",
        s"_:ff00 <http://p> ${NTriples.termToString(Term.Lit(lex, null, "en"))} .",
        s"<http://s> <${NTriples.escapeIri("http://p<q>")}> " +
          NTriples.termToString(Term.Lit("5",
            "http://www.w3.org/2001/XMLSchema#integer", null)) + " .")
      assert(nt == expected)
      assert(nt.exists(_.contains("\\u0020")) && nt.exists(_.contains("\\u0003")))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
