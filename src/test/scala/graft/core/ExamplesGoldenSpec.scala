package graft.core

import org.scalatest.funsuite.AnyFunSuite
import TestGraph.{assertIsomorphic, resource}

/** Real-world-document goldens: the reference's `examples/` directory
  * (root/reference/examples — HTML shipped WITHOUT expected outputs).
  * The expected .nt graphs in src/test/resources/examples were derived by
  * applying the microdata-to-RDF processing rules by hand and audited
  * triple-by-triple (subjects/itemids, vocab derivation from the first
  * type, URL vs literal element dispatch, verbatim inner-text whitespace,
  * time@datetime lexical typing, itemref pull-in) — so they both widen the
  * P/R corpus with realistic full documents (https-scheme schema.org
  * vocab, goodrelations hash vocab, multi-type items, newline-bearing
  * literals, implied dd/dt end tags) and pin the extractor against
  * regressions on them.
  */
object ExamplesGoldenSpec {
  /** The corpus definition, shared with PrReportSpec's aggregate P/R. */
  val names = Seq("itemref", "blog_posting", "events_schema_org",
    "inventory-level", "locomotive", "goodreads", "svg")
}

class ExamplesGoldenSpec extends AnyFunSuite {

  def golden(name: String): Unit = {
    val html = resource(s"/examples/$name.html")
    val nt = resource(s"/examples/$name.nt")
    val res = Extractor.extract(html, name, s"http://md.example.org/$name.html",
      TestGraph.fullRegistry)
    assertIsomorphic(res.triples, nt, s"for examples/$name")
    assert(res.errors.isEmpty, res.errors)
  }

  test("itemref example: external itemref target merges into the item") {
    golden("itemref")
  }
  test("blog_posting: https-scheme schema.org vocab, fragment/query hrefs, date typing") {
    golden("blog_posting")
  }
  test("events_schema_org: nested Place/PostalAddress/AggregateOffer, meta content, multiline name") {
    golden("events_schema_org")
  }
  test("inventory-level: goodrelations hash vocab, relative itemid against base") {
    golden("inventory-level")
  }
  test("locomotive: two types split across whitespace run, implied dd end tags") {
    golden("locomotive")
  }
  test("goodreads: verbatim whitespace-heavy literals, nested author item") {
    golden("goodreads")
  }
  test("svg: microdata attributes process identically in SVG markup") {
    golden("svg")
  }
}
