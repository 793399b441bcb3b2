package graft.core

import org.scalatest.funsuite.AnyFunSuite

class Rfc3986Spec extends AnyFunSuite {
  test("absolute ref wins") {
    assert(Rfc3986.resolve("http://a/b", "http://c/d") == "http://c/d")
  }
  test("relative against http base") {
    assert(Rfc3986.resolve("http://example.com/", "foo") == "http://example.com/foo")
    assert(Rfc3986.resolve("http://example.com/a/b", "foo") == "http://example.com/a/foo")
    assert(Rfc3986.resolve("http://example.com/a/b", "/foo") == "http://example.com/foo")
    assert(Rfc3986.resolve("http://example.com/a/b", "../c") == "http://example.com/c")
    assert(Rfc3986.resolve("http://example.com/a/b", "#f") == "http://example.com/a/b#f")
    assert(Rfc3986.resolve("http://example.com/a/b", "?q") == "http://example.com/a/b?q")
  }
  test("absolute ref with a LEADING dot segment normalizes (fast path must not skip it)") {
    assert(Rfc3986.resolve("http://a/b", "http:../c") == "http:c")
    assert(Rfc3986.resolve("http://a/b", "a:./b") == "a:b")
    assert(Rfc3986.resolve("http://a/b", "http://c/d/../e") == "http://c/e")
    // a non-segment dot after the colon takes the slow path to the same result
    assert(Rfc3986.resolve("http://a/b", "mailto:.user") == "mailto:.user")
  }
  test("empty ref returns base (doap itemid='')") {
    assert(Rfc3986.resolve("https://rubygems.org/gems/rdf-microdata", "") ==
      "https://rubygems.org/gems/rdf-microdata")
  }
  test("relative base (no document base): reference stays relative") {
    assert(Rfc3986.resolve("", "subj") == "subj")
    assert(Rfc3986.resolve("", "") == "")
    assert(Rfc3986.resolve("", "#name") == "#name")
  }
  test("validateIri: opt-in reader validate semantics (reader.rb:464)") {
    assert(Rfc3986.validateIri("http://example.com/a?q=1#f").isEmpty)
    assert(Rfc3986.validateIri("urn:isbn:0451450523").isEmpty)
    assert(Rfc3986.validateIri("http://ex.org/%C3%A9").isEmpty)
    assert(Rfc3986.validateIri("").exists(_.contains("empty")))
    assert(Rfc3986.validateIri("relative/path").exists(_.contains("relative")))
    assert(Rfc3986.validateIri("http://ex.org/a b").exists(_.contains("U+0020")))
    assert(Rfc3986.validateIri("http://ex.org/<x>").exists(_.contains("forbidden")))
    assert(Rfc3986.validateIri("http://ex.org/%G1").exists(_.contains("percent")))
    assert(Rfc3986.validateIri("http://ex.org/%2").exists(_.contains("percent")))
  }

  test("canonicalizeIri: scheme/host lowercase, default port drop, escape upcase, dot segments") {
    assert(Rfc3986.canonicalizeIri("HTTP://Example.COM:80/a/../b%2f") ==
      "http://example.com/b%2F")
    assert(Rfc3986.canonicalizeIri("https://Ex.org:443/x") == "https://ex.org/x")
    assert(Rfc3986.canonicalizeIri("https://ex.org:8443/x") == "https://ex.org:8443/x")
    assert(Rfc3986.canonicalizeIri("http://u:p@Host.Org/P") == "http://u:p@host.org/P")
    // path/query/fragment case is preserved (only escapes upcase)
    assert(Rfc3986.canonicalizeIri("http://ex.org/Path?Q=%2f#Fr%2f") ==
      "http://ex.org/Path?Q=%2F#Fr%2F")
    // relative refs pass through untouched; malformed escapes never throw
    assert(Rfc3986.canonicalizeIri("relative/Path") == "relative/Path")
    assert(Rfc3986.canonicalizeIri("http://ex.org/%2") == "http://ex.org/%2")
  }

  test("isAbsolute") {
    assert(Rfc3986.isAbsolute("http://schema.org/name"))
    assert(Rfc3986.isAbsolute("urn:x:y"))
    assert(!Rfc3986.isAbsolute("name"))
    assert(!Rfc3986.isAbsolute("Person"))
    assert(!Rfc3986.isAbsolute("#frag"))
  }
  test("withFragment replaces fragment") {
    assert(Rfc3986.withFragment("http://a/b", "n") == "http://a/b#n")
    assert(Rfc3986.withFragment("", "name") == "#name")
  }
}

class LexicalSpec extends AnyFunSuite {
  import Lexical._
  test("numeric scan order: Integer then Double, verbatim lexical") {
    assert(numericDatatype("1") == XsdInteger)
    assert(numericDatatype("-12") == XsdInteger)
    assert(numericDatatype("1.1") == XsdDouble)
    assert(numericDatatype("1.1e1") == XsdDouble)
    assert(numericDatatype(".5") == XsdDouble)
    assert(numericDatatype("INF") == XsdDouble)
    assert(numericDatatype("foo") == null)
    assert(numericDatatype("1 2") == null)
  }
  test("temporal scan order: Date, Time, DateTime, Duration") {
    assert(temporalDatatype("2011-06-28Z") == XsdDate)
    assert(temporalDatatype("2011-06-28") == XsdDate)
    assert(temporalDatatype("00:00:00Z") == XsdTime)
    assert(temporalDatatype("2011-06-28T00:00:00Z") == XsdDateTime)
    assert(temporalDatatype("2011-06-28T00:00:00.123-05:00") == XsdDateTime)
    assert(temporalDatatype("P2011Y06M28DT00H00M00S") == XsdDuration)
    assert(temporalDatatype("PT5M") == XsdDuration)
    assert(temporalDatatype("foo") == null)
    assert(temporalDatatype("28 June 2011") == null)
  }
  test("fragEscape percent-encodes the reserved set per UTF-8 byte") {
    assert(fragEscape("name") == "name")
    assert(fragEscape("a b") == "a b")
    assert(fragEscape("a#b") == "a%23b")
    assert(fragEscape("a[b]") == "a%5Bb%5D")
    assert(fragEscape("""a"b""") == "a%22b")
    assert(fragEscape("a|b^c{d}") == "a%7Cb%5Ec%7Bd%7D")
    assert(fragEscape("a\\b") == "a%5Cb")
    assert(fragEscape("a%b") == "a%25b")
  }
}

class MicroDocSpec extends AnyFunSuite {
  import graft.html.MicroDoc
  test("parses nested elements with attributes") {
    val d = MicroDoc.parse("""<div itemscope itemtype="http://x/T"><span itemprop='a'>hi</span></div>""")
    val items = d.topLevelItems
    assert(items.size == 1)
    assert(items.head.attr("itemtype").contains("http://x/T"))
    assert(items.head.elements.head.innerText == "hi")
  }
  test("void elements take no children") {
    val d = MicroDoc.parse("""<div><link itemprop="l" href="x"><span itemprop="s">t</span></div>""")
    val div = d.root.elements.head
    assert(div.elements.map(_.tag) == Seq("link", "span"))
  }
  test("lang inheritance") {
    val d = MicroDoc.parse("""<dl lang="en"><dd><cite itemprop="t">X</cite></dd></dl>""")
    val cite = d.root.elements.head.elements.head.elements.head
    assert(cite.language == "en")
  }
  test("entity decoding in text and attributes") {
    val d = MicroDoc.parse("""<a href="x?a=1&amp;b=2">AC&#47;DC &amp; more</a>""")
    val a = d.root.elements.head
    assert(a.attr("href").contains("x?a=1&b=2"))
    assert(a.innerText == "AC/DC & more")
  }
  test("named entity references decode (Latin-1 block + typographic punctuation)") {
    val d = MicroDoc.parse("""<span>Caf&eacute; &mdash; M&uuml;ller &hellip; &copy;&nbsp;&euro;5</span>""")
    assert(d.root.elements.head.innerText == "Café — Müller … © €5")
    // unknown names still pass through verbatim
    val u = MicroDoc.parse("""<span>&notaname; stays</span>""")
    assert(u.root.elements.head.innerText == "&notaname; stays")
  }
  test("NTriples: IRIs with grammar-forbidden chars round-trip via \\uXXXX escapes") {
    import graft.model.{RawTriple, Term}
    val t = RawTriple("http://x/a>b c", "http://p/q", Term.Iri("http://y/<z>\\w"))
    val line = NTriples.serialize(Seq(t))
    assert(!line.matches(".*<[^>]*[ <{}|^`\\\\][^>]*>.*") || line.contains("\\u"),
      s"raw forbidden char leaked: $line")
    val back = NTriples.parse(line)
    assert(back.head.subj == t.subj && back.head.pred == t.pred)
    assert(back.head.obj == t.obj)
  }
  test("NTriples: ECHAR \\b and \\f escapes parse (the reference's writer emits the named forms)") {
    import graft.model.{RawTriple, Term}
    val ts = NTriples.parse("<http://s> <http://p> \"a\\bb\\fc\" .")
    assert(ts.head.obj == Term.Lit("a\bb\fc"))
    // round-trip through this writer's \uXXXX forms
    val line = NTriples.serialize(Seq(RawTriple("http://s", "http://p", ts.head.obj)))
    assert(NTriples.parse(line).head.obj == ts.head.obj)
  }
  test("stray solidus on a non-void HTML element is ignored (tag stays open, HTML5)") {
    val d = MicroDoc.parse("""<div><span itemprop="a"/>text</div>""")
    val span = d.root.elements.head.elements.head
    assert(span.tag == "span")
    assert(span.innerText == "text", "HTML5: <span/> does NOT close — the text is its child")
  }
  test("foreign content (svg/math) honors XML self-closing syntax") {
    val d = MicroDoc.parse("""<svg><circle r="1"/><rect/></svg>""")
    val svg = d.root.elements.head
    assert(svg.elements.map(_.tag) == Seq("circle", "rect"))
    assert(svg.elements.forall(_.elements.isEmpty))
  }
  test("NTriples: unterminated literal is a diagnostic, not StringIndexOutOfBounds") {
    val e = intercept[IllegalArgumentException] {
      NTriples.parse("<http://s> <http://p> \"unterminated")
    }
    assert(e.getMessage.contains("unterminated"))
  }
  test("NTriples: unterminated IRIs are diagnostics, not StringIndexOutOfBounds") {
    val e1 = intercept[IllegalArgumentException] {
      NTriples.parse("<http://s")
    }
    assert(e1.getMessage.contains("unterminated IRI"))
    val e2 = intercept[IllegalArgumentException] {
      NTriples.parse("<http://s> <http://p> \"x\"^^<http://dt")
    }
    assert(e2.getMessage.contains("unterminated datatype IRI"))
  }
  test("first element by id wins; comments and doctype skipped") {
    val d = MicroDoc.parse("""<!DOCTYPE html><!-- c --><p id="a">one</p><p id="a">two</p>""")
    assert(d.byId("a").innerText == "one")
  }
  test("p auto-closes before block elements") {
    val d = MicroDoc.parse("""<div><p>text<div id="x">inner</div></div>""")
    // the inner div must be a sibling-level element, not swallowed by <p>
    assert(d.byId.contains("x"))
    val outer = d.root.elements.head
    assert(outer.elements.map(_.tag) == Seq("p", "div"))
  }
  test("structural paths are stable and unique") {
    val d = MicroDoc.parse("""<div><span>a</span><span>b</span></div>""")
    val spans = d.root.elements.head.elements
    assert(spans.map(_.path).distinct.size == 2)
  }
}

class SkolemPropertySpec extends AnyFunSuite {
  test("skolem ids are deterministic and docId-scoped") {
    val gen = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val doc = gen.nextString(gen.nextInt(20))
      val path = gen.nextString(gen.nextInt(10))
      assert(Extractor.skolem(doc, path) == Extractor.skolem(doc, path))
    }
    assert(Extractor.skolem("d1", "0.1") != Extractor.skolem("d2", "0.1"))
    assert(Extractor.skolem("d1", "0.1") != Extractor.skolem("d1", "0.2"))
  }
}
