package graft.core

import org.scalatest.funsuite.AnyFunSuite
import TestGraph.{assertIsomorphic, resource}

/** Golden-file tests: the reference's example pairs
  * (/root/reference/spec/test-files/example{1,2,3}.html ↔ .ttl,
  * reader_spec.rb:878-884) and the full-document doap fixture
  * (/root/reference/etc/doap.html ↔ doap.nt, reader_spec.rb:7-9).
  */
class GoldenSpec extends AnyFunSuite {

  def golden(name: String): Unit = {
    val html = resource(s"/golden/$name.html")
    val nt = resource(s"/golden/$name.nt")
    val res = Extractor.extract(html, name, null, TestGraph.testRegistry)
    assertIsomorphic(res.triples, nt, s"for $name")
    assert(res.errors.isEmpty, res.errors)
  }

  test("example1: itemid subjects, absolute itemprops, language inheritance") {
    golden("example1")
  }
  test("example2: itemref sharing — one adr bnode shared by two hcards") {
    golden("example2")
  }
  test("example3: repeated properties, nested typed items, relative hrefs") {
    golden("example3")
  }
  test("doap: <base href>, empty itemid, multi-token itemprop, time→xsd:date") {
    golden("doap")
    // exact statement count parity with the reference fixture (19 lines)
    val res = Extractor.extract(resource("/golden/doap.html"), "doap", null, TestGraph.testRegistry)
    assert(res.triples.toSet.size == resource("/golden/doap.nt").linesIterator.count(_.nonEmpty))
  }

  test("skolem determinism: same doc twice → identical triples") {
    val html = resource("/golden/example2.html")
    val a = Extractor.extract(html, "d1", null, TestGraph.testRegistry).triples
    val b = Extractor.extract(html, "d1", null, TestGraph.testRegistry).triples
    assert(a == b)
    val c = Extractor.extract(html, "d2", null, TestGraph.testRegistry).triples
    assert(a.toSet.intersect(c.toSet).isEmpty) // different doc → disjoint bnode ids
  }
}
