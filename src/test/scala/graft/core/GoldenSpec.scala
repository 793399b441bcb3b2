package graft.core

import org.scalatest.funsuite.AnyFunSuite
import TestGraph.resource

/** Golden-file properties BEYOND graph equivalence. The per-file
  * bnode-bijection isomorphism checks for every golden and example fixture
  * live in [[SuiteSpec]] (driven by suite/manifest.jsonld — the single
  * registry of file-based cases); this spec keeps only the assertions the
  * manifest shape cannot express.
  */
class GoldenSpec extends AnyFunSuite {

  test("doap: exact statement-count parity with the reference fixture (19 lines)") {
    val res = Extractor.extract(resource("/golden/doap.html"), "doap", null, TestGraph.testRegistry)
    assert(res.triples.toSet.size == resource("/golden/doap.nt").linesIterator.count(_.nonEmpty))
    assert(res.errors.isEmpty, res.errors)
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
