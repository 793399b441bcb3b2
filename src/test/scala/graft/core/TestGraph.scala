package graft.core

import graft.model.{RawTriple, Term}
import org.scalatest.Assertions._

/** Golden-test harness: extraction + bnode-bijection graph isomorphism,
  * the comparison rule the reference's specs use (`be_equivalent_graph`,
  * /root/reference/spec/reader_spec.rb:902-907).
  */
object TestGraph {

  lazy val testRegistry: RegistryIndex =
    RegistryIndex.fromJson(resource("/golden/test-registry.json"))

  /** The reference's shipped registry (etc/registry.json copy) — the one a
    * real deployment loads; used by the real-world `examples/` goldens.
    */
  lazy val fullRegistry: RegistryIndex =
    RegistryIndex.fromJson(resource("/golden/registry.json"))

  def resource(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  def extract(html: String, base: String = null,
              registry: RegistryIndex = testRegistry): ExtractResult =
    Extractor.extract(html, "testdoc", base, registry)

  /** Rename bnodes (skolem or `_:` labels) to positional `_:b<i>` is NOT
    * done — instead both graphs keep their labels and we search a bijection.
    */
  private def isBnode(s: String): Boolean =
    s.startsWith("_:") || Extractor.isSkolem(s)

  private def bnodes(g: Set[RawTriple]): Vector[String] =
    g.iterator.flatMap { t =>
      Iterator(t.subj) ++ (t.obj match {
        case Term.Iri(v) => Iterator(v)
        case _ => Iterator.empty
      })
    }.filter(isBnode).toVector.distinct

  private def mapped(g: Set[RawTriple], m: Map[String, String]): Set[RawTriple] =
    g.map { t =>
      val s = m.getOrElse(t.subj, t.subj)
      val o = t.obj match {
        case Term.Iri(v) => Term.Iri(m.getOrElse(v, v))
        case l => l
      }
      RawTriple(s, t.pred, o)
    }

  def isomorphic(a0: Seq[RawTriple], b0: Seq[RawTriple]): Boolean = {
    val a = a0.toSet
    val b = b0.toSet
    if (a.size != b.size) return false
    val ab = bnodes(a)
    val bb = bnodes(b)
    if (ab.size != bb.size) return false
    // backtracking over bijections; graphs here are tiny (≤ ~8 bnodes)
    def search(rem: List[String], avail: Set[String], m: Map[String, String]): Boolean =
      rem match {
        case Nil => mapped(a, m) == b
        case x :: rest =>
          avail.exists(y => search(rest, avail - y, m + (x -> y)))
      }
    search(ab.toList, bb.toSet, Map.empty)
  }

  /** Maximum number of expected triples matched under the best bnode
    * bijection (for suite-wide P/R aggregation; == |expected| when
    * isomorphic).
    */
  def matchedCount(actual0: Seq[RawTriple], expected0: Seq[RawTriple]): Int = {
    val a = actual0.toSet
    val b = expected0.toSet
    // fully isomorphic (the common case — every unit test asserts it) means
    // every expected triple matches, at any bnode count; the bounded
    // partial-match search below is only for diagnosing real mismatches
    if (a.size == b.size && isomorphic(actual0, expected0)) return b.size
    val ab = bnodes(a)
    val bb = bnodes(b)
    var best = 0
    def search(rem: List[String], avail: List[String], m: Map[String, String]): Unit =
      rem match {
        case Nil =>
          val overlap = mapped(a, m).intersect(b).size
          if (overlap > best) best = overlap
        case x :: rest =>
          // allow leaving a bnode unmapped (unmatched) too
          search(rest, avail, m)
          avail.foreach(y => search(rest, avail.filterNot(_ == y), m + (x -> y)))
      }
    if (ab.size <= 6 && bb.size <= 6) search(ab.toList, bb.toList, Map.empty)
    else best = mapped(a, Map.empty).intersect(b).size
    best
  }

  def assertIsomorphic(actual: Seq[RawTriple], expectedNt: String, clue: String = ""): Unit = {
    val expected = NTriples.parse(expectedNt)
    if (!isomorphic(actual, expected)) {
      fail(s"""graphs not isomorphic $clue
           |--- actual (${actual.toSet.size}):
           |${NTriples.serialize(actual.toSet.toVector.sortBy((t: RawTriple) => t.toString))}
           |--- expected (${expected.toSet.size}):
           |${NTriples.serialize(expected.toSet.toVector.sortBy((t: RawTriple) => t.toString))}
           |""".stripMargin)
    }
  }

  /** Every (markup, golden, base) case verified through check() is recorded
    * here so PrReportSpec can aggregate suite-wide P/R over the exact same
    * corpus the unit tests enforce.
    */
  val recorded = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()

  /** Extract `md` and compare with `nt`, both possibly using the spec's
    * Person context wrappers (reader_spec.rb:73-81).
    */
  def checkCtx(md: String, nt: String): Unit = {
    val mdDoc = s"""<div itemscope='' itemtype="http://schema.org/Person">
         $md
        </div>"""
    val ntDoc =
      "_:a <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://schema.org/Person> .\n" + nt
    check(mdDoc, ntDoc)
  }

  def check(md: String, nt: String, base: String = null): Unit = {
    recorded.add((md, nt, base))
    val res = extract(md, base)
    assertIsomorphic(res.triples, nt, s"for markup: $md")
  }
}
