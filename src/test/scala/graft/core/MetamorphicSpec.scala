package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Metamorphic properties over GENERATED microdata: transformations that
  * the W3C processing rules say cannot change the extracted graph must
  * yield isomorphic output (bnode-bijection isomorphism — skolem ids are
  * path-dependent, so only the graph SHAPE is invariant). This checks the
  * semantics on a far larger input space than the transcribed fixtures,
  * without needing goldens.
  */
class MetamorphicSpec extends AnyFunSuite {

  private val propName = Gen.oneOf("name", "age", "knows", "url", "tag")
  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))

  private def leafProp: Gen[String] = Gen.oneOf(
    for { n <- propName; v <- word } yield s"""<span itemprop="$n">$v</span>""",
    for { n <- propName; v <- word } yield s"""<a itemprop="$n" href="/$v">l</a>""",
    for { n <- propName; v <- Gen.choose(0, 999) } yield s"""<data itemprop="$n" value="$v"/>""",
    for { n <- propName; v <- word } yield s"""<meta itemprop="$n" content="$v"/>""",
    for { n <- propName; v <- word } yield s"""<time itemprop="$n" datetime="2026-01-0${v.length % 9 + 1}">t</time>""")

  private def prop(depth: Int): Gen[String] =
    if (depth <= 0) leafProp
    else Gen.frequency(4 -> leafProp, 1 -> (for {
      n <- propName
      inner <- item(depth - 1)
    } yield inner.replaceFirst("<div itemscope", s"""<div itemprop="$n" itemscope""")))

  private def item(depth: Int): Gen[String] = for {
    t <- Gen.oneOf("""itemtype="http://schema.org/Person" """,
      """itemtype="http://s/T" """, "")
    id <- Gen.oneOf("", """itemid="http://x/a" """, """itemid="http://x/b" """)
    k <- Gen.choose(0, 3)
    ps <- Gen.listOfN(k, prop(depth))
  } yield s"""<div itemscope $t$id>${ps.mkString}</div>"""

  private val doc: Gen[String] =
    Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, item(1))).map(_.mkString("\n"))

  private def checkProp(p: Prop, seed: Long): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300).withInitialSeed(Seed(seed)), p)
    assert(res.passed, res.toString)
  }

  /** Uppercase the tag and attribute NAMES of generated markup (values
    * untouched — the generator's value words never collide with the name
    * tokens). Mixed-case artifacts (e.g. dateTIME=) are fine: any case
    * variant must parse identically.
    */
  private def shoutCase(d: String): String =
    Seq("div", "span", "data", "meta", "time", "section", "a",
      "itemscope", "itemprop", "itemtype", "itemid",
      "href", "value", "content", "datetime")
      .foldLeft(d) { (s, n) =>
        val u = n.toUpperCase
        s.replace("<" + n, "<" + u).replace("</" + n, "</" + u)
          .replace(n + "=", u + "=").replace(" " + n + " ", " " + u + " ")
      }

  test("ASCII-uppercasing tag and attribute names is inert (HTML case-insensitivity)") {
    checkProp(Prop.forAll(doc) { d =>
      TestGraph.isomorphic(TestGraph.extract(d).triples,
        TestGraph.extract(shoutCase(d)).triples)
    }, 17)
  }

  test("wrapping a document in inert containers yields an isomorphic graph") {
    checkProp(Prop.forAll(doc) { d =>
      val a = TestGraph.extract(d).triples
      val b = TestGraph.extract(s"<div><section>\n$d\n</section></div>").triples
      TestGraph.isomorphic(a, b)
    }, 11)
  }

  test("comments and stray text BETWEEN top-level items are inert") {
    checkProp(Prop.forAll(doc) { d =>
      val a = TestGraph.extract(d).triples
      val b = TestGraph.extract(s"<!-- c -->\nnoise $d\n<!-- after --> tail").triples
      TestGraph.isomorphic(a, b)
    }, 12)
  }

  test("attribute order on the item tag is irrelevant") {
    checkProp(Prop.forAll(item(1)) { it =>
      // itemscope X Y  →  Y X itemscope (pure attribute permutation)
      val reordered = it.replaceFirst(
        """<div itemscope (itemtype="[^"]*" )?(itemid="[^"]*" )?>""",
        """<div $2$1itemscope>""")
      TestGraph.isomorphic(
        TestGraph.extract(it).triples, TestGraph.extract(reordered).triples)
    }, 13)
  }

  test("N-Triples serialize → parse round-trips isomorphically") {
    checkProp(Prop.forAll(doc) { d =>
      val a = TestGraph.extract(d).triples
      val back = NTriples.parse(NTriples.serialize(a))
      TestGraph.isomorphic(a, back)
    }, 14)
  }
}
