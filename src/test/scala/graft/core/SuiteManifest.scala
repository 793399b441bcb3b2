package graft.core

import scala.jdk.CollectionConverters._

/** Reader for the vendored conformance-suite manifest — the JSON-LD shape
  * the reference consumes from the W3C microdata-rdf test server
  * (reference spec/suite_helper.rb:118-194: `@graph[0]` carries `label` +
  * `entries`; each entry has `@type` Positive/Negative × Evaluation/Syntax,
  * `action`, optional `result` and `registry`). Vendored extension: an
  * optional `base` gives the entry's document base URI explicitly (the
  * reference derives base from its test server's action URL; our fixtures
  * were derived at known bases — see the manifest's own comment).
  *
  * Suite conformance is thereby MECHANICAL: dropping a new test case in is
  * files + one manifest entry, zero code — [[SuiteSpec]] materializes a
  * ScalaTest test per entry, and PrReportSpec folds every positive
  * evaluation entry into the aggregate P/R.
  */
object SuiteManifest {

  final case class Entry(id: String, types: Seq[String], name: String,
                         comment: String, action: String,
                         result: Option[String], registry: Option[String],
                         base: Option[String]) {
    /** suite_helper.rb:164 — negative iff any @type mentions "Negative".
      * (The manifest shape also distinguishes Evaluation vs Syntax types;
      * every vendored entry is an Evaluation test, so that axis is not
      * modeled — a future Syntax entry would add a predicate here.)
      */
    def positive: Boolean = !types.exists(_.contains("Negative"))
  }

  /** Resolve a manifest-relative path: suite-local files first
    * (`negative/...`), then the shared fixture roots (`golden/...`,
    * `examples/...`).
    */
  def resolve(rel: String): String =
    probe("/suite/" + rel).orElse(probe("/" + rel))
      .getOrElse(sys.error(s"manifest references missing resource: $rel"))

  private def probe(path: String): Option[String] =
    Option(getClass.getResourceAsStream(path)).map { in =>
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }

  // the two fixture registries route to TestGraph's existing lazy parses
  // (single source of truth); anything else parses once per path
  private val registryCache = scala.collection.concurrent.TrieMap[String, RegistryIndex](
    "golden/test-registry.json" -> TestGraph.testRegistry,
    "golden/registry.json" -> TestGraph.fullRegistry)
  def registryFor(e: Entry): RegistryIndex =
    e.registry.map(r =>
        registryCache.getOrElseUpdate(r, RegistryIndex.fromJson(resolve(r))))
      .getOrElse(TestGraph.testRegistry)

  /** (manifest label, entries) from the vendored manifest.jsonld. */
  lazy val load: (String, Vector[Entry]) = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(TestGraph.resource("/suite/manifest.jsonld"))
    val m = root.get("@graph").get(0)
    def str(n: com.fasterxml.jackson.databind.JsonNode, f: String): Option[String] =
      Option(n.get(f)).map(_.asText)
    val entries = m.get("entries").elements().asScala.map { e =>
      val types = Option(e.get("@type")).map { t =>
        if (t.isArray) t.elements().asScala.map(_.asText).toSeq else Seq(t.asText)
      }.getOrElse(Nil)
      Entry(str(e, "@id").getOrElse(""), types,
        str(e, "name").getOrElse(sys.error("manifest entry without name")),
        str(e, "comment").getOrElse(""),
        str(e, "action").getOrElse(sys.error("manifest entry without action")),
        str(e, "result"), str(e, "registry"), str(e, "base"))
    }.toVector
    (str(m, "label").getOrElse(""), entries)
  }
}

/** Manifest-driven conformance runner: one ScalaTest test per manifest
  * entry, mirroring the reference's suite_spec.rb:14-70 — positive
  * evaluation entries assert bnode-bijection graph equivalence and a clean
  * error surface; negative entries assert the extractor SURFACES an error
  * (the reference raises RDF::ReaderError under `validate: true`; our
  * analog is a non-empty ExtractResult.errors, which `--validate` turns
  * into a failed exit).
  */
class SuiteSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val (label, entries) = SuiteManifest.load

  test("manifest loads with the expected corpus breadth") {
    assert(label.nonEmpty)
    assert(entries.size >= 15, s"suite unexpectedly small: ${entries.size}")
    assert(entries.exists(!_.positive), "suite must include negative cases")
  }

  entries.foreach { t =>
    test(s"${t.name}: ${t.comment.takeWhile(_ != '(').trim}") {
      val html = SuiteManifest.resolve(t.action)
      val res = Extractor.extract(html, t.name, t.base.orNull,
        SuiteManifest.registryFor(t))
      if (t.positive) {
        TestGraph.assertIsomorphic(res.triples,
          SuiteManifest.resolve(t.result.getOrElse(
            sys.error(s"positive entry ${t.name} without result"))),
          s"for suite entry ${t.name}")
        assert(res.errors.isEmpty, res.errors)
      } else {
        assert(res.errors.nonEmpty,
          s"negative entry ${t.name} must surface an extraction error")
      }
    }
  }
}
