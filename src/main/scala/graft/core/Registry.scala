package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** One vocabulary context: a prefix URI (null = no current vocabulary) plus
  * the registry-declared per-property expansions.
  *
  * Mirrors the reference's `Registry` instance semantics
  * (/root/reference/lib/rdf/microdata/registry.rb:35-106): `propertyBase`
  * gets a trailing `#` unless the prefix already ends in `/` or `#`
  * (registry.rb:39-40); `predicateURI` passes absolute names through,
  * falls back to the document base's fragment when there is no vocabulary,
  * and otherwise appends the fragment-escaped name (registry.rb:60-76);
  * `expand` yields `subPropertyOf` else `equivalentProperty` targets
  * (registry.rb:84-92 — subPropertyOf wins, they do not union).
  */
final case class Vocab(uri: String, props: Map[String, Vector[String]])
    extends Serializable {

  val propertyBase: String = {
    val s = if (uri == null) "" else uri
    if (s.endsWith("/") || s.endsWith("#")) s else s + "#"
  }

  def predicateURI(name: String, baseUri: String): String =
    if (Rfc3986.isAbsolute(name)) name
    else if (uri == null) Rfc3986.withFragment(if (baseUri == null) "" else baseUri, Lexical.fragEscape(name))
    else propertyBase + Lexical.fragEscape(name)

  /** Strip the first occurrence of propertyBase (Ruby `sub`, registry.rb:99). */
  private def tokenize(predicate: String): String = {
    val i = predicate.indexOf(propertyBase)
    if (i < 0) predicate
    else predicate.substring(0, i) + predicate.substring(i + propertyBase.length)
  }

  /** Expansion IRIs for an emitted predicate (inline 1-hop, reader.rb:288-292). */
  def expand(predicate: String): Vector[String] =
    props.getOrElse(tokenize(predicate), Vector.empty)
}

object Vocab {
  /** `Registry.new(nil)` — top-level evaluation context (reader.rb:216). */
  val none: Vocab = Vocab(null, Map.empty)
  private val DerivedRe = java.util.regex.Pattern.compile("([/#])[^/#]*$")

  /** Derived vocabulary: type URI stripped after last `/` or `#`
    * (reader.rb:256).
    */
  def derived(typeUri: String): Vocab =
    Vocab(DerivedRe.matcher(typeUri).replaceFirst("$1"), Map.empty)
}

/** Immutable, broadcast-friendly registry index. Prefix lookup is
  * first-match in file insertion order (registry.rb:48-52 `detect`).
  */
final class RegistryIndex(val entries: Vector[Vocab]) extends Serializable {
  def find(typeUri: String): Option[Vocab] =
    entries.find(v => typeUri.startsWith(v.uri))
}

object RegistryIndex {
  val empty = new RegistryIndex(Vector.empty)

  /** Parse a registry JSON document (shape of
    * /root/reference/etc/registry.json): top-level map prefix → entry; only
    * `properties.{subPropertyOf,equivalentProperty}` are consumed — other
    * keys (`propertyURI`, `multipleValues`, `datatype`) are parsed and
    * ignored, matching the current reference (SURVEY.md §2.9).
    */
  def fromJson(json: String): RegistryIndex = {
    val root = new ObjectMapper().readTree(json)
    val entries = root.properties().asScala.flatMap { e =>
      val (prefix, node) = (e.getKey, e.getValue)
      if (!node.isObject) None // e.g. "@comment" strings are skipped
      else {
        val propsNode = node.get("properties")
        val props: Map[String, Vector[String]] =
          if (propsNode == null || !propsNode.isObject) Map.empty
          else propsNode.properties().asScala.flatMap { p =>
            val spec = p.getValue
            if (!spec.isObject) None
            else {
              val v = Option(spec.get("subPropertyOf"))
                .orElse(Option(spec.get("equivalentProperty")))
              v.map { vn =>
                val iris =
                  if (vn.isArray) vn.elements().asScala.map(_.asText()).toVector
                  else Vector(vn.asText())
                p.getKey -> iris
              }
            }
          }.toMap
        Some(Vocab(prefix, props))
      }
    }.toVector
    new RegistryIndex(entries)
  }

  def fromFile(path: String): RegistryIndex =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  /** Registry-by-URI (the reference loads registries with
    * `RDF::Util::File.open_file`, registry.rb:16-28, which handles file: and
    * http(s): alike). `file:` URIs and bare paths read locally; remote
    * schemes go through java.net.URL so an egress-enabled deployment works
    * unchanged. Load once on the driver, then broadcast (ExtractPipeline).
    */
  def fromUri(uri: String): RegistryIndex = {
    val u = java.net.URI.create(uri)
    u.getScheme match {
      case null => fromFile(uri)
      case "file" => fromFile(java.nio.file.Paths.get(u).toString)
      case _ =>
        val in = u.toURL.openStream()
        try fromJson(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
    }
  }
}
