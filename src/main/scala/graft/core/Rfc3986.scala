package graft.core

/** RFC 3986 reference resolution, matching the join semantics the reference
  * relies on via RDF.rb's `RDF::URI#join` (used at
  * /root/reference/lib/rdf/microdata/reader.rb:457-468).
  *
  * Unlike `java.net.URI`, this tolerates a *relative* base (the reference
  * resolves against `RDF::URI("")` when no document base exists,
  * reader.rb:209, producing relative outputs like `<subj>`, `<#name>`), and
  * resolving the empty reference returns the base itself (doap.html's
  * `itemid=""` → the document base, /root/reference/etc/doap.nt:1).
  */
object Rfc3986 {

  /** Parsed URI components; null = undefined (RFC 3986 distinguishes
    * undefined from empty).
    */
  final case class Parts(scheme: String, authority: String, path: String,
                         query: String, fragment: String) {
    def recompose: String = {
      val sb = new StringBuilder
      if (scheme != null) { sb ++= scheme; sb += ':' }
      if (authority != null) { sb ++= "//"; sb ++= authority }
      sb ++= path
      if (query != null) { sb += '?'; sb ++= query }
      if (fragment != null) { sb += '#'; sb ++= fragment }
      sb.result()
    }
  }

  // RFC 3986 appendix B
  private val UriRe =
    "^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$".r

  def parse(s: String): Parts = s match {
    case UriRe(sch, auth, path, q, frag) =>
      Parts(sch, auth, if (path == null) "" else path, q, frag)
    case _ => Parts(null, null, s, null, null)
  }

  /** True when the string carries a scheme (RDF.rb `URI#absolute?`).
    * Regex-free scan — this runs per itemprop/itemtype token in the hot
    * extraction path.
    */
  def isAbsolute(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == ':') return i > 0
      // scheme chars: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ); first must be ALPHA
      val ok =
        if (i == 0) (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        else (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
             (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return false
      i += 1
    }
    false
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); trimLastSegment(out) }
      else if (in == "/..") { in = "/"; trimLastSegment(out) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val idx = in.indexOf('/', start)
        if (idx < 0) { out ++= in; in = "" }
        else { out ++= in.substring(0, idx); in = in.substring(idx) }
      }
    }
    out.result()
  }

  private def trimLastSegment(sb: StringBuilder): Unit = {
    val i = sb.lastIndexOf("/")
    sb.setLength(if (i < 0) 0 else i)
  }

  /** RFC 3986 §5.3 merge. */
  private def merge(base: Parts, refPath: String): String =
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val i = base.path.lastIndexOf('/')
      if (i < 0) refPath else base.path.substring(0, i + 1) + refPath
    }

  /** RFC 3986 §5.2.2 transform-reference; strict (no backward-compat scheme
    * shortcut is needed because inputs never repeat the base scheme with a
    * relative path).
    */
  def resolve(baseStr: String, refStr: String): String = {
    // fast path: an absolute ref without dot segments resolves to itself
    // (the overwhelmingly common case for itemid/href in real markup).
    // ":." catches a path that STARTS with a dot segment ("http:../a",
    // "a:./b" — no "/." to match); a non-segment dot after the colon
    // ("mailto:.user") merely takes the slow path to the same result.
    if (isAbsolute(refStr) && refStr.indexOf("/.") < 0 &&
        refStr.indexOf(":.") < 0) return refStr
    val base = parse(baseStr)
    val ref = parse(refStr)
    val t =
      if (ref.scheme != null)
        ref.copy(path = removeDotSegments(ref.path))
      else if (ref.authority != null)
        Parts(base.scheme, ref.authority, removeDotSegments(ref.path), ref.query, ref.fragment)
      else if (ref.path.isEmpty) {
        val q = if (ref.query != null) ref.query else base.query
        Parts(base.scheme, base.authority, base.path, q, ref.fragment)
      } else {
        val p =
          if (ref.path.startsWith("/")) removeDotSegments(ref.path)
          else removeDotSegments(merge(base, ref.path))
        Parts(base.scheme, base.authority, p, ref.query, ref.fragment)
      }
    t.recompose
  }

  /** Strip any fragment (document-base preparation, reader.rb:205-207). */
  def stripFragment(s: String): String = {
    val i = s.indexOf('#')
    if (i < 0) s else s.substring(0, i)
  }

  /** Return base with its fragment set to `frag` (predicateURI step 2,
    * registry.rb:67-70).
    */
  def withFragment(base: String, frag: String): String =
    stripFragment(base) + "#" + frag

  /** Opt-in IRI validation (the reference's `validate:` reader option —
    * reader.rb:464 `value.validate! if validate?`): None = valid, Some =
    * the reason. Pragmatic IRI check, not full ABNF: a valid RDF term IRI
    * must be absolute (carry a scheme), contain no raw whitespace /
    * control / angle-quote-brace characters (the set the N-Triples
    * grammar also forbids inside `<...>`), and every `%` must head a
    * two-hex-digit escape. Validation FLAGS, it never mutates — the
    * verbatim-lexical policy stays (FIXTURES.md).
    */
  def validateIri(s: String): Option[String] = {
    if (s == null || s.isEmpty) return Some("empty IRI")
    if (!isAbsolute(s)) return Some(s"relative IRI (no scheme): $s")
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c <= ' ') return Some(f"forbidden character U+${c.toInt}%04X in IRI: $s")
      if (c == '<' || c == '>' || c == '"' || c == '{' || c == '}' ||
          c == '|' || c == '\\' || c == '^' || c == '`')
        return Some(s"forbidden character '$c' in IRI: $s")
      if (c == '%') {
        if (i + 2 >= n || !isHex(s.charAt(i + 1)) || !isHex(s.charAt(i + 2)))
          return Some(s"malformed percent-escape at $i in IRI: $s")
        i += 2
      }
      i += 1
    }
    None
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Opt-in IRI canonicalization (the reference's `canonicalize:` reader
    * option — reader.rb:465 `value.canonicalize! if canonicalize?`,
    * RDF.rb's `URI#canonicalize` normalizations): lowercase the scheme and
    * host, drop the default port (http:80 / https:443), uppercase the hex
    * digits of percent-escapes, and remove dot segments from the path.
    * Relative references (no scheme) are returned untouched — there is
    * nothing scheme-relative to normalize.
    */
  def canonicalizeIri(s: String): String = {
    if (!isAbsolute(s)) return s
    val p = parse(s)
    val scheme = p.scheme.toLowerCase(java.util.Locale.ROOT)
    val authority =
      if (p.authority == null) null
      else {
        // userinfo@host:port — only host lowercases; default ports drop
        val at = p.authority.lastIndexOf('@')
        val (userinfo, hostPort) =
          if (at >= 0) (p.authority.substring(0, at + 1), p.authority.substring(at + 1))
          else ("", p.authority)
        val colon = hostPort.lastIndexOf(':')
        // a colon inside an IPv6 literal [..] is not a port separator
        val isPort = colon >= 0 && !hostPort.substring(colon + 1).contains(']') &&
          hostPort.substring(colon + 1).forall(c => c >= '0' && c <= '9')
        val (host, port) =
          if (isPort) (hostPort.substring(0, colon), hostPort.substring(colon + 1))
          else (hostPort, null)
        val hostLc = host.toLowerCase(java.util.Locale.ROOT)
        val keepPort = port != null && port.nonEmpty &&
          !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
        userinfo + hostLc + (if (keepPort) ":" + port else "")
      }
    val path = upcaseEscapes(removeDotSegments(p.path))
    Parts(scheme, authority,
      path,
      if (p.query == null) null else upcaseEscapes(p.query),
      if (p.fragment == null) null else upcaseEscapes(p.fragment)).recompose
  }

  /** Uppercase the two hex digits of every %XX escape (RFC 3986 §6.2.2.1);
    * everything else passes through verbatim.
    */
  private def upcaseEscapes(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { // malformed escape passes through verbatim — never throws
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
