package graft.html

import scala.collection.mutable

/** Minimal, dependency-free HTML5-subset DOM for microdata extraction.
  *
  * Plays the role Nokogiri plays for the reference
  * (/root/reference/lib/rdf/microdata/reader/nokogiri.rb): it only needs to
  * expose the accessors the extraction algorithm consumes — element tree,
  * attributes, inherited `lang` (nokogiri.rb:36-47) and `xml:base`
  * (nokogiri.rb:51-59), `inner_text`, document-wide first-id lookup
  * (nokogiri.rb:241-243), and top-level item discovery (nokogiri.rb:235-237).
  *
  * Parsing is forgiving: unknown/mismatched end tags are ignored, HTML5 void
  * elements never take children, `<p>`/`<li>`/`<dt>`/`<dd>` end-tag omission
  * is honored, comments/doctype are skipped, and entities are decoded in both
  * text and attribute values. Documents are row-local in the Spark pipeline,
  * so this parser is single-threaded per row and allocation-light.
  */
object MicroDoc {

  sealed trait Node
  final case class Text(value: String) extends Node

  final class Elem(val tag: String) extends Node {
    // compact attribute storage: elements rarely carry more than 4 attrs,
    // so parallel arrays with linear lookup beat a per-element hash map
    // (this parse runs once per transcript row — allocation is the wall)
    private var attrKeys: Array[String] = null
    private var attrVals: Array[String] = null
    private var nAttrs = 0
    val children = mutable.ArrayBuffer.empty[Node]
    var parent: Elem = _
    /** index within parent.children (path component). */
    var childIdx: Int = 0
    private var pathMemo: String = null

    /** Stable structural path from root, e.g. "0.2.1" — the deterministic
      * replacement for Ruby object identity (reader.rb:236 fresh bnodes,
      * memory keyed by element): content-addressed skolem IDs hash this.
      * Computed lazily — only itemscope elements without itemid need it.
      */
    def path: String = {
      if (pathMemo == null)
        pathMemo =
          if (parent == null) String.valueOf(childIdx)
          else parent.path + "." + childIdx
      pathMemo
    }

    def addAttr(name: String, value: String): Unit = {
      if (attrKeys == null) {
        attrKeys = new Array[String](4); attrVals = new Array[String](4)
      } else if (nAttrs == attrKeys.length) {
        attrKeys = java.util.Arrays.copyOf(attrKeys, nAttrs * 2)
        attrVals = java.util.Arrays.copyOf(attrVals, nAttrs * 2)
      }
      attrKeys(nAttrs) = name; attrVals(nAttrs) = value; nAttrs += 1
    }

    def attrRaw(name: String): String = {
      var i = 0
      while (i < nAttrs) {
        if (attrKeys(i) == name) return attrVals(i)
        i += 1
      }
      null
    }
    def attr(name: String): Option[String] = Option(attrRaw(name))
    def has(name: String): Boolean = attrRaw(name) != null

    def elements: Seq[Elem] = children.collect { case e: Elem => e }.toSeq

    /** Inherited language: own `lang` else nearest ancestor's. */
    def language: String = {
      var e: Elem = this
      while (e != null) {
        var l = e.attrRaw("xml:lang")
        if (l == null) l = e.attrRaw("lang")
        if (l != null) return (if (l.nonEmpty) l else null) // lang="" resets
        e = e.parent
      }
      null
    }

    /** Inherited xml:base, or null. */
    def base: String = {
      var e: Elem = this
      while (e != null) {
        val b = e.attrRaw("xml:base")
        if (b != null) return b
        e = e.parent
      }
      null
    }

    def innerText: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case Text(v) => sb ++= v
        case e: Elem => e.children.foreach(walk)
      }
      children.foreach(walk)
      sb.result()
    }

    /** Document-order self-and-descendants. */
    def descendantsAndSelf: Iterator[Elem] =
      Iterator.single(this) ++ elements.iterator.flatMap(_.descendantsAndSelf)
  }

  /** Parsed document. `root` is a synthetic container so bare fragments
    * (most spec fixtures) parse uniformly. `itemscopeElems` (document order)
    * and `hasReverseAttr` are collected during the parse so extraction never
    * re-traverses the tree to find items.
    */
  final class Doc(val root: Elem, val itemscopeElems: Seq[Elem],
                  val hasReverseAttr: Boolean) {
    /** First element per id, document order (nokogiri.rb:241-243 at_css). */
    lazy val byId: Map[String, Elem] = {
      val m = mutable.LinkedHashMap.empty[String, Elem]
      root.descendantsAndSelf.foreach { e =>
        e.attr("id").foreach(id => if (!m.contains(id)) m(id) = e)
      }
      m.toMap
    }

    /** Top-level items: `[itemscope]` without `@itemprop`
      * (nokogiri.rb:235-237).
      */
    def topLevelItems: Seq[Elem] = itemscopeElems.filter(e => !e.has("itemprop"))

    /** `html>head>base@href`, fragment-stripped by the caller
      * (nokogiri.rb:224-229). Forgiving: first <base href> anywhere.
      */
    def docBase: Option[String] =
      root.descendantsAndSelf.find(e => e.tag == "base" && e.has("href"))
        .flatMap(_.attr("href"))
  }

  private val VoidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  // HTML5 tags whose start implies </p>
  private val ClosesP = Set(
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "main", "menu", "nav", "ol", "p",
    "pre", "section", "table", "ul")

  private val RawText = Set("script", "style")

  /** ASCII-lowercase only when needed — markup is almost always already
    * lowercase, and this runs per tag and attribute name.
    */
  private def lowerAscii(str: String): String = {
    var k = 0
    val m = str.length
    while (k < m && { val ch = str.charAt(k); ch < 'A' || ch > 'Z' }) k += 1
    if (k == m) str else str.toLowerCase(java.util.Locale.ROOT)
  }

  def parse(html: String): Doc = {
    val root = new Elem("#root")
    val stack = mutable.ArrayBuffer[Elem](root)
    val itemscopeElems = mutable.ArrayBuffer.empty[Elem]
    var hasReverse = false
    val s = html
    lazy val lower = s.toLowerCase
    val n = s.length
    var i = 0
    val text = new java.lang.StringBuilder

    def flushText(): Unit = {
      if (text.length > 0) {
        stack.last.children += Text(decodeEntities(text.toString))
        text.setLength(0)
      }
    }
    def openElem(e: Elem): Unit = {
      val p = stack.last
      e.parent = if (p eq root) null else p
      e.childIdx = p.children.length
      p.children += e
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c != '<') {
        // append the whole text run in one go (the common case: most of a
        // transcript turn is prose, not markup)
        var lt = s.indexOf('<', i)
        if (lt < 0) lt = n
        text.append(s, i, lt)
        i = lt
      }
      else if (i + 1 >= n) { text.append(c); i += 1 }
      else {
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (s.startsWith("<!--", i)) {
            val e = s.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = s.indexOf('>', i)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '?') {
          flushText()
          val e = s.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else if (c1 == '/') {
          flushText()
          var j = i + 2
          val t0 = j
          while (j < n && s.charAt(j) != '>') j += 1
          val name = lowerAscii(s.substring(t0, j).trim)
          // pop to matching open tag; ignore if not on stack
          val at = stack.lastIndexWhere(_.tag == name)
          if (at > 0) stack.takeInPlace(at)
          i = if (j < n) j + 1 else n
        } else if (c1.isLetter) {
          flushText()
          var j = i + 1
          val t0 = j
          while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '-')) j += 1
          val tag = lowerAscii(s.substring(t0, j))
          val e = new Elem(tag)
          var selfClose = false
          // attributes
          var done = false
          while (!done && j < n) {
            while (j < n && s.charAt(j).isWhitespace) j += 1
            if (j >= n) done = true
            else s.charAt(j) match {
              case '>' => j += 1; done = true
              case '/' =>
                j += 1
                if (j < n && s.charAt(j) == '>') { j += 1; selfClose = true; done = true }
              case _ =>
                val a0 = j
                while (j < n && !s.charAt(j).isWhitespace &&
                       s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
                val aname = lowerAscii(s.substring(a0, j))
                while (j < n && s.charAt(j).isWhitespace) j += 1
                var avalue = ""
                if (j < n && s.charAt(j) == '=') {
                  j += 1
                  while (j < n && s.charAt(j).isWhitespace) j += 1
                  if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
                    val q = s.charAt(j); j += 1
                    val v0 = j
                    while (j < n && s.charAt(j) != q) j += 1
                    avalue = s.substring(v0, j)
                    if (j < n) j += 1
                  } else {
                    val v0 = j
                    while (j < n && !s.charAt(j).isWhitespace && s.charAt(j) != '>') j += 1
                    avalue = s.substring(v0, j)
                  }
                }
                if (aname.nonEmpty && !e.has(aname))
                  e.addAttr(aname, decodeEntities(avalue))
            }
          }
          if (e.has("itemscope")) itemscopeElems += e
          if (!hasReverse && e.has("itemprop-reverse")) hasReverse = true
          // implied end tags
          if (ClosesP.contains(tag) && stack.last.tag == "p") stack.dropRightInPlace(1)
          if ((tag == "li" && stack.last.tag == "li") ||
              ((tag == "dt" || tag == "dd") && (stack.last.tag == "dt" || stack.last.tag == "dd")))
            stack.dropRightInPlace(1)
          openElem(e)
          if (!selfClose && !VoidTags.contains(tag)) {
            if (RawText.contains(tag)) {
              val close = "</" + tag
              val e2 = lower.indexOf(close, j)
              val end = if (e2 < 0) n else e2
              if (end > j) e.children += Text(s.substring(j, end))
              val gt = s.indexOf('>', end)
              j = if (gt < 0) n else gt + 1
            } else stack += e
          }
          i = j
        } else { text.append(c); i += 1 }
      }
    }
    flushText()
    new Doc(root, itemscopeElems.toSeq, hasReverse)
  }

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try new String(Character.toChars(Integer.parseInt(ent.substring(2), 16)))
              catch { case _: Exception => null }
            case _ if ent.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(ent.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (decoded != null) { sb ++= decoded; i = semi + 1 }
          else { sb += c; i += 1 }
        } else { sb += c; i += 1 }
      } else { sb += c; i += 1 }
    }
    sb.result()
  }
}
