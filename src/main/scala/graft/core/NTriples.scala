package graft.core

import graft.model.{RawTriple, Term}

/** N-Triples serialization (the reference CLI's output format,
  * /root/reference/script/parse:23-31) and a small parser used by the golden
  * test harness (goldens are stored as N-Triples).
  */
object NTriples {

  def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb ++= "\\\\"
      case '"' => sb ++= "\\\""
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04X"
      case c => sb += c
    }
    sb.result()
  }

  /** IRIREF content escaping (N-Triples grammar): the characters the
    * production forbids raw inside `<...>` — controls, space, the angle
    * brackets themselves, quote, braces, pipe, caret, backtick, backslash —
    * become \uXXXX UCHARs. Extracted IRIs can carry any of these (e.g.
    * `href="a&gt;b"` decodes to an IRI containing '>'), and writing them
    * raw produces lines every conformant parser (including [[parse]]
    * below, which cuts the IRI at the first '>') mis-reads.
    */
  def escapeIri(s: String): String = {
    var i = 0
    var needs = false
    while (!needs && i < s.length) {
      val c = s.charAt(i)
      needs = c <= ' ' || c == '<' || c == '>' || c == '"' || c == '{' ||
        c == '}' || c == '|' || c == '^' || c == '`' || c == '\\'
      i += 1
    }
    if (!needs) return s
    val sb = new StringBuilder
    s.foreach {
      case c if c <= ' ' || c == '<' || c == '>' || c == '"' || c == '{' ||
        c == '}' || c == '|' || c == '^' || c == '`' || c == '\\' =>
        sb ++= f"\\u${c.toInt}%04X"
      case c => sb += c
    }
    sb.result()
  }

  def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          // ECHAR backspace / form feed: this writer emits them as \uXXXX,
          // but the reference's writer (RDF::NTriples) uses the named forms
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'u' =>
            sb ++= new String(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 6), 16)))
            i += 6
          case 'U' =>
            sb ++= new String(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16)))
            i += 10
          case o => sb += o; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.result()
  }

  def termToString(t: Term): String = t match {
    case Term.Iri(v) if Extractor.isSkolem(v) => "_:" + v.substring(Extractor.SkolemPrefix.length)
    case Term.Iri(v) => s"<${escapeIri(v)}>"
    case Term.Lit(lex, dt, lang) =>
      val q = "\"" + escape(lex) + "\""
      if (lang != null) q + "@" + lang
      else if (dt != null) q + "^^<" + escapeIri(dt) + ">"
      else q
  }

  def serialize(triples: Seq[RawTriple]): String =
    triples.map { t =>
      val s = if (Extractor.isSkolem(t.subj)) "_:" + t.subj.substring(Extractor.SkolemPrefix.length)
              else s"<${escapeIri(t.subj)}>"
      s"$s <${escapeIri(t.pred)}> ${termToString(t.obj)} ."
    }.mkString("\n")

  /** Parse N-Triples text. Bnode labels are kept as `_:label` strings in
    * subj / Term.Iri positions so the isomorphism checker can spot them.
    */
  def parse(nt: String): Vector[RawTriple] =
    nt.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
      val (s, r1) = parseTerm(line)
      val (p, r2) = parseTerm(r1)
      val (o, r3) = parseTerm(r2)
      require(r3.trim.startsWith("."), s"bad NT line: $line")
      RawTriple(termStr(s), termStr(p), o)
    }.toVector

  private def termStr(t: Term): String = t match {
    case Term.Iri(v) => v
    case Term.Lit(l, _, _) => l
  }

  /** Returns (term, rest). */
  private def parseTerm(in: String): (Term, String) = {
    val s = in.dropWhile(_.isWhitespace)
    if (s.startsWith("<")) {
      val e = s.indexOf('>')
      require(e >= 0, s"bad NT line (unterminated IRI): $in")
      (Term.Iri(unescape(s.substring(1, e))), s.substring(e + 1))
    } else if (s.startsWith("_:")) {
      val e = s.indexWhere(c => c.isWhitespace || c == '.')
      val end = if (e < 0) s.length else e
      (Term.Iri(s.substring(0, end)), s.substring(end))
    } else if (s.startsWith("\"")) {
      // closing quote = '"' preceded by an even number of backslashes
      var i = 1
      var close = -1
      while (close < 0 && i < s.length) {
        if (s.charAt(i) == '"') {
          var bs = 0
          var j = i - 1
          while (j >= 1 && s.charAt(j) == '\\') { bs += 1; j -= 1 }
          if (bs % 2 == 0) close = i
        }
        i += 1
      }
      require(close >= 0, s"bad NT line (unterminated literal): $in")
      val lex = unescape(s.substring(1, close))
      val rest = s.substring(close + 1)
      if (rest.startsWith("@")) {
        val e = rest.indexWhere(c => c.isWhitespace || c == '.')
        val end = if (e < 0) rest.length else e
        (Term.Lit(lex, lang = rest.substring(1, end)), rest.substring(end))
      } else if (rest.startsWith("^^<")) {
        val e = rest.indexOf('>')
        require(e >= 0, s"bad NT line (unterminated datatype IRI): $in")
        // unescape like every other IRI position — the writer \uXXXX-escapes
        // datatype IRIs too, and an unescaped read breaks round-tripping
        (Term.Lit(lex, datatype = unescape(rest.substring(3, e))), rest.substring(e + 1))
      } else (Term.Lit(lex), rest)
    } else sys.error(s"cannot parse term at: $s")
  }
}
