package graft.core

/** XSD 1.1 lexical-space scanners, mirroring the GRAMMAR regexes the
  * reference inherits from RDF.rb / rdf-xsd and applies in
  * `property_value` (/root/reference/lib/rdf/microdata/reader.rb:428-448).
  *
  * Order matters: data/meter values scan Integer → Float → Double with Float
  * coerced to Double (reader.rb:431-434); time values scan Date → Time →
  * DateTime → Duration (reader.rb:445-448). No match → untyped literal,
  * lexical form preserved verbatim.
  */
object Lexical {
  val XSD = "http://www.w3.org/2001/XMLSchema#"
  val XsdInteger = XSD + "integer"
  val XsdDouble = XSD + "double"
  val XsdDate = XSD + "date"
  val XsdTime = XSD + "time"
  val XsdDateTime = XSD + "dateTime"
  val XsdDuration = XSD + "duration"

  private val IntegerRe = "^[+-]?\\d+$".r
  // RDF.rb Double GRAMMAR (Float is an alias coerced to Double, reader.rb:434)
  private val DoubleRe =
    "^(?:[+-]?\\d+(?:\\.\\d*)?(?:[eE][+-]?\\d+)?|[+-]?\\.\\d+(?:[eE][+-]?\\d+)?|[+-]?INF|NaN)$".r
  private val Tz = "(?:[+-]\\d{2}:\\d{2}|UTC|GMT|Z)?"
  private val DateRe = ("^-?\\d{4,}-\\d{2}-\\d{2}" + Tz + "$").r
  private val TimeRe = ("^\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?" + Tz + "$").r
  private val DateTimeRe =
    ("^-?\\d{4,}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?" + Tz + "$").r
  private val DurationRe =
    "^-?P(?=\\d|T)(?:\\d+Y)?(?:\\d+M)?(?:\\d+D)?(?:T(?=\\d)(?:\\d+H)?(?:\\d+M)?(?:\\d+(?:\\.\\d+)?S)?)?$".r

  /** Datatype IRI for a data/meter `@value`, or null (untyped). */
  def numericDatatype(v: String): String =
    if (IntegerRe.matches(v)) XsdInteger
    else if (DoubleRe.matches(v)) XsdDouble
    else null

  /** Datatype IRI for a time `@datetime`/text, or null (untyped). */
  def temporalDatatype(v: String): String =
    if (DateRe.matches(v)) XsdDate
    else if (TimeRe.matches(v)) XsdTime
    else if (DateTimeRe.matches(v)) XsdDateTime
    else if (DurationRe.matches(v)) XsdDuration
    else null

  /** Percent-escape `"#%<>[\]^{|}` per UTF-8 byte, uppercase hex
    * (registry.rb:104-106 frag_escape).
    */
  def fragEscape(name: String): String = {
    val escape = "\"#%<>[\\]^{|}"
    val sb = new StringBuilder
    name.foreach { c =>
      if (escape.indexOf(c.toInt) >= 0)
        c.toString.getBytes("UTF-8").foreach(b => sb ++= f"%%${b & 0xff}%02X")
      else sb += c
    }
    sb.result()
  }
}
