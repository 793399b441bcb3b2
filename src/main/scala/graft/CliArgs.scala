package graft

/** Shared `--key value` / `--flag` argument scaffold for the spark-submit
  * entry points ([[ExtractMain]], [[QueryMain]]) — one implementation so
  * error behavior and parsing rules cannot drift between them.
  */
private[graft] object CliArgs {

  /** @param flags      keys that take no value (`--validate`)
    * @param repeatKey   a key that may repeat; its values accumulate in the
    *                    returned vector (`--pattern a --pattern b`)
    * @param required    keys that must be present (checked after parsing)
    */
  def parse(args: Array[String], flags: Set[String] = Set.empty,
            repeatKey: Option[String] = None,
            required: Seq[String] = Nil): (Map[String, String], Vector[String]) = {
    val (m, reps) = parseMulti(args, flags, repeatKey.toSet, required)
    (m, repeatKey.map(k => reps.getOrElse(k, Vector.empty)).getOrElse(Vector.empty))
  }

  /** [[parse]] with any number of repeating keys; their values accumulate
    * per key, in argument order (`--pattern a --optional b --pattern c`).
    */
  def parseMulti(args: Array[String], flags: Set[String] = Set.empty,
                 repeatKeys: Set[String] = Set.empty, required: Seq[String] = Nil)
      : (Map[String, String], Map[String, Vector[String]]) = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String],
             reps: Map[String, Vector[String]])
        : (Map[String, String], Map[String, Vector[String]]) = rest match {
      case Nil => (acc, reps)
      case k :: tail if k.startsWith("--") && flags.contains(k.drop(2)) =>
        loop(tail, acc + (k.drop(2) -> "true"), reps)
      // a following "--token" is the NEXT option, never this key's value
      // ("--pattern --entail" must not swallow the flag), and a trailing
      // bare key gets a "missing value" error, not "unexpected argument"
      case k :: v :: tail if k.startsWith("--") && !v.startsWith("--") &&
          repeatKeys.contains(k.drop(2)) =>
        val key = k.drop(2)
        loop(tail, acc, reps + (key -> (reps.getOrElse(key, Vector.empty) :+ v)))
      case k :: v :: tail if k.startsWith("--") && !v.startsWith("--") =>
        loop(tail, acc + (k.drop(2) -> v), reps)
      case k :: _ if k.startsWith("--") => sys.error(s"missing value for $k")
      case other :: _ => sys.error(s"unexpected argument: $other")
    }
    val (m, reps) = loop(args.toList, Map.empty, Map.empty)
    required.foreach(k => require(m.contains(k), s"--$k is required"))
    (m, reps)
  }
}
