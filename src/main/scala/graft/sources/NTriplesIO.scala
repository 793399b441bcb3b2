package graft.sources

import graft.core.{Extractor, NTriples}
import graft.model.{Term, Triple}
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Distributed N-Triples source/sink — the reference CLI's native wire
  * format (script/parse:23-31), readable back as a Dataset[Triple].
  *
  * Reading is line-oriented and row-local (text scan → flatMap): N-Triples
  * is one statement per line by definition, so the source parallelizes by
  * file split with no shuffle, exactly like the extraction stage. Bnode
  * labels (`_:hex`) map back into the deterministic skolem namespace, so
  * write → read round-trips to the identical canonical triple set.
  * Malformed lines are soft errors surfaced through an accumulator,
  * matching the extractor's error contract (reader.rb:146-148).
  */
object NTriplesIO {

  def read(spark: SparkSession, path: String,
           errorCounter: LongAccumulator = null): Dataset[Triple] = {
    import spark.implicits._
    spark.read.textFile(path).flatMap { line =>
      val t = line.trim
      if (t.isEmpty || t.startsWith("#")) None
      else {
        try {
          val rt = NTriples.parse(t).head
          def deSkolem(v: String): String =
            if (v.startsWith("_:")) Extractor.SkolemPrefix + v.substring(2) else v
          Some(rt.obj match {
            case Term.Iri(v) =>
              Triple(deSkolem(rt.subj), rt.pred, deSkolem(v), null, null, null, null, -1)
            case Term.Lit(lex, dt, lang) =>
              Triple(deSkolem(rt.subj), rt.pred, null, lex, dt, lang, null, -1)
          })
        } catch {
          case _: Exception =>
            if (errorCounter != null) errorCounter.add(1L)
            None
        }
      }
    }
  }

  /** One N-Triples line per statement (ExtractPipeline.toNTriples column
    * serializer), written as partitioned text.
    */
  def write(triples: Dataset[Triple], path: String): Unit =
    graft.spark.ExtractPipeline.toNTriples(triples)
      .write.mode(SaveMode.Overwrite).text(path)
}
