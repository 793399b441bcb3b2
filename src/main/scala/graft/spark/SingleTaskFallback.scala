package graft.spark

import org.apache.spark.sql.Dataset

/** Shared materialization/fallback protocol for the single-task escape
  * hatches (closures, incremental closure, entailment fixpoint): eagerly
  * materialize the one-task result so an in-task overflow or
  * iteration-cap failure surfaces HERE, unwrapped from Spark's
  * task-failure envelope. One copy of the cause-chain walk so the three
  * call sites cannot drift (and so a cause with a NULL message never
  * NPEs past the real failure).
  */
private[spark] object SingleTaskFallback {

  /** @return Some(materialized result); None when the cause chain carries
    *         `overflowMarker` (caller falls back to the distributed
    *         path); rethrows a clean IllegalStateException when the chain
    *         carries `liveNeedle` (the iteration-cap contract); anything
    *         else rethrows the original failure.
    */
  def materialize[T](out: Dataset[T], overflowMarker: String,
                     liveNeedle: String): Option[Dataset[T]] =
    try Some(out.localCheckpoint())
    catch {
      case e: Throwable =>
        val causes = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16).toSeq
        def msg(t: Throwable): String = Option(t.getMessage).getOrElse("")
        if (causes.exists(c => msg(c).contains(overflowMarker))) None
        else causes.collectFirst {
          case c: IllegalStateException if msg(c).contains(liveNeedle) =>
            throw new IllegalStateException(c.getMessage)
        }.getOrElse(throw e)
    }
}
