package graft.spark

import graft.model.Triple
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The NIGHTLY-CRAWL composition: fold one delta batch of extracted triples
  * into a standing graph root, maintaining every standing artifact
  * incrementally — the deployment shape the four incremental operators
  * ([[ExtractPipeline.graphDiff]]-style novelty append,
  * [[EntityLink.mentionLinkStateIncremental]],
  * [[Entailment.owlEntailIncremental]]) exist for. Driven from spark-submit
  * by [[graft.IncrementalMain]].
  *
  * Standing layout under `root` (all through the [[TableIO]] seam):
  *
  *  - `graph/` — RAW triples under `batch_id=<id>/pred_bucket=<m>`
  *    partitions (the [[graft.streaming.StreamingExtract.sinkToGraph]]
  *    layout, so [[GraphQuery.loadGraph]] opens it with pruning intact).
  *    RAW, not entity-canonalized: skolem ids are content-addressed and
  *    never change, so appended rows are immutable — a later merge can
  *    change an entity's CANONICAL id, which must therefore be applied as
  *    a read-time view ([[readCanonical]]), never baked into stored rows
  *    (baked rows would need corpus-wide rewrites on every merge).
  *  - `link_state/` — the standing `(node, component)` linking state,
  *    versioned by [[LinkStateStore]] (when link keys are configured).
  *  - `closure/` — the graph's entailment closure in the same batch
  *    layout, appended novel-rows-only via
  *    [[Entailment.owlEntailIncremental]] (when enabled).
  *
  * Per-batch cost: extraction of the delta, the delta-sized quotient CC,
  * the closure's delta cone, plus identity anti-joins of the delta against
  * the pred_bucket-PRUNED standing slice (only partitions whose bucket
  * appears in the delta are read). Nothing recomputes from scratch.
  *
  * Crash-rerun is idempotent WITHOUT a manifest: triples are
  * content-addressed, so a rerun's novelty anti-join skips whatever a
  * half-written batch already landed and appends only the remainder under
  * its own fresh batch_id — set semantics hold, nothing duplicates,
  * nothing is lost. (The link-state fold is idempotent inside
  * [[LinkStateStore]].)
  */
object IncrementalGraph {

  final case class CrawlSummary(batchId: Long, newTriples: Long,
                                newClosureTriples: Long, linkStateNodes: Long)

  private val CrawlPrefix = "_graft_crawl/batch-"

  /** Fold one delta batch into the standing root. `delta` should be the
    * extracted (set-semantics) triples of the new transcripts — see
    * [[graft.IncrementalMain]] for the CLI wiring.
    */
  def foldBatch(delta: Dataset[Triple], root: String, predBuckets: Int = 16,
                linkKeys: Seq[String] = Nil, entail: Boolean = false,
                maxKeyDegree: Int = 100000,
                io: TableIO = TableIO.default): CrawlSummary = {
    val spark = delta.sparkSession
    val d = delta.dropDuplicates(Triple.identityCols).localCheckpoint()

    // Batch ids must be MONOTONE over ALL folds, including zero-novelty
    // reruns: an empty fold materializes no batch_id partition (so
    // max(batch_id) in the data is unchanged) yet still commits a
    // link-state version and a crawl mark under its id. Deriving the next
    // id from data alone would REUSE that id on the next genuine fold, and
    // LinkStateStore.save would then rewrite the LIVE pointed-to version
    // table in place — torn reads for concurrent consumers, and a crash
    // mid-rewrite leaves the committed pointer on a corrupt table. The
    // crawl marks are written unconditionally, so their max rides over
    // empty folds; the data max still participates for dirs predating the
    // marks (and compacted roots, whose marks reset).
    val markFloor = io.listMetadata(spark, s"$root/graph", "_graft_crawl/batch-")
      .flatMap(n => scala.util.Try(n.stripPrefix("batch-").toLong).toOption)
      .foldLeft(0L)((acc, id) => math.max(acc, id + 1L))

    val (newTriples, batchId) =
      appendNovel(spark, d, s"$root/graph", predBuckets, io, minBatchId = markFloor)

    val linkNodes =
      if (linkKeys.isEmpty) -1L
      else LinkStateStore.fold(d, s"$root/link_state", batchId, linkKeys,
        maxKeyDegree, io).count()

    val closureNew =
      if (!entail) -1L
      else {
        val dir = s"$root/closure"
        appendNovel(spark, closureDelta(d, dir, io), dir, predBuckets, io,
          knownBatchId = batchId)._1
      }

    // per-batch crawl mark: observability + lineage (which batch landed how
    // much), atomic via the metadata seam
    io.writeMetadata(spark, s"$root/graph", s"$CrawlPrefix$batchId",
      s"""{"batch_id": $batchId, "new_triples": $newTriples, "new_closure_triples": $closureNew, "link_state_nodes": $linkNodes}""" + "\n")
    CrawlSummary(batchId, newTriples, closureNew, linkNodes)
  }

  /** The standing triples of a batch-layout dir, if it exists (gated on the
    * layout metadata — a foreign/absent dir folds like a first batch).
    */
  private def standing(spark: SparkSession, dir: String,
                       io: TableIO): Option[Dataset[Triple]] = {
    import spark.implicits._
    // Try: a dir whose every committed batch was EMPTY has metadata but no
    // data files — parquet schema inference then throws; fold as first batch
    io.readMetadata(spark, dir, ExtractPipeline.LayoutFile).flatMap { _ =>
      scala.util.Try {
        io.read(spark, dir)
          .select(col("subj"), col("pred"), col("obj_iri"), col("obj_lexical"),
            col("obj_datatype"), col("obj_lang"), col("conv_id"), col("turn_idx"))
          .as[Triple]
      }.toOption
    }
  }

  /** Compute the closure's NOVEL rows for one delta against a standing
    * closure dir (first batch: the delta's own closure) — shared by
    * [[foldBatch]] and the streaming maintainer
    * ([[graft.streaming.StreamingExtract.closureStream]]).
    */
  private[graft] def closureDelta(delta: Dataset[Triple], dir: String,
                                  io: TableIO): Dataset[Triple] = {
    val spark = delta.sparkSession
    import spark.implicits._
    standing(spark, dir, io) match {
      case None =>
        refuseTransitive(Entailment.owlEntail(delta))
      case Some(closed) =>
        // full new closure, then keep only rows the standing closure
        // lacks — the append stays delta-cone-sized. The standing side is
        // a disk-backed scan consumed three times (transitive guard,
        // incremental seed, novelty anti-join): re-scanning pruned parquet
        // beats localCheckpoint's full materialization of the closure per
        // fold — the O(|closed|) cost this operator exists to avoid.
        val c = closed
        refuseTransitive(c)
        val out = Entailment.owlEntailIncremental(c, delta).as("n")
          .join(c.as("o"), Triple.identityCond("n", "o"), "left_anti").as[Triple]
          .localCheckpoint()
        // the DELTA can introduce the declaration too (checked on the cone,
        // which contains every delta row's derivations incl. inherited
        // rdf:type facts) — after the fact is cheaper than a second
        // pre-scan and equally safe: nothing has been appended yet
        refuseTransitive(out)
        out
    }
  }

  /** THROW-not-truncate ([[Entailment]]'s stance) for the one rule the
    * incremental maintainer cannot express: `owl:TransitiveProperty`.
    * [[Entailment.owlEntailIncremental]] handles only the rewrite rules, so
    * a graph declaring a transitive predicate would get a standing closure
    * silently missing every multi-hop fact that `ExtractMain --entail`
    * (which runs [[Entailment.owlEntailWithTransitive]]) derives. Refuse
    * loudly and steer to the batch path.
    */
  private def refuseTransitive[T](df: Dataset[T]): Dataset[T] = {
    val decl = df.toDF()
      .filter(col("pred") === Entailment.RdfType &&
        col("obj_iri") === Entailment.TransitiveProperty)
      .select(col("subj")).limit(1).collect()
    require(decl.isEmpty,
      s"incremental closure maintenance does not support owl:TransitiveProperty " +
        s"(declared for <${decl.headOption.map(_.getString(0)).getOrElse("")}>): " +
        "prp-trp joins facts with facts, which the delta-cone maintainer cannot " +
        "bound. Rebuild the closure in batch (ExtractMain --entail persists " +
        "owlEntailWithTransitive's full closure) instead of folding this delta.")
    df
  }

  /** Append the delta's NOVEL rows (identity anti-join against the
    * pred_bucket-pruned standing slice) under the next batch_id partition.
    * Returns (rows written, batch id used). `minBatchId` lets the caller
    * raise the derived id past folds that wrote no data (see
    * [[foldBatch]]'s monotonicity note).
    */
  private[graft] def appendNovel(spark: SparkSession, delta: Dataset[Triple], dir: String,
                                 predBuckets: Int, io: TableIO,
                                 knownBatchId: Long = -1L,
                                 minBatchId: Long = 0L): (Long, Long) = {
    val existing = standing(spark, dir, io)
    val buckets = existing match {
      case Some(_) =>
        // the dir describes itself — a caller-supplied count that disagrees
        // with the layout would corrupt pruning for every reader
        bucketCount(spark, dir, io).getOrElse(predBuckets)
      case None =>
        io.writeMetadata(spark, dir, ExtractPipeline.LayoutFile,
          s"""{"pred_buckets": $predBuckets}""" + "\n")
        predBuckets
    }
    val batchId =
      if (knownBatchId >= 0) knownBatchId
      else math.max(minBatchId, existing.map(_ =>
        // cast: the partition column may infer as int; coalesce: a standing
        // dir whose every batch was empty still has metadata but no rows
        io.read(spark, dir)
          .agg(coalesce(max(col("batch_id")).cast("long"), lit(-1L)))
          .head().getLong(0) + 1L
      ).getOrElse(0L))

    val novel = existing match {
      case None => delta.toDF()
      case Some(st) =>
        // prune the standing side to the delta's own pred buckets before the
        // identity anti-join: partitions whose bucket the delta never touches
        // are never read (bucket count is registry-bounded, so the collect is
        // catalog-sized)
        val deltaBuckets = delta
          .select(pmod(hash(col("pred")), lit(buckets)).as("b")).distinct()
          .collect().map(_.getInt(0)).toSeq
        val slice = st.toDF().withColumn("pred_bucket",
            pmod(hash(col("pred")), lit(buckets)))
          .filter(col("pred_bucket").isin(deltaBuckets: _*))
        delta.as("d").join(slice.as("a"), Triple.identityCond("d", "a"), "left_anti")
    }
    val written = ExtractPipeline.writeCounted(
      novel.withColumn("batch_id", lit(batchId))
        .withColumn("pred_bucket", pmod(hash(col("pred")), lit(buckets))),
      io.overwritePartitions(_, dir, Seq("batch_id", "pred_bucket")))
    (written, batchId)
  }

  private[graft] def bucketCount(spark: SparkSession, dir: String, io: TableIO): Option[Int] =
    io.readMetadata(spark, dir, ExtractPipeline.LayoutFile).flatMap { json =>
      scala.util.Try {
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
        Option(root.get("pred_buckets")).map(_.asInt(0)).filter(_ > 0)
      }.toOption.flatten
    }

  /** Compact a batch-layout dir (this object's `graph/`/`closure/`, or a
    * [[graft.streaming.StreamingExtract.sinkToGraph]] output): rewrite all
    * standing rows into `destDir` as ONE `batch_id=0` generation, restoring
    * O(pred_buckets) partition count after many folds/micro-batches. Writes
    * SIDE-BY-SIDE — the source dir is never touched, so a crashed
    * compaction costs nothing and the swap (mv, catalog repoint, Iceberg
    * REPLACE TABLE) stays an atomic operation of the deployment's storage
    * layer. Pred-bucket count carries over from the source layout; rows
    * re-deduplicate on identity (a sinkToGraph source can hold the same
    * statement under several batch partitions — set semantics at rest).
    */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
              io: TableIO = TableIO.default): Long = {
    val buckets = bucketCount(spark, srcDir, io).getOrElse(16)
    val rows = standing(spark, srcDir, io) match {
      case None => 0L
      case Some(st) =>
        ExtractPipeline.writeCounted(
          st.dropDuplicates(Triple.identityCols)
            .withColumn("batch_id", lit(0L))
            .withColumn("pred_bucket", pmod(hash(col("pred")), lit(buckets))),
          io.overwritePartitions(_, destDir, Seq("batch_id", "pred_bucket")))
    }
    io.writeMetadata(spark, destDir, ExtractPipeline.LayoutFile,
      s"""{"pred_buckets": $buckets}""" + "\n")
    rows
  }

  /** [[compact]] a whole standing root side-by-side: graph (always),
    * closure (when maintained), and the CURRENT link-state version
    * (re-committed as the destination's v0 — older versions are history,
    * not state). Returns (graph rows, closure rows or -1, state nodes
    * or -1). The source root stays untouched; swapping roots is the
    * storage layer's atomic operation.
    */
  def compactRoot(spark: SparkSession, srcRoot: String, destRoot: String,
                  io: TableIO = TableIO.default): (Long, Long, Long) = {
    val g = compact(spark, s"$srcRoot/graph", s"$destRoot/graph", io)
    val c = io.readMetadata(spark, s"$srcRoot/closure", ExtractPipeline.LayoutFile)
      .map(_ => compact(spark, s"$srcRoot/closure", s"$destRoot/closure", io))
      .getOrElse(-1L)
    val l = LinkStateStore.load(spark, s"$srcRoot/link_state", io)
      .map(st => LinkStateStore.save(st, s"$destRoot/link_state", 0L, io).count())
      .getOrElse(-1L)
    (g, c, l)
  }

  /** Open the standing RAW graph for querying ([[GraphQuery.loadGraph]]
    * semantics: pruning from the layout metadata, stats by one-pass scan).
    */
  def readGraph(spark: SparkSession, root: String,
                io: TableIO = TableIO.default): GraphQuery.PersistedGraph =
    GraphQuery.loadGraph(spark, s"$root/graph", io)

  /** The CANONICAL view of the standing graph: raw triples rewritten
    * through the standing link state's current mapping (the read-time
    * canonicalization the RAW storage decision above requires). Falls back
    * to the raw triples when no link state exists.
    */
  def readCanonical(spark: SparkSession, root: String,
                    io: TableIO = TableIO.default): Dataset[Triple] = {
    import spark.implicits._
    val raw = readGraph(spark, root, io).df
      .select(col("subj"), col("pred"), col("obj_iri"), col("obj_lexical"),
        col("obj_datatype"), col("obj_lang"), col("conv_id"), col("turn_idx"))
      .as[Triple]
    LinkStateStore.loadMapping(spark, s"$root/link_state", io) match {
      case Some(mapping) => EntityLink.rewriteWithMapping(raw, mapping.localCheckpoint())
      case None => raw
    }
  }

  /** The standing closure opened for querying (when maintained). */
  def readClosure(spark: SparkSession, root: String,
                  io: TableIO = TableIO.default): GraphQuery.PersistedGraph =
    GraphQuery.loadGraph(spark, s"$root/closure", io)
}
