package graft.spark

import graft.model.Triple
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Cross-turn entity linking + canonicalization (the graft extension the
  * north star names: blocking + connected-components canonicalizer).
  *
  * Within one turn, coreference is handled by the extractor's memory map
  * and itemid IRIs. ACROSS turns, anonymous items (skolem subjects) that
  * denote the same real-world entity must be merged. Strategy:
  *
  *  1. **Blocking**: a mention (subject) keys on the values of its
  *     identifying properties (email, phone, name, …) — `(subj, key)` edges.
  *     Mentions never pair all-vs-all; only mentions sharing a key meet,
  *     and the shuffle is on the key (salt-friendly if one key is hot).
  *  2. **Connected components** over the bipartite mention↔key graph:
  *     transitive identity (A shares a key with B, B with C ⇒ A=B=C).
  *  3. **Canonicalization**: every component takes its least subject id as
  *     the canonical id; triples are rewritten subj/obj-side.
  */
object EntityLink {

  /** (subj, canonical) mapping for skolem subjects, linked through the given
    * identifying predicates.
    *
    * Skew (north rule: "salted-key LSH blocking ... absorb conv_id/entity
    * skew"): a HOT blocking key — one contact value shared by millions of
    * mentions — would otherwise put every one of them in a single CC
    * neighborhood and one join bucket. Keys with degree > maxKeyDegree
    * split into ⌈df/maxKeyDegree⌉ salted sub-keys (mention-hash
    * assignment), chained pairwise so transitive identity is preserved
    * exactly: components are unchanged, but no node degree and no join
    * bucket exceeds ~maxKeyDegree.
    */
  def mentionMapping(triples: Dataset[Triple], keyPredicates: Seq[String],
                     maxKeyDegree: Int = 100000): DataFrame =
    mappingFromState(mentionLinkState(triples, keyPredicates, maxKeyDegree))

  /** Blocking edges of the mention↔key graph — shared by the full build
    * and incremental delta batches. Mention→key pairs; key nodes are
    * namespaced so they can't collide with subject ids in the CC node
    * space. The U+0000 separator is made INJECTIVE by escape-then-delimit
    * (U+0001 is the escape: 01→ 0101, 00→ 0102): extraction already maps
    * NUL to U+FFFD per the HTML spec, but triples can also arrive from
    * N-Triples files whose \\u0000 escapes smuggle a raw NUL into
    * pred/lexical — without this, (P, "a\\0b") and ("P\\0a", b) would
    * share a key and silently merge unrelated entities. (All escapes are
    * source escape sequences; the file stays plain text.)
    *
    * Sub-key NAMES are df-independent (`key\u0000i`), and a split key's
    * RAW node is chained in as an anchor (raw → sub-key 0): a later batch
    * that salts the same key differently (its own degree count) still
    * lands on nodes connected to this batch's — incremental state merges
    * stay exact however per-batch salting decisions drift.
    */
  private def linkEdges(triples: Dataset[Triple], keyPredicates: Seq[String],
                        maxKeyDegree: Int): DataFrame = {
    def escSep(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(c, "\u0001", "\u0001\u0001"), "\u0000", "\u0001\u0002")
    val mk = triples
      .filter(col("pred").isin(keyPredicates: _*) && col("obj_lexical").isNotNull)
      .filter(col("subj").startsWith(graft.core.Extractor.SkolemPrefix))
      .select(col("subj").as("src"),
        concat(escSep(col("pred")), lit("\u0000"), escSep(col("obj_lexical"))).as("key"))
      .localCheckpoint() // consumed twice (degree count + salt join)
    // SPLIT keys only (degree > maxKeyDegree) participate in the salt
    // assignment, and the salt join must not itself shuffle mentions by the
    // raw key — that would put the hot key's entire neighborhood in one
    // join bucket, exactly the skew this mechanism absorbs. The split-key
    // table is degree-bounded (<= |mentions|/maxKeyDegree rows — a hot-key
    // CATALOG, not data), so it broadcasts and the assignment is a
    // shuffle-free map-side left join; non-split keys pass through on the
    // null branch. (The degree count itself is skew-safe either way:
    // hash-aggregate with map-side partials never concentrates a key.)
    val splits = mk.groupBy(col("key"))
      .agg(ceil(count(lit(1)).cast("double") / maxKeyDegree).cast("int").as("n_salts"))
      .filter(col("n_salts") > 1)
      .localCheckpoint() // consumed three times (salt join, chains, anchors)
    val withSalt = mk.join(broadcast(splits), Seq("key"), "left")
      .select(col("src"),
        when(col("n_salts").isNull, col("key"))
          .otherwise(concat(col("key"), lit("\u0000"),
            pmod(hash(col("src")), col("n_salts")).cast("string"))).as("dst"))
    // chain the sub-keys of each split key: K#0 - K#1 - ... - K#(n-1),
    // plus the raw-key ANCHOR K - K#0 (cross-batch connectivity)
    val chains = splits
      .select(col("key"), explode(sequence(lit(0), col("n_salts") - 2)).as("i"))
      .select(concat(col("key"), lit("\u0000"), col("i").cast("string")).as("src"),
        concat(col("key"), lit("\u0000"), (col("i") + 1).cast("string")).as("dst"))
    val anchors = splits
      .select(col("key").as("src"),
        concat(col("key"), lit("\u00000")).as("dst"))
    withSalt.unionByName(chains).unionByName(anchors)
  }

  /** The full linking STATE: (node, component) labels over the mention↔key
    * graph, key nodes included — what [[mentionLinkStateIncremental]]
    * maintains batch over batch. Deployments persist THIS between crawl
    * batches (not just the subject projection), because merges arrive
    * through shared KEY nodes.
    */
  def mentionLinkState(triples: Dataset[Triple], keyPredicates: Seq[String],
                       maxKeyDegree: Int = 100000): DataFrame =
    ConnectedComponents.run(linkEdges(triples, keyPredicates, maxKeyDegree))

  /** Fold one batch of new mention triples into a standing linking state:
    * the batch's blocking edges run through
    * [[ConnectedComponents.incremental]], so the cost scales with the
    * batch, never the corpus. New mentions sharing a key (or a salted
    * sub-key, or the raw anchor of a previously split key) with standing
    * mentions merge into their components exactly as a from-scratch
    * rebuild would.
    */
  def mentionLinkStateIncremental(state: DataFrame, newTriples: Dataset[Triple],
                                  keyPredicates: Seq[String],
                                  maxKeyDegree: Int = 100000): DataFrame =
    ConnectedComponents.incremental(state,
      linkEdges(newTriples, keyPredicates, maxKeyDegree))

  /** (subj, canonical) projection of a linking state: canonical = min
    * *subject* in the component (keys sort after skolems only by accident,
    * so take min over subjects explicitly).
    */
  def mappingFromState(state: DataFrame): DataFrame = {
    val subjects = state.filter(col("node").startsWith(graft.core.Extractor.SkolemPrefix))
    val canon = subjects.groupBy(col("component"))
      .agg(min(col("node")).as("canonical"))
    subjects.join(canon, "component")
      .select(col("node").as("subj"), col("canonical"))
  }

  /** Rewrite triples through a (subj → canonical) mapping on both subject
    * and object positions, then re-deduplicate (merged mentions collapse
    * their repeated statements).
    *
    * Only skolem subjects/objects can possibly rewrite (the mapping's
    * domain is skolems by construction), so each rewrite join shuffles
    * ONLY the skolem-keyed slice — at corpus scale the vast majority of
    * rows (itemid subjects, literal objects) pass through join-free. This
    * also keeps null obj_iri keys out of the object join entirely.
    */
  def canonicalize(triples: Dataset[Triple], keyPredicates: Seq[String]): Dataset[Triple] =
    // materialized once: the mapping subtree feeds BOTH rewrite joins
    rewriteWithMapping(triples, mentionMapping(triples, keyPredicates).localCheckpoint())

  /** The rewrite half of [[canonicalize]] with a caller-supplied mapping —
    * the incremental path's entry point (a standing state updated by
    * [[mentionLinkStateIncremental]] projects through [[mappingFromState]]
    * and rewrites here). The mapping frame should be materialized
    * (localCheckpoint) by the caller: both joins consume it.
    *
    * Identity rows (subj == canonical — every unmerged mention, usually
    * the vast majority) are dropped from the join side here: the joins are
    * left+coalesce, so an unmatched row passes through unchanged, and the
    * shuffled/broadcast side shrinks from corpus-sized to
    * merged-mentions-sized. The object pass re-derives the subject-pass
    * plan twice (skolem/pass branches); its shuffle Exchanges are reused
    * within one action (ReuseExchange), and the pass slices deliberately
    * re-scan pruned parquet rather than checkpoint a corpus-sized frame.
    */
  def rewriteWithMapping(triples: Dataset[Triple], mapping: DataFrame): Dataset[Triple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val skolemPfx = graft.core.Extractor.SkolemPrefix
    val m = mapping.filter(col("canonical") =!= col("subj"))

    val subjSkolem = triples.filter(col("subj").startsWith(skolemPfx))
    val subjPass = triples.filter(!col("subj").startsWith(skolemPfx)).toDF()
    val bySubj = subjSkolem.as("t")
      .join(m.as("ms"), col("t.subj") === col("ms.subj"), "left")
      .select(coalesce(col("ms.canonical"), col("t.subj")).as("subj"),
        col("t.pred").as("pred"), col("t.obj_iri").as("obj_iri"),
        col("t.obj_lexical").as("obj_lexical"), col("t.obj_datatype").as("obj_datatype"),
        col("t.obj_lang").as("obj_lang"), col("t.conv_id").as("conv_id"),
        col("t.turn_idx").as("turn_idx"))
      .unionByName(subjPass)

    val objSkolem = bySubj.filter(col("obj_iri").isNotNull && col("obj_iri").startsWith(skolemPfx))
    val objPass = bySubj.filter(col("obj_iri").isNull || !col("obj_iri").startsWith(skolemPfx))
    val byObj = objSkolem.as("t")
      .join(m.withColumnRenamed("subj", "o").as("mo"),
        col("t.obj_iri") === col("mo.o"), "left")
      .select(col("t.subj").as("subj"), col("t.pred").as("pred"),
        coalesce(col("mo.canonical"), col("t.obj_iri")).as("obj_iri"),
        col("t.obj_lexical").as("obj_lexical"), col("t.obj_datatype").as("obj_datatype"),
        col("t.obj_lang").as("obj_lang"), col("t.conv_id").as("conv_id"),
        col("t.turn_idx").as("turn_idx"))
      .unionByName(objPass)
      .as[Triple]
    ExtractPipeline.canonicalize(byObj)
  }
}
