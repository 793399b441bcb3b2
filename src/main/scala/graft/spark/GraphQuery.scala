package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Basic-graph-pattern (BGP) querying over the extracted triple table —
  * the consumer-side role RDF.rb's `Queryable#query` plays for the
  * reference reader's output (reference: rdf-microdata feeds RDF.rb
  * repositories; spec/reader_spec.rb exercises `parse(...).query`-style
  * matching via graph equivalence, and expansion.rb:102-117 executes
  * patterns against a loaded repository).
  *
  * A pattern is a (subject, predicate, object) triple of terms; each term
  * is a constant ([[GraphQuery.C]]) or a named variable ([[GraphQuery.V]]).
  * `bgp` returns the DISTINCT variable bindings satisfying every pattern.
  *
  * Spark-first shape — the whole query stays declarative so Catalyst does
  * the planning:
  *  - each pattern compiles to a filtered projection of the triple table;
  *    constant terms become pushable predicates (plain column equalities
  *    and IsNull/Or combinations, so `PushedFilters` reach the parquet
  *    scan — a `?s rdf:type :Person` pattern never reads non-type rows);
  *  - when the table is a [[ExtractPipeline.writeGraph]] layout (a
  *    `pred_bucket` partition column), a constant-predicate pattern also
  *    filters `pred_bucket = pmod(hash(pred), n)` — the hash folds to a
  *    literal at plan time, so the scan PRUNES partitions: at 100 TB a
  *    `rdf:type` pattern touches 1/n of the directories, not all of them;
  *  - patterns join pairwise on their shared variables (equi-joins on
  *    binding columns — co-partitioned shuffles, or BroadcastHashJoin when
  *    a selective pattern leaves a small side; AQE re-plans at runtime);
  *  - join order is SELECTIVITY-GREEDY within the connectivity constraint:
  *    patterns are costed from a one-pass predicate-frequency stats map
  *    ([[predStats]] — preds are vocabulary-bounded, so the map is
  *    catalog-stat-sized) discounted per bound constant, the cheapest
  *    pattern seeds the join, and each step joins the cheapest CONNECTED
  *    pattern — so two big patterns never join before a selective one can
  *    shrink the bindings. At equal estimated cost, SUBJECT-star joins win
  *    the tie: on a subject-bucketed table they are shuffle-free and keep
  *    the accumulated frame partitioned on the star variable, so the
  *    cross-variable joins (which must shuffle the small binding frame
  *    anyway) land last. A disconnected pattern set is rejected instead
  *    of silently exploding (at 100 TB a cartesian between pattern frames
  *    is the scale-killer this operator must never emit).
  *
  * Object bindings surface as `coalesce(obj_iri, obj_lexical)` — IRIs and
  * literal lexical forms share one binding domain, mirroring how the
  * fixtures compare term values.
  */
object GraphQuery {

  sealed trait Term
  /** Named variable; equal names unify across (and within) patterns. */
  final case class V(name: String) extends Term
  /** Constant IRI or literal lexical form. */
  final case class C(value: String) extends Term

  /** One-pass predicate-frequency stats over a persisted graph: the
    * vocabulary registry bounds distinct preds, so this is a catalog-stat
    * map (dozens of rows), computed with a single partial-agg groupBy and
    * reused across every query against the table.
    */
  def predStats(triples: DataFrame): Map[String, Long] =
    triples.groupBy(col("pred")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** A [[ExtractPipeline.writeGraph]] table opened for querying: frame +
    * the layout's own bucket count + predicate stats.
    */
  final case class PersistedGraph(df: DataFrame, predBuckets: Int,
                                  stats: Map[String, Long])

  /** Open a persisted graph directory: reads the layout's OWN bucket count
    * AND write-time predicate stats from `_graft_layout.json` (written by
    * [[ExtractPipeline.writeGraph]] — a mismatched caller-supplied count
    * would silently empty every constant-pred pattern, so the table must
    * describe itself, and stats from metadata mean opening a graph costs a
    * metadata read, not a table scan). Goes through the path's own Hadoop
    * FileSystem, so hdfs:// / s3a:// graph dirs work under spark-submit.
    * Missing metadata (a foreign parquet dir) degrades to predBuckets = 0
    * (correct results, no partition pruning) with stats computed by the
    * one-pass scan.
    */
  def loadGraph(spark: org.apache.spark.sql.SparkSession, dir: String,
                io: graft.spark.TableIO = graft.spark.TableIO.default): PersistedGraph = {
    import scala.jdk.CollectionConverters._
    val df = io.read(spark, dir)
    // corrupt/truncated metadata (e.g. a writer killed mid-write on a
    // filesystem without the rename the writer attempts) degrades exactly
    // like MISSING metadata — the graph must stay queryable; the READ
    // itself may also throw (checksum mismatch on a torn local file), so
    // it sits inside the Try alongside the parse
    val parsed: Option[PersistedGraph] =
      scala.util.Try(
          io.readMetadata(spark, dir, graft.spark.ExtractPipeline.LayoutFile))
        .toOption.flatten.flatMap { json =>
        scala.util.Try {
          val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
          val buckets = Option(root.get("pred_buckets")).map(_.asInt(0)).getOrElse(0)
          val statsNode = root.get("pred_stats")
          val stats =
            if (statsNode != null && statsNode.isObject)
              statsNode.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
            else predStats(df)
          PersistedGraph(df, buckets, stats)
        }.toOption
      }
    parsed.getOrElse(PersistedGraph(df, 0, predStats(df)))
  }

  /** Open a SUBJECT-BUCKETED graph table written by
    * [[ExtractPipeline.writeGraphBucketedBySubject]] for querying. The
    * frame comes from `spark.table`, so every pattern compiled from it is a
    * bucketed scan reporting `HashPartitioning(subj, nBuckets)` — and
    * because the pattern projection only ALIASES subj into its binding
    * column, Spark's alias-aware partitioning propagation keeps that
    * distribution through the projection. Subject-star joins (every
    * entity-assembly query: N patterns sharing the subject variable) then
    * satisfy their join distribution straight off the scans: ZERO Exchange
    * in the whole query, at any scale. Joins on non-subject bindings
    * shuffle as usual.
    *
    * Predicate stats come from the table's own [[ExtractPipeline
    * .PredStatsProperty]] catalog property (written at write time);
    * a foreign table without it falls back to the one-pass scan.
    * `predBuckets` is 0 — a bucketed table has no `pred_bucket` partition
    * column; predicate selectivity is served by parquet row-group pushdown
    * on the sorted-within-bucket layout instead.
    */
  def loadBucketedGraph(spark: org.apache.spark.sql.SparkSession,
                        tableName: String): PersistedGraph = {
    import scala.jdk.CollectionConverters._
    val df = spark.table(tableName)
    val stats = scala.util.Try {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
      val props = spark.sessionState.catalog.getTableMetadata(ident).properties
      props.get(graft.spark.ExtractPipeline.PredStatsProperty).map { json =>
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
          .properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
      }
    }.toOption.flatten
    PersistedGraph(df, 0, stats.getOrElse(predStats(df)))
  }

  /** Solve a BGP against an opened persisted graph (bucket count and stats
    * come from the table itself — the safe front door).
    */
  def bgp(g: PersistedGraph, patterns: Seq[(Term, Term, Term)]): DataFrame =
    bgp(g.df, patterns, g.predBuckets, g.stats)

  /** Solve the basic graph pattern over (subj, pred, obj_iri, obj_lexical,
    * ...) triples; returns one column per distinct variable name, in
    * first-mention order.
    *
    * @param predBuckets when > 0 and the frame carries a `pred_bucket`
    *        column (the [[ExtractPipeline.writeGraph]] layout), constant-
    *        predicate patterns add the partition-pruning bucket filter.
    *        MUST equal the count the table was written with — a mismatch
    *        silently empties constant-pred patterns; prefer the
    *        [[loadGraph]]/[[PersistedGraph]] front door, which reads the
    *        count from the table's own layout metadata.
    * @param stats predicate frequencies from [[predStats]]; empty map =
    *        cost by constant count only.
    */
  def bgp(triples: DataFrame, patterns: Seq[(Term, Term, Term)],
          predBuckets: Int = 0, stats: Map[String, Long] = Map.empty): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    require(patterns.forall(p => Seq(p._1, p._2, p._3).exists(_.isInstanceOf[V])),
      "variable-free patterns (pure existence checks) are not supported: " +
        "they cannot join on a shared variable — evaluate the constant " +
        "triple separately and gate the query on its result")

    val items = patterns.map { p =>
      val (df, vars) = compile(triples, p, predBuckets)
      val subjVar = p._1 match { case V(n) => n; case _ => null }
      (df, vars, subjVar, estimate(p, stats))
    }
    // variables surface in first-mention order regardless of join order
    val outVars = patterns
      .flatMap(p => Seq(p._1, p._2, p._3)).collect { case V(n) => n }.distinct
    greedyJoin(items, outVars)
  }

  /** Selectivity-greedy connected join over pre-compiled pattern frames —
    * the shared core of [[bgp]] and [[bgpWithPaths]]. Each item is
    * (bindings frame, variable names, subject variable or null, estimated
    * rows); input position breaks cost ties deterministically.
    */
  private def greedyJoin(items0: Seq[(DataFrame, Seq[String], String, Long)],
                         outVars: Seq[String]): DataFrame = {
    val items = scala.collection.mutable.ArrayBuffer.tabulate(items0.size) { i =>
      val (df, vars, sv, e) = items0(i)
      (df, vars, sv, e, i)
    }
    // subject variables of the patterns already joined into acc: at EQUAL
    // estimated cost, a candidate whose SUBJECT variable is one of these is
    // preferred — that join is subject-to-subject, which a subject-bucketed
    // table ([[ExtractPipeline.writeGraphBucketedBySubject]]) satisfies
    // straight off the bucketed scans with no Exchange, and which keeps the
    // accumulated frame partitioned on the star variable so LATER star
    // patterns stay shuffle-free too (a non-subject join in the middle
    // would repartition acc and force the remaining star joins to shuffle
    // back). On a non-bucketed layout the preference is harmless: order
    // between equal-cost patterns was arbitrary (input index) anyway.
    val accSubjVars = scala.collection.mutable.Set.empty[String]
    def takeCheapest(ok: Seq[String] => Boolean): Option[(DataFrame, Seq[String], String)] = {
      val cands = items.zipWithIndex.collect {
        case ((df, vs, sv, e, i), pos) if ok(vs) =>
          val starPenalty = if (sv != null && accSubjVars.contains(sv)) 0 else 1
          ((df, vs, sv), (e, starPenalty, i), pos)
      }
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(_._2)
        items.remove(best._3)
        Some(best._1)
      }
    }

    var first = takeCheapest(_ => true).get
    if (first._3 != null) accSubjVars += first._3
    var acc = (first._1, first._2)
    while (items.nonEmpty) {
      val next = takeCheapest(vs => vs.exists(acc._2.contains))
      require(next.isDefined,
        s"disconnected BGP: patterns over ${items.map(_._2).mkString(",")} share no " +
          s"variable with {${acc._2.mkString(",")}} — a cartesian product is refused")
      val (ndf, nvs, nsv) = next.get
      if (nsv != null) accSubjVars += nsv
      val shared = nvs.filter(acc._2.contains)
      acc = (acc._1.join(ndf, shared), (acc._2 ++ nvs).distinct)
    }
    acc._1.select(outVars.map(col): _*).distinct()
  }

  /** Estimated result rows for one pattern: the predicate's frequency when
    * known (an absent pred estimates 0 — maximally selective, the join
    * empties immediately), the whole table when not, discounted 100× per
    * bound subject/object constant (unknown value distribution — the
    * factor only needs to rank "more constants = fewer rows" consistently,
    * not predict cardinality).
    */
  private[spark] def estimate(p: (Term, Term, Term), stats: Map[String, Long]): Long = {
    val total =
      if (stats.nonEmpty) math.max(stats.valuesIterator.sum, 1L) else Long.MaxValue / 4
    val (base, discounts) = p._2 match {
      case C(v) if stats.nonEmpty =>
        (stats.getOrElse(v, 0L), Seq(p._1, p._3).count(_.isInstanceOf[C]))
      case C(_) => // unknown pred frequency: the constant still discounts
        (total, 1 + Seq(p._1, p._3).count(_.isInstanceOf[C]))
      case _ => (total, Seq(p._1, p._3).count(_.isInstanceOf[C]))
    }
    (0 until discounts).foldLeft(base)((e, _) => if (e > 0) math.max(e / 100, 1L) else 0L)
  }

  /** One pattern → (bindings frame, variable names). Constants filter as
    * pushable predicates; a variable repeated inside one pattern becomes an
    * equality filter (e.g. `?x :sameAs ?x`).
    */
  private def compile(triples: DataFrame, p: (Term, Term, Term),
                      predBuckets: Int): (DataFrame, Seq[String]) = {
    val hasBucket = predBuckets > 0 && triples.columns.contains("pred_bucket")
    var df = triples
    val slots = Seq("subj" -> p._1, "pred" -> p._2, "obj" -> p._3)
    slots.foreach {
      case ("pred", C(v)) =>
        df = df.filter(col("pred") === v)
        if (hasBucket) // hash(lit) constant-folds → literal partition filter
          df = df.filter(col("pred_bucket") === pmod(hash(lit(v)), lit(predBuckets)))
      case ("subj", C(v)) => df = df.filter(col("subj") === v)
      case ("obj", C(v)) =>
        // Triple's object is (obj_iri XOR obj_lexical) — this disjunction
        // is exactly coalesce(obj_iri, obj_lexical) = v, but built from
        // EqualTo/IsNull/Or so it PUSHES to the parquet scan (a coalesce
        // comparison does not)
        df = df.filter(col("obj_iri") === v ||
          (col("obj_iri").isNull && col("obj_lexical") === v))
      case _ => ()
    }
    df = df.select(col("subj"), col("pred"),
      coalesce(col("obj_iri"), col("obj_lexical")).as("obj"))
    val varSlots = slots.collect { case (c, V(n)) => (c, n) }
    varSlots.groupBy(_._2).foreach { case (_, cs) =>
      cs.drop(1).foreach { case (c, _) => df = df.filter(col(c) === col(cs.head._1)) }
    }
    val names = varSlots.map(_._2).distinct
    (df.select(names.map(n => col(varSlots.find(_._2 == n).get._1).as(n)): _*), names)
  }

  /** BGP with OPTIONAL groups (the SPARQL OPTIONAL analog): the required
    * patterns solve as [[bgp]]; each optional group solves as its own BGP
    * and LEFT-joins the accumulated bindings on the shared variables —
    * rows without a match keep their required bindings and surface the
    * group's variables as NULL. Groups left-join in listed order, each
    * seeing bindings from earlier groups (SPARQL's sequential OPTIONAL
    * semantics); a group matching k rows multiplies bindings k-fold, like
    * any join.
    *
    * SPARQL's compatibility rule — an UNBOUND shared variable is
    * compatible with any binding — is honored when a later group joins on
    * a variable an earlier group may have left NULL (the chained idiom
    * `OPTIONAL {?x knows ?y} OPTIONAL {?y name ?n}`): rows whose shared
    * variables are all bound take the plain equi-join; rows where one is
    * NULL join by `IS NULL OR equal` and the match's value fills the
    * binding (coalesce). Per the SPARQL algebra an unbound row is
    * compatible with EVERY group solution and multiplies accordingly —
    * that blow-up is confined to the unbound slice by the split (the
    * bound slice, normally the bulk, stays hash-joined).
    *
    * Scale shape: each side is a full [[bgp]] (pushdown, pruning,
    * selectivity-ordered joins); the left join is a co-partitioned
    * equi-join on the shared binding columns, broadcast when the optional
    * side is selective enough for AQE to see it small; only possibly-NULL
    * rows (post-OPTIONAL leftovers) pay the compatibility join. A group
    * sharing NO variable with the accumulated bindings is refused for the
    * same reason [[bgp]] refuses disconnected patterns.
    */
  def bgpOptional(g: PersistedGraph, required: Seq[(Term, Term, Term)],
                  optionals: Seq[Seq[(Term, Term, Term)]]): DataFrame = {
    var acc = bgp(g, required)
    // variables an earlier optional group may have left NULL
    val maybeNull = scala.collection.mutable.Set.empty[String]
    optionals.foreach { grp =>
      val opt = bgp(g, grp)
      val shared = opt.columns.filter(acc.columns.contains).toSeq
      require(shared.nonEmpty,
        s"optional group {${opt.columns.mkString(",")}} shares no variable " +
          s"with {${acc.columns.mkString(",")}} — a cartesian product is refused")
      val (nullable, bound) = shared.partition(maybeNull.contains)
      acc =
        if (nullable.isEmpty) acc.join(opt, shared, "left")
        else {
          val accOnly = acc.columns.filterNot(shared.contains)
          val optOnly = opt.columns.filterNot(shared.contains)
          val outCols = shared ++ accOnly ++ optOnly
          val allBound = nullable.map(col(_).isNotNull).reduce(_ && _)
          // bound slice: plain equi left join (hash-joinable, the bulk)
          val boundSide = acc.filter(allBound).join(opt, shared, "left")
            .select(outCols.map(col): _*)
          // unbound slice: compatibility join — NULL matches anything and
          // takes the match's binding; confined to post-OPTIONAL leftovers
          val cond = (bound.map(c => col(s"gq_a.$c") === col(s"gq_o.$c")) ++
            nullable.map(c =>
              col(s"gq_a.$c").isNull || col(s"gq_a.$c") === col(s"gq_o.$c")))
            .reduce(_ && _)
          val nullSide = acc.filter(!allBound).as("gq_a")
            .join(opt.as("gq_o"), cond, "left")
            .select(bound.map(c => col(s"gq_a.$c").as(c)) ++
              nullable.map(c =>
                coalesce(col(s"gq_a.$c"), col(s"gq_o.$c")).as(c)) ++
              accOnly.map(c => col(s"gq_a.$c").as(c)) ++
              optOnly.map(c => col(s"gq_o.$c").as(c)): _*)
            .select(outCols.map(col): _*)
          boundSide.unionByName(nullSide)
        }
      // the group's new variables are NULL on unmatched rows; nullable
      // shared variables stay possibly-NULL (unmatched rows keep NULL
      // through the coalesce)
      maybeNull ++= opt.columns.filterNot(shared.contains)
    }
    // variables surface in first-mention order across required + optional
    // groups (a using-columns join reorders; the API shouldn't)
    val outVars = (required ++ optionals.flatten)
      .flatMap(p => Seq(p._1, p._2, p._3)).collect { case V(n) => n }.distinct
    acc.select(outVars.map(col): _*)
  }

  /** ASK — does the pattern set have at least one solution? (The SPARQL
    * ASK query form.) Planned as the BGP with a LIMIT 1 on top: Spark's
    * CollectLimit short-circuits — tasks stop as soon as one row
    * surfaces, so a satisfied ASK over a selective pattern reads one
    * pruned slice and exits, never the full solution set.
    */
  def ask(g: PersistedGraph, patterns: Seq[(Term, Term, Term)]): Boolean =
    !bgp(g, patterns).limit(1).isEmpty

  /** CONSTRUCT — build new triples from a template over the BGP's
    * solutions (the SPARQL CONSTRUCT query form, and the light-weight
    * rule-application path: "wherever this shape matches, assert these
    * edges" without running the full entailment fixpoint). Template slots
    * are [[C]] constants or [[V]] variables bound by the patterns; output
    * is a distinct (subj, pred, obj) edge frame (set semantics, like any
    * graph). A term bound to a literal surfaces by its lexical form —
    * callers constructing typed-literal graphs should keep literals in
    * object position and join back to the source for datatypes.
    *
    * Scale shape: one projection over the solved BGP plus the distinct
    * that set semantics require — no joins beyond the BGP's own.
    */
  def construct(g: PersistedGraph, patterns: Seq[(Term, Term, Term)],
                template: Seq[(Term, Term, Term)]): DataFrame = {
    require(template.nonEmpty, "empty CONSTRUCT template")
    val bindings = bgp(g, patterns)
    def slot(t: Term, name: String): Column = t match {
      case C(v) => lit(v).as(name)
      case V(n) =>
        require(bindings.columns.contains(n),
          s"template variable ?$n is not bound by the patterns " +
            s"{${bindings.columns.mkString(",")}}")
        col(n).as(name)
    }
    template.map { case (s, p, o) =>
      bindings.select(slot(s, "subj"), slot(p, "pred"), slot(o, "obj"))
    }.reduce(_ unionByName _).distinct()
  }

  /** BGP difference (the SPARQL MINUS analog): solutions of the required
    * patterns with every row removed for which some minus-group solution
    * agrees on the shared variables. Each group solves as its own [[bgp]]
    * and applies as a LEFT ANTI join on the shared binding columns — the
    * negation never materializes a product. A group sharing NO variable
    * with the accumulated bindings removes NOTHING (SPARQL's MINUS
    * disjoint-domain rule — unlike [[bgpOptional]], where a disconnected
    * group would mean a cartesian and is refused, here the spec'd
    * semantics are already safe).
    *
    * Scale shape: anti-joins shuffle on the shared binding columns like
    * any equi-join, and AQE broadcasts a selective minus side; the minus
    * group's own patterns push/prune independently.
    */
  def bgpMinus(g: PersistedGraph, required: Seq[(Term, Term, Term)],
               minusGroups: Seq[Seq[(Term, Term, Term)]]): DataFrame = {
    var acc = bgp(g, required)
    minusGroups.foreach { grp =>
      val m = bgp(g, grp)
      val shared = m.columns.filter(acc.columns.contains).toSeq
      if (shared.nonEmpty) acc = acc.join(m, shared, "left_anti")
    }
    acc
  }

  /** DESCRIBE — assemble every stored triple about the entities a BGP
    * selects (the SPARQL DESCRIBE analog, and the entity-assembly access
    * path a KG serves most: "give me everything we know about X"). Solves
    * `patterns` as a [[bgp]], projects the distinct bindings of
    * `entityVar`, and semi-joins the triple table on subject — full triple
    * rows (obj_iri/obj_lexical/obj_datatype/obj_lang preserved) come back,
    * not just the pattern's bindings.
    *
    * Scale shape: the selector BGP pushes/prunes as always; the entity set
    * it yields is selective by construction (that's why the caller wrote
    * patterns), so the semi-join broadcasts the SMALL entity side under
    * AQE while the big triple table streams map-side — no full-table
    * shuffle. On a subject-bucketed table ([[loadBucketedGraph]]) the
    * subj semi-join additionally inherits the bucketed distribution.
    */
  def describe(g: PersistedGraph, patterns: Seq[(Term, Term, Term)],
               entityVar: String): DataFrame = {
    val bindings = bgp(g, patterns)
    require(bindings.columns.contains(entityVar),
      s"describe variable ?$entityVar is not bound by the patterns " +
        s"{${bindings.columns.mkString(",")}}")
    val entities = bindings.select(col(entityVar).as("subj")).distinct()
    // of the triple columns, keep those the frame actually carries (a
    // persisted graph has all six; a bare test frame may carry four) —
    // layout columns like pred_bucket stay internal
    val cols = Seq("subj", "pred", "obj_iri", "obj_lexical",
      "obj_datatype", "obj_lang").filter(g.df.columns.contains)
    // set semantics like [[bgp]]: a lineage-keeping table stores one row
    // per witness turn; the DESCRIBED graph is a set of triples
    g.df.join(entities, Seq("subj"), "left_semi")
      .select(cols.map(col): _*).distinct()
  }

  /** UNION of basic graph patterns (the SPARQL UNION analog): each branch
    * solves as its own [[bgp]] — full pushdown, pruning and join ordering
    * per branch — and the branch results union under set semantics. A
    * variable bound in only SOME branches surfaces as NULL in the others
    * (SPARQL's unbound), with columns in first-mention order across
    * branches.
    *
    * Scale shape: a union of independently-planned subqueries — Spark
    * unions are metadata-only (no shuffle); the one shuffle this operator
    * adds is the final distinct on the binding columns, which SPARQL's set
    * semantics require. Branches prune/push independently, so a union of
    * two selective constant-pred branches reads two pruned slices, never
    * the whole graph.
    */
  def bgpUnion(g: PersistedGraph, branches: Seq[Seq[(Term, Term, Term)]]): DataFrame = {
    require(branches.nonEmpty, "empty UNION")
    // allowMissingColumns NULL-fills branch-unbound variables and keeps
    // first-mention column order across the reduce — every binding column
    // is a string, so the filled NULLs type consistently
    branches.map(b => bgp(g, b))
      .reduce(_.unionByName(_, allowMissingColumns = true)).distinct()
  }

  /** Transitive property path `pred+` (the SPARQL OneOrMorePath analog —
    * the RDF.rb Queryable role [[bgp]] fills covers only single-hop
    * patterns; reference expansion.rb's rule loop is the same "derive
    * until nothing new" shape over different rules): distinct
    * `(subj, obj)` pairs connected by one or more `pred` edges.
    *
    * DOMAIN: IRI-node edges only (`obj_iri`) — the closure-utility shape
    * its consumers need (entailment's prp-trp IRI chains, reachability,
    * incremental maintenance over (s, o) pair tables). Literal-TERMINAL
    * paths are out of this operator's domain: the path-algebra evaluator
    * ([[evalPath]] on `Plus(P(pred))`, the CLI's `pred+`) includes them,
    * and [[Entailment.owlEntailWithTransitive]] derives them explicitly
    * as its literal-extension step.
    *
    * Spark-first shape, scaled for a 100-TB graph:
    *  - the edge slice is a constant-predicate scan — the pushed
    *    `pred = <lit>` filter plus `pred_bucket` partition pruning on a
    *    [[ExtractPipeline.writeGraph]] layout mean the job reads the ONE
    *    predicate's partition, never the whole graph;
    *  - SEMI-NAIVE frontier expansion (same discipline as
    *    [[Entailment.owlEntail]]): iteration i joins only the previous
    *    DELTA against the edge slice (a co-partitioned equi-join on the
    *    hop column), never re-deriving from the accumulated closure, so
    *    per-iteration cost is O(|Δ ⋈ E|), not O(|closure|²);
    *  - novelty is a `left_anti` against the union of CHECKPOINTED
    *    accepted deltas (disjoint by construction — plain unions, shallow
    *    lineage, no growing-plan recompute);
    *  - iterations = graph diameter (log₂ N on a management tree); cycles
    *    terminate naturally — a cyclic hop re-derives only seen pairs and
    *    the anti-join empties the frontier.
    *
    * Hitting `maxIterations` with a live frontier THROWS: a silently
    * truncated closure is wrong answers, not a degraded mode.
    */
  def pathPlus(g: PersistedGraph, pred: String, maxIterations: Int = 64): DataFrame =
    pathPlusAlt(g, Seq(pred), maxIterations)

  /** `(p1|p2|…)+` — transitive closure over the UNION of several
    * predicates' edge slices (the SPARQL alternation-under-closure path,
    * e.g. `(reportsTo|managedBy)+`): a hop may take any listed predicate.
    * Same semi-naive machinery as the single-predicate form; the edge
    * slice is one pushed `pred IN (…)` scan, with partition pruning
    * through an `IN` over the constant-folded bucket hashes.
    */
  def pathPlusAlt(g: PersistedGraph, preds: Seq[String],
                  maxIterations: Int = 64): DataFrame = {
    require(preds.nonEmpty, "empty predicate alternation")
    var slice = g.df.filter(col("pred").isin(preds: _*) && col("obj_iri").isNotNull)
    if (g.predBuckets > 0 && g.df.columns.contains("pred_bucket"))
      slice = slice.filter(preds
        .map(p => col("pred_bucket") === pmod(hash(lit(p)), lit(g.predBuckets)))
        .reduce(_ || _)) // each side folds to a literal → partition filter
    // no distinct here: fullClosure dedups its input itself — a second
    // Deduplicate would cost a redundant full shuffle of the edge slice
    val edges = slice.select(col("subj").as("s"), col("obj_iri").as("o"))
    fullClosure(edges, maxIterations, preds.mkString("|"))
  }

  /** Transitive closure of a bare (s, o) edge frame — [[pathPlus]] without
    * the predicate-slice front end, for callers that already hold edges
    * (entity-link outputs, diff batches). Same semi-naive machinery and
    * the same THROW on a live frontier at the iteration cap.
    */
  def closePairs(edges: DataFrame, maxIterations: Int = 64): DataFrame =
    fullClosure(edges.select(col("s"), col("o")), maxIterations, "closePairs")

  /** INCREMENTAL transitive-closure maintenance — the path twin of
    * [[Entailment.owlEntailIncremental]]: given the CLOSED pair set of a
    * relation (a [[pathPlus]]/[[closePairs]] output, columns (s, o)) and a
    * batch of NEW hop edges, return the closure of (old ∪ new) while
    * exploring only paths that USE a new edge.
    *
    * Every genuinely new pair decomposes as `C? ∘ (Δ ∘ (C ∪ Δ)*)` — any
    * old-edge subpath collapses to ONE closed pair because C is already
    * transitively closed. So: a semi-naive right-extension seeded at Δ
    * over the edge set C ∪ Δ (suffix paths alternate single C-pairs and
    * Δ-hops), then ONE prefix join with C. Per-batch cost scales with the
    * delta's reachability cone, never the standing closure — the
    * continuously-maintained-KG shape at 100 TB.
    */
  def pathPlusIncremental(closedPairs: DataFrame, newEdges: DataFrame,
                          maxIterations: Int = 64): DataFrame = {
    val c = closedPairs.select(col("s"), col("o")).localCheckpoint()
    val d = newEdges.select(col("s"), col("o")).distinct()
    incrementalSingleTask(c, d, maxIterations).getOrElse {
      val r = c.union(d).distinct()
      val suffix = seminaiveClosure(r, d, maxIterations, "pathPlusIncremental")
        .localCheckpoint()
      val prefixed = c.as("pc").join(suffix.as("px"), col("pc.o") === col("px.s"))
        .select(col("pc.s").as("s"), col("px.o").as("o"))
      c.union(suffix).union(prefixed).distinct()
    }
  }

  /** Single-task twin of the incremental decomposition `C ∪ (Δ ∘ (C∪Δ)*)
    * ∪ (C ∘ Δ ∘ (C∪Δ)*)` for standing closures under the
    * [[SingleTaskClosureMaxEdges]] threshold — same rationale as
    * [[singleTaskClosure]] (the three-stage DataFrame pipeline costs ~8
    * scheduler-bound jobs regardless of data size). Identical pair set:
    * the in-memory loop replays the exact seeded expansion, prefix join
    * and final distinct. None above the threshold or past the pair cap
    * (caller falls back to the distributed pipeline).
    */
  private def incrementalSingleTask(c: DataFrame, d: DataFrame,
                                    maxIterations: Int): Option[DataFrame] = {
    if (c.count() > SingleTaskClosureMaxEdges) return None
    val spark = c.sparkSession
    import spark.implicits._
    val input = c.select(lit(0).as("t"), col("s"), col("o"))
      .unionByName(d.select(lit(1).as("t"), col("s"), col("o")))
    val maxPairs = SingleTaskClosureMaxPairs
    val maxEdges = SingleTaskClosureMaxEdges
    val out = input.as[(Int, String, String)].coalesce(1).mapPartitions { it =>
      val cPairs = scala.collection.mutable.HashSet.empty[(String, String)]
      val dPairs = scala.collection.mutable.HashSet.empty[(String, String)]
      it.foreach { case (t, s, o) =>
        if (t == 0) cPairs.add((s, o)) else dPairs.add((s, o))
        // the pre-task count guards only the standing closure; the DELTA
        // is unsized until here — overflow falls back to the distributed
        // pipeline instead of eating the task heap
        if (dPairs.size > maxEdges)
          throw new IllegalStateException(OverflowMarker)
      }
      // hop edges r = C ∪ Δ, adjacency by source
      val adj = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[String]]()
      def addEdge(s: String, o: String): Unit = {
        var buf = adj.get(s)
        if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[String]; adj.put(s, buf) }
        buf += o
      }
      cPairs.foreach { case (s, o) => addEdge(s, o) }
      dPairs.foreach { case (s, o) => if (!cPairs.contains((s, o))) addEdge(s, o) }
      // seeded suffix expansion: Δ ∘ (C∪Δ)*
      val suffix = scala.collection.mutable.HashSet.empty[(String, String)]
      var delta = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      dPairs.foreach { p => if (suffix.add(p)) delta += p }
      var iter = 0
      while (delta.nonEmpty && iter < maxIterations) {
        iter += 1
        val next = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        delta.foreach { case (s, o) =>
          if (o != null) { // NULL hop nodes join nothing (SQL parity)
            val outs = adj.get(o)
            if (outs != null) outs.foreach { o2 =>
              if (suffix.add((s, o2))) next += ((s, o2))
            }
          }
        }
        if (suffix.size > maxPairs) throw new IllegalStateException(OverflowMarker)
        delta = next
      }
      if (delta.nonEmpty)
        throw new IllegalStateException(
          s"path closure (pathPlusIncremental) frontier still live after $maxIterations " +
            "iterations — raise maxIterations; a truncated closure would be silently wrong")
      // prefix join C ∘ suffix, then C ∪ suffix ∪ prefixed under set semantics
      val cByObj = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[String]]()
      cPairs.foreach { case (s, o) =>
        var buf = cByObj.get(o)
        if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[String]; cByObj.put(o, buf) }
        buf += s
      }
      val result = scala.collection.mutable.HashSet.empty[(String, String)]
      result ++= cPairs
      result ++= suffix
      suffix.foreach { case (ss, so) =>
        if (ss != null) { // NULL suffix source joins nothing (SQL parity)
          val pres = cByObj.get(ss)
          if (pres != null) pres.foreach { cs =>
            result.add((cs, so))
            if (result.size > maxPairs) throw new IllegalStateException(OverflowMarker)
          }
        }
      }
      result.iterator
    }.toDF("s", "o")
    SingleTaskFallback.materialize(out, OverflowMarker, "frontier still live")
  }

  /** Semi-naive transitive expansion — the shared fixpoint core of
    * [[pathPlusAlt]] and the [[Path.Plus]]/[[Path.Star]] cases of
    * [[evalPath]]: grow `seed` by repeatedly joining the newest DELTA (only)
    * against `edges` until no new (s, o) pair appears. Novelty is a
    * left-anti against the union of checkpointed accepted deltas (disjoint
    * by construction — shallow lineage, no growing-plan recompute);
    * iterations = graph diameter; cycles terminate naturally. Hitting
    * `maxIterations` with a live frontier THROWS — a silently truncated
    * closure is wrong answers, not a degraded mode.
    *
    * @param edgesIn (s, o) hop edges
    * @param seed    (s, o) starting pairs — the edges themselves for a full
    *                closure, or the single-source slice for a bound-endpoint
    *                closure (then only the reachable CONE is explored: at
    *                100 TB a `<x> p+ ?y` query never materializes the whole
    *                graph's closure)
    */
  private def seminaiveClosure(edgesIn: DataFrame, seed: DataFrame,
                               maxIterations: Int, what: String): DataFrame = {
    val edgesRaw = edgesIn.select(col("s"), col("o")).localCheckpoint()
    singleTaskClosure(edgesRaw, Some(seed.select(col("s"), col("o")).distinct()),
        maxIterations, what)
      .getOrElse(seminaiveClosureDistributed(edgesRaw, seed, maxIterations, what))
  }

  /** The distributed one-hop semi-naive loop (the pre-threshold shape). */
  private def seminaiveClosureDistributed(edgesRaw: DataFrame, seed: DataFrame,
                                          maxIterations: Int, what: String): DataFrame = {
    val edges = edgesRaw.select(col("s").as("e_s"), col("o").as("e_o"))
    var seen = seed.select(col("s"), col("o")).distinct().localCheckpoint()
    var delta = seen
    var frontierLive = !delta.isEmpty
    var iter = 0
    while (iter < maxIterations && frontierLive) {
      iter += 1
      val novel = delta.join(edges, col("o") === col("e_s"))
        .select(col("s"), col("e_o").as("o"))
        .distinct().as("d")
        .join(seen.as("a"),
          col("d.s") === col("a.s") && col("d.o") === col("a.o"), "left_anti")
        .localCheckpoint()
      delta = novel
      // one emptiness probe per iteration (the while-condition reuses it)
      frontierLive = !novel.isEmpty
      // accepted deltas are disjoint and individually checkpointed, so the
      // running union stays shallow-lineage and duplicate-free
      if (frontierLive) seen = seen.union(novel)
    }
    if (frontierLive)
      throw new IllegalStateException(
        s"path closure ($what) frontier still live after $maxIterations iterations " +
          "— raise maxIterations; a truncated closure would be silently wrong")
    seen
  }

  /** Edge-count threshold below which a closure runs as ONE in-memory task
    * — the same size-adaptive escape hatch [[ConnectedComponents.run]]
    * documents for its union–find path, for the same reason: the
    * distributed fixpoint costs `rounds × jobs/round × fixed scheduler
    * latency` regardless of data volume, and below this threshold that
    * driver-side tax dominates while every task is trivially small.
    * 500k string edges is ~25 MB in one task; the derived pair set is
    * additionally capped by [[SingleTaskClosureMaxPairs]] — a degenerate
    * graph (a long chain closes quadratically) overflows the cap and falls
    * back to the distributed loop instead of eating the task heap.
    */
  // vars, not vals: the distributed-path parity specs force the
  // distributed strategies by dropping the thresholds to 0 (and restore
  // them) — production code never writes these
  private[spark] var SingleTaskClosureMaxEdges: Long = 500000L
  private[spark] var SingleTaskClosureMaxPairs: Long = 20000000L

  private val OverflowMarker = "graft-single-task-closure-overflow"

  /** Try the single-task in-memory closure; None when the edge count is
    * over the threshold or the pair cap overflowed (caller falls back to
    * the distributed loop). SEEDED closures run the same one-hop
    * semi-naive expansion as [[seminaiveClosureDistributed]]; FULL
    * closures run semi-naive DOUBLING (novel pairs join the adjacency, so
    * covered path length doubles per round) — the same round semantics as
    * [[fullClosureDoubling]], so the `maxIterations` live-frontier
    * contract agrees across the size threshold. Traversal never continues
    * through a NULL hop node, matching the SQL equi-joins' null
    * rejection (null-endpoint SEED/edge pairs still surface in the
    * result, as they do distributed — they just extend nothing).
    */
  private def singleTaskClosure(edges: DataFrame, seed: Option[DataFrame],
                                maxIterations: Int, what: String): Option[DataFrame] = {
    if (edges.count() > SingleTaskClosureMaxEdges) return None
    val spark = edges.sparkSession
    import spark.implicits._
    val hasSeed = seed.isDefined
    val tagged = edges.select(lit(0).as("t"), col("s"), col("o"))
    val input = seed match {
      case Some(sd) => tagged.unionByName(sd.select(lit(1).as("t"), col("s"), col("o")))
      case None => tagged
    }
    val maxPairs = SingleTaskClosureMaxPairs
    val out = input.as[(Int, String, String)].coalesce(1).mapPartitions { it =>
      val adj = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[String]]()
      def addEdge(s: String, o: String): Unit = {
        var buf = adj.get(s)
        if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[String]; adj.put(s, buf) }
        buf += o
      }
      val seen = scala.collection.mutable.HashSet.empty[(String, String)]
      var delta = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      it.foreach { case (t, s, o) =>
        if (t == 0) {
          addEdge(s, o)
          if (!hasSeed && seen.add((s, o))) delta += ((s, o))
        } else if (seen.add((s, o))) delta += ((s, o))
      }
      var iter = 0
      while (delta.nonEmpty && iter < maxIterations) {
        iter += 1
        val next = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        delta.foreach { case (s, o) =>
          if (o != null) { // a NULL hop node joins nothing (SQL equi-join parity)
            val outs = adj.get(o)
            if (outs != null) outs.foreach { o2 =>
              if (seen.add((s, o2))) next += ((s, o2))
            }
          }
        }
        if (seen.size > maxPairs)
          throw new IllegalStateException(OverflowMarker)
        // FULL closure: doubling — the accepted novel pairs join the
        // adjacency, so the next round composes against the closure so
        // far (T_k), not just the edges
        if (!hasSeed) next.foreach { case (s, o) => addEdge(s, o) }
        delta = next
      }
      if (delta.nonEmpty)
        throw new IllegalStateException(
          s"path closure ($what) frontier still live after $maxIterations iterations " +
            "— raise maxIterations; a truncated closure would be silently wrong")
      seen.iterator
    }.toDF("s", "o")
    // materialize HERE so a pair-cap overflow (or the live-frontier throw)
    // surfaces now, unwrapped from Spark's task-failure envelope
    SingleTaskFallback.materialize(out, OverflowMarker, "frontier still live")
  }

  /** Full transitive closure by semi-naive PATH DOUBLING (the "smart" TC of
    * Valduriez & Boral / Ioannidis: `T_{k+1} = T_k ∪ (Δ_k ∘ T_k)`): round k
    * composes the last round's NOVEL pairs with the whole closure-so-far,
    * so the covered path length doubles per round — ceil(log₂ d) + 1
    * rounds for diameter d, against d rounds of one-hop expansion.
    * Correctness of the semi-naive restriction: a pair whose shortest path
    * length L lands in (2^{k-1}, 2^k] splits at its midpoint into a prefix
    * of length ⌈L/2⌉ ∈ (2^{k-2}, 2^{k-1}] — i.e. a pair that was NOVEL in
    * round k−1 — and a suffix already in the closure, so `Δ ∘ closure`
    * derives every new pair and the fixpoint is the exact transitive
    * closure (same pair set as one-hop semi-naive, verified by the
    * recursive-CTE oracles).
    *
    * Trade-off (guide §1.2 — algorithm first): each round shuffles the
    * accumulated closure instead of the edge slice, and a pair with many
    * midpoints is derived once per midpoint before the distinct — doubling
    * does O(log d) times more join work than one-hop expansion in the
    * worst case. What it buys is rounds: every round is a full shuffle
    * barrier whose scheduler/latency floor is paid serially (at bench
    * scale that floor IS the cost; on a cluster a deep closure pays d
    * barriers of stragglers). For the long-diameter closures this engine
    * actually runs (org trees, crawl chains — d ≈ log n or worse), log₂ d
    * barriers wins at every scale we can measure. Bound-endpoint closures
    * keep one-hop [[seminaiveClosure]]: their frontier is a cone slice,
    * and composing it with a full closure would drag in pairs outside the
    * cone.
    */
  private def fullClosure(edgesIn: DataFrame, maxIterations: Int,
                          what: String): DataFrame = {
    val e = edgesIn.select(col("s"), col("o")).distinct().localCheckpoint()
    singleTaskClosure(e, None, maxIterations, what)
      .getOrElse(fullClosureDoubling(e, maxIterations, what))
  }

  private def fullClosureDoubling(edgesIn: DataFrame, maxIterations: Int,
                                  what: String): DataFrame = {
    var seen = edgesIn
    var delta = seen
    var frontierLive = !delta.isEmpty
    var iter = 0
    while (iter < maxIterations && frontierLive) {
      iter += 1
      // renamed projections, not aliases: round 1 composes `seen` with
      // ITSELF, and the anti-join's left side derives from `seen` too —
      // alias-based column refs cannot disambiguate a true self-join
      val suffix = seen.select(col("s").as("c_s"), col("o").as("c_o"))
      val novel = delta.join(suffix, col("o") === col("c_s"))
        .select(col("s"), col("c_o").as("o"))
        .distinct()
        .join(seen.select(col("s").as("a_s"), col("o").as("a_o")),
          col("s") === col("a_s") && col("o") === col("a_o"), "left_anti")
        .select(col("s"), col("o"))
        .localCheckpoint()
      delta = novel
      frontierLive = !novel.isEmpty
      // the union of individually-checkpointed disjoint deltas: shallow
      // lineage, no re-materialization of the whole closure per round
      if (frontierLive) seen = seen.union(novel)
    }
    if (frontierLive)
      throw new IllegalStateException(
        s"path closure ($what) frontier still live after $maxIterations iterations " +
          "— raise maxIterations; a truncated closure would be silently wrong")
    seen
  }

  // --------------------------------------------------------------------
  // SPARQL 1.1 property-path algebra
  // --------------------------------------------------------------------

  /** A property-path expression (the SPARQL 1.1 path algebra — reference
    * role: rdf-microdata emits graphs INTO RDF.rb, whose SPARQL engine
    * serves path queries over them; here the engine itself is Spark).
    * Build with the constructors in [[Path]]; evaluate with [[evalPath]]
    * or embed in a BGP with [[bgpWithPaths]].
    */
  sealed trait Path
  object Path {
    /** Atomic predicate step `p` — one forward edge. The object may be an
      * IRI or a literal (a literal can TERMINATE a path but never continues
      * it: literals are never subjects).
      */
    final case class P(iri: String) extends Path
    /** Inverse `^p` — traverses object→subject. */
    final case class Inv(p: Path) extends Path
    /** Sequence `p1/p2/…` — each step starts where the previous ended. */
    final case class Chain(ps: Seq[Path]) extends Path
    /** Alternation `p1|p2|…` — a step may take any branch. */
    final case class Alt(ps: Seq[Path]) extends Path
    /** One-or-more `p+` — transitive closure (semi-naive fixpoint). */
    final case class Plus(p: Path) extends Path
    /** Zero-or-more `p*` — [[Plus]] plus the zero-length pairs. */
    final case class Star(p: Path) extends Path
    /** Zero-or-one `p?` — one step or the zero-length pairs. */
    final case class Opt(p: Path) extends Path
    /** Negated property set `!(p1|…|^q1|…)` (SPARQL splits the set by
      * direction): a `forward=Some(ex)` side matches ONE forward edge whose
      * predicate is NOT in `ex`; an `inverse=Some(ex)` side matches one
      * inverse edge likewise; a side left `None` matches nothing in that
      * direction. `NegSet(Some(Nil))` is the forward wildcard (any one
      * edge). A negated set scans every predicate BUT the listed ones, so
      * `pred_bucket` pruning does not apply — by nature, not omission.
      */
    final case class NegSet(forward: Option[Seq[String]],
                            inverse: Option[Seq[String]] = None) extends Path {
      require(forward.isDefined || inverse.isDefined,
        "NegSet with neither direction matches nothing — give forward and/or inverse exclusions")
    }
    /** `!(iris…)` — any one forward edge whose predicate is none of `iris`. */
    def notOneOf(iris: String*): NegSet = NegSet(Some(iris))
    /** Any one forward edge, whatever its predicate. */
    val wildcard: NegSet = NegSet(Some(Nil))
  }

  /** Human-readable SPARQL-ish rendering (error messages, logs). */
  def render(p: Path): String = p match {
    case Path.P(iri) => s"<$iri>"
    case Path.Inv(q) => s"^${render(q)}"
    case Path.Chain(ps) => ps.map(render).mkString("(", "/", ")")
    case Path.Alt(ps) => ps.map(render).mkString("(", "|", ")")
    case Path.Plus(q) => render(q) + "+"
    case Path.Star(q) => render(q) + "*"
    case Path.Opt(q) => render(q) + "?"
    case Path.NegSet(f, i) =>
      val names = f.getOrElse(Nil).map(x => s"<$x>") ++
        i.getOrElse(Nil).map(x => s"^<$x>")
      s"!(${names.mkString("|")})"
  }

  /** Evaluate a property path to its distinct (s, o) pairs over the whole
    * graph. For bound-endpoint evaluation (`<x> path ?y`), prefer
    * [[bgpWithPaths]] with a constant term — closures then explore only
    * the reachable cone instead of materializing the full closure.
    *
    * Scale shape: atomic steps are pushed constant-pred scans with
    * `pred_bucket` partition pruning on a [[ExtractPipeline.writeGraph]]
    * layout; [[Path.Inv]] is a column swap (free); [[Path.Chain]] is a
    * chain of co-partitioned equi-joins on the hop node; [[Path.Alt]] is a
    * metadata-only union of independently-pruned scans; [[Path.Plus]] runs
    * the [[seminaiveClosure]] fixpoint. [[Path.Star]]/[[Path.Opt]] with
    * BOTH endpoints unbound must emit the zero-length pair of every graph
    * node (SPARQL's ZeroLengthPath) — a full node-set scan; bind an
    * endpoint when you don't need that.
    */
  def evalPath(g: PersistedGraph, path: Path, maxIterations: Int = 64): DataFrame =
    pathFrame(g, path, None, None, maxIterations).distinct()

  /** Atomic forward edges for one predicate: pushed equality +
    * constant-folded bucket pruning, object coalesced to one term domain.
    * The coalesce matches the BGP engine's string-typed binding columns
    * (literal-terminal paths bind their lexical form). Known limitation of
    * the string domain: a literal whose lexical form EQUALS an IRI in the
    * graph is indistinguishable from it at a chaining join — exact typed
    * paths would carry a term-kind column through every binding frame.
    */
  private def atomEdges(g: PersistedGraph, iri: String): DataFrame = {
    var df = g.df.filter(col("pred") === iri)
    if (g.predBuckets > 0 && g.df.columns.contains("pred_bucket"))
      df = df.filter(col("pred_bucket") === pmod(hash(lit(iri)), lit(g.predBuckets)))
    df.select(col("subj").as("s"),
      coalesce(col("obj_iri"), col("obj_lexical")).as("o"))
  }

  /** Zero-length pairs (SPARQL ZeroLengthPath): a bound endpoint matches
    * itself; both unbound matches every node occurring in the graph
    * (subjects ∪ objects — one distinct over two projected scans).
    */
  private def zeroLength(g: PersistedGraph, src: Option[String],
                         dst: Option[String]): DataFrame = {
    val spark = g.df.sparkSession
    (src, dst) match {
      case (Some(a), Some(b)) =>
        spark.range(if (a == b) 1 else 0).select(lit(a).as("s"), lit(b).as("o"))
      case (Some(a), None) => spark.range(1).select(lit(a).as("s"), lit(a).as("o"))
      case (None, Some(b)) => spark.range(1).select(lit(b).as("s"), lit(b).as("o"))
      case (None, None) =>
        g.df.select(col("subj").as("n"))
          .unionByName(g.df.select(
            coalesce(col("obj_iri"), col("obj_lexical")).as("n")))
          .distinct()
          .select(col("n").as("s"), col("n").as("o"))
    }
  }

  /** Recursive path evaluation to an (s, o) frame (not necessarily
    * distinct — [[evalPath]]/[[compilePath]] add the final distinct).
    * `src`/`dst` are endpoint CONSTANTS pushed as deep as the algebra
    * allows: into both sides of [[Path.Alt]], the outer steps of a
    * [[Path.Chain]], the swapped slots of [[Path.Inv]], and the closure
    * SEED of [[Path.Plus]]/[[Path.Star]] (single-source semi-naive — the
    * reachable cone, never the full closure).
    */
  private def pathFrame(g: PersistedGraph, path: Path, src: Option[String],
                        dst: Option[String], maxIter: Int): DataFrame = {
    def bound(df: DataFrame): DataFrame = {
      var d = df
      src.foreach(v => d = d.filter(col("s") === v))
      dst.foreach(v => d = d.filter(col("o") === v))
      d
    }
    path match {
      case Path.P(iri) => bound(atomEdges(g, iri))

      case Path.NegSet(fwd, inv) =>
        val fw = fwd.map { ex =>
          val base = if (ex.isEmpty) g.df else g.df.filter(!col("pred").isin(ex: _*))
          base.select(col("subj").as("s"),
            coalesce(col("obj_iri"), col("obj_lexical")).as("o"))
        }
        val iv = inv.map { ex =>
          val base = if (ex.isEmpty) g.df else g.df.filter(!col("pred").isin(ex: _*))
          base.select(coalesce(col("obj_iri"), col("obj_lexical")).as("s"),
            col("subj").as("o"))
        }
        bound((fw.toSeq ++ iv.toSeq).reduce(_ unionByName _))

      case Path.Inv(p) =>
        pathFrame(g, p, dst, src, maxIter)
          .select(col("o").as("s"), col("s").as("o"))

      case Path.Chain(ps) =>
        require(ps.nonEmpty, "empty path sequence")
        if (ps.size == 1) pathFrame(g, ps.head, src, dst, maxIter)
        else {
          val frames = ps.zipWithIndex.map { case (q, i) =>
            pathFrame(g, q,
              if (i == 0) src else None,
              if (i == ps.size - 1) dst else None, maxIter).distinct()
          }
          frames.reduce { (a, b) =>
            a.as("pl").join(b.as("pr"), col("pl.o") === col("pr.s"))
              .select(col("pl.s").as("s"), col("pr.o").as("o"))
          }
        }

      case Path.Alt(ps) =>
        require(ps.nonEmpty, "empty path alternation")
        ps.map(pathFrame(g, _, src, dst, maxIter)).reduce(_ unionByName _)

      case Path.Plus(p) =>
        val edges = pathFrame(g, p, None, None, maxIter).distinct()
        (src, dst) match {
          case (Some(v), d) =>
            val cone = seminaiveClosure(edges,
              edges.filter(col("s") === v), maxIter, render(path))
            d.map(w => cone.filter(col("o") === w)).getOrElse(cone)
          case (None, Some(w)) => // single-TARGET: explore the reverse cone
            val rev = edges.select(col("o").as("s"), col("s").as("o"))
            seminaiveClosure(rev, rev.filter(col("s") === w), maxIter, render(path))
              .select(col("o").as("s"), col("s").as("o"))
          case _ => fullClosure(edges, maxIter, render(path))
        }

      case Path.Star(p) =>
        pathFrame(g, Path.Plus(p), src, dst, maxIter)
          .unionByName(zeroLength(g, src, dst))

      case Path.Opt(p) =>
        pathFrame(g, p, src, dst, maxIter)
          .unionByName(zeroLength(g, src, dst))
    }
  }

  /** One path pattern → (bindings frame, variable names), the path twin of
    * [[compile]]: constant endpoints push into [[pathFrame]] (closures
    * explore only the bound cone); a repeated variable (`?x path ?x`)
    * becomes an equality filter.
    */
  private def compilePath(g: PersistedGraph, sTerm: Term, path: Path,
                          oTerm: Term, maxIter: Int): (DataFrame, Seq[String]) = {
    val src = sTerm match { case C(v) => Some(v); case _ => None }
    val dst = oTerm match { case C(v) => Some(v); case _ => None }
    val df = pathFrame(g, path, src, dst, maxIter).distinct()
    (sTerm, oTerm) match {
      case (V(a), V(b)) if a == b =>
        (df.filter(col("s") === col("o")).select(col("s").as(a)), Seq(a))
      case (V(a), V(b)) => (df.select(col("s").as(a), col("o").as(b)), Seq(a, b))
      case (V(a), C(_)) => (df.select(col("s").as(a)), Seq(a))
      case (C(_), V(b)) => (df.select(col("o").as(b)), Seq(b))
      case (C(_), C(_)) =>
        throw new IllegalArgumentException(
          "variable-free path pattern — evaluate evalPath with both endpoints bound separately")
    }
  }

  /** Estimated result rows for a path pattern — a RANKING heuristic for
    * the greedy join order, same contract as [[estimate]] (consistent
    * ordering, not cardinality prediction): atoms cost their predicate
    * frequency, a sequence its narrowest step, an alternation the branch
    * sum, a closure 4× its edge slice, zero-length forms add the node-set
    * term; each bound endpoint discounts 100×.
    */
  private[spark] def pathEstimate(p: (Term, Path, Term),
                                  stats: Map[String, Long]): Long = {
    val total =
      if (stats.nonEmpty) math.max(stats.valuesIterator.sum, 1L) else Long.MaxValue / 4
    val cap = Long.MaxValue / 4
    def go(q: Path): Long = q match {
      case Path.P(iri) => if (stats.nonEmpty) stats.getOrElse(iri, 0L) else total
      case Path.Inv(r) => go(r)
      case Path.Chain(ps) => ps.map(go).min
      case Path.Alt(ps) => // saturating sum: the no-stats sentinel is cap-sized
        ps.map(go).foldLeft(0L)((a, b) => if (a > cap - b) cap else a + b)
      case Path.Plus(r) => math.min(go(r), cap / 4) * 4
      case Path.Star(r) => math.min(math.min(go(r), cap / 4) * 4 + math.min(total, cap / 2), cap)
      case Path.Opt(r) => if (go(r) > cap - total) cap else go(r) + total
      case Path.NegSet(_, _) => total
    }
    val consts = Seq(p._1, p._3).count(_.isInstanceOf[C])
    (0 until consts).foldLeft(go(p._2))((e, _) => if (e > 0) math.max(e / 100, 1L) else 0L)
  }

  /** BGP extended with property-path patterns: `patterns` solve exactly as
    * [[bgp]]; each `(s, path, o)` in `pathPatterns` compiles to the path's
    * distinct (s, o) binding frame ([[compilePath]] — bound endpoints push
    * into the evaluation, so a `<x> p+ ?y` pattern explores only x's
    * cone); all frames then join through the same selectivity-greedy
    * connected order ([[greedyJoin]]), path frames costed by
    * [[pathEstimate]]. Disconnected pattern sets are refused like in
    * [[bgp]]. Variables surface in first-mention order, triple patterns
    * before path patterns.
    */
  def bgpWithPaths(g: PersistedGraph, patterns: Seq[(Term, Term, Term)],
                   pathPatterns: Seq[(Term, Path, Term)],
                   maxIterations: Int = 64): DataFrame = {
    require(patterns.nonEmpty || pathPatterns.nonEmpty, "empty BGP")
    require(patterns.forall(p => Seq(p._1, p._2, p._3).exists(_.isInstanceOf[V])),
      "variable-free patterns (pure existence checks) are not supported: " +
        "they cannot join on a shared variable — evaluate the constant " +
        "triple separately and gate the query on its result")
    require(pathPatterns.forall(p => Seq(p._1, p._3).exists(_.isInstanceOf[V])),
      "variable-free path patterns are not supported — evaluate evalPath " +
        "with both endpoints bound separately and gate the query on its result")
    val tripleItems = patterns.map { p =>
      val (df, vars) = compile(g.df, p, g.predBuckets)
      val subjVar = p._1 match { case V(n) => n; case _ => null }
      (df, vars, subjVar, estimate(p, g.stats))
    }
    val pathItems = pathPatterns.map { pp =>
      val (df, vars) = compilePath(g, pp._1, pp._2, pp._3, maxIterations)
      // a path frame is closure/join output, never the bucketed scan — no
      // subject-star preference applies
      (df, vars, null: String, pathEstimate(pp, g.stats))
    }
    val outVars = (patterns.flatMap(p => Seq(p._1, p._2, p._3)) ++
        pathPatterns.flatMap(p => Seq(p._1, p._3)))
      .collect { case V(n) => n }.distinct
    greedyJoin(tripleItems ++ pathItems, outVars)
  }
}
