package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic transcript tables (BASELINE.json input_hint shape:
  * conv_id, turn_idx, role, text, tool, ts) whose `text` embeds microdata
  * markup derived from the driver-generated TPC-H-ish tables.
  *
  * Every template here is reproducible in ANSI SQL (DuckDB printf), which is
  * what makes the end-to-end correctness gate strong: the oracle reconstructs
  * the *expected triples* straight from the source tables while Spark runs
  * the full parse→extract→canonicalize path.
  *
  * Generation is fully distributed (column expressions over the source
  * tables, no driver-side data), so the same builders scale with the input.
  */
object Transcripts {

  private def readTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** One turn per customer; conversations of ~15 turns keyed by custkey%100.
    * Turns where custkey%7==0 carry no markup (exercises the scan
    * pre-filter). Markup: typed Person item with itemid, literal + typed +
    * content-attr properties, a nested typed Country item shared across
    * customers of one nation, and an additionalType link that the registry
    * expands to rdf:type.
    */
  def customers(spark: SparkSession, sfDir: String): DataFrame = {
    val c = readTable(spark, sfDir, "customer")
    val n = readTable(spark, sfDir, "nation")
    val markup = format_string(
      "Here is customer %d: <div itemscope itemtype=\"http://schema.org/Person\" itemid=\"http://ex.org/customer/%d\" lang=\"en\"><span itemprop=\"name\">%s</span><data itemprop=\"acctbal\" value=\"%s\"/><span itemprop=\"segment\" content=\"%s\">segment</span><div itemprop=\"nation\" itemscope itemtype=\"http://schema.org/Country\" itemid=\"http://ex.org/nation/%d\"><span itemprop=\"name\">%s</span></div><link itemprop=\"additionalType\" href=\"http://ex.org/class/Customer\"></div> done.",
      col("c_custkey"), col("c_custkey"), col("c_name"),
      col("c_acctbal").cast("decimal(12,2)").cast("string"),
      col("c_mktsegment"), col("c_nationkey").cast("long"), col("n_name"))
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        concat(lit("conv-"), (col("c_custkey") % 100).cast("string")).as("conv_id"),
        (col("c_custkey") / 100).cast("int").as("turn_idx"),
        element_at(array(lit("user"), lit("assistant"), lit("tool")),
          (col("c_custkey") % 3).cast("int") + 1).as("role"),
        when(col("c_custkey") % 7 === 0,
          format_string("Let me look up customer %d for you.", col("c_custkey")))
          .otherwise(markup).as("text"),
        when(col("c_custkey") % 3 === 2, lit("kb_lookup")).otherwise(lit(null)).as("tool"),
        (to_timestamp(lit("2026-01-01 00:00:00")).cast("long") +
          (col("c_custkey") / 100).cast("long") * 60L).cast("timestamp").as("ts"))
  }

  /** One turn per 20th order: two items (Order, Invoice) sharing one
    * itemref'd element — the cross-item structure-sharing case
    * (reference fixture example2) — plus a time→xsd:date property.
    * Vocabulary comes from the https://schema.org/ registry entry.
    */
  def orders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = readTable(spark, sfDir, "orders").filter(col("o_orderkey") % 20 === 0)
    val markup = format_string(
      "Order update: <div itemscope itemtype=\"https://schema.org/Order\" itemid=\"http://ex.org/order/%d\" itemref=\"m%d\"></div><div itemscope itemtype=\"https://schema.org/Invoice\" itemid=\"http://ex.org/invoice/%d\" itemref=\"m%d\"></div><p id=\"m%d\"><span itemprop=\"orderStatus\">%s</span><time itemprop=\"orderDate\" datetime=\"%s\">that day</time></p>",
      col("o_orderkey"), col("o_orderkey"), col("o_orderkey"), col("o_orderkey"),
      col("o_orderkey"), col("o_orderstatus"), date_format(col("o_orderdate"), "yyyy-MM-dd"))
    o.select(
      concat(lit("oconv-"), (col("o_orderkey") % 50).cast("string")).as("conv_id"),
      // orderkey/20 is unique per filtered row (keys are multiples of 20),
      // so (conv_id, turn_idx) — and therefore docId — never collides
      // across distinct documents (orderkey/1000 collapsed 10 docs per key)
      (col("o_orderkey") / 20).cast("int").as("turn_idx"),
      lit("assistant").as("role"),
      markup.as("text"),
      lit(null).cast("string").as("tool"),
      col("o_orderdate").as("ts"))
  }

  /** One turn per supplier: reverse property (@itemprop-reverse) — the
    * offer→seller edge points *at* the item.
    */
  def suppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val s = readTable(spark, sfDir, "supplier")
    val markup = format_string(
      "Supplier card: <div itemscope itemtype=\"http://schema.org/Organization\" itemid=\"http://ex.org/supplier/%d\"><span itemprop=\"name\">%s</span><link itemprop-reverse=\"seller\" href=\"http://ex.org/offer/%d\"></div>",
      col("s_suppkey"), col("s_name"), col("s_suppkey"))
    s.select(
      concat(lit("sconv-"), (col("s_suppkey") % 10).cast("string")).as("conv_id"),
      (col("s_suppkey") / 10).cast("int").as("turn_idx"),
      lit("tool").as("role"),
      markup.as("text"),
      lit("catalog").as("tool"),
      to_timestamp(lit("2026-02-01 00:00:00")).as("ts"))
  }

  /** Four turns per customer, each carrying one ANONYMOUS Person mention
    * (no itemid → skolem subject) with two identifying `contact` keys that
    * chain across the turns: mention j holds keys (j, j+1). The four
    * mentions of one customer are therefore only *transitively* linkable —
    * the multi-hop case the connected-components canonicalizer exists for.
    */
  def mentions(spark: SparkSession, sfDir: String): DataFrame = {
    val c = readTable(spark, sfDir, "customer")
      .select(col("c_custkey"), explode(array(lit(1), lit(2), lit(3), lit(4))).as("j"))
    val markup = format_string(
      "Contact card: <div itemscope itemtype=\"http://schema.org/Person\"><span itemprop=\"contact\">key-%d-%d</span><span itemprop=\"contact\">key-%d-%d</span></div>",
      col("c_custkey"), col("j"), col("c_custkey"), col("j") + 1)
    c.select(
      concat(lit("mconv-"), col("c_custkey").cast("string")).as("conv_id"),
      col("j").cast("int").as("turn_idx"),
      lit("assistant").as("role"),
      markup.as("text"),
      lit(null).cast("string").as("tool"),
      to_timestamp(lit("2026-03-01 00:00:00")).as("ts"))
  }

  /** One turn per customer carrying an org-chart card: employee
    * `http://ex.org/emp/K` reports to `http://ex.org/emp/K div 2` (a
    * binary tree over the custkeys, depth log2 N — the multi-HOP relation
    * [[GraphQuery.pathPlus]] exists for; the customer KG's relations are
    * all single-hop). Custkey 1 is the root and carries no reportsTo
    * link. The manager IRI is derived with integer division on BOTH
    * sides (`div` here, `//` in the DuckDB oracle) so the edge sets are
    * bit-identical at any scale.
    */
  def orgChart(spark: SparkSession, sfDir: String): DataFrame = {
    val c = readTable(spark, sfDir, "customer")
    val markup = format_string(
      "Org card: <div itemscope itemtype=\"http://schema.org/Person\" itemid=\"http://ex.org/emp/%d\"><span itemprop=\"name\">%s</span>%s</div>",
      col("c_custkey"), col("c_name"),
      when(col("c_custkey") > 1,
          format_string("<link itemprop=\"reportsTo\" href=\"http://ex.org/emp/%d\">",
            expr("CAST(c_custkey AS BIGINT) div 2")))
        .otherwise(lit("")))
    c.select(
      concat(lit("oconv-"), (col("c_custkey") % 100).cast("string")).as("conv_id"),
      (col("c_custkey") / 100).cast("int").as("turn_idx"),
      lit("assistant").as("role"),
      markup.as("text"),
      lit(null).cast("string").as("tool"),
      to_timestamp(lit("2026-04-01 00:00:00")).as("ts"))
  }

  /** Purely synthetic transcripts at arbitrary scale for the benchmark:
    * `spark.range`-driven (fully distributed, deterministic, seedless),
    * with conv_id skew (~10% of turns land in 1% of conversations — the
    * hot-conversation case the north rule calls out), a mix of markup
    * shapes, and ~1/4 markup-free turns.
    */
  def synthetic(spark: SparkSession, nTurns: Long, nConvs: Long): DataFrame = {
    val id = col("id")
    // skew: ids divisible by 10 collapse onto nConvs/100 hot conversations
    val hotConvs = math.max(nConvs / 100, 1L)
    val convNum = when(id % 10 === 0, id % hotConvs).otherwise(id % nConvs)
    val person = format_string(
      "Profile: <div itemscope itemtype=\"http://schema.org/Person\" itemid=\"http://ex.org/person/%d\" lang=\"en\"><span itemprop=\"name\">Person %d</span><data itemprop=\"score\" value=\"%d\"/><time itemprop=\"seen\" datetime=\"2026-01-01\">then</time><div itemprop=\"org\" itemscope itemtype=\"http://schema.org/Organization\" itemid=\"http://ex.org/org/%d\"><span itemprop=\"name\">Org %d</span></div><link itemprop=\"additionalType\" href=\"http://ex.org/class/P\"></div>",
      id % 100000, id, id % 97, id % 500, id % 500)
    val article = format_string(
      "Note: <div itemscope itemtype=\"http://schema.org/Article\"><span itemprop=\"headline\">Headline %d</span><meta itemprop=\"wordCount\" content=\"%d\"><a itemprop=\"url\" href=\"http://ex.org/a/%d\">link</a></div> end.",
      id, id % 1000, id)
    val shared = format_string(
      "<div itemscope itemtype=\"http://schema.org/Order\" itemid=\"http://ex.org/o/%d\" itemref=\"z%d\"></div><p id=\"z%d\"><span itemprop=\"orderStatus\">S%d</span></p>",
      id, id, id, id % 5)
    spark.range(0, nTurns).select(
      concat(lit("bconv-"), convNum.cast("string")).as("conv_id"),
      // hot rows index their turns by hotConvs so (conv_id, turn_idx)
      // stays unique inside hot conversations too — the skew remap would
      // otherwise give many turns of one hot conv the same turn_idx and
      // collapse their docIds
      when(id % 10 === 0, (id / hotConvs).cast("int"))
        .otherwise((id / nConvs).cast("int")).as("turn_idx"),
      element_at(array(lit("user"), lit("assistant"), lit("tool")),
        (id % 3).cast("int") + 1).as("role"),
      when(id % 4 === 3, format_string("Plain chat turn %d with no structured data.", id))
        .when(id % 4 === 0, person)
        .when(id % 4 === 1, article)
        .otherwise(shared).as("text"),
      lit(null).cast("string").as("tool"),
      (to_timestamp(lit("2026-01-01 00:00:00")).cast("long") + (id % 86400))
        .cast("timestamp").as("ts"))
  }
}
