package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator family from SURVEY.md §2
  * (the reference's extraction/validation semantics re-expressed relationally
  * over the driver's parquet tables), with a DuckDB-equivalent oracle in
  * [[oracleSql]]. Extraction itself (HTML/PDF → text, byte-identity) is
  * tested in ScalaTest over synthetic `pages` fixtures (no SQL oracle can
  * express it) and surfaced here through the `x_*` queries.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Relational queries (SURVEY §2.2–§2.7 operator inventory, re-expressed
  // over the driver tables so DuckDB can oracle them).
  // ---------------------------------------------------------------------

  /** A4/A5-style grouped aggregation with partial/final agg (SURVEY §2.4). */
  private def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** J2-style equi-join + grouped agg + deterministic top-k (SURVEY §2.3/§2.6). */
  private def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust  = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord   = t(s, dir, "orders")
    val li    = t(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** W1-style running aggregate over an ordered frame (SURVEY §2.5). */
  private def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .filter(col("l_suppkey") <= 3)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        round(sum(col("l_quantity")).over(w), 2).as("running_qty"))
  }

  /** A2 best-candidate argmax (top-1 per group with explicit tie-break),
    * the reference's best-table pick (text_extractor_all.py:209-216). */
  private def qArgmaxBestEvent(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("best_event_id"),
        round(col("value"), 4).as("best_value"))
  }

  /** W1 running section label: last-non-null carry-forward scan
    * (text_extractor_all.py:287-291) — here: last marker event per user. */
  private def qSectionCarry(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("section",
        coalesce(
          last(when(col("event_type").isin("signup", "login"), col("event_type")),
            ignoreNulls = true).over(w),
          lit("UNLABELED")))
      .select(col("event_id"), col("user_id"), col("section"))
  }

  /** Semi/anti join semantics (golden↔prediction pairing J2/J3 "skip missing"
    * is inner+left_anti; SURVEY §2.3). */
  private def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Set operation (candidate-union/except analogue, SURVEY §2.7):
    * parts shipped in 1995 but never in 1996. */
  private def qSetExcept(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val in95 = li.filter(year(col("l_shipdate")) === 1995).select(col("l_partkey")).distinct()
    val in96 = li.filter(year(col("l_shipdate")) === 1996).select(col("l_partkey")).distinct()
    in95.except(in96)
  }

  /** J1 — the reference's XBRL↔table theta join (xbrl_validate.py:104-146),
    * re-expressed as a *banded equi-join* + exact tolerance filter instead of
    * a nested loop: facts = part retail prices, cells = lineitem prices,
    * scales {1, 1000}, tolerance max(0.01, 0.001·|fact|).
    * The band key makes the join an equi-join Catalyst can hash/broadcast;
    * the oracle states the naive theta-join — same result set. */
  private def qThetaBand(s: SparkSession, dir: String): DataFrame = {
    val bandW = 2048.0 // >= 2 * max tolerance (0.001 * 5e5 = 500)
    val facts = t(s, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"))
      .withColumn("band", explode(sequence(
        floor(col("p_retailprice") / bandW) - 1, floor(col("p_retailprice") / bandW) + 1)))
    val cells = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("scale", explode(array(lit(1.0), lit(1000.0))))
      .withColumn("scaled", col("l_extendedprice") * col("scale"))
      .withColumn("band", floor(col("scaled") / bandW))
    cells.join(broadcast(facts), "band")
      .filter(abs(col("scaled") - col("p_retailprice")) <=
        greatest(lit(0.01), lit(0.001) * abs(col("p_retailprice"))))
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("p_partkey"))
  }

  // ---------------------------------------------------------------------
  // Training-data-pipeline ops over `documents` / `embeddings`.
  // ---------------------------------------------------------------------

  /** Exact deduplication: group identical text, keep the smallest doc_id. */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  /** Word-set Jaccard near-dup pairs within a `source` bucket (bounded
    * candidate space — the exact-verify stage of a MinHash/LSH pipeline). */
  private def qJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        array_distinct(split(col("text"), " ")).as("words"))
    val a = docs.select(col("source"), col("doc_id").as("id_a"), col("words").as("wa"))
    val b = docs.select(col("source"), col("doc_id").as("id_b"), col("words").as("wb"))
    a.join(b, Seq("source")).filter(col("id_a") < col("id_b"))
      .withColumn("jac",
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))).cast("double"))
      .filter(col("jac") >= 0.8)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
  }

  /** Token counting + quality scoring (length / word-length / stopword ratio). */
  private def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
    t(s, dir, "documents")
      .withColumn("tokens", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        round(col("n_chars").cast("double") / size(col("tokens")), 4).as("avg_token_len"),
        round(size(filter(col("tokens"), tk => array_contains(stop, tk))).cast("double")
          / size(col("tokens")), 4).as("stopword_ratio"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _,
    "q3_top_revenue"     -> q3TopRevenue _,
    "q_window_running"   -> qWindowRunning _,
    "q_argmax_best"      -> qArgmaxBestEvent _,
    "q_section_carry"    -> qSectionCarry _,
    "q_anti_join"        -> qAntiJoin _,
    "q_set_except"       -> qSetExcept _,
    "q_theta_band"       -> qThetaBand _,
    "q_dedup_exact"      -> qDedupExact _,
    "q_jaccard_pairs"    -> qJaccardPairs _,
    "q_text_quality"     -> qTextQuality _,
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  round(sum(l_quantity) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem
        |WHERE l_suppkey <= 3""".stripMargin,
    "q_argmax_best" ->
      """SELECT user_id, best_event_id, best_value FROM (
        |  SELECT user_id, event_id AS best_event_id, round(value, 4) AS best_value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_section_carry" ->
      """SELECT event_id, user_id,
        |  coalesce(last_value(CASE WHEN event_type IN ('signup','login')
        |      THEN event_type END IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'UNLABELED') AS section
        |FROM events""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin,
    "q_set_except" ->
      """SELECT DISTINCT l_partkey FROM lineitem WHERE year(l_shipdate) = 1995
        |EXCEPT
        |SELECT DISTINCT l_partkey FROM lineitem WHERE year(l_shipdate) = 1996""".stripMargin,
    "q_theta_band" ->
      """SELECT p_partkey, count(*) AS n_matches
        |FROM part, lineitem, (SELECT unnest([1.0, 1000.0]) AS scale) scales
        |WHERE abs(l_extendedprice * scale - p_retailprice)
        |      <= greatest(0.01, 0.001 * abs(p_retailprice))
        |GROUP BY p_partkey
        |ORDER BY p_partkey""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY text""".stripMargin,
    "q_jaccard_pairs" ->
      """WITH d AS (SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS words
        |           FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.words, b.words))) AS DOUBLE), 4) AS jaccard
        |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.words, b.words))) AS DOUBLE) >= 0.8""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_token_len,
        |  round(CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','a','of','and','to'))) AS DOUBLE)
        |    / len(string_split(text, ' ')), 4) AS stopword_ratio
        |FROM documents""".stripMargin,
  )
}
