package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The driver-verified relational operator catalog: each entry is a ▸
  * operator from SURVEY.md §2 expressed Spark-first over the driver's
  * testdata tables, with an equivalent ANSI-SQL oracle for DuckDB.
  *
  * Conventions keeping the Spark/DuckDB comparison byte-stable:
  *   - every computed column is aliased identically on both sides
  *   - every result carries a total ORDER BY on key columns
  *   - derived doubles are round()ed (raw column passthroughs stay exact)
  *   - DuckDB integer sums are cast to BIGINT (it defaults to HUGEINT)
  *   - DuckDB regexp_replace gets the 'g' flag (Spark replaces all by default)
  */
object RelationalQueries {

  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---------- CDC / merge-pattern family (events table ≈ change log) ----------

  /** M1/M6 ▸ last-writer-wins merge resolve: latest event per key via
    * max_by(struct, lsn) — the exact dedup kernel of the engine
    * (reference: MERGE matched-arm semantics,
    * Scripts/python/enhanced_main_etl.py:778-821).
    */
  private val m1 = Q("m1_merge_lww",
    (spark, dir) => {
      val e = t(spark, dir, "events")
      e.groupBy(col("user_id"), col("event_type"))
        .agg(max_by(struct(e.columns.map(col).toSeq: _*), col("event_id")).as("e"))
        .select(col("user_id"), col("event_type"),
          col("e.event_id").as("last_event_id"),
          round(col("e.value"), 4).as("last_value"),
          col("e.ts").as("last_ts"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, event_id AS last_event_id,
            round(value, 4) AS last_value, ts AS last_ts
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                               ORDER BY event_id DESC) AS rn FROM events)
            WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** T3 ▸ per-partition LSN frontier (monotone sequence high-watermark,
    * reference: line_no/identity ordering, Scripts/database_schema.sql:147,208).
    */
  private val t3 = Q("t3_lsn_frontier",
    (spark, dir) =>
      t(spark, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(col("event_id")).as("last_event_id"), count(lit(1)).as("n_events"))
        .orderBy("user_id"),
    Some("""SELECT user_id, max(event_id) AS last_event_id, count(*) AS n_events
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** J5 ▸ anti-join idempotency filter: events of the stream's second half
    * whose (user_id, value-bucket) key was never seen in the first half —
    * the "skip already-loaded keys" dedup
    * (reference: Docs/etl_requirements_reviewed_by_sr.md:163-165).
    */
  private val j5 = Q("j5_anti_join_dedup",
    (spark, dir) => {
      val e = t(spark, dir, "events")
      // Scalar threshold as a broadcast 1-row aggregate crossJoin — the
      // whole query is ONE plan / one job (a driver-side `.head` probe
      // would force a second job and a full extra scan at scale).
      val k = broadcast(e.agg(floor(max(col("event_id")) / 2.0).cast("long").as("kv")))
      val withK = e.crossJoin(k).withColumn("vb", floor(col("value")).cast("long"))
      val existing = withK.filter(col("event_id") <= col("kv"))
        .select(col("user_id"), col("vb")).distinct()
      withK.filter(col("event_id") > col("kv"))
        .join(existing, Seq("user_id", "vb"), "left_anti")
        .select(col("event_id"), col("user_id"), col("event_type"), col("vb"))
        .orderBy("event_id")
    },
    Some("""WITH k AS (SELECT CAST(floor(max(event_id)/2.0) AS BIGINT) AS kv FROM events),
            ex AS (SELECT DISTINCT user_id, CAST(floor(value) AS BIGINT) AS vb
                   FROM events, k WHERE event_id <= k.kv)
            SELECT e.event_id, e.user_id, e.event_type,
                   CAST(floor(e.value) AS BIGINT) AS vb
            FROM events e, k
            WHERE e.event_id > k.kv AND NOT EXISTS (
              SELECT 1 FROM ex WHERE ex.user_id = e.user_id
                AND ex.vb = CAST(floor(e.value) AS BIGINT))
            ORDER BY e.event_id"""))

  /** M7 ▸ SCD current-row read: row_number() over (key ORDER BY recency)=1
    * (reference: study_disease_map active-row pattern,
    * Docs/etl_requirements_reviewed_by_sr.md:518-558).
    */
  private val m7 = Q("m7_scd_current",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(spark, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 4).as("value"), col("ts"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_id, event_type, round(value,4) AS value, ts
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY ts DESC, event_id DESC) AS rn FROM events)
            WHERE rn = 1 ORDER BY user_id"""))

  /** C8/S4 ▸ deterministic content-hash batch id: sha256 over concatenated
    * content, truncated to 32 hex chars (reference:
    * Scripts/python/enhanced_main_etl.py:655-658,418-424).
    */
  private val c8 = Q("c8_batch_id",
    (spark, dir) =>
      t(spark, dir, "events")
        .select(col("event_id"),
          substring(sha2(concat_ws("||",
            col("user_id").cast("string"), col("event_type"),
            col("event_id").cast("string")), 256), 1, 32).as("batch_id"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
            substr(sha256(concat_ws('||', CAST(user_id AS VARCHAR), event_type,
                                    CAST(event_id AS VARCHAR))), 1, 32) AS batch_id
            FROM events ORDER BY event_id"""))

  // ---------- aggregation family ----------

  /** A1 ▸ grouped aggregate profile (TPC-H Q1 shape; reference:
    * vw_expression_by_cohort, Scripts/database_schema.sql:318-339).
    * Partial (map-side) aggregation + final hash agg — no extra shuffle.
    */
  private val q1 = Q("q1_agg",
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity),2) AS sum_qty,
            round(sum(l_extendedprice),2) AS sum_base_price,
            round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
            round(avg(l_quantity),4) AS avg_qty,
            round(avg(l_extendedprice),4) AS avg_price,
            count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** A1/A3 ▸ cohort stats with exact distinct + sample stddev. */
  private val a1 = Q("a1_cohort_agg",
    (spark, dir) =>
      t(spark, dir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"),
          round(avg(col("o_totalprice")), 4).as("avg_total"),
          round(stddev_samp(col("o_totalprice")), 4).as("sd_total"),
          round(min(col("o_totalprice")), 2).as("min_total"),
          round(max(col("o_totalprice")), 2).as("max_total"))
        .orderBy("o_orderpriority", "o_orderstatus"),
    Some("""SELECT o_orderpriority, o_orderstatus,
            count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders,
            round(avg(o_totalprice),4) AS avg_total,
            round(stddev_samp(o_totalprice),4) AS sd_total,
            round(min(o_totalprice),2) AS min_total,
            round(max(o_totalprice),2) AS max_total
            FROM orders GROUP BY o_orderpriority, o_orderstatus
            ORDER BY o_orderpriority, o_orderstatus"""))

  /** A2 ▸ exact ordered-set percentiles (reference: PERCENTILE_CONT,
    * Scripts/database_schema.sql:330). Spark `percentile` and DuckDB
    * `quantile_cont` both interpolate linearly at (n-1)p.
    */
  private val a2 = Q("a2_median",
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 4).as("med_qty"),
          round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90_price"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            round(quantile_cont(l_quantity, 0.5),4) AS med_qty,
            round(quantile_cont(l_extendedprice, 0.9),4) AS p90_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A3 ▸ conditional-sum data-quality profile (reference: vw_data_quality,
    * Scripts/database_schema.sql:530-549).
    */
  private val a3 = Q("a3_quality_profile",
    (spark, dir) =>
      t(spark, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
          sum(when(col("value") < 1.0, 1L).otherwise(0L)).as("n_low"),
          max(col("ts")).as("max_ts"),
          round(count(lit(1)) * lit(1.0) / countDistinct(col("user_id")), 4).as("events_per_user"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
            CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
            CAST(sum(CASE WHEN value < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
            max(ts) AS max_ts,
            round(count(*)*1.0/count(DISTINCT user_id),4) AS events_per_user
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** A4 ▸ duplicate detection: GROUP BY key HAVING count>1 (reference:
    * Scripts/database_schema.sql:419-425 — the post-merge PK uniqueness probe).
    */
  private val a4 = Q("a4_dup_detect",
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_partkey"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .orderBy("l_orderkey", "l_partkey"),
    Some("""SELECT l_orderkey, l_partkey, count(*) AS cnt FROM lineitem
            GROUP BY l_orderkey, l_partkey HAVING count(*) > 1
            ORDER BY l_orderkey, l_partkey"""))

  /** A9 ▸ meta-analytic pooled aggregate via sufficient statistics
    * (DerSimonian–Laird shape; reference formulas:
    * Docs/etl_requirements_reviewed_by_sr.md:603-625). One shuffle, all
    * closed-form column math afterwards — no UDAF.
    */
  private val a9 = Q("a9_meta_pooled",
    (spark, dir) => {
      val e = t(spark, dir, "events")
        .withColumn("w", lit(1.0) / (lit(1.0) + col("value") * col("value")))
      e.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("k"),
          sum(col("w")).as("s1"),
          sum(col("w") * col("w")).as("s2"),
          sum(col("w") * col("value")).as("st"),
          sum(col("w") * col("value") * col("value")).as("st2"))
        .select(col("event_type") +: col("k") +:
          graft.functions.StatFunctions.dlPooledCols: _*)
        .orderBy("event_type")
    },
    Some(s"""WITH s AS (
              SELECT event_type, count(*) AS k,
                     sum(w) AS s1, sum(w*w) AS s2,
                     sum(w*value) AS st, sum(w*value*value) AS st2
              FROM (SELECT event_type, value, 1.0/(1.0+value*value) AS w FROM events)
              GROUP BY event_type)
            SELECT event_type, k,
                   ${graft.functions.StatFunctions.dlPooledSql}
            FROM s ORDER BY event_type"""))

  // ---------- join family ----------

  /** J1/J2 ▸ star join with broadcast dims (reference:
    * sp_load_fact_expression + vw_expression_long,
    * Scripts/database_schema.sql:375-398,290-315). Dims are broadcast so
    * the fact table never shuffles.
    */
  private val j1 = Q("j1_star_join",
    (spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val o = t(spark, dir, "orders")
      val c = t(spark, dir, "customer")
      val n = t(spark, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
            round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
            count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  /** J2 ▸ left outer join preserving unmatched rows. */
  private val j2 = Q("j2_left_outer",
    (spark, dir) => {
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
            round(coalesce(sum(o_totalprice),0),2) AS total_spent
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey, c_name ORDER BY c_custkey"""))

  /** J4 ▸ theta self-join with inequality + HAVING (reference: gene-pair
    * candidates, Scripts/database_schema.sql:342-366). Equi-part of the
    * condition drives the shuffle; the inequality stays a residual
    * predicate so Catalyst still plans a hash/sort-merge join, not a
    * cartesian product.
    */
  private val j4 = Q("j4_theta_selfjoin",
    (spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val a = li.select(col("l_orderkey"), col("l_partkey").as("p1"))
      val b = li.select(col("l_orderkey"), col("l_partkey").as("p2"))
      a.join(b, Seq("l_orderkey"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .orderBy("p1", "p2")
    },
    Some("""SELECT a.l_partkey AS p1, b.l_partkey AS p2,
            count(DISTINCT a.l_orderkey) AS n_orders
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2
            ORDER BY p1, p2"""))

  /** J6 ▸ left-anti null-probe (reference: missing-sample validation,
    * Scripts/database_schema.sql:427-435): customers with no order above
    * 1.5× the global average order value.
    */
  private val j6 = Q("j6_anti_probe",
    (spark, dir) => {
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders")
      // One plan: the scalar threshold rides as a broadcast 1-row agg.
      val th = broadcast(o.agg((avg(col("o_totalprice")) * 1.5).as("th")))
      val big = o.crossJoin(th).filter(col("o_totalprice") > col("th"))
        .select(col("o_custkey")).distinct()
      c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    Some("""WITH th AS (SELECT avg(o_totalprice)*1.5 AS v FROM orders)
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o, th
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > th.v)
            ORDER BY c_custkey"""))

  /** J8 ▸ decorrelated scalar subquery (reference: correlated probes,
    * Scripts/database_schema.sql:511,433-434): orders 1.5× above their own
    * customer's average.
    */
  private val j8 = Q("j8_corr_subquery",
    (spark, dir) => {
      val o = t(spark, dir, "orders")
      val av = o.groupBy(col("o_custkey").as("k")).agg(avg(col("o_totalprice")).as("av"))
      o.join(av, col("o_custkey") === col("k"))
        .filter(col("o_totalprice") > col("av") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice,2) AS o_totalprice
            FROM orders o JOIN (SELECT o_custkey AS k, avg(o_totalprice) AS av
                                FROM orders GROUP BY 1) a ON o.o_custkey = a.k
            WHERE o.o_totalprice > a.av * 1.5 ORDER BY o.o_orderkey"""))

  // ---------- projection / transform family ----------

  /** P1 ▸ melt/unpivot — the reference's load-bearing reshape
    * (pd.melt / SQL UNPIVOT, Scripts/python/enhanced_main_etl.py:394-400,
    * Scripts/ETL_Framework_Implementation.sql:402-438). Built-in
    * Dataset.unpivot — a Catalyst Expand, no generator UDTF needed.
    */
  private val p1 = Q("p1_melt_unpivot",
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure"),
    Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
            UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
            UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
            ORDER BY l_orderkey, l_linenumber, measure"""))

  /** P4 ▸ descriptor normalization (reference: _normalise_descriptor,
    * Scripts/python/enhanced_main_etl.py:37-44): trim, collapse [-_]+ and
    * whitespace, lowercase. Pure codegen'd string expressions.
    */
  private val p4 = Q("p4_normalize",
    (spark, dir) =>
      t(spark, dir, "part")
        .select(col("p_partkey"),
          lower(regexp_replace(regexp_replace(trim(col("p_name")), "[-_]+", " "), "\\s+", " "))
            .as("norm_name"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
            lower(regexp_replace(regexp_replace(trim(p_name), '[-_]+', ' ', 'g'),
                                 '\s+', ' ', 'g')) AS norm_name
            FROM part ORDER BY p_partkey"""))

  /** P6 ▸ domain-range validation filter, bounds as CONFIG DATA: the flag
    * columns and the quarantine predicate fold out of the rule config's
    * `validation` section ([[graft.enrich.Validation.rangeFlags]]), so a
    * deployment tightens a threshold by editing config, not by recompiling
    * (reference: range checks live in config + CHECK constraints,
    * Config/config.yaml:82, Scripts/database_schema.sql:438-443).
    */
  private val p6 = Q("p6_range_flags",
    (spark, dir) => {
      val rules = graft.enrich.RulesConfig.default.validation
      val flags = graft.enrich.Validation.rangeFlags(rules)
      t(spark, dir, "lineitem")
        .filter(graft.enrich.Validation.anyViolation(rules))
        .select(Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_discount"), col("l_tax")) ++
          flags.map { case (name, c) => c.as(name) }: _*)
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_discount, l_tax,
            coalesce(l_discount > 0.05, false) AS bad_disc,
            coalesce(l_tax > 0.05, false) AS bad_tax
            FROM lineitem WHERE l_discount > 0.05 OR l_tax > 0.05
            ORDER BY l_orderkey, l_linenumber"""))

  /** P8 ▸ persisted computed log2 column (reference:
    * Scripts/database_schema.sql:152).
    */
  private val p8 = Q("p8_computed_log2",
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(when(col("l_quantity") > 0, log(2.0, col("l_quantity"))), 6).as("log2_qty"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
            round(CASE WHEN l_quantity > 0 THEN log2(l_quantity) END, 6) AS log2_qty
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** P9 ▸ unit normalization: per-group library size via window sum, then
    * log2(cpm+1) (reference: COUNTS→CPM transform,
    * Docs/etl_requirements_reviewed_by_sr.md:443-458).
    */
  private val p9 = Q("p9_unit_norm",
    (spark, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
      t(spark, dir, "lineitem")
        .withColumn("cpm",
          col("l_extendedprice") / sum(col("l_extendedprice")).over(w) * 1e6)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(log(2.0, col("cpm") + 1), 6).as("log_cpm"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
            round(log2(l_extendedprice / sum(l_extendedprice)
                  OVER (PARTITION BY l_orderkey) * 1e6 + 1), 6) AS log_cpm
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  // ---------- classification / enrichment family ----------

  /** C1/M6 ▸ priority-ordered regex classifier with override-beats-rule
    * precedence (reference: IllnessInferenceEngine.infer_illness,
    * Scripts/python/enhanced_main_etl.py:442-470). Pure when/rlike chain —
    * the rules are data, the plan is built at runtime, no UDF.
    */
  private val c1 = Q("c1_regex_classifier",
    (spark, dir) => {
      val overrideLabel = when(col("p_brand") === "Brand#13", lit("OVERRIDE_13"))
      val ruleLabel =
        when(col("p_type").rlike("BRASS$"), lit("BRASS_END"))
          .when(col("p_type").rlike("^PROMO"), lit("PROMO"))
          .when(col("p_type").rlike("POLISHED|BURNISHED"), lit("SHINY"))
      t(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          coalesce(overrideLabel, ruleLabel, lit("UNKNOWN")).as("label"),
          when(overrideLabel.isNotNull, lit("override"))
            .when(ruleLabel.isNotNull, lit("rule"))
            .otherwise(lit("default")).as("method"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_brand, p_type,
            coalesce(CASE WHEN p_brand = 'Brand#13' THEN 'OVERRIDE_13' END,
                     CASE WHEN regexp_matches(p_type, 'BRASS$') THEN 'BRASS_END'
                          WHEN regexp_matches(p_type, '^PROMO') THEN 'PROMO'
                          WHEN regexp_matches(p_type, 'POLISHED|BURNISHED') THEN 'SHINY' END,
                     'UNKNOWN') AS label,
            CASE WHEN p_brand = 'Brand#13' THEN 'override'
                 WHEN regexp_matches(p_type, 'BRASS$|^PROMO|POLISHED|BURNISHED') THEN 'rule'
                 ELSE 'default' END AS method
            FROM part ORDER BY p_partkey"""))

  /** C2 ▸ regex group extraction (reference: platform "Name (Accession)"
    * split, Scripts/python/enhanced_main_etl.py:484-498).
    */
  private val c2 = Q("c2_regex_extract",
    (spark, dir) =>
      t(spark, dir, "events")
        .select(col("event_id"),
          expr("""CAST(nullif(regexp_extract(props, '"k": (\\d+)', 1), '') AS INT)""").as("k_val"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
            CAST(nullif(regexp_extract(props, '"k": (\d+)', 1), '') AS INTEGER) AS k_val
            FROM events ORDER BY event_id"""))

  /** C3 ▸ case-insensitive substring lookup with first-match precedence
    * over a config lookup table (reference: manufacturer lookup,
    * Scripts/python/enhanced_main_etl.py:476-482; Config/config.yaml:54-61)
    * — [[graft.enrich.Classifiers.manufacturer]]'s when-chain over a
    * caller-supplied table, here keyed on the part-name vocabulary.
    */
  private val c3 = Q("c3_manufacturer_lookup",
    (spark, dir) => {
      val lookup = Seq("widget" -> "WidgetWorks", "bolt" -> "BoltCo",
        "gear" -> "GearFab", "ring" -> "RingCorp")
      t(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"),
          graft.enrich.Classifiers.manufacturer(col("p_name"), lookup).as("maker"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name,
            CASE WHEN contains(lower(p_name), 'widget') THEN 'WidgetWorks'
                 WHEN contains(lower(p_name), 'bolt') THEN 'BoltCo'
                 WHEN contains(lower(p_name), 'gear') THEN 'GearFab'
                 WHEN contains(lower(p_name), 'ring') THEN 'RingCorp'
                 ELSE 'Unknown' END AS maker
            FROM part ORDER BY p_partkey"""))

  /** J3 ▸ broadcast map-side key join used as a FILTER: restrict the fact
    * scan to keys present in a small driver-side set (reference: the
    * gene-universe filter applied during the melt,
    * Scripts/python/enhanced_main_etl.py:628-640). Spark shape: left_semi
    * against an explicitly broadcast dimension slice — no shuffle of the
    * fact side, no payload duplication, and the filter runs map-side in
    * the same stage as the scan.
    */
  private val j3 = Q("j3_semi_filter_join",
    (spark, dir) => {
      val promo = t(spark, dir, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      t(spark, dir, "lineitem")
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .orderBy("l_orderkey", "l_partkey")
    },
    Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
            ORDER BY l_orderkey, l_partkey"""))

  /** A5 ▸ reconciliation counts: per-order expected-vs-resolved row
    * accounting with a completeness flag (reference: reconcile counts
    * after load, Scripts/python/enhanced_main_etl.py:998-1020 — rows_fact
    * vs genes × resolved samples).
    */
  private val a5 = Q("a5_reconciliation",
    (spark, dir) =>
      t(spark, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .withColumn("complete", col("n_rows") === col("n_parts"))
        .orderBy("l_orderkey"),
    Some("""SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
            count(*) = count(DISTINCT l_partkey) AS complete
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  // ---------- window / rank family ----------

  /** W1/W2 ▸ multi-key ranked top-K (reference: ranked view + TOP,
    * Docs/etl_requirements_reviewed_by_sr.md:425,350-351). Spark plans
    * TakeOrderedAndProject — no global sort of the full table.
    */
  private val w1 = Q("w1_ranked_topk",
    (spark, dir) => {
      // top-k first (TakeOrderedAndProject — per-partition heaps, no global
      // sort/window over the full table), then rank the 100 survivors.
      val top = t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      top.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("rank")
    },
    Some("""SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank,
                   o_orderkey, round(o_totalprice,2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** W2 ▸ running aggregate over an explicit ROWS frame. */
  private val w2 = Q("w2_running_sum",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
            round(sum(o_totalprice) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
            FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** A6 ▸ throughput derivation guarded against /0 (reference:
    * vw_etl_performance rows_per_second,
    * Scripts/database_schema.sql:508-525): events/sec per user session
    * window (min..max ts).
    */
  private val a6 = Q("a6_throughput",
    (spark, dir) =>
      t(spark, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("span_sec"))
        .select(col("user_id"), col("n_events"), col("span_sec"),
          when(col("span_sec") > 0,
            round(col("n_events") / col("span_sec"), 6)).as("events_per_sec"))
        .orderBy("user_id"),
    Some("""SELECT user_id, n_events, span_sec,
            CASE WHEN span_sec > 0 THEN round(n_events * 1.0 / span_sec, 6) END AS events_per_sec
            FROM (SELECT user_id, count(*) AS n_events,
                   CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS span_sec
                  FROM events GROUP BY user_id)
            ORDER BY user_id"""))

  /** A7 ▸ validation-score rollup: pass/fail/warn conditional counts +
    * quality percentage (reference:
    * Scripts/ETL_Framework_Implementation.sql:529-541).
    */
  private val a7 = Q("a7_validation_rollup",
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_warn"),
          sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("n_fail"),
          // quality = share of rows with NO flag at all: counting pass
          // rows directly, NOT n - n_fail - n_warn, which double-subtracts
          // a row that is both warned and failed (a one-row group that is
          // both would read -100%)
          sum(when(col("l_discount") > 0.05 || col("l_quantity") <= 0, 0L)
            .otherwise(1L)).as("n_pass"))
        .select(col("l_returnflag"), col("n"), col("n_warn"), col("n_fail"),
          round(col("n_pass") * 100.0 / col("n"), 4).as("quality_pct"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, n, n_warn, n_fail,
            round(n_pass * 100.0 / n, 4) AS quality_pct
            FROM (SELECT l_returnflag, count(*) AS n,
                   CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_warn,
                   CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
                   CAST(sum(CASE WHEN l_discount > 0.05 OR l_quantity <= 0
                            THEN 0 ELSE 1 END) AS BIGINT) AS n_pass
                  FROM lineitem GROUP BY l_returnflag)
            ORDER BY l_returnflag"""))

  /** S5 ▸ source discovery: enumerate + pattern-filter source identifiers
    * (reference: _discover_studies regex-matched dir listing,
    * Scripts/python/enhanced_main_etl.py:1205-1215).
    */
  private val s5 = Q("s5_discovery",
    (spark, dir) =>
      t(spark, dir, "documents")
        .select(col("source")).distinct()
        .filter(col("source").rlike("^src[0-9]+$"))
        .withColumn("source_num",
          expr("CAST(regexp_extract(source, '([0-9]+)', 1) AS INT)"))
        .orderBy("source"),
    Some("""SELECT source, CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER) AS source_num
            FROM (SELECT DISTINCT source FROM documents)
            WHERE regexp_matches(source, '^src[0-9]+$') ORDER BY source"""))

  /** W4 ▸ canonical pair key via least/greatest + coalesce (reference:
    * LEAST/GREATEST pair canonicalization,
    * Docs/etl_requirements_reviewed_by_sr.md:382,430-431).
    */
  private val w4 = Q("w4_least_greatest",
    (spark, dir) =>
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          least(col("l_partkey"), col("l_suppkey")).as("pair_lo"),
          greatest(col("l_partkey"), col("l_suppkey")).as("pair_hi"),
          coalesce(nullif(col("l_returnflag"), lit("N")), col("l_linestatus")).as("flag_or_status"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
            least(l_partkey, l_suppkey) AS pair_lo,
            greatest(l_partkey, l_suppkey) AS pair_hi,
            coalesce(nullif(l_returnflag, 'N'), l_linestatus) AS flag_or_status
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** A9+Φ ▸ pooled z-score and two-sided p-value via the normal-CDF
    * expression (reference: z/p columns of the pooled meta-analysis view,
    * Docs/etl_requirements_reviewed_by_sr.md:616). Fixed-effect
    * SE = sqrt(1/Σw); the identical Abramowitz–Stegun Φ runs in DuckDB.
    */
  private val a9p = Q("a9_pvalues",
    (spark, dir) => {
      import graft.functions.StatFunctions
      val e = t(spark, dir, "events")
        .withColumn("w", lit(1.0) / (lit(1.0) + col("value") * col("value")))
      val s = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("k"), sum(col("w")).as("s1"),
          sum(col("w") * col("value")).as("st"))
      val z = (col("st") / col("s1")) / sqrt(lit(1.0) / col("s1"))
      s.select(col("event_type"), col("k"),
        round(col("st") / col("s1"), 6).as("pooled"),
        round(sqrt(lit(1.0) / col("s1")), 6).as("se"),
        round(z, 6).as("z"),
        round(StatFunctions.pValue(z), 6).as("p_two_sided"))
        .orderBy("event_type")
    },
    Some {
      val z = "((st/s1) / sqrt(1.0/s1))"
      s"""WITH s AS (
            SELECT event_type, count(*) AS k, sum(w) AS s1, sum(w*value) AS st
            FROM (SELECT event_type, value, 1.0/(1.0+value*value) AS w FROM events)
            GROUP BY event_type)
          SELECT event_type, k,
                 round(st/s1, 6) AS pooled,
                 round(sqrt(1.0/s1), 6) AS se,
                 round($z, 6) AS z,
                 round(${graft.functions.StatFunctions.pValueSql(z)}, 6) AS p_two_sided
          FROM s ORDER BY event_type"""
    })

  /** A9+Fisher/Stouffer ▸ Fisher z-transform pooling of correlation-like
    * effects + Stouffer weighted p-combination over the same sufficient
    * stats as a9 (reference: Fisher z for correlations + Stouffer
    * combination, Docs/etl_requirements_reviewed_by_sr.md:608-621,416).
    * Per study: effect r ∈ (−1,1), Fisher z = atanh(r), study size n.
    * Pooled: z̄ = Σ(n−3)z / Σ(n−3), back-transformed r̄ = tanh(z̄).
    * Stouffer: Z = Σ√n·(z√(n−3)) / √Σn, p = 2(1−Φ(|Z|)). One shuffle;
    * atanh/tanh are spelled as their exp/ln closed forms on BOTH engines
    * so the oracle runs the byte-identical formula.
    */
  private val a9s = Q("a9_stouffer",
    (spark, dir) => {
      import graft.functions.StatFunctions
      val e = t(spark, dir, "events")
        // correlation-like effect in (−1,1) and a deterministic per-study n
        .withColumn("r", col("value") / sqrt(lit(1.0) + col("value") * col("value")))
        .withColumn("n", (lit(10) + pmod(col("event_id"), lit(20))).cast("double"))
        .withColumn("fz", lit(0.5) * log((lit(1.0) + col("r")) / (lit(1.0) - col("r"))))
      val s = e.groupBy(col("event_type")).agg(
        count(lit(1)).as("k"),
        sum((col("n") - 3) * col("fz")).as("szw"),
        sum(col("n") - 3).as("sw"),
        sum(sqrt(col("n")) * col("fz") * sqrt(col("n") - 3)).as("sst"),
        sum(col("n")).as("sn"))
      val zbar = col("szw") / col("sw")
      val pooledR = lit(1.0) - lit(2.0) / (exp(lit(2.0) * zbar) + lit(1.0)) // tanh(zbar)
      val zComb = col("sst") / sqrt(col("sn"))
      s.select(col("event_type"), col("k"),
        round(zbar, 6).as("fisher_z_pooled"),
        round(pooledR, 6).as("pooled_r"),
        round(zComb, 6).as("z_stouffer"),
        round(StatFunctions.pValue(zComb), 6).as("p_combined"))
        .orderBy("event_type")
    },
    Some {
      val zc = "(sst / sqrt(sn))"
      s"""WITH b AS (
            SELECT event_type,
                   value / sqrt(1.0 + value*value) AS r,
                   CAST(10 + (event_id % 20) AS DOUBLE) AS n
            FROM events),
          f AS (SELECT event_type, n, 0.5 * ln((1.0 + r) / (1.0 - r)) AS fz FROM b),
          s AS (
            SELECT event_type, count(*) AS k,
                   sum((n-3) * fz) AS szw, sum(n-3) AS sw,
                   sum(sqrt(n) * fz * sqrt(n-3)) AS sst, sum(n) AS sn
            FROM f GROUP BY event_type)
          SELECT event_type, k,
                 round(szw/sw, 6) AS fisher_z_pooled,
                 round(1.0 - 2.0 / (exp(2.0 * szw/sw) + 1.0), 6) AS pooled_r,
                 round($zc, 6) AS z_stouffer,
                 round(${graft.functions.StatFunctions.pValueSql(zc)}, 6) AS p_combined
          FROM s ORDER BY event_type"""
    })

  /** P5 ▸ label normalization + int-or-passthrough key parse (reference:
    * _normalize_label / _parse_key,
    * Scripts/python/enhanced_main_etl.py:124-132): a mixed column parses
    * to its integer form when it is one, else upper-trimmed passthrough.
    */
  private val p5 = Q("p5_label_parse",
    (spark, dir) => {
      t(spark, dir, "events")
        .withColumn("mixed", when(pmod(col("event_id"), lit(3)) === 0,
          concat(lit(" "), col("event_id").cast("string"), lit(" ")))
          .otherwise(concat(lit(" "), col("event_type"), lit(" "))))
        .select(col("event_id"),
          coalesce(expr("CAST(try_cast(trim(mixed) AS INT) AS STRING)"),
            upper(trim(col("mixed")))).as("parsed_key"),
          expr("try_cast(trim(mixed) AS INT)").as("int_key"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
            coalesce(CAST(TRY_CAST(trim(mixed) AS INTEGER) AS VARCHAR),
                     upper(trim(mixed))) AS parsed_key,
            TRY_CAST(trim(mixed) AS INTEGER) AS int_key
            FROM (SELECT event_id,
                   CASE WHEN event_id % 3 = 0
                        THEN ' ' || CAST(event_id AS VARCHAR) || ' '
                        ELSE ' ' || event_type || ' ' END AS mixed
                  FROM events)
            ORDER BY event_id"""))

  /** C5 ▸ layered fallback-keyed dictionary resolve (reference:
    * _get_illness_key_map fallback chain,
    * Scripts/python/enhanced_main_etl.py:83-188): dim-table lookup
    * (broadcast join) → literal fallback map → constant default.
    */
  private val c5 = Q("c5_fallback_resolve",
    (spark, dir) => {
      val c = t(spark, dir, "customer")
      // primary dictionary: a partial dim (nations 0-14 only)
      val dim = t(spark, dir, "nation").filter(col("n_nationkey") < 15)
        .select(col("n_nationkey"), col("n_name"))
      // secondary: small literal fallback map, then default
      val fallback = typedlit(Map(15 -> "FALLBACK_15", 16 -> "FALLBACK_16",
        17 -> "FALLBACK_17"))
      c.join(broadcast(dim), col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey"), col("c_nationkey"),
          coalesce(col("n_name"),
            element_at(fallback, col("c_nationkey").cast("int")),
            lit("UNKNOWN")).as("resolved"),
          when(col("n_name").isNotNull, "dim")
            .when(element_at(fallback, col("c_nationkey").cast("int")).isNotNull, "fallback")
            .otherwise("default").as("source"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey,
            coalesce(n.n_name,
                     CASE c_nationkey WHEN 15 THEN 'FALLBACK_15'
                                      WHEN 16 THEN 'FALLBACK_16'
                                      WHEN 17 THEN 'FALLBACK_17' END,
                     'UNKNOWN') AS resolved,
            CASE WHEN n.n_name IS NOT NULL THEN 'dim'
                 WHEN c_nationkey IN (15, 16, 17) THEN 'fallback'
                 ELSE 'default' END AS source
            FROM customer c LEFT JOIN
              (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15) n
              ON c.c_nationkey = n.n_nationkey
            ORDER BY c_custkey"""))

  val all: Seq[Q] = Seq(m1, t3, j5, m7, c8, q1, a1, a2, a3, a4, a5, a6, a7, a9, a9p, a9s,
    j1, j2, j3, j4, j6, j8, p1, p4, p5, p6, p8, p9, c1, c2, c3, c5, s5, w1, w2, w4)
}
