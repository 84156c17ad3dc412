package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Hierarchy
import graft.sources.Tables

/** Warehouse-modeling + data-quality tier (extension; the reference's
  * surface stops at flat table loads — `etl_process.py:18` loops plain
  * extract→load with no history modeling and no validation beyond row
  * counts). These are the operations a BI/warehouse user of such a
  * pipeline runs daily: slowly-changing-dimension builds, cohort
  * retention, hierarchy flattening, and the Deequ-style profile /
  * expectation / anomaly checks that gate a load.
  *
  * All single-pass or log-round declarative plans; nothing here collects
  * to the driver.
  */
object WarehouseQueries {

  private val Fmt = "yyyy-MM-dd HH:mm:ss"

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Profiled orders columns: (name, native column, string formatter).
    * min/max are computed on the NATIVE type (string-formatting first
    * would sort "10" < "9") and only then rendered.
    */
  private val profileCols: Seq[(String, String => org.apache.spark.sql.Column)] = Seq(
    "o_orderkey" -> ((c: String) => col(c).cast("string")),
    "o_custkey" -> ((c: String) => col(c).cast("string")),
    "o_orderstatus" -> ((c: String) => col(c)),
    "o_totalprice" -> ((c: String) => format_string("%.2f", col(c))),
    "o_orderdate" -> ((c: String) => date_format(col(c), Fmt)),
    "o_orderpriority" -> ((c: String) => col(c)))

  /** Expectation rules over lineitem: (rule name, predicate SQL shared
    * verbatim by Spark and the DuckDB oracle). NULL counts as a violation
    * (a constraint you cannot evaluate is not satisfied).
    */
  private val rules: Seq[(String, String)] = Seq(
    "discount_le_5pct" -> "l_discount <= 0.05",
    "price_positive" -> "l_extendedprice > 0",
    "quantity_le_30" -> "l_quantity <= 30",
    "quantity_range" -> "l_quantity BETWEEN 1 AND 50",
    "returnflag_domain" -> "l_returnflag IN ('A','N','R')",
    "tax_range" -> "l_tax BETWEEN 0 AND 0.08")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SCD Type-2 dimension build: per-customer order-priority history
    // compressed to change runs with [effective_from, effective_to)
    // validity and an is_current flag — the standard warehouse shape for
    // attribute history. Three window passes over ONE hash partitioning
    // (all windows share partitionBy custkey, so Catalyst plans a single
    // shuffle); same-day collisions resolve deterministically to the max
    // order key before run-compression.
    "q_scd2" -> ((s, d) => {
      val byDay = Window.partitionBy("o_custkey", "o_orderdate")
        .orderBy(col("o_orderkey").desc)
      val byCust = Window.partitionBy("o_custkey").orderBy("o_orderdate")
      val dedup = t(s, d, "orders")
        .withColumn("rn", row_number().over(byDay))
        .filter(col("rn") === 1)
      val runs = dedup
        .withColumn("prev", lag("o_orderpriority", 1).over(byCust))
        .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
      runs
        .withColumn("eff_to", lead("o_orderdate", 1).over(byCust))
        .select(
          col("o_custkey").as("custkey"),
          col("o_orderpriority").as("priority"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("effective_from"),
          date_format(col("eff_to"), "yyyy-MM-dd").as("effective_to"),
          col("eff_to").isNull.as("is_current"))
        .orderBy("custkey", "effective_from")
    }),

    // Cohort retention: users bucketed by first-seen week, distinct actives
    // per (cohort, weeks-since) cell. The first-seen week comes from a
    // window min over the SAME user_id partitioning the events already
    // shuffle to — no extra join against a firsts table.
    "q_cohort" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
      t(s, d, "events")
        .withColumn("cohort_week", date_trunc("week", min(col("ts")).over(byUser)))
        .withColumn("week_offset",
          floor(datediff(date_trunc("week", col("ts")), col("cohort_week")) / 7).cast("bigint"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .select(
          date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Hierarchy flattening: a synthetic taxonomy over part (keys ≤ 10 are
    // roots, every other key's parent is a deterministic arithmetic
    // function of the key) resolved to (node, root, depth) by pointer
    // doubling — O(log depth) self-joins, not per-level recursion. The
    // oracle replays it with a genuine recursive CTE.
    "q_hierarchy" -> ((s, d) => {
      val edges = t(s, d, "part").select(
        col("p_partkey").as("node"),
        when(col("p_partkey") <= 10, lit(null).cast("long"))
          .otherwise(expr("p_partkey DIV (2 + p_partkey % 3)")).as("parent"))
      Hierarchy.flatten(edges).orderBy("node")
    }),

    // Per-column profile of orders: row/null/distinct counts plus native
    // min/max rendered to strings — one aggregation pass, pivoted to one
    // row per column with stack(). Distinct counts are EXACT here so the
    // oracle can replay them; the 100 TB variant swaps in
    // approx_count_distinct (the HLL path fn_hll_sketch already pins).
    "dq_profile" -> ((s, d) => {
      val mins = profileCols.map { case (c, _) => min(col(c)).as(s"min_raw_$c") }
      val maxs = profileCols.map { case (c, _) => max(col(c)).as(s"max_raw_$c") }
      // two-step: aggregate native min/max first, then format + stack.
      val row = t(s, d, "orders")
        .agg(count(lit(1)).as("n_rows"),
          (profileCols.flatMap { case (c, _) =>
            Seq(
              sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
              countDistinct(col(c)).as(s"dist_$c"))
          } ++ mins ++ maxs): _*)
      val stackArgs = profileCols.map { case (c, _) =>
        s"'$c', n_rows, null_$c, dist_$c, min_fmt_$c, max_fmt_$c"
      }.mkString(", ")
      row
        .select(col("*") +: profileCols.flatMap { case (c, fmt) =>
          Seq(fmt(s"min_raw_$c").as(s"min_fmt_$c"), fmt(s"max_raw_$c").as(s"max_fmt_$c"))
        }: _*)
        .select(expr(
          s"stack(${profileCols.size}, $stackArgs) AS " +
            "(col_name, n_rows, n_null, n_distinct, min_value, max_value)"))
        .orderBy("col_name")
    }),

    // Expectation audit: every rule evaluated in ONE scan (sum of
    // violation indicators), pivoted to a row per rule with its pass
    // verdict — the Deequ-style load gate, shaped so 100 TB pays a single
    // pass regardless of rule count.
    "dq_expectations" -> ((s, d) => {
      val aggs = count(lit(1)).as("n_rows") +: rules.map { case (name, pred) =>
        sum(when(expr(pred), 0L).otherwise(1L)).as(s"viol_$name")
      }
      val stackArgs = rules.map { case (name, _) =>
        s"'$name', n_rows, viol_$name, viol_$name = 0"
      }.mkString(", ")
      t(s, d, "lineitem")
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(
          s"stack(${rules.size}, $stackArgs) AS (rule, n_rows, n_violations, pass)"))
        .orderBy("rule")
    }),

    // Anomaly detection: per-event-type z-score against the group mean /
    // sample stddev, reporting |z| > 3 outliers. Group moments come from
    // an unbounded window over the SAME event_type partitioning — one
    // shuffle, no join-back, no second scan.
    "dq_anomaly" -> ((s, d) => {
      val byType = Window.partitionBy("event_type")
      t(s, d, "events")
        .withColumn("mu", avg("value").over(byType))
        .withColumn("sigma", stddev_samp("value").over(byType))
        .withColumn("z", (col("value") - col("mu")) / col("sigma"))
        .filter(abs(col("z")) > 3.0)
        .select(
          col("event_id"), col("event_type"), col("value"),
          round(col("z") + 1e-9, 3).as("z"))
        .orderBy("event_id")
    }))

  val oracles: Map[String, String] = Map(

    "q_scd2" ->
      """WITH dedup AS (
        |  SELECT o_custkey, o_orderdate, o_orderpriority,
        |         row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                            ORDER BY o_orderkey DESC) AS rn
        |  FROM orders),
        |hist AS (
        |  SELECT o_custkey, o_orderdate, o_orderpriority,
        |         lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |                                    ORDER BY o_orderdate) AS prev
        |  FROM dedup WHERE rn = 1),
        |runs AS (
        |  SELECT o_custkey, o_orderdate, o_orderpriority,
        |         lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                                 ORDER BY o_orderdate) AS eff_to
        |  FROM hist WHERE prev IS NULL OR prev <> o_orderpriority)
        |SELECT o_custkey AS custkey, o_orderpriority AS priority,
        |       strftime(o_orderdate, '%Y-%m-%d') AS effective_from,
        |       strftime(eff_to, '%Y-%m-%d') AS effective_to,
        |       eff_to IS NULL AS is_current
        |FROM runs ORDER BY custkey, effective_from""".stripMargin,

    "q_cohort" ->
      """WITH f AS (
        |  SELECT user_id, ts,
        |         date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cohort_week
        |  FROM events)
        |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
        |       (date_diff('day', cohort_week, date_trunc('week', ts)) // 7)::BIGINT AS week_offset,
        |       count(DISTINCT user_id) AS n_users
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_hierarchy" ->
      """WITH RECURSIVE e AS (
        |  SELECT p_partkey AS node,
        |         CASE WHEN p_partkey <= 10 THEN NULL
        |              ELSE p_partkey // (2 + p_partkey % 3) END AS parent
        |  FROM part),
        |walk(node, root, depth) AS (
        |  SELECT node, node, 0 FROM e WHERE parent IS NULL
        |  UNION ALL
        |  SELECT e.node, w.root, w.depth + 1 FROM e JOIN walk w ON e.parent = w.node)
        |SELECT node, root, depth::BIGINT AS depth FROM walk ORDER BY node""".stripMargin,

    "dq_profile" -> {
      val perCol = Seq(
        ("o_orderkey", "min(o_orderkey)::VARCHAR", "max(o_orderkey)::VARCHAR"),
        ("o_custkey", "min(o_custkey)::VARCHAR", "max(o_custkey)::VARCHAR"),
        ("o_orderstatus", "min(o_orderstatus)", "max(o_orderstatus)"),
        ("o_totalprice", "printf('%.2f', min(o_totalprice))", "printf('%.2f', max(o_totalprice))"),
        ("o_orderdate", "strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S')",
          "strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')"),
        ("o_orderpriority", "min(o_orderpriority)", "max(o_orderpriority)"))
      perCol.map { case (c, mn, mx) =>
        s"""SELECT '$c' AS col_name, count(1) AS n_rows,
           |  count(1) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
           |  $mn AS min_value, $mx AS max_value FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "dq_expectations" ->
      rules.map { case (name, pred) =>
        s"""SELECT '$name' AS rule, count(1) AS n_rows,
           |  sum(CASE WHEN $pred THEN 0 ELSE 1 END)::BIGINT AS n_violations,
           |  sum(CASE WHEN $pred THEN 0 ELSE 1 END) = 0 AS pass FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY rule"),

    "dq_anomaly" ->
      """WITH m AS (
        |  SELECT event_id, event_type, value,
        |         avg(value) OVER (PARTITION BY event_type) AS mu,
        |         stddev_samp(value) OVER (PARTITION BY event_type) AS sigma
        |  FROM events)
        |SELECT event_id, event_type, value,
        |       round((value - mu) / sigma + 0.000000001, 3) AS z
        |FROM m WHERE abs((value - mu) / sigma) > 3 ORDER BY event_id""".stripMargin)
}
