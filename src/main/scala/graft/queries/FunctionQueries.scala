package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalar / window function surface batteries — the "every function a user
  * of the engine would reach for" coverage tier (SURVEY.md §2.5
  * expressions row). Each battery exercises a family of built-ins whose
  * cross-engine semantics are worth pinning: string, datetime,
  * conditional/null, math, array, and window-function/frame behavior.
  *
  * Conventions (shared with the other registries): identical aliases both
  * sides, Spark INT outputs cast to BIGINT (DuckDB's default integer
  * width), float results rounded with the +1e-9 epsilon to kill
  * round-half drift, total order on a unique key.
  */
object FunctionQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // String function battery over customer names/segments.
    "fn_string" -> ((s, d) =>
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          lower(col("c_name")).as("lo"),
          upper(col("c_mktsegment")).as("up"),
          substring(col("c_name"), 1, 8).as("sub"),
          concat(col("c_mktsegment"), lit("#"), col("c_name")).as("cat"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("pad"),
          trim(lit(" x ")).as("tr"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("rep"),
          reverse(col("c_mktsegment")).as("rev"),
          repeat(lit("ab"), 3).as("rpt"),
          length(col("c_name")).cast("bigint").as("len"),
          instr(col("c_name"), "0").cast("bigint").as("pos"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tl"))
        .orderBy("c_custkey")),

    // Encoding battery: hex / base64 roundtrips and byte lengths over
    // customer names — the interchange-encoding surface (blob keys, URL
    // payloads). Both engines implement RFC 4648 base64 without wrapping
    // and lowercase hex is normalized on the DuckDB side.
    "fn_encode" -> ((s, d) =>
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          hex(col("c_name").cast("binary")).as("hx"),
          base64(col("c_name").cast("binary")).as("b64"),
          col("c_name").cast("binary").as("bin_probe"),
          length(col("c_name").cast("binary")).cast("bigint").as("n_bytes"))
        .select(col("c_custkey"), col("hx"), col("b64"),
          sha2(col("bin_probe"), 256).as("sha"),
          col("n_bytes"))
        .orderBy("c_custkey")),

    // Regex battery over document text: anchored group extraction,
    // match-all counting, rlike, and positional token split. Java regex
    // and DuckDB RE2 agree on this subset ([a-z] classes, bounded
    // quantifiers, anchors); no-match extract is '' in both engines, and
    // the out-of-range token is coalesced to '' to match split_part.
    "fn_regex" -> ((s, d) =>
      t(s, d, "documents")
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
          regexp_extract(col("text"), "^[a-z]+ ([a-z]+)", 1).as("second_word"),
          size(expr("regexp_extract_all(text, '[a-z]{5,}', 0)")).cast("bigint").as("n_long"),
          col("text").rlike("spark").as("has_spark"),
          coalesce(get(split(col("text"), " "), lit(2)), lit("")).as("third_token"))
        .orderBy("doc_id")),

    // Datetime battery over order dates: field extraction, truncation,
    // arithmetic, end-of-month, epoch.
    "fn_datetime" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("bigint").as("yr"),
          month(col("o_orderdate")).cast("bigint").as("mo"),
          dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
          quarter(col("o_orderdate")).cast("bigint").as("qtr"),
          weekday(col("o_orderdate")).cast("bigint").as("dow_mon0"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mstart"),
          date_format(col("o_orderdate") + expr("interval 3 months"), "yyyy-MM-dd HH:mm:ss").as("plus3m"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("bigint").as("days_to_98"))
        .orderBy("o_orderkey")),

    // Conditional / null-handling battery: CASE, coalesce, nullif,
    // greatest/least, null-safe equality.
    "fn_conditional" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") >= 25, "big")
            .when(col("l_quantity") >= 10, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
          greatest(col("l_tax"), col("l_discount")).as("gmax"),
          least(col("l_tax"), col("l_discount")).as("lmin"),
          (nullif(col("l_linenumber"), lit(1)) <=> lit(null)).as("was_one"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Math battery; every float rounded with the cross-engine epsilon.
    "fn_math" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - col("l_tax")).as("ad"),
          ceil(col("l_extendedprice") / 100).cast("bigint").as("ce"),
          floor(col("l_extendedprice") / 100).cast("bigint").as("fl"),
          round(sqrt(col("l_extendedprice")) + 1e-9, 6).as("sq"),
          round(log(col("l_extendedprice")) + 1e-9, 6).as("ln_"),
          round(pow(col("l_quantity"), 2) + 1e-9, 2).as("p2"),
          signum(col("l_discount") - col("l_tax")).cast("bigint").as("sg"),
          (col("l_quantity").cast("bigint") % 7).as("md"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Array battery over document token lists.
    "fn_array" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).cast("bigint").as("n"),
          // joined to a string: array-typed result columns break the
          // driver's sort-rows-by-all-columns compare
          array_join(slice(col("toks"), 2, 3), ",").as("sl"),
          array_contains(col("toks"), "the").as("has_the"),
          element_at(col("toks"), 1).as("first_tok"),
          array_position(col("toks"), "the").cast("bigint").as("pos_the"),
          size(array_distinct(col("toks"))).cast("bigint").as("n_uniq"),
          array_join(slice(sort_array(array_distinct(col("toks"))), 1, 5), ",").as("top5"))
        .orderBy("doc_id")),

    // Bitwise battery: and/or/xor/shifts/popcount over event ids.
    "fn_bitwise" -> ((s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          (col("event_id").bitwiseAND(255)).as("b_and"),
          (col("event_id").bitwiseOR(4096)).as("b_or"),
          (col("event_id").bitwiseXOR(col("user_id"))).as("b_xor"),
          shiftleft(col("event_id"), 3).as("b_shl"),
          shiftright(col("event_id"), 2).as("b_shr"),
          bit_count(col("event_id")).cast("bigint").as("b_pop"))
        .orderBy("event_id")),

    // String-distance battery: levenshtein over the (tiny, distinct)
    // event-type vocabulary cross-joined with itself — the blocked fuzzy-
    // match primitive; at corpus scale the cross join is always bounded by
    // a blocking key (here the whole vocab IS the block).
    "fn_strdist" -> ((s, d) => {
      val types = t(s, d, "events").select("event_type").distinct()
      types.as("x").crossJoin(types.as("y"))
        .select(
          col("x.event_type").as("a"), col("y.event_type").as("b"),
          levenshtein(col("x.event_type"), col("y.event_type"))
            .cast("bigint").as("lev"))
        .orderBy("a", "b")
    }),

    // Map-typed column battery: construct, access, keys, merge. The oracle
    // computes the same OUTPUT values relationally — DuckDB v1.0 map access
    // semantics differ, and what must match is the result, not the
    // intermediate representation.
    "fn_map" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("m", map(
          lit("type"), col("event_type"),
          lit("uid"), col("user_id").cast("string")))
        .withColumn("m2", map_concat(col("m"), map(lit("ev"), col("event_id").cast("string"))))
        .select(
          col("event_id"),
          element_at(col("m"), "type").as("m_type"),
          element_at(col("m"), "missing").as("m_missing"),
          size(map_keys(col("m2"))).cast("bigint").as("n_keys"),
          array_join(sort_array(map_keys(col("m2"))), ",").as("keys_sorted"),
          element_at(col("m2"), "ev").as("m_ev"))
        .orderBy("event_id")),

    // Sliding windows in batch: 1-day windows every 12 hours — each event
    // lands in exactly two epoch-aligned windows; the oracle reproduces
    // the window starts arithmetically.
    "q_sliding_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value") + 1e-9, 2).as("sum_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start", "event_type")),

    // Typed-UDAF surface: WeightedAvg Aggregator registered via udaf();
    // oracle is the built-in sum(w*x)/sum(w) formulation it must equal.
    "q_weighted_avg" -> ((s, d) => {
      val wavg = udaf(graft.functions.WeightedAvg.agg)
      // rounded to 2, not 4: the UDAF buffer sums doubles in partition
      // order while the oracle's decimal sum is exact, so the comparison
      // boundary must sit far above the ~1e-8 order-drift
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(
          wavg(col("l_quantity"), col("l_extendedprice")) + 1e-9, 2).as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // Unpivot (wide → long): three measure columns stacked into
    // (metric, val) rows — the inverse of q_pivot.
    "fn_unpivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .selectExpr("l_orderkey", "l_linenumber",
          """stack(3, 'discount', l_discount, 'qty', l_quantity, 'tax', l_tax)
            | AS (metric, val)""".stripMargin)
        .orderBy("l_orderkey", "l_linenumber", "metric")),

    // Deterministic mode per group: most frequent value, ties broken by the
    // smallest value — spelled out as count + rank in BOTH engines because
    // the built-in mode() leaves tie order undefined in each.
    "fn_mode" -> ((s, d) => {
      val counts = t(s, d, "events")
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("c").desc, col("user_id"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("user_id").as("mode_user"), col("c").as("n_hits"))
        .orderBy("event_type")
    }),

    // try_cast battery: failed casts yield null, never an error.
    "fn_trycast" -> ((s, d) =>
      t(s, d, "events")
        .selectExpr(
          "event_id",
          "try_cast(event_type AS BIGINT) AS bad_int",
          "try_cast(cast(value AS STRING) AS DOUBLE) AS roundtrip",
          "try_cast(substr(event_type, 1, 1) AS DOUBLE) AS bad_dbl",
          "coalesce(try_cast(event_type AS BIGINT), -1) AS defaulted")
        .orderBy("event_id")),

    // URL parsing — the web-pipeline normalization primitive (crawl data
    // is keyed by host/path). URLs are constructed deterministically from
    // customer columns, then decomposed with parse_url; the oracle
    // recomputes each component from the same inputs, so the row pins
    // Spark's extraction semantics against ground truth (incl. the
    // per-parameter QUERY lookup).
    "fn_url" -> ((s, d) =>
      t(s, d, "customer")
        .withColumn("url", concat(
          lit("https://"), lower(col("c_mktsegment")), lit(".example.com/cust/"),
          col("c_custkey").cast("string"),
          lit("/profile?seg="), lower(col("c_mktsegment")),
          lit("&id="), col("c_custkey").cast("string")))
        .select(
          col("c_custkey"),
          col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("id")).as("id_param"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"))
        .orderBy("c_custkey")),

    // Window-function battery: ranking family, value family, explicit ROWS
    // frame (last_value needs it — the default frame stops at CURRENT ROW).
    "fn_window_funcs" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("v_events_fn")
      s.sql(
        """SELECT event_id, user_id,
          |  CAST(rank() OVER w AS BIGINT) AS rnk,
          |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
          |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          |  round(percent_rank() OVER w + 0.000000001, 6) AS prnk,
          |  round(cume_dist() OVER w + 0.000000001, 6) AS cd,
          |  lag(event_id, 1, -1) OVER w AS prev_id,
          |  lead(event_id, 1, -1) OVER w AS next_id,
          |  first_value(event_id) OVER w AS first_id,
          |  last_value(event_id) OVER (PARTITION BY user_id ORDER BY event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_id
          |FROM v_events_fn
          |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
          |ORDER BY event_id""".stripMargin)
    }),

    // Time-range window frame: events per user in the preceding hour —
    // RANGE BETWEEN INTERVAL, the frame kind plain ROWS can't express.
    "fn_window_range" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("v_events_rng")
      s.sql(
        """SELECT event_id, user_id,
          |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
          |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)
          |    AS n_last_hour
          |FROM v_events_rng ORDER BY event_id""".stripMargin)
    }),

    // Frequent-items sketch: approx_top_k (Datasketches frequent-items) —
    // the heavy-hitters primitive a corpus-statistics pipeline runs
    // instead of a full groupBy+sort at scale. With 5 distinct items the
    // sketch is in its exact regime and counts are all distinct, so the
    // certificate pins sketch counts EQUAL to the exact aggregation's.
    "fn_approx_topk" -> ((s, d) => {
      val ev = t(s, d, "events")
      val exact = ev.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      val sk = ev.agg(expr("approx_top_k(event_type, 3)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("event_type"), col("e.count").as("n_est"))
      exact.join(sk, "event_type")
        .select(col("event_type"), col("n_exact"),
          (col("n_est") === col("n_exact")).as("sketch_exact"))
        .orderBy(col("n_exact").desc, col("event_type"))
    }),

    // HLL sketch battery: the mergeable-sketch path for distinct counting
    // at scale — per-partition/per-day sketches union-merged instead of a
    // global shuffle of raw values (the Datasketches HLL built-ins).
    // Verified by certificate: the exact count plus (a) BOTH the direct
    // and the merged estimates within 5% of exact, (b) a flat union of
    // daily sketches estimating IDENTICALLY to a two-level union (days →
    // day-parity subtotals → total): union state is a function of the
    // coupon/register multiset, so merge SHAPE and order cannot change
    // the answer. The earlier form of (b) pinned direct === merged, which
    // is NOT an invariant — the round-8 full sf0.1 gate caught it: at
    // ~1500 distinct users vs lgK=12 the direct sketch still sits in
    // sparse/coupon mode while the union path converts to dense HLL, and
    // the two estimators legitimately differ by a few counts (sf0.01's
    // smaller cardinalities kept both sparse, hiding the false pin).
    // The oracle pins exact + TRUE + TRUE.
    "fn_hll_sketch" -> ((s, d) => {
      val ev = t(s, d, "events")
      val direct = ev.groupBy("event_type").agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("est_d"),
        countDistinct("user_id").as("n_users_exact"))
      val daily = ev
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
        .localCheckpoint(true) // consumed by both merge shapes
      val merged = daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est_m"))
      val twoLevel = daily
        .groupBy(col("event_type"), (dayofmonth(col("day")) % 2).as("par"))
        .agg(hll_union_agg(col("sk"), lit(false)).as("sk2"))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk2"), lit(false))).as("est_m2"))
      direct.join(merged, "event_type").join(twoLevel, "event_type")
        .select(col("event_type"), col("n_users_exact"),
          (abs(col("est_d") - col("n_users_exact"))
            <= col("n_users_exact") * 0.05
            && abs(col("est_m") - col("n_users_exact"))
            <= col("n_users_exact") * 0.05).as("hll_ok"),
          (col("est_m") === col("est_m2")).as("merge_ok"))
        .orderBy("event_type")
    })
  )

  val oracles: Map[String, String] = Map(

    "fn_encode" ->
      """SELECT c_custkey,
        | upper(hex(c_name)) AS hx,
        | to_base64(c_name::BLOB) AS b64,
        | lower(sha256(c_name)) AS sha,
        | octet_length(c_name::BLOB)::BIGINT AS n_bytes
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_regex" ->
      """SELECT doc_id,
        | regexp_extract(text, '^([a-z]+)', 1) AS first_word,
        | regexp_extract(text, '^[a-z]+ ([a-z]+)', 1) AS second_word,
        | len(regexp_extract_all(text, '[a-z]{5,}'))::BIGINT AS n_long,
        | regexp_matches(text, 'spark') AS has_spark,
        | split_part(text, ' ', 3) AS third_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_approx_topk" ->
      """SELECT event_type, count(1) AS n_exact, TRUE AS sketch_exact
        |FROM events GROUP BY event_type
        |ORDER BY n_exact DESC, event_type LIMIT 3""".stripMargin,

    "fn_hll_sketch" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users_exact,
        |       TRUE AS hll_ok, TRUE AS merge_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "fn_string" ->
      """SELECT c_custkey,
        | lower(c_name) AS lo,
        | upper(c_mktsegment) AS up,
        | substr(c_name, 1, 8) AS sub,
        | c_mktsegment || '#' || c_name AS cat,
        | lpad(c_custkey::VARCHAR, 10, '0') AS pad,
        | trim(' x ') AS tr,
        | regexp_replace(c_name, '[0-9]+', '#', 'g') AS rep,
        | reverse(c_mktsegment) AS rev,
        | repeat('ab', 3) AS rpt,
        | length(c_name)::BIGINT AS len,
        | strpos(c_name, '0')::BIGINT AS pos,
        | translate(c_mktsegment, 'AEIOU', 'aeiou') AS tl
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_datetime" ->
      """SELECT o_orderkey,
        | year(o_orderdate)::BIGINT AS yr,
        | month(o_orderdate)::BIGINT AS mo,
        | day(o_orderdate)::BIGINT AS dom,
        | quarter(o_orderdate)::BIGINT AS qtr,
        | (isodow(o_orderdate) - 1)::BIGINT AS dow_mon0,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
        | strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d %H:%M:%S') AS plus3m,
        | strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS eom,
        | epoch(o_orderdate)::BIGINT AS epoch_s,
        | date_diff('day', o_orderdate::DATE, DATE '1998-01-01')::BIGINT AS days_to_98
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_conditional" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_quantity >= 25 THEN 'big'
        |      WHEN l_quantity >= 10 THEN 'mid'
        |      ELSE 'small' END AS bucket,
        | coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
        | greatest(l_tax, l_discount) AS gmax,
        | least(l_tax, l_discount) AS lmin,
        | (nullif(l_linenumber, 1) IS NOT DISTINCT FROM NULL) AS was_one
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_discount - l_tax) AS ad,
        | ceil(l_extendedprice / 100)::BIGINT AS ce,
        | floor(l_extendedprice / 100)::BIGINT AS fl,
        | round(sqrt(l_extendedprice) + 0.000000001, 6) AS sq,
        | round(ln(l_extendedprice) + 0.000000001, 6) AS ln_,
        | round(pow(l_quantity, 2) + 0.000000001, 2) AS p2,
        | sign(l_discount - l_tax)::BIGINT AS sg,
        | (l_quantity::BIGINT % 7) AS md
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_array" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        |SELECT doc_id,
        | len(toks)::BIGINT AS n,
        | array_to_string(list_slice(toks, 2, 4), ',') AS sl,
        | list_contains(toks, 'the') AS has_the,
        | toks[1] AS first_tok,
        | coalesce(list_position(toks, 'the'), 0)::BIGINT AS pos_the,
        | len(list_distinct(toks))::BIGINT AS n_uniq,
        | array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 5), ',') AS top5
        |FROM t ORDER BY doc_id""".stripMargin,

    "fn_bitwise" ->
      """SELECT event_id,
        | (event_id & 255) AS b_and,
        | (event_id | 4096) AS b_or,
        | xor(event_id, user_id) AS b_xor,
        | (event_id << 3) AS b_shl,
        | (event_id >> 2) AS b_shr,
        | bit_count(event_id)::BIGINT AS b_pop
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_strdist" ->
      """WITH t AS (SELECT DISTINCT event_type FROM events)
        |SELECT x.event_type AS a, y.event_type AS b,
        |  levenshtein(x.event_type, y.event_type)::BIGINT AS lev
        |FROM t x CROSS JOIN t y ORDER BY a, b""".stripMargin,

    "fn_map" ->
      """SELECT event_id,
        | event_type AS m_type,
        | NULL::VARCHAR AS m_missing,
        | 3::BIGINT AS n_keys,
        | 'ev,type,uid' AS keys_sorted,
        | event_id::VARCHAR AS m_ev
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sliding_window" ->
      """WITH w AS (
        |  SELECT *, TIMESTAMP '1970-01-01 00:00:00'
        |    + ((floor(epoch(ts) / 43200) - k) * 43200)::BIGINT * INTERVAL 1 SECOND
        |    AS win_start
        |  FROM events, unnest([0, 1]) AS u(k))
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(1) AS n, round(sum(value) + 0.000000001, 2) AS sum_value
        |FROM w GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    "q_weighted_avg" ->
      """SELECT l_returnflag,
        | round(sum(l_quantity * l_extendedprice) / sum(l_quantity) + 0.000000001, 2)
        |   AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "fn_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'discount' AS metric, l_discount AS val FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'qty', l_quantity FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "fn_mode" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(1) AS c
        |  FROM events GROUP BY event_type, user_id),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY event_type ORDER BY c DESC, user_id) AS rn
        |  FROM c)
        |SELECT event_type, user_id AS mode_user, c AS n_hits
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "fn_trycast" ->
      """SELECT event_id,
        | try_cast(event_type AS BIGINT) AS bad_int,
        | try_cast(value::VARCHAR AS DOUBLE) AS roundtrip,
        | try_cast(substr(event_type, 1, 1) AS DOUBLE) AS bad_dbl,
        | coalesce(try_cast(event_type AS BIGINT), -1) AS defaulted
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_url" ->
      """SELECT c_custkey,
        | 'https://' || lower(c_mktsegment) || '.example.com/cust/' || c_custkey
        |   || '/profile?seg=' || lower(c_mktsegment) || '&id=' || c_custkey AS url,
        | lower(c_mktsegment) || '.example.com' AS host,
        | '/cust/' || c_custkey || '/profile' AS path,
        | 'seg=' || lower(c_mktsegment) || '&id=' || c_custkey AS query,
        | c_custkey::VARCHAR AS id_param,
        | 'https' AS proto
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_window_funcs" ->
      """SELECT event_id, user_id,
        | rank() OVER w AS rnk,
        | dense_rank() OVER w AS drnk,
        | ntile(4) OVER w AS quartile,
        | round(percent_rank() OVER w + 0.000000001, 6) AS prnk,
        | round(cume_dist() OVER w + 0.000000001, 6) AS cd,
        | lag(event_id, 1, -1) OVER w AS prev_id,
        | lead(event_id, 1, -1) OVER w AS next_id,
        | first_value(event_id) OVER w AS first_id,
        | last_value(event_id) OVER (PARTITION BY user_id ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin,

    "fn_window_range" ->
      """SELECT event_id, user_id,
        | count(*) OVER (PARTITION BY user_id ORDER BY ts
        |   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)::BIGINT
        |   AS n_last_hour
        |FROM events ORDER BY event_id""".stripMargin
  )
}
