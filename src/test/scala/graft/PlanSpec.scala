package graft

import graft.SparkEntry

/** Physical-plan shape assertions — the properties that make queries hold at
  * 100 TB, checked on the tiny sf so regressions surface in CI, not on the
  * cluster: correlated subqueries must decorrelate to joins (a per-row
  * subplan re-executes the inner query once per outer row), and the star
  * join must broadcast its dimensions.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("k-means assignment broadcasts the centroids; no cartesian product") {
    // audit the operator's lazy plan (the query memoizes via a
    // localCheckpoint, whose plan is just a materialized-RDD scan)
    val df = graft.operators.Similarity.kmeansAssign(
      graft.sources.Tables.load(spark, sf, "embeddings"),
      "vec_id", "embedding", k = 8, iters = 1)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"centroids must reach the assignment via broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"assignment must never cartesian-shuffle the corpus:\n$p")
  }

  test("SemDeDup prune joins clusters by cid hash; no cartesian product") {
    val p = plan("sim_semdedup_keep")
    assert(!p.contains("CartesianProduct"),
      s"within-cluster pairs must come from a cid equi-join:\n$p")
    assert("""cid#\d+""".r.findFirstIn(p).isDefined
      && (p.contains("HashJoin") || p.contains("SortMergeJoin")),
      s"expected the cid self-join in:\n$p")
  }

  test("exact set-similarity join plans equi joins only — never a cartesian") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val toks = graft.functions.CrossHash.tokens(col("text"))
    val p = graft.operators.Dedup.setSimilarityJoinPlan(
        docs, "doc_id", graft.functions.CrossHash.wordShingles(toks, 3), threshold = 0.7)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix filtering must keep candidate generation an equi join on tok:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected the prefix-token equi join in:\n$p")
  }

  test("SCD2 point-in-time join is windows + equi joins — no range cross product") {
    val p = plan("q_scd2_pit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the as-of spelling must never plan a validity-range cross product:\n$p")
    assert(p.contains("Window"), s"expected the as-of window pass in:\n$p")
  }

  test("correlated EXISTS decorrelates to a left semi join, no per-row subplan") {
    val p = plan("q_exists_correlated")
    assert(p.contains("LeftSemi"), s"expected a semi join in:\n$p")
    // a surviving correlated subplan would show as a (non-scalar) Subquery
    // re-executed per row; after decorrelation only joins remain
    assert(!p.contains("InSubqueryExec"), s"subquery survived decorrelation:\n$p")
  }

  test("correlated scalar subquery decorrelates to aggregate + join") {
    val p = plan("q_scalar_subquery")
    // the per-part average must appear as its own aggregation joined back,
    // not as a ScalarSubquery evaluated per outer row
    assert(!p.contains("ScalarSubquery"), s"scalar subquery not decorrelated:\n$p")
    assert(p.contains("Join"), s"expected the decorrelated join in:\n$p")
  }

  test("Q21 shape: multi-EXISTS + NOT-EXISTS decorrelate to one semi and one anti join") {
    val p = plan("q_multi_exists")
    assert(p.contains("LeftSemi"), s"expected a semi join (EXISTS) in:\n$p")
    assert(p.contains("LeftAnti"), s"expected an anti join (NOT EXISTS) in:\n$p")
    // both subqueries must become joins of the fact table — a surviving
    // per-row subplan would re-scan lineitem once per outer row
    assert(!p.contains("InSubqueryExec"), s"subquery survived decorrelation:\n$p")
    assert(!p.contains("ScalarSubquery"), s"unexpected scalar subplan:\n$p")
  }

  test("Q22 shape: anti join + one-row scalar aggregate, no per-row subplan") {
    val p = plan("q_anti_scalar")
    assert(p.contains("LeftAnti"), s"expected the no-orders anti join in:\n$p")
    // the uncorrelated scalar avg is legitimately a ONE-TIME subquery
    // (one row, evaluated once, broadcast into the filter) — what must
    // NOT appear is a correlated per-row form (InSubqueryExec) or a
    // re-aggregation joined per row
    assert(!p.contains("InSubqueryExec"), s"per-row subquery in:\n$p")
    val semiCount = "LeftSemi".r.findAllIn(p).length
    assert(semiCount == 0, s"unexpected semi joins in:\n$p")
  }

  test("chunked embedding pair join plans as an equi join on the tile key, never cartesian") {
    val e = graft.sources.Tables.load(spark, sf, "embeddings")
    val p = graft.operators.Dedup.embeddingPairs(
        e, "vec_id", "embedding", "label", threshold = 0.38, chunkRows = 64)
      .queryExecution.executedPlan.toString
    // the tile grid must drive a hash/sort-merge equi join on (ca, cb);
    // if Catalyst ever folded those keys away the plan would degrade to
    // the O(n²)-per-task cartesian the chunking exists to prevent
    assert(!p.contains("CartesianProduct"),
      s"chunk join degraded to a cartesian product:\n$p")
    // the two broadcast chunk-id replications are fine; the x-y verify
    // join itself must be keyed
    assert("""(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)""".r
      .findFirstIn(p).isDefined, s"expected an equi join in:\n$p")
  }

  test("star join broadcasts the dimension side") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dims in:\n$p")
  }

  test("incremental scan pushes the day range onto the raw on-disk ts column") {
    val df = graft.sources.Tables.loadIncremental(spark, sf, "events", "ts",
      java.time.LocalDate.parse("2024-01-15"))
    val p = df.queryExecution.executedPlan.toString
    // the filter must reach the parquet scan as attribute-vs-literal on the
    // RAW on-disk column — long nanos or timestamp[us]/NTZ, whichever form
    // the corpus ships (row-group skipping); a filter on the session-zone
    // conversion would not appear in PushedFilters at all
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts"),
      s"day range not pushed to the scan:\n$p")
    // and the normalized output is watermark/unix_micros-compatible
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
  }

  test("salted join joins on (key, salt), not key alone") {
    val p = plan("q_skew_join")
    // the salt must appear IN a join key list next to k — merely appearing
    // as a projected column would mean the hot key still lands on one
    // reducer (and the exploded right side would duplicate rows)
    assert("""k#\d+L?, __salt#\d+""".r.findFirstIn(p).isDefined,
      s"expected (k, __salt) as compound join keys in:\n$p")
  }

  test("date-equality predicate pushes to the lineitem scan") {
    val p = plan("p6_date_predicate")
    // the filter must render INSIDE PushedFilters — 'l_shipdate' alone also
    // appears in an unpushed post-scan Filter, which is the regression this
    // test exists to catch
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate range not pushed into the scan:\n$p")
  }

  test("tfidf broadcasts the corpus count, joins tf/df by hash") {
    val p = plan("tx_tfidf")
    // the 1-row corpus count must arrive via broadcast, never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"corpus count not broadcast in:\n$p")
  }

  test("bm25 filters to query terms before aggregating, broadcasts corpus stats") {
    val p = plan("tx_bm25")
    assert(p.contains("BroadcastExchange"), s"corpus stats not broadcast in:\n$p")
    // the term filter must precede the explode's aggregation: it shows as a
    // filter on the exploded term column, bounding the shuffled frame to
    // |docs|·|queryTerms| — without it the full posting list shuffles
    assert(p.contains("spark") && (p.contains("INSET") || p.contains("IN (")),
      s"query-term filter missing from:\n$p")
  }

  test("context packing windows per shard — a global (unpartitioned) window would serialize at scale") {
    val p = plan("tx_pack_ctx")
    // Spark renders an unpartitioned window as an empty partition spec
    // with a single-partition exchange feeding it
    assert("""windowspecdefinition\(shard""".r.findFirstIn(p.toLowerCase).isDefined,
      s"expected the window partitioned by shard in:\n$p")
    assert(!p.contains("SinglePartition"),
      s"packing must not funnel through one partition:\n$p")
  }

  test("globalRank (the ppl-bucket rank) windows per value-bucket — no corpus-sized single-partition window") {
    // audit the operator's lazy plan (tx_ppl_buckets memoizes the bucketed
    // frame via localCheckpoint, whose plan is a materialized-RDD scan)
    val base = graft.sources.Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        (org.apache.spark.sql.functions.col("doc_id") % 97)
          .cast("double").as("nll"))
    val df = graft.operators.Relational
      .globalRank(base, "nll", Seq("doc_id"), "rnk", buckets = 8)
    val p = df.queryExecution.executedPlan.toString
    // the exact rank must come from per-bucket windows + broadcast offsets,
    // never row_number() OVER (ORDER BY …) whose physical form is an
    // Exchange SinglePartition feeding one corpus-wide Window task
    assert(!p.contains("SinglePartition"),
      s"the rank must never funnel the corpus through one partition:\n$p")
    assert("""windowspecdefinition\(__gr_b""".r.findFirstIn(p.toLowerCase).isDefined,
      s"expected the window partitioned by the value bucket in:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"bucket offsets must arrive via broadcast in:\n$p")
  }

  test("two-stage ANN broadcasts the bounded query side; no cartesian product") {
    val p = plan("sim_knn_2stage")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query side not broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"coarse stage must broadcast, not cartesian-shuffle:\n$p")
  }

  test("CDC containment joins by chunk fingerprint hash; no cartesian product") {
    // the public method localCheckpoints its result, whose plan is just a
    // materialized-RDD scan — audit the lazy pipeline it executes instead
    val df = graft.operators.Dedup.cdcContainmentPlan(
      graft.sources.Tables.load(spark, sf, "documents"),
      "doc_id", org.apache.spark.sql.functions.col("text"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be a hash join on chunk_fp:\n$p")
    assert("""chunk_fp#\d+""".r.findFirstIn(p).isDefined
      && (p.contains("HashJoin") || p.contains("SortMergeJoin")),
      s"expected the chunk_fp self-join in:\n$p")
  }

  test("decontamination broadcasts the benchmark grams; the train side never shuffles into the join") {
    val p = plan("d_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast bench side in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"unexpected product join in:\n$p")
  }

  test("boilerplate blocklist is a bounded top-K broadcast back to the gram frame") {
    // the suite query now reads the memoized signal frame (an
    // RDD-scan plan) — audit the lazy operator pipeline the frame build
    // executes instead, the cdcContainmentPlan discipline
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .withColumn("__tk", graft.functions.CrossHash.tokens(
        org.apache.spark.sql.functions.col("text")))
    val p = graft.operators.Text.boilerplateCoverage(docs, "doc_id",
        graft.functions.CrossHash.wordShingles(
          org.apache.spark.sql.functions.col("__tk"), 3), topK = 500)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K df must be partial-topK-merge, not a full sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast blocklist in:\n$p")
  }

  test("lateral top-N decorrelates to WindowGroupLimit + join, no per-row subplan") {
    val p = plan("q_lateral_topn")
    // partial per-partition top-N before the window rank — the plan that
    // scales; a surviving correlated subplan would nested-loop per order
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$p")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"lateral fell back to a product join:\n$p")
  }

  test("runtime bloom filter injects a might_contain prefilter on the probe side") {
    // the 100 TB shape: fact SMJ dim-with-selective-filter — Spark's
    // runtime filtering builds a bloom filter from the filtered dim keys
    // and applies it to the fact scan BEFORE the shuffle, cutting shuffled
    // bytes by the dim filter's selectivity. Thresholds are size-based
    // (10GB-scale defaults), so pin the behavior at spec scale by zeroing
    // them; the assertion is the injected might_contain, not the sizes.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.sources.Tables.load(spark, sf, "lineitem")
      val ord = graft.sources.Tables.load(spark, sf, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord,
        li("l_orderkey") === ord("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"runtime bloom filter not injected on the probe side:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("cdc chunk cut points resolve to the promoted native expression") {
    val p = plan("tx_cdc_chunks")
    assert(p.toLowerCase.contains("graft_cdc_ends"),
      s"expected the native CdcEnds expression in:\n$p")
  }

  private def countOf(p: String, needle: String): Int =
    needle.r.findAllMatchIn(p).length

  test("SCD2 build pays exactly one hash shuffle — all windows share the custkey partitioning") {
    val p = plan("q_scd2")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"expected one custkey shuffle (dedup/runs/lead all re-sort in place), got:\n$p")
  }

  test("expectation audit is one scan, one aggregation pass, for all rules") {
    val p = plan("dq_expectations")
    assert(countOf(p, "FileScan") == 1, s"expected a single lineitem scan in:\n$p")
    assert(p.contains("partial_sum"),
      s"violation sums must combine map-side before the single-partition exchange:\n$p")
  }

  test("EWMA lags run in one window pass over one user shuffle") {
    val p = plan("q_ewma")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"expected one user_id shuffle for all eight lags:\n$p")
    assert(countOf(p, "\\bWindow \\[") == 1,
      s"the eight lags must share a single Window operator:\n$p")
  }

  test("sweep-line concurrency explodes boundaries from a single scan") {
    val p = plan("q_concurrency")
    assert(countOf(p, "FileScan") == 1,
      s"boundary points must come from one events scan (explode), not a self-union:\n$p")
    assert(countOf(p, "Exchange hashpartitioning") == 1,
      s"running sum and peak must share the event_type shuffle:\n$p")
  }

  test("PMI materializes the vocabulary once and broadcasts it to both join sides") {
    val p = plan("tx_pmi")
    // the checkpointed 150-row vocab appears as an in-memory scan, not a
    // re-run of the corpus-wide df aggregation per side
    assert(countOf(p, "FileScan parquet") == 2,
      s"expected two documents scans (one per self-join side) and no vocab re-run:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"vocab restriction must broadcast:\n$p")
  }

  test("PSI drift broadcasts the decile edges and the split cut to the fact scan") {
    val p = plan("dq_drift")
    // both one-row frames (cut date, 9 edges) must reach the events scan
    // as broadcasts — a shuffle here would move the fact table twice
    assert(countOf(p, "BroadcastNestedLoopJoin") >= 2,
      s"expected broadcast cut + edges joins in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no fact-table shuffle join should appear:\n$p")
  }

  test("ABC analysis windows over the per-part aggregate, not the fact table") {
    val p = plan("q_abc_analysis")
    // the cumulative window must sit ABOVE the partial-aggregated frame:
    // lineitem is aggregated to parts before any Window operator runs
    val winIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < p.lastIndexOf("HashAggregate"),
      s"expected window over the aggregated frame:\n$p")
    assert(p.contains("partial_sum"),
      s"revenue aggregation must combine map-side:\n$p")
  }

  test("MIPS broadcasts the bounded query side and pushes top-k below the shuffle") {
    val p = plan("sim_mips")
    assert(p.contains("BroadcastNestedLoopJoin BuildLeft"),
      s"query side must broadcast against the corpus:\n$p")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"per-query top-k must prune map-side before the rank shuffle:\n$p")
  }

  test("day-partitioned layout prunes to one partition for a one-day read") {
    // the property the DAY-partitioned sink exists for at 100 TB: a
    // one-day predicate must prune at PLANNING time (PartitionFilters on
    // the scan, one directory touched), never scan-then-filter
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val df = spark.range(300).selectExpr(
      "id", "timestamp_micros(cast(1705276800000000 + id * 900000000 as long)) AS ts")
    graft.sources.Sinks.write(df, out, dayPartitionField = Some("ts"))
    val read = spark.read.parquet(out).filter("p_date = DATE'2024-01-16'")
    val scan = read.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.exists(_.toString.contains("p_date")),
      s"day predicate must be a partition filter: ${scan.partitionFilters}")
    // selectedPartitions is evaluated at planning: exactly one directory
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size == 1,
      "one-day read must touch exactly one partition directory")
    assert(read.count() == df.filter("to_date(ts) = DATE'2024-01-16'").count())
  }

  test("CBO: ANALYZE column stats flip a selective-filter join to broadcast") {
    // The 100 TB claim behind ANALYZE TABLE: without column statistics a
    // Filter inherits its child's size estimate, so a selectivity-1/ndv
    // equality filter over a large table still plans as a shuffle join;
    // with COMPUTE STATISTICS FOR COLUMNS the CBO estimates the filtered
    // cardinality and broadcasts the (actually tiny) side with NO hint.
    val n = 400000L
    spark.range(n).selectExpr("id", "id % 50000 AS grp", "repeat('x', 40) AS pad")
      .write.mode("overwrite").saveAsTable("cbo_fact")
    spark.range(n).selectExpr("id", "repeat('y', 40) AS pad2")
      .write.mode("overwrite").saveAsTable("cbo_other")
    def joinPlan: String = {
      val filtered = spark.table("cbo_fact").filter("grp = 7")
      spark.table("cbo_other").join(filtered, "id")
        .queryExecution.executedPlan.toString
    }
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.planStats.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false") // AQE would re-plan at runtime; this pins COMPILE-time stats use
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo_other COMPUTE STATISTICS")
      val before = joinPlan
      assert(before.contains("SortMergeJoin"),
        s"without column stats the filtered side must look big (shuffle join):\n$before")
      spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS FOR COLUMNS grp")
      val after = joinPlan
      assert(after.contains("BroadcastHashJoin"),
        s"column stats must shrink the filter estimate to a broadcast:\n$after")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

}
