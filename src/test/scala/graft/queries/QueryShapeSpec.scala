package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural invariants of the newest query-tier entries — properties the
  * DuckDB hash-compare can't see (it pins equality, not WHY the answer is
  * right).
  */
class QueryShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("certificateQueries: the sf0.1 re-proof subset names real queries") {
    val certs = graft.SparkEntry.certificateQueries
    val all = graft.SparkEntry.queries.keySet
    val ghosts = certs.diff(all)
    assert(ghosts.isEmpty, s"certificate set names unknown queries: $ghosts")
    // every streaming parity is scale-sensitive by construction
    assert(all.filter(_.startsWith("st_")).subsetOf(certs))
    // sentinels for the three certificate families the subset exists for:
    // sketches, ANN floors, index lifecycle
    Seq("fn_hll_sketch", "q_approx_percentile", "sim_knn_ivf",
        "sim_knn_ivf_sqrtn", "d_exactly_once_ingest")
      .foreach(s => assert(certs.contains(s), s"missing sentinel $s"))
  }

  test("tx_chunk_overlap: chunks tile every document with stride-24 starts") {
    import spark.implicits._
    val chunks = TextQueries.queries("tx_chunk_overlap")(spark, sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max("start").as("last_start"),
        min("start").as("first_start"),
        sum(when(col("n_toks") === 32, 1).otherwise(0)).as("n_full"))
      .as[(Long, Long, Long, Long, Long)]
      .collect()
    val nToks = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (doc, nChunks, lastStart, firstStart, nFull) =>
      val n = nToks(doc)
      assert(firstStart == 0L, s"doc $doc: first chunk must start at 0")
      // starts are 0, 24, 48, … ≤ n-1 ⇒ count = ceil(n/24), so every token
      // index < n is covered by the chunk starting at 24*floor(i/24)
      assert(nChunks == (n + 23) / 24, s"doc $doc: chunk count")
      assert(lastStart == 24L * ((n - 1) / 24), s"doc $doc: last start")
      // all but at most two trailing chunks are full 32-token windows
      assert(nFull >= nChunks - 2, s"doc $doc: full-window count")
    }
  }

  test("q_variant: typed extraction handles missing paths and type casts") {
    import spark.implicits._
    val out = RelationalQueries.queries("q_variant")(spark, sf)
    val row = out.orderBy("event_id").limit(1)
      .select("k_int", "k_str", "k_missing", "v_is_null")
      .as[(Option[Long], Option[String], Option[String], Boolean)]
      .head()
    assert(row._1.isDefined, "k extracts as BIGINT")
    assert(row._2.contains(row._1.get.toString), "string cast of the same path")
    assert(row._3.isEmpty, "missing path yields NULL, not error")
    assert(!row._4, "parsed object is not the JSON null literal")
  }

  test("st_late_data_parity: some stragglers drop, some merge, no duplicate windows") {
    import spark.implicits._
    val out = StreamQueries.queries("st_late_data_parity")(spark, sf)
      .select(col("win_start"), col("n")).as[(String, Long)].collect()
    assert(out.map(_._1).distinct.length == out.length,
      "append mode must emit each finalized window exactly once")
    val total = out.map(_._2).sum
    val all = graft.sources.Tables.load(spark, sf, "events").count()
    val onTime = graft.sources.Tables.load(spark, sf, "events")
      .filter(pmod(col("event_id"), lit(5)) =!= 0).count()
    assert(total < all, "watermark must drop at least one straggler")
    assert(total > onTime, "at least one straggler must merge into a live window")
  }

  test("k11_xml_roundtrip: XML metacharacters survive write+read") {
    val out = ParityQueries.queries("k11_xml_roundtrip")(spark, sf)
    val probes = out.select("xml_probe").collect().map(_.getString(0))
    assert(probes.nonEmpty)
    assert(probes.forall(_.contains(" <&\"'> ")),
      "escaped metacharacters must round-trip verbatim")
  }

  // q_incr_quantiles_kll's mergeability contract, pinned at the two KLL
  // regimes. Exact equality of two merge orders is only guaranteed while
  // every sketch is in EXACT mode (n ≤ k: the sketch stores all items, a
  // merge is a concatenation); once compaction starts, Datasketches flips
  // an unseeded coin per compaction, so different merge orders give
  // different-but-bounded estimates — that bound is the contract there.
  test("kll quantiles: exact mode (n <= k) is merge-order-invariant and exact") {
    import spark.implicits._
    // 120 values across 5 days, k = 200 > 120: every daily sketch and the
    // merged sketch stay exact
    val ev = (1 to 120).map(i => (i % 5, i.toDouble)).toDF("day", "value")
    val daily = ev.groupBy("day")
      .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"))
      .localCheckpoint(true)
    def est(order: org.apache.spark.sql.Column): (Double, Double) =
      daily.repartition(1).sortWithinPartitions(order)
        .agg(expr("kll_merge_agg_double(sk)").as("msk"))
        .selectExpr("kll_sketch_get_quantile_double(msk, 0.5d)",
          "kll_sketch_get_quantile_double(msk, 0.9d)")
        .as[(Double, Double)].head()
    val (a50, a90) = est(col("day").asc)
    val (b50, b90) = est(col("day").desc)
    assert(a50 == b50 && a90 == b90,
      s"exact-mode merges must be order-invariant: ($a50,$a90) vs ($b50,$b90)")
    // inclusive-rank quantile over 1..120: smallest v with rank(v) >= q
    assert(a50 == 60.0, s"p50 of 1..120 must be exact in exact mode, got $a50")
    assert(a90 == 108.0, s"p90 of 1..120 must be exact in exact mode, got $a90")
  }

  test("kll quantiles: compaction mode bounds the true rank in both merge orders") {
    import spark.implicits._
    val k = 200
    val eps = 2 * org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)
    // 8000 values > k forces compaction; seeded shuffle spreads days so
    // each daily sketch also compacts
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((1 to 8000).toVector).zipWithIndex
      .map { case (v, i) => (i % 16, v.toDouble) }
    val ev = rows.toDF("day", "value").repartition(4).localCheckpoint(true)
    val daily = ev.groupBy("day")
      .agg(expr(s"kll_sketch_agg_double(value, $k)").as("sk"))
      .localCheckpoint(true)
    for (order <- Seq(col("day").asc, col("day").desc)) {
      val (n, e50, e90) = daily.repartition(1).sortWithinPartitions(order)
        .agg(expr("kll_merge_agg_double(sk)").as("msk"))
        .selectExpr("kll_sketch_get_n_double(msk)",
          "kll_sketch_get_quantile_double(msk, 0.5d)",
          "kll_sketch_get_quantile_double(msk, 0.9d)")
        .as[(Long, Double, Double)].head()
      assert(n == 8000L, "tracked n is exact through any merge tree")
      // true inclusive rank of the estimate over the uniform 1..8000
      def trueRank(v: Double): Double = math.floor(v) / 8000.0
      assert(math.abs(trueRank(e50) - 0.5) <= eps,
        s"p50 estimate $e50 outside rank bound $eps")
      assert(math.abs(trueRank(e90) - 0.9) <= eps,
        s"p90 estimate $e90 outside rank bound $eps")
    }
  }

  test("d_curate_full: the funnel counts are monotone and the survivors are exactly n_s8") {
    val rows = TextQueries.queries("d_curate_full")(spark, sf)
      .localCheckpoint(true)
    val head = rows.select((1 to 8).map(i => col(s"n_s$i")): _*).head()
    val funnel = (0 until 8).map(head.getLong)
    assert(funnel == funnel.sorted.reverse,
      s"cumulative gates can only shrink the survivor set: $funnel")
    assert(rows.count() == funnel.last,
      s"emitted survivors (${rows.count()}) must equal the last funnel stage (${funnel.last})")
  }

  test("d_domain_gate: blocked domains are absent and every kept doc carries its domain's stats") {
    val rows = TextQueries.queries("d_domain_gate")(spark, sf)
      .localCheckpoint(true)
    val nBlocked = rows.select("n_blocked").head().getLong(0)
    assert(nBlocked >= 3L, "the bottom-3 rule always blocks at least 3 domains")
    val keptDomains = rows.select("domain").distinct().count()
    // every domain is either fully kept or fully blocked — the gate is
    // domain-level by construction
    val docsPerDomain = rows.groupBy("domain").count()
      .select("count").distinct().collect().map(_.getLong(0))
    assert(docsPerDomain.forall(_ > 0))
    assert(keptDomains + nBlocked >= 4,
      s"kept $keptDomains + blocked $nBlocked domains should cover the corpus' sources")
  }

  test("d_curate_emit: every shard's window count is the ceil of its token mass") {
    // the result is a localCheckpoint of the manifest (the scratch shard
    // dir is gone by return), so the invariant is pinned on the OUTPUT:
    // ≤ 8 shards, window count = ceil(token mass / 512) per shard
    val df = TextQueries.queries("d_curate_emit")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 8)
    rows.foreach { r =>
      val nTokens = r.getAs[Long]("n_tokens")
      val nWindows = r.getAs[Long]("n_windows")
      assert(nWindows == (nTokens + 511) / 512,
        s"window count must be ceil(token mass / 512): $r")
    }
  }
}
