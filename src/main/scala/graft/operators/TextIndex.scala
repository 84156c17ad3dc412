package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — the SPARSE-retrieval serving tier, the
  * seventh persisted index family (after minhash / gram / IVF / IVF-PQ /
  * k-means / linear-model). Where the dense tier answers "vectors near
  * this query vector" through IVF cells, this tier answers "documents
  * matching these query terms, BM25-ranked" through bucketed postings
  * lists — the retrieval half of a RAG pipeline that a dense index cannot
  * express (exact term semantics, no training, instant ingest).
  *
  * The reference pipeline has no retrieval at all (it is a table-copy ELT,
  * see `/root/reference/etl_process.py:18-23`); this tier is part of the
  * mandated LLM-pipeline extension surface, reusing the exact BM25
  * arithmetic of [[Text.bm25]] so the one-shot and the served paths are
  * oracle-equal.
  *
  * Catalog layout under `tablePrefix` (generation-resolved through the
  * same `_current` pointer chain as every other family — see
  * [[graft.sources.Sinks.rebuildCutover]]):
  *
  *   - `_postings` (term, id, tf)  bucketed+sorted by `term` — the
  *     postings lists. A probe filters `term IN (query terms)`, which
  *     Spark serves with BUCKET PRUNING (only the buckets the query terms
  *     hash to are read — `SelectedBucketsCount` in the scan, pinned in
  *     PlanSpec); at 100 TB the probe cost is O(matched postings), never
  *     a corpus scan.
  *   - `_doclens` (id, dl)  bucketed+sorted by `id` — document lengths
  *     for the BM25 length normalization. Joined only against the
  *     (tiny) matched-id set; the index side never re-shuffles.
  *   - `_stats` (batch_id, n_docs, tot_dl) — PARTIAL corpus statistics,
  *     one row per build/ingest/delete verb (deletes append NEGATIVE
  *     compensation rows). Probes sum this metadata-sized table instead
  *     of re-aggregating `_doclens`, so global stats stay O(#batches).
  *   - `_tombstones` (id) — deleted document ids. Probes anti-join their
  *     (small) candidate sets against it; document-frequency is computed
  *     live from the PROBED terms' surviving postings, so deletion
  *     correctness falls out with no stored-df bookkeeping at all.
  *   - `_meta` (k1, b, buckets) — scoring parameters + layout, written
  *     LAST as the completeness marker (crash mid-build leaves a metaless
  *     prefix nothing resolves to).
  */
object TextIndex {

  private[graft] val Suffixes =
    Seq("_postings", "_doclens", "_stats", "_tombstones", "_meta")

  // positional postings: `pos` (0-based, ascending) enables phrase /
  // proximity probes; tf = size(pos) keeps BM25 reads unchanged
  private def postingsOf(docs: DataFrame, idCol: String, toks: Column): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        posexplode(toks).as(Seq("p", "term")))
      .groupBy("term", "id").agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("p").cast("long"))).as("pos"))

  private def doclensOf(docs: DataFrame, idCol: String, toks: Column): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
      size(toks).cast("long").as("dl"))

  /** Build the index over `docs`. Layout + scoring params land in `_meta`
    * (LAST); stats land as the batch_id = -1 base partial.
    */
  def writeTextIndex(
      docs: DataFrame,
      idCol: String,
      toks: Column,
      tablePrefix: String,
      buckets: Int,
      k1: Double = 1.2,
      b: Double = 0.75): Unit = {
    val spark = docs.sparkSession
    val lens = doclensOf(docs, idCol, toks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.sources.Sinks.writeBucketedTable(
        postingsOf(docs, idCol, toks), s"${tablePrefix}_postings", buckets, "term")
      graft.sources.Sinks.writeBucketedTable(
        lens, s"${tablePrefix}_doclens", buckets, "id")
      lens.agg(lit(-1L).as("batch_id"), count(lit(1)).as("n_docs"),
          coalesce(sum("dl"), lit(0L)).as("tot_dl"))
        .write.mode(SaveMode.Overwrite)
        .format("parquet").saveAsTable(s"${tablePrefix}_stats")
      spark.createDataFrame(Seq((0L, 0L))).toDF("id", "pad")
        .filter(lit(false)).select("id")
        .write.mode(SaveMode.Overwrite)
        .format("parquet").saveAsTable(s"${tablePrefix}_tombstones")
      spark.createDataFrame(Seq((k1, b, buckets))).toDF("k1", "b", "buckets")
        .write.mode(SaveMode.Overwrite)
        .format("parquet").saveAsTable(s"${tablePrefix}_meta")
    } finally lens.unpersist()
  }

  /** One ingest cycle: append the batch's postings + doclens
    * bucket-aligned (probes stay zero-rescan as the index grows) and its
    * stats partial. Cost per call is O(|batch| tokens) — one aggregation,
    * two bucketed appends, never a corpus re-scan. This is the
    * `foreachBatch` body of a streaming retrieval ingest
    * (`st_text_index_parity`).
    */
  def ingestIntoTextIndex(
      newDocs: DataFrame,
      idCol: String,
      toks: Column,
      tablePrefix: String,
      batchId: Long = -1L): Unit = {
    val spark = newDocs.sparkSession
    val tp = graft.sources.Sinks.activeTablePrefix(spark, tablePrefix)
    val buckets = spark.table(s"${tp}_meta").head().getInt(2)
    // re-ingesting a TOMBSTONED id must fail loudly: appending fresh
    // postings/doclens for it would (a) stay invisible through every
    // probe's tombstone anti-join while its stats partial counts it, and
    // (b) leave TWO doclens generations for one id once the tombstone is
    // lifted. The supported path is compactTextIndex first (physical
    // excision + tombstone truncation), then ingest normally.
    val resurrected = newDocs.select(col(idCol).cast("long").as("id"))
      .join(spark.table(s"${tp}_tombstones"), Seq("id"), "left_semi")
      .limit(1).collect()
    require(resurrected.isEmpty,
      s"ingest into '$tablePrefix' includes tombstoned id " +
        s"${resurrected.headOption.map(_.getLong(0)).getOrElse(-1L)} — " +
        "run compactTextIndex to excise tombstoned rows before " +
        "re-ingesting a deleted document")
    val lens = doclensOf(newDocs, idCol, toks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      postingsOf(newDocs, idCol, toks).write.mode(SaveMode.Append)
        .bucketBy(buckets, "term").sortBy("term")
        .format("parquet").saveAsTable(s"${tp}_postings")
      lens.write.mode(SaveMode.Append)
        .bucketBy(buckets, "id").sortBy("id")
        .format("parquet").saveAsTable(s"${tp}_doclens")
      lens.agg(lit(batchId).as("batch_id"), count(lit(1)).as("n_docs"),
          coalesce(sum("dl"), lit(0L)).as("tot_dl"))
        .write.mode(SaveMode.Append)
        .format("parquet").saveAsTable(s"${tp}_stats")
    } finally lens.unpersist()
  }

  /** Exactly-once wrapper around [[ingestIntoTextIndex]] — the
    * batchId-keyed write-ahead-ledger recipe with [[deleteFromTextIndex]]
    * as the crash-recovery scrub (per-document rows, so the anti-join
    * scrub applies — unlike the gram index's df partials). Returns true
    * when the batch was applied, false on a redelivery skip.
    */
  def exactlyOnceIngestIntoTextIndex(
      newDocs: DataFrame,
      idCol: String,
      toks: Column,
      tablePrefix: String,
      batchId: Long): Boolean = {
    val spark = newDocs.sparkSession
    graft.sources.Sinks.exactlyOnceBatch(
        spark, s"${tablePrefix}_applied", batchId) {
      hardDeleteFromTextIndex(spark, tablePrefix,
        newDocs.select(col(idCol).cast("long").as("id")))
    } {
      ingestIntoTextIndex(newDocs, idCol, toks, tablePrefix, batchId)
    }.isDefined
  }

  /** Take documents down: tombstone their ids and append a NEGATIVE stats
    * compensation row (their count and summed dl, looked up from
    * `_doclens`). Idempotent — already-tombstoned ids are skipped, so a
    * retried delete cannot double-compensate. Postings rows stay on disk
    * until [[compactTextIndex]]; probes are correct immediately because
    * candidates anti-join the tombstones and df is computed from the
    * surviving postings of the probed terms only.
    *
    * Crash-window ordering: the tombstone append lands FIRST. Dying
    * between the two appends leaves the ids tombstoned but
    * uncompensated — probes are already CORRECT (the docs are
    * invisible; only n_docs/avgdl are slightly stale until
    * [[compactTextIndex]] re-sums stats from the surviving doclens),
    * and the idempotence skip means a retry cannot compensate twice.
    * The reverse order would double-compensate on retry — a permanent
    * stats corruption rather than a repairable staleness.
    */
  def deleteFromTextIndex(
      spark: SparkSession,
      tablePrefix: String,
      ids: DataFrame): Unit = {
    val tp = graft.sources.Sinks.activeTablePrefix(spark, tablePrefix)
    val fresh = ids.select(col(ids.columns.head).cast("long").as("id"))
      .distinct()
      .join(spark.table(s"${tp}_tombstones"), Seq("id"), "left_anti")
      .localCheckpoint(true)
    val comp = fresh.join(spark.table(s"${tp}_doclens"), Seq("id"))
      .agg(lit(-2L).as("batch_id"), (-count(lit(1))).as("n_docs"),
        (-coalesce(sum("dl"), lit(0L))).as("tot_dl"))
      .localCheckpoint(true)
    fresh.write.mode(SaveMode.Append)
      .format("parquet").saveAsTable(s"${tp}_tombstones")
    comp.write.mode(SaveMode.Append)
      .format("parquet").saveAsTable(s"${tp}_stats")
  }

  /** Physical excision (the exactly-once scrub): rewrite postings and
    * doclens without `ids`' rows through the bucket-preserving compaction
    * path, and remove any stats partials those ids contributed by
    * re-summing. Used only by the ledger scrub, where the partial batch's
    * ids are known exactly; routine take-downs use the cheap
    * [[deleteFromTextIndex]].
    */
  private def hardDeleteFromTextIndex(
      spark: SparkSession,
      tablePrefix: String,
      ids: DataFrame): Unit = {
    val tp = graft.sources.Sinks.activeTablePrefix(spark, tablePrefix)
    excise(spark, tp, ids.select(col("id")).distinct().localCheckpoint(true))
  }

  /** Physically remove `gone`'s rows from postings + doclens through the
    * bucket-preserving compaction path, then recompute the single base
    * `_stats` partial from the surviving, non-tombstoned doclens — the
    * shared body of the ledger scrub ([[hardDeleteFromTextIndex]], where
    * `gone` is a partial batch's ids) and the vacuum
    * ([[compactTextIndex]], where `gone` is the tombstone set). The
    * stats scan anti-joins `_tombstones` so an excision that is NOT the
    * tombstone set (the scrub) still leaves tombstoned docs
    * uncounted.
    */
  private def excise(spark: SparkSession, tp: String, gone: DataFrame): (Int, Int) = {
    val res = graft.sources.Sinks.compactTable(spark, s"${tp}_postings",
      rewrite = df => df.join(gone, Seq("id"), "left_anti"))
    graft.sources.Sinks.compactTable(spark, s"${tp}_doclens",
      rewrite = df => df.join(gone, Seq("id"), "left_anti"))
    val st = spark.table(s"${tp}_doclens")
      .join(spark.table(s"${tp}_tombstones"), Seq("id"), "left_anti")
      .agg(lit(-1L).as("batch_id"), count(lit(1)).as("n_docs"),
        coalesce(sum("dl"), lit(0L)).as("tot_dl"))
      .localCheckpoint(true)
    st.write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${tp}_stats")
    res
  }

  /** BM25 top-k probe against the ACTIVE generation. Exactly
    * [[Text.bm25]]'s arithmetic (decimal-summed contributions, round 4,
    * +1e-9) over the index's stored state:
    *
    *   - postings filtered to the query terms — served by bucket pruning,
    *   - tombstone anti-join on the (small) matched set,
    *   - df computed live from the surviving matched postings (tiny:
    *     only the probed terms), so deletes need no df maintenance,
    *   - global n_docs / avgdl from the summed `_stats` partials
    *     (metadata-sized, broadcast).
    *
    * Returns (id, dl, bm25) ordered by bm25 desc, id — deterministic
    * under the round-4 scores.
    */
  def bm25AgainstIndex(
      spark: SparkSession,
      tablePrefix: String,
      queryTerms: Seq[String],
      kTop: Int,
      maxDfFrac: Double = 1.0): DataFrame = {
    require(kTop >= 1, s"kTop=$kTop must be positive")
    bm25Scores(spark, tablePrefix, queryTerms, maxDfFrac)
      .orderBy(col("bm25").desc, col("id"))
      .limit(kTop)
  }

  /** Hot-term audit — the postings-skew report an operator reads before
    * probing with an unvetted query bag (the `d_band_stats` discipline
    * applied to retrieval): per-term document frequency and its corpus
    * fraction, hottest first. The defenses it informs are (a) SEMANTIC —
    * BM25's idf already drives a near-universal term's contribution
    * toward zero, (b) COST — [[bm25AgainstIndex]]'s `maxDfFrac` elides
    * terms above a df fraction from scoring entirely (Lucene's
    * common-terms cutoff; spec-proven, corpus-level threshold is
    * deployment-tuned), and (c) LAYOUT — [[compactTextIndex]] keeps a
    * hot term's postings from fragmenting across ingest files.
    */
  def postingsStats(
      spark: SparkSession,
      tablePrefix: String,
      topN: Int): DataFrame = {
    require(topN >= 1, s"topN=$topN must be positive")
    val tp = graft.sources.Sinks.activeTablePrefix(spark, tablePrefix)
    val stats = spark.table(s"${tp}_stats")
      .agg(sum("n_docs").as("n_docs"))
    spark.table(s"${tp}_postings")
      .join(spark.table(s"${tp}_tombstones"), Seq("id"), "left_anti")
      .groupBy("term").agg(countDistinct("id").as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"), col("df"),
        round(col("df").cast("double") / col("n_docs") + 1e-9, 4).as("df_frac"))
      .orderBy(col("df").desc, col("term"))
      .limit(topN)
  }

  /** Filtered probe — metadata-restricted retrieval (the RAG shape:
    * "top-k matching these terms, but only documents passing this
    * predicate"). Lucene/ES semantics on purpose: the filter restricts
    * CANDIDATES, never statistics — idf/avgdl stay corpus-global, so
    * adding a filter clause cannot re-rank the surviving matches
    * (contrast the dense tier's `sim_knn_ivf_filtered`, where pre-filter
    * semantics are the contract — both contracts exist in production
    * engines; each tier documents and oracle-proves its own). The
    * allowed-id set joins as a LEFT SEMI against the (already
    * term-bounded) scored candidates.
    */
  def bm25FilteredAgainstIndex(
      spark: SparkSession,
      tablePrefix: String,
      queryTerms: Seq[String],
      allowedIds: DataFrame,
      kTop: Int): DataFrame = {
    require(kTop >= 1, s"kTop=$kTop must be positive")
    val allowed = allowedIds
      .select(col(allowedIds.columns.head).cast("long").as("id")).distinct()
    bm25Scores(spark, tablePrefix, queryTerms)
      .join(allowed, Seq("id"), "left_semi")
      .orderBy(col("bm25").desc, col("id"))
      .limit(kTop)
  }

  /** Exact phrase search over the POSITIONAL postings: a document
    * matches at start position s iff term_i of the phrase occurs at
    * s + i for every i — the classic positional-intersection probe
    * (Manning et al., IIR §2.4). Each term's occurrence positions are
    * exploded SHIFTED by −i and the per-term (id, start) sets
    * intersected, so duplicate terms in the phrase ("the ... the") and
    * overlapping self-matches are handled by set semantics with no
    * special cases. Every set is bounded by that term's postings (the
    * scan is bucket-pruned like every probe); ranking is occurrence
    * count desc, id.
    *
    * Returns (id, dl, n_hits) — top kTop by (n_hits desc, id).
    */
  def phraseSearchAgainstIndex(
      spark: SparkSession,
      tablePrefix: String,
      phrase: Seq[String],
      kTop: Int): DataFrame = {
    require(phrase.nonEmpty, "phraseSearchAgainstIndex: empty phrase")
    require(kTop >= 1, s"kTop=$kTop must be positive")
    val tp = graft.sources.Sinks.activeTablePrefix(spark, tablePrefix)
    val post = spark.table(s"${tp}_postings")
      .filter(col("term").isInCollection(phrase.distinct))
      .join(spark.table(s"${tp}_tombstones"), Seq("id"), "left_anti")
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      post.filter(col("term") === t)
        .select(col("id"), explode(col("pos")).as("p"))
        .select(col("id"), (col("p") - i).as("start"))
    }
    val hits = parts.reduce(_.intersect(_))
    hits.groupBy("id").agg(count(lit(1)).as("n_hits"))
      .join(spark.table(s"${tp}_doclens"), "id")
      .select("id", "dl", "n_hits")
      .orderBy(col("n_hits").desc, col("id"))
      .limit(kTop)
  }

  /** Ordered proximity ("A NEAR/k B") over the positional postings: a
    * document scores one hit per occurrence of `termA` that has an
    * occurrence of `termB` within (0, maxDist] positions AFTER it —
    * distinct anchors, so several B's near one A count once (the
    * deterministic, replayable convention). The position pairing is a
    * per-document range join between two term-bounded position sets;
    * nothing scans beyond the two terms' bucket-pruned postings.
    *
    * Returns (id, dl, n_hits) — top kTop by (n_hits desc, id).
    */
  def proximitySearchAgainstIndex(
      spark: SparkSession,
      tablePrefix: String,
      termA: String,
      termB: String,
      maxDist: Int,
      kTop: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist=$maxDist must be >= 1")
    require(kTop >= 1, s"kTop=$kTop must be positive")
    val tp = graft.sources.Sinks.activeTablePrefix(spark, tablePrefix)
    val post = spark.table(s"${tp}_postings")
      .filter(col("term").isInCollection(Seq(termA, termB).distinct))
      .join(spark.table(s"${tp}_tombstones"), Seq("id"), "left_anti")
    def positions(t: String, as: String) =
      post.filter(col("term") === t)
        .select(col("id"), explode(col("pos")).as(as))
    val hits = positions(termA, "pa")
      .join(positions(termB, "pb"),
        Seq("id")) // per-doc range pairing; both sides term-bounded
      .filter(col("pb") > col("pa") && col("pb") <= col("pa") + maxDist)
      .select("id", "pa").distinct()
    hits.groupBy("id").agg(count(lit(1)).as("n_hits"))
      .join(spark.table(s"${tp}_doclens"), "id")
      .select("id", "dl", "n_hits")
      .orderBy(col("n_hits").desc, col("id"))
      .limit(kTop)
  }

  /** Shared scoring plan of the single-bag probes: (id, dl, bm25) for
    * every surviving document matching >= 1 query term — bucket-pruned
    * postings scan, tombstone anti-join, live df, summed stats partials.
    */
  private def bm25Scores(
      spark: SparkSession,
      tablePrefix: String,
      queryTerms: Seq[String],
      maxDfFrac: Double = 1.0): DataFrame =
    bm25Contribs(spark, tablePrefix, queryTerms, maxDfFrac)
      .groupBy("id", "dl")
      .agg(round(sum(col("contrib").cast("decimal(28,14)")).cast("double") + 1e-9, 4)
        .as("bm25"))

  /** The ONE BM25 scoring body every probe shape consumes: per surviving
    * (term, id) posting of the query terms, the term's BM25 contribution
    * plus the doc length — bucket-pruned postings scan, tombstone
    * anti-join, live df, summed stats partials, optional common-term
    * elision. The single probe aggregates it by (id, dl); the batched
    * probe first fans it out against its (query_id, term) pairs. One
    * body means the probes cannot drift apart (same elision, same
    * arithmetic, same determinism device).
    */
  private def bm25Contribs(
      spark: SparkSession,
      tablePrefix: String,
      queryTerms: Seq[String],
      maxDfFrac: Double): DataFrame = {
    require(queryTerms.nonEmpty, "bm25AgainstIndex: no query terms")
    require(maxDfFrac > 0 && maxDfFrac <= 1.0,
      s"maxDfFrac=$maxDfFrac must be in (0, 1]")
    val tp = graft.sources.Sinks.activeTablePrefix(spark, tablePrefix)
    val m = spark.table(s"${tp}_meta").head()
    val (k1, b) = (m.getDouble(0), m.getDouble(1))
    val stats = spark.table(s"${tp}_stats")
      .agg(sum("n_docs").as("n_docs"), sum("tot_dl").as("tot_dl"))
    val tomb = spark.table(s"${tp}_tombstones")
    val post = spark.table(s"${tp}_postings")
      .filter(col("term").isInCollection(queryTerms))
      .join(tomb, Seq("id"), "left_anti")
    val dfreq = post.groupBy("term").agg(countDistinct("id").as("df"))
    val joined = post.join(broadcast(dfreq), "term")
      .join(spark.table(s"${tp}_doclens"), "id")
      .crossJoin(broadcast(stats))
    // common-term elision (Lucene's cutoff): terms above the df fraction
    // contribute nothing and their postings never reach the scoring —
    // the probe's COST defense against stop-term bags; default 1.0 keeps
    // the exact-BM25 contract
    val elided =
      if (maxDfFrac >= 1.0) joined
      else joined.filter(
        col("df").cast("double") <= lit(maxDfFrac) * col("n_docs"))
    elided
      .withColumn("avgdl", col("tot_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log(lit(1.0) + ((col("n_docs") - col("df")).cast("double") + 0.5)
          / (col("df").cast("double") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1))
          / (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .select("term", "id", "dl", "contrib")
  }

  /** Batched multi-query BM25 probe — the serving fan-in shape: N query
    * term bags answered in ONE pass over the index instead of N probes.
    * The bags arrive driver-side (they are the serving request batch),
    * so their term union pushes down as a LITERAL `IN` filter — the scan
    * stays bucket-pruned exactly like the single probe — while the
    * per-query scoring fans out through a broadcast join against the
    * (query_id, term) pairs. Per-query top-k is one window partitioned
    * by query_id (WindowGroupLimit keeps per-partition top-k before the
    * shuffle). Cost: one pruned postings pass for the whole batch —
    * the amortization is the point.
    *
    * Returns (query_id, rank, id, dl, bm25), rank 1..kTop per query.
    */
  def bm25BatchAgainstIndex(
      spark: SparkSession,
      tablePrefix: String,
      queryBags: Map[Long, Seq[String]],
      kTop: Int,
      maxDfFrac: Double = 1.0): DataFrame = {
    require(queryBags.nonEmpty && queryBags.values.forall(_.nonEmpty),
      "bm25BatchAgainstIndex: every query needs at least one term")
    require(kTop >= 1, s"kTop=$kTop must be positive")
    val allTerms = queryBags.values.flatten.toSeq.distinct
    val qt = spark.createDataFrame(
        queryBags.toSeq.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) })
      .toDF("query_id", "term")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("bm25").desc, col("id"))
    // the shared scoring body (same elision, arithmetic and determinism
    // device as the single probe — the shapes cannot drift), fanned out
    // per query bag and top-k'd per query
    bm25Contribs(spark, tablePrefix, allTerms, maxDfFrac)
      .join(broadcast(qt), "term")
      .groupBy("query_id", "id", "dl")
      .agg(round(sum(col("contrib").cast("decimal(28,14)")).cast("double") + 1e-9, 4)
        .as("bm25"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kTop)
      .select("query_id", "rank", "id", "dl", "bm25")
  }

  /** Lazy probe plan for plan audits (PlanSpec pins bucket pruning on the
    * postings scan) — identical to [[bm25AgainstIndex]], which is already
    * lazy; alias kept for the sibling families' naming convention.
    */
  private[graft] def bm25AgainstIndexPlan(
      spark: SparkSession,
      tablePrefix: String,
      queryTerms: Seq[String],
      kTop: Int): DataFrame =
    bm25AgainstIndex(spark, tablePrefix, queryTerms, kTop)

  /** Blue/green rebuild — for scoring-parameter (k1/b) or bucket-count
    * changes; same pointer/resolve contract as the sibling families.
    * Returns the new generation number.
    *
    * Exactly-once ledger contract: the `_applied` batch history is NOT
    * generation-scoped (see [[graft.sources.Sinks.clearIngestLedger]]).
    * Rebuilding from a corpus that already CONTAINS the committed
    * batches (the usual re-encode) keeps the ledger — a post-cutover
    * redelivery must still skip or it would double-apply. Rebuilding
    * from a snapshot that EXCLUDES them means the caller is resetting
    * the stream to replay those batches: clear the ledger with the same
    * cutover, or the replays are silently skipped.
    */
  def rebuildTextIndex(
      docs: DataFrame,
      idCol: String,
      toks: Column,
      tablePrefix: String,
      buckets: Int,
      k1: Double = 1.2,
      b: Double = 0.75): Long =
    graft.sources.Sinks.rebuildCutover(docs.sparkSession, tablePrefix,
      Suffixes) { g =>
      writeTextIndex(docs, idCol, toks, g, buckets, k1, b)
    }

  /** Fork (snapshot) the active generation into an independent staging
    * copy — the copy-on-write verb mutation trials run on.
    */
  def snapshotTextIndex(
      spark: SparkSession,
      fromPrefix: String,
      toPrefix: String): Unit =
    graft.sources.Sinks.snapshotTablePrefix(spark, fromPrefix, toPrefix, Suffixes)

  /** Vacuum: fold tombstoned rows out of postings/doclens (bucket
    * layout preserved — probes keep their pruned scans), re-sum the
    * stats partials to one base row, and truncate the tombstones.
    * Returns (input files, output files) for the postings rewrite.
    */
  def compactTextIndex(spark: SparkSession, tablePrefix: String): (Int, Int) = {
    val tp = graft.sources.Sinks.activeTablePrefix(spark, tablePrefix)
    val gone = spark.table(s"${tp}_tombstones").localCheckpoint(true)
    val res = excise(spark, tp, gone)
    gone.limit(0).write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${tp}_tombstones")
    res
  }
}
