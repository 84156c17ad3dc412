package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.SchemaRegistry

/** Parquet sink with the reference's load semantics
  * (`bigquery_operations.py:21-48`):
  *
  *  - K1 schema enforcement: declared `StructType` bound before the write;
  *  - K2 write disposition: daily ⇒ append, full ⇒ overwrite (truncate)
  *    (`bigquery_operations.py:36`);
  *  - K3 DAY time-partitioning: derived `p_date` partition column, the
  *    file-layout analogue of BigQuery's `TimePartitioning(DAY, field=…)`
  *    (`bigquery_operations.py:30-34`). Day partitioning keeps future
  *    incremental reads partition-prunable, which is the 100 TB story: a
  *    daily query touches one directory, not the table;
  *  - K5 post-load row-count audit (`bigquery_operations.py:46-48`).
  */
object Sinks {

  final case class LoadReport(table: String, rowsLoaded: Long, rowsTotal: Long)

  /** Partition column name added by DAY partitioning. */
  val PartitionCol = "p_date"

  /** K2+K3: write with disposition + optional DAY partitioning. */
  def write(
      df: DataFrame,
      path: String,
      daily: Boolean = false,
      dayPartitionField: Option[String] = None): Unit = {
    val mode = if (daily) SaveMode.Append else SaveMode.Overwrite
    dayPartitionField match {
      case Some(f) =>
        // repartition on the partition value first: otherwise every shuffle
        // partition writes a sliver into every day directory — thousands of
        // tiny files here, millions at 100 TB. One shuffle, one file per
        // day per final partition.
        df.withColumn(PartitionCol, to_date(col(f)))
          .repartition(col(PartitionCol))
          .write.mode(mode).partitionBy(PartitionCol).parquet(path)
      case None =>
        df.write.mode(mode).parquet(path)
    }
  }

  /** K5: read-back count audit. */
  def countAudit(spark: SparkSession, path: String): Long =
    spark.read.parquet(path).count()

  /** Bucketed, sorted table layout for shuffle-free co-located joins —
    * the 100 TB answer to "this join runs every day on the same keys":
    * both sides bucketed by the join key join with NO Exchange in the
    * plan (asserted in SinksSpec). Uses the session catalog's parquet
    * bucketing (no Hive dependency); `saveAsTable` is required because
    * bucket metadata lives in the catalog, not the files.
    */
  def writeBucketedTable(
      df: DataFrame,
      table: String,
      buckets: Int,
      bucketCol: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Drop a managed table AND its warehouse directory. A fresh JVM's
    * in-memory catalog has forgotten the previous run's managed tables
    * but their directories survive, and `saveAsTable` refuses to create a
    * new managed table over an existing location — callers that re-create
    * catalog tables idempotently (bucketed round-trips, index rebuilds)
    * scrub through this first.
    */
  def dropManagedTable(spark: SparkSession, table: String): Unit = {
    // simple identifiers only: a qualified (db.table) or quoted name would
    // make the <warehouse>/<table> fallback below point at the wrong
    // directory, and the name is interpolated into SQL
    require(table.matches("[A-Za-z0-9_]+"),
      s"dropManagedTable expects an unqualified [A-Za-z0-9_]+ identifier, got '$table'")
    // resolve the real location from the catalog while the entry still
    // exists; fall back to the warehouse convention (lowercased — the
    // catalog stores table directories case-folded) for the fresh-JVM case
    // where only the directory survives
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val catalog = spark.sessionState.catalog
    val p =
      if (catalog.tableExists(ident))
        new org.apache.hadoop.fs.Path(catalog.getTableMetadata(ident).location)
      else new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Z-value (Morton code) of two non-negative integer columns: their bits
    * interleaved (`a` on even positions, `b` on odd), so sorting by it
    * co-locates rows close in BOTH dimensions. Pure bitwise Column
    * expression — codegen-eligible, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-ordered parquet layout — multi-dimensional data skipping for tables
    * queried sometimes by one key, sometimes the other (the Delta/Iceberg
    * OPTIMIZE ZORDER answer, expressed with vanilla Spark): range-partition
    * on the z-value into `files` output files and sort within each, so
    * every file's footer min/max bounds BOTH dimensions and a reader
    * prunes most files for a predicate on either key. A single-key sort
    * gives perfect pruning on that key and NONE on the other; the z-curve
    * trades a constant factor on each for usable pruning on both
    * (locality measured in SinksSpec against a time-sorted layout).
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      files: Int,
      bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Single-key sorted (clustered) parquet layout — the Delta/Iceberg
    * `OPTIMIZE … ORDER BY` shape for tables overwhelmingly queried by ONE
    * key (time ranges on a fact table): range-partition into `files`
    * output files on the key and sort within each, so the per-file footer
    * min/max ranges are DISJOINT and a key-range predicate prunes every
    * non-overlapping file at planning time (pinned in SinksSpec). The
    * complementary layout to [[writeZOrdered]]: perfect pruning on one key
    * instead of usable pruning on two.
    *
    * `tieBreak` columns extend the within-file sort (stable layouts diff
    * cleanly run-over-run); they do not affect file assignment.
    */
  def writeSortedLayout(
      df: DataFrame,
      path: String,
      key: String,
      files: Int,
      tieBreak: Seq[String] = Nil): Unit = {
    require(files >= 1, s"files=$files must be >= 1")
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key, tieBreak: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction — the table-maintenance pass every streaming or
    * per-batch-append sink eventually needs (thousands of KB-sized files
    * turn a 100 TB scan into a metadata storm and kill split planning).
    * Sizes the output to ceil(totalBytes / targetFileBytes) files from the
    * ACTUAL on-disk byte count (a driver-side file listing — metadata, not
    * data), then rewrites in one distributed pass. Round-robin
    * repartition, not coalesce: coalesce would chain small source files
    * into few tasks without rebalancing bytes, keeping the skew that made
    * the files small in the first place.
    *
    * Returns (input file count, output file count) for auditability.
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    // resolve through the Hadoop FileSystem of the path's scheme, not
    // java.io.File — on hdfs:// or s3a:// a local listing would return
    // nothing and silently collapse the whole table into one file
    def parquetFiles(dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    val inFiles = parquetFiles(inDir)
    require(inFiles.nonEmpty, s"no parquet files to compact under $inDir")
    val totalBytes = inFiles.map(_.getLen).sum
    // Long arithmetic end-to-end: a tiny target over a 100 TB input must
    // not overflow Int and collapse to a single output file
    val nOutL = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
    val nOut = math.min(nOutL, Int.MaxValue.toLong).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    (inFiles.length, parquetFiles(outDir).length)
  }

  /** Partition-granular retention sweep (TTL) over a `partCol=`-
    * partitioned directory sink: drops every partition directory whose
    * value sorts strictly BELOW `cutoffInclusive` and keeps the rest —
    * ISO dates compare correctly as strings, which is why the DAY sink
    * writes `yyyy-MM-dd`. This is the honest 100 TB retention shape:
    * whole-partition metadata deletes (one filesystem call per expired
    * day), never a row-filter rewrite of surviving data — cost is
    * O(expired partitions), independent of table size. Resolves the
    * path's own FileSystem (hdfs:// / s3a:// safe, like [[compact]]);
    * a non-partition file or an unrelated directory under the root is
    * left untouched, so a sweep pointed at a non-partitioned directory
    * deletes nothing rather than everything. Returns
    * (partitions dropped, partitions kept).
    */
  def retentionSweep(
      spark: SparkSession,
      dir: String,
      partCol: String,
      cutoffInclusive: String): (Int, Int) = {
    require(cutoffInclusive.nonEmpty, "empty cutoff would drop nothing meaningfully")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = partCol + "="
    val parts = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
    val values = parts.map(_.getPath.getName.stripPrefix(prefix))
    // the comparison is lexicographic, which is only a date comparison for
    // zero-padded ISO values — if the sink's partitions all look like
    // dates, a non-ISO cutoff ("2024-1-2") would silently keep/drop the
    // wrong set, so refuse it loudly instead
    val iso = "\\d{4}-\\d{2}-\\d{2}".r
    if (values.nonEmpty && values.forall(iso.matches(_)))
      require(iso.matches(cutoffInclusive),
        s"cutoff '$cutoffInclusive' is not in the sink's zero-padded " +
          s"yyyy-MM-dd partition format — lexicographic comparison against " +
          s"ISO partition values would be wrong")
    val (drop, keep) = parts.partition(
      _.getPath.getName.stripPrefix(prefix) < cutoffInclusive)
    // a sweep that expires EVERY partition leaves an unreadable sink
    // (parquet schema inference fails on the empty root) — that is a
    // retention-config bug, not a TTL, so fail before the first delete
    require(keep.nonEmpty || parts.isEmpty,
      s"cutoff '$cutoffInclusive' would drop all ${parts.length} partitions " +
        s"and leave $dir unreadable — widen the cutoff or drop the sink itself")
    drop.foreach(s => fs.delete(s.getPath, true))
    (drop.length, keep.length)
  }

  /** Resolve the ACTIVE generation of a rebuildable persisted index: a
    * `<prefix>_current` pointer table names the live generation
    * (`<prefix>_g<N>`); without one, the bare prefix wins when its
    * `_meta` exists (every index built before rebuilds existed — two
    * cheap existence checks, the common case); else fall back to the
    * newest COMPLETE generation (every index builder writes `_meta`
    * LAST, so its presence marks completeness — a mid-build generation
    * never resolves; crash-recovery only). Family verbs resolve through
    * here, so probes/appends/deletes/compaction follow a cutover with
    * no call-site changes.
    */
  private[graft] def activeTablePrefix(spark: SparkSession, prefix: String): String = {
    if (spark.catalog.tableExists(s"${prefix}_current"))
      s"${prefix}_g${spark.table(s"${prefix}_current").head().getLong(0)}"
    else if (spark.catalog.tableExists(s"${prefix}_meta"))
      prefix
    else {
      val pat = (java.util.regex.Pattern.quote(prefix.toLowerCase) + "_g(\\d+)_meta").r
      val gens = spark.sessionState.catalog.listTables("default")
        .map(_.table.toLowerCase).collect { case pat(g) => g.toLong }
      if (gens.isEmpty) prefix else s"${prefix}_g${gens.max}"
    }
  }

  /** The shared stage → pointer-flip → retire flow behind every index
    * family's rebuild verb: `build` writes a complete index under the
    * staged generation prefix it is given (its `_meta` last), the
    * cutover is one small-table overwrite of `<prefix>_current`, and
    * the retired generation drops last. Crash windows each leave a
    * serveable state — see [[activeTablePrefix]]. Returns the new
    * generation number.
    */
  private[graft] def rebuildCutover(
      spark: SparkSession,
      tablePrefix: String,
      suffixes: Seq[String])(build: String => Unit): Long = {
    val cur =
      if (spark.catalog.tableExists(s"${tablePrefix}_current"))
        spark.table(s"${tablePrefix}_current").head().getLong(0)
      else 0L
    val next = cur + 1
    val g = s"${tablePrefix}_g$next"
    suffixes.foreach(sfx => dropManagedTable(spark, s"$g$sfx"))
    build(g)
    spark.createDataFrame(Seq(Tuple1(next))).toDF("gen")
      .write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${tablePrefix}_current")
    val oldPrefix = if (cur == 0) tablePrefix else s"${tablePrefix}_g$cur"
    suffixes.foreach(sfx => dropManagedTable(spark, s"$oldPrefix$sfx"))
    next
  }

  /** Drop every on-disk remnant of a pointer-managed table family at
    * `prefix`: the bare member tables, the exactly-once ledger, the
    * generation pointer, and generations g1..`maxGen` — the idempotence
    * scrub for trial fixtures that re-build a family per run (now that
    * deletes/compactions also advance generations, a leftover `_current`
    * from a previous run would silently mis-resolve a freshly written
    * bare index).
    */
  def dropTableFamily(
      spark: SparkSession,
      prefix: String,
      suffixes: Seq[String],
      maxGen: Int = 4): Unit = {
    (suffixes ++ Seq("_applied", "_current"))
      .foreach(sfx => dropManagedTable(spark, s"$prefix$sfx"))
    (1 to maxGen).foreach(g =>
      suffixes.foreach(sfx => dropManagedTable(spark, s"${prefix}_g$g$sfx")))
  }

  /** Reset an index family's exactly-once ingest ledger (`_applied`,
    * kept at the BARE prefix — deliberately OUTSIDE the generation
    * chain). The ledger's batch history spans generations, which is the
    * right default for the common rebuild ("re-encode the corpus AS
    * INGESTED SO FAR": a post-cutover redelivery of a committed batch
    * must still skip, or it would double-apply). It is the WRONG default
    * for a rebuild from a snapshot that excludes committed batches —
    * there the stream is being reset to replay them, and a stale ledger
    * would silently skip the replays. That caller resets the ledger
    * with this verb as part of the same cutover, mirroring the stream's
    * checkpoint reset. Spelled out here because the failure is silent
    * in both directions; the rebuild verbs' scaladoc points at it.
    */
  def clearIngestLedger(spark: SparkSession, tablePrefix: String): Unit =
    dropManagedTable(spark, s"${tablePrefix}_applied")

  /** Snapshot (fork) a persisted table family — the index lifecycle verb
    * a vector/dedup store exposes as "restore into a staging copy": the
    * ACTIVE generation of `fromPrefix` (pointer-resolved, same chain as
    * every probe) is copied into a bare `toPrefix`, table by table, each
    * copy re-written through the source table's own bucket spec so the
    * fork serves with the identical zero-Exchange probe layout. `_meta`
    * copies LAST — the same completeness-marker discipline as the
    * builders, so a crash mid-fork leaves a metaless target nothing
    * resolves to. The fork is then a fully independent index: mutating
    * verbs (delete/append/rebuild) on it never touch the source — the
    * copy-on-write discipline `SinksSpec` pins. Cost is one bounded
    * rewrite per table (no quantizer retrains, no re-encode), which is
    * what makes forking cheap relative to rebuilding.
    */
  def snapshotTablePrefix(
      spark: SparkSession,
      fromPrefix: String,
      toPrefix: String,
      suffixes: Seq[String]): Unit = {
    require(fromPrefix != toPrefix,
      s"snapshotTablePrefix: fork target must differ from source '$fromPrefix'")
    require(suffixes.contains("_meta"),
      "snapshotTablePrefix: family must include _meta (the completeness marker)")
    val from = activeTablePrefix(spark, fromPrefix)
    // bare target: stale tables or a stale generation pointer at the
    // target prefix must not leak into (or mis-resolve) the fresh fork
    (suffixes :+ "_current").foreach(sfx => dropManagedTable(spark, s"$toPrefix$sfx"))
    val (meta, data) = suffixes.partition(_ == "_meta")
    (data ++ meta).foreach { sfx =>
      val src = s"$from$sfx"
      val spec = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(src)).bucketSpec
      spec match {
        case Some(b) =>
          require(b.bucketColumnNames.size == 1,
            s"snapshotTablePrefix: multi-column bucket spec on $src unsupported")
          writeBucketedTable(spark.table(src), s"$toPrefix$sfx",
            b.numBuckets, b.bucketColumnNames.head)
        case None =>
          spark.table(src).write.mode(SaveMode.Overwrite)
            .format("parquet").saveAsTable(s"$toPrefix$sfx")
      }
    }
  }

  /** Blue/green persisted LABEL table (id → rep — the connected-components
    * state [[graft.operators.Dedup.incrementalConnectedComponents]]
    * maintains): each update stages the full new label set as a fresh
    * generation — bucketed on `id`, `_meta` written LAST as the
    * completeness marker, exactly the four index families' discipline —
    * then flips `<prefix>_current` (one small-table overwrite) and
    * retires the old generation. Before this verb the streaming CC path
    * overwrote its bucketed label table in place per batch: a crash
    * mid-overwrite lost the labels, the one persisted state without the
    * [[rebuildCutover]] protection (round-8 verdict). Every crash window
    * now leaves a complete serving generation: die before the pointer
    * flip and the old generation still serves (the update re-runs); die
    * after it and the new one serves (a leaked retired generation is
    * storage, not correctness). As a bonus the update plan reads the OLD
    * generation while writing the NEW table, so read-while-overwrite
    * materialization hacks are unnecessary. Returns the new generation.
    */
  def updateLabelTable(
      spark: SparkSession,
      tablePrefix: String,
      labels: org.apache.spark.sql.DataFrame,
      buckets: Int = 8): Long =
    rebuildCutover(spark, tablePrefix, Seq("_labels", "_meta")) { g =>
      writeBucketedTable(labels, s"${g}_labels", buckets, "id")
      spark.createDataFrame(Seq(Tuple1(buckets))).toDF("buckets")
        .write.mode(SaveMode.Overwrite)
        .format("parquet").saveAsTable(s"${g}_meta")
    }

  /** The serving generation of a [[updateLabelTable]] label table,
    * resolved through the same pointer/completeness chain as every index
    * probe ([[activeTablePrefix]] — `_meta` presence marks a complete
    * generation, so a mid-build crash never resolves to a torn table).
    */
  def readLabelTable(spark: SparkSession, tablePrefix: String): org.apache.spark.sql.DataFrame =
    spark.table(s"${activeTablePrefix(spark, tablePrefix)}_labels")

  /** Deterministic training-shard writer — the curation pipeline's LAST
    * step: the curated corpus lands as `nShards` reproducible shard
    * files whose membership AND internal order are pure functions of
    * (salt, id), so a re-run on re-ordered, re-partitioned, or
    * incrementally-rebuilt upstream data writes byte-identical shards.
    * Shard assignment is the salted h60 used by every sampling operator
    * (`h60(salt:shard:id) mod nShards` — uniform in expectation, no
    * counting pass); within-shard order is an independent salted hash
    * (`__ord`, ties broken by id), which deterministically interleaves
    * documents so each shard reads as an unbiased sample stream rather
    * than upstream's correlated order (the usual "shuffle the training
    * data once, reproducibly" requirement). One `repartition(nShards,
    * shard)` puts each shard wholly in one task → exactly one file per
    * `shard=` directory; `__ord` is persisted so readers (and the spec)
    * can verify the order without recomputing hashes.
    *
    * At 100 TB: the repartition is the one shuffle and it is the
    * unavoidable one (a global deterministic interleave IS a shuffle);
    * shard count is chosen as corpus_bytes / desired_file_size, and the
    * per-shard sort is an external sort within one task's partition —
    * the same cost profile as any partitioned sorted write.
    */
  def writeTrainingShards(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      dir: String,
      nShards: Int,
      salt: String): Unit = {
    require(nShards > 0, s"nShards=$nShards must be positive")
    df.withColumn("shard",
        pmod(graft.functions.CrossHash.h60(
          concat(lit(s"$salt:shard:"), col(idCol).cast("string"))), lit(nShards.toLong)))
      .withColumn("__ord",
        graft.functions.CrossHash.h60(
          concat(lit(s"$salt:ord:"), col(idCol).cast("string"))))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"), col(idCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(dir)
  }

  /** Manifest of a [[writeTrainingShards]] artifact, computed from the
    * WRITTEN files (so a green oracle certifies the artifact, not the
    * plan that produced it): per shard, document count, token mass, and
    * an order-invariant membership fingerprint (`bit_xor` of a third
    * independent salted id hash — XOR is overflow-free and
    * order-invariant, so the fingerprint is stable however the files
    * are scanned, and any added/dropped/substituted document flips it).
    */
  def shardManifest(
      spark: SparkSession,
      dir: String,
      idCol: String,
      nTokens: org.apache.spark.sql.Column,
      salt: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(dir)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nTokens).cast("long").as("n_tokens"),
        call_function("bit_xor",
          graft.functions.CrossHash.h60(
            concat(lit(s"$salt:fp:"), col(idCol).cast("string")))).as("id_fp"))
      .select(col("shard").cast("long").as("shard"),
        col("n_docs"), col("n_tokens"), col("id_fp"))

  /** Z-order TILE-PARTITIONED write: rows land in 2^tileBits tile
    * DIRECTORIES keyed by the interleaved-bit (Morton) key of two
    * equal-width bin indexes. Complementary to [[writeZOrdered]] (one
    * z-sorted file set whose pruning relies on reader-side footer
    * min/max — which plain Spark parquet scans do per ROW GROUP, not
    * per file, at execution time): here the tile id is a PARTITION
    * column, so [[readZTiled]] prunes whole directories at PLANNING
    * time — the Spark-native form of the lakehouse OPTIMIZE
    * ZORDER: a box predicate on EITHER column (or both) maps to a small
    * set of z-tiles, and [[readZTiled]] turns that set into a
    * partition filter, so pruning works for BOTH columns where a plain
    * sort layout prunes only its leading column. Everything is
    * deterministic and engine-replayable: bins are `width_bucket` over
    * the column's own [min, max] (two tiny aggregations), the Morton
    * interleave is a 2·bitsPerDim-term bit fold, and the tile is the
    * key's top `tileBits` bits — no range-partitioner sampling anywhere,
    * so the same data always writes the same tiles (`d_?`/oracle-safe).
    * Bin parameters land in `_zmeta` (underscore-prefixed: invisible to
    * data scans of the directory).
    *
    * At 100 TB: one repartition on the tile id is the only shuffle;
    * tiles are equal z-VOLUME, so heavily skewed columns want
    * quantile-binned edges instead of equal-width (the `width_bucket`
    * call is the seam — swap in percentile_approx edges); tileBits
    * sizes directories at corpus_bytes / 2^tileBits.
    */
  def writeZTiled(
      df: DataFrame,
      dir: String,
      colA: String,
      colB: String,
      bitsPerDim: Int = 8,
      tileBits: Int = 6): Unit = {
    require(bitsPerDim >= 1 && bitsPerDim <= 16, s"bitsPerDim=$bitsPerDim")
    require(tileBits >= 1 && tileBits <= 2 * bitsPerDim, s"tileBits=$tileBits")
    val spark = df.sparkSession
    val b = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double")),
      sum(when(col(colA).isNull.or(col(colB).isNull), 1L).otherwise(0L))).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"writeZTiled: no non-null ($colA, $colB) rows to bin — an empty " +
        "layout would be unreadable")
    // NULL z-keys would land in zfile=__HIVE_DEFAULT_PARTITION__, which
    // readZTiled's `zfile IN (tiles)` filter can never select — such rows
    // would be silently unreachable through the reader. Refuse loudly
    // (same spirit as the empty-layout guard); callers wanting NULLs must
    // route them to a side table themselves.
    require(b.getLong(4) == 0L,
      s"writeZTiled: ${b.getLong(4)} rows have NULL in $colA/$colB — they " +
        "would be unreachable through readZTiled's tile filter")
    val (loA, loB) = (b.getDouble(0), b.getDouble(2))
    // a constant column degenerates width_bucket's range — widen it so
    // every row lands in bin 0 and the layout stays well-defined (all
    // pruning then comes from the other dimension)
    val hiA = if (b.getDouble(1) > loA) b.getDouble(1) else loA + 1.0
    val hiB = if (b.getDouble(3) > loB) b.getDouble(3) else loB + 1.0
    val n = (1 << bitsPerDim).toLong
    def bin(c: String, lo: Double, hi: Double) =
      least(greatest(
        call_function("width_bucket", col(c).cast("double"), lit(lo), lit(hi), lit(n)) - 1L,
        lit(0L)), lit(n - 1))
    val zkey = (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", col("__bin_a"), lit(i)).bitwiseAND(lit(1L)),
          lit(2 * i + 1)))
        .bitwiseOR(call_function("shiftleft",
          call_function("shiftright", col("__bin_b"), lit(i)).bitwiseAND(lit(1L)),
          lit(2 * i)))
    }
    df.withColumn("__bin_a", bin(colA, loA, hiA))
      .withColumn("__bin_b", bin(colB, loB, hiB))
      .withColumn("__zkey", zkey)
      .withColumn("zfile",
        call_function("shiftright", col("__zkey"), lit(2 * bitsPerDim - tileBits)))
      .drop("__bin_a", "__bin_b")
      .repartition(1 << tileBits, col("zfile"))
      .sortWithinPartitions("zfile", "__zkey")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("zfile")
      .parquet(dir)
    spark.createDataFrame(Seq((colA, loA, hiA, colB, loB, hiB, bitsPerDim, tileBits)))
      .toDF("col_a", "lo_a", "hi_a", "col_b", "lo_b", "hi_b", "bits", "tile_bits")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/_zmeta")
  }

  /** Box-predicate reader over a [[writeZTiled]] layout: the query box
    * [loA, hiA] × [loB, hiB] is mapped to bin ranges, the (tiny, ≤
    * 2^tileBits) tile list is enumerated driver-side — a tile's top
    * bits fix the high bits of BOTH bin indexes, so tile-box ∩ query-box
    * is integer interval arithmetic — and the scan carries `zfile IN
    * (tiles)` as a genuine PARTITION filter (directory pruning; pinned
    * in SinksSpec via the scan's partition-filter count) plus the exact
    * residual predicate. Pruning power: a box covering fraction f of
    * each dimension touches ~f·2^(tileBits/2) of the tile grid per
    * dimension — both columns prune, which no single-column sort gives.
    */
  def readZTiled(
      spark: SparkSession,
      dir: String,
      loA: Double, hiA: Double,
      loB: Double, hiB: Double): DataFrame = {
    val m = spark.read.parquet(s"$dir/_zmeta").head()
    val (cA, mLoA, mHiA) = (m.getString(0), m.getDouble(1), m.getDouble(2))
    val (cB, mLoB, mHiB) = (m.getString(3), m.getDouble(4), m.getDouble(5))
    val bits = m.getInt(6); val tileBits = m.getInt(7)
    val n = 1L << bits
    def binOf(v: Double, lo: Double, hi: Double): Long =
      if (hi <= lo) 0L
      else math.min(n - 1, math.max(0L,
        math.floor((v - lo) / (hi - lo) * n).toLong))
    // ±1 bin slack: the writer binned rows with Spark's width_bucket and
    // this is an independent floor reimplementation — a last-ulp rounding
    // difference at an exact bucket edge must never prune a tile that
    // holds a matching row (costs a sliver of pruning, never correctness)
    val (qa0, qa1) = (binOf(loA, mLoA, mHiA) - 1, binOf(hiA, mLoA, mHiA) + 1)
    val (qb0, qb1) = (binOf(loB, mLoB, mHiB) - 1, binOf(hiB, mLoB, mHiB) + 1)
    // tile's top bits fix the top ceil(tileBits/2) a-bits (odd positions)
    // and floor(tileBits/2) b-bits (even positions)
    val aTop = (tileBits + 1) / 2
    val bTop = tileBits / 2
    val tiles = (0 until (1 << tileBits)).filter { t =>
      var aHigh = 0L; var bHigh = 0L
      (0 until tileBits).foreach { j =>
        // bit j of the tile (from the top) is zkey bit 2*bits-1-j:
        // odd global position → an a-bit, even → a b-bit
        val globalPos = 2 * bits - 1 - j
        val bitVal = (t >> (tileBits - 1 - j)) & 1
        if (globalPos % 2 == 1) aHigh = (aHigh << 1) | bitVal
        else bHigh = (bHigh << 1) | bitVal
      }
      val aLo = aHigh << (bits - aTop); val aHi = ((aHigh + 1) << (bits - aTop)) - 1
      val bLo = bHigh << (bits - bTop); val bHi = ((bHigh + 1) << (bits - bTop)) - 1
      aHi >= qa0 && aLo <= qa1 && bHi >= qb0 && bLo <= qb1
    }
    spark.read.parquet(dir)
      .filter(col("zfile").isin(tiles: _*))
      .filter(col(cA).cast("double").between(loA, hiA) &&
        col(cB).cast("double").between(loB, hiB))
  }

  /** Append one write-ahead ledger row for [[exactlyOnceBatch]]. Plain
    * (non-bucketed) parquet catalog table; duplicate rows are harmless
    * (the reader asks "does a commit row exist", not "how many").
    */
  private[graft] def recordLedger(
      spark: SparkSession,
      ledgerTable: String,
      batchId: Long,
      phase: String): Unit =
    spark.createDataFrame(Seq((batchId, phase))).toDF("batch_id", "phase")
      .write.mode(SaveMode.Append).format("parquet").saveAsTable(ledgerTable)

  /** The batchId-keyed write-ahead ledger that turns Structured
    * Streaming's at-least-once `foreachBatch` retries into exactly-once
    * index STATE — shared by the exactly-once variants of all four
    * persisted-index ingest verbs. A plain append is retry-unsafe two
    * ways: a batch redelivered after a successful append double-inserts,
    * and a crash mid-append leaves a partial batch a blind re-run
    * duplicates. Both close against the ledger (batch_id, phase):
    *
    *  1. a `commit` row for this batchId ⇒ the batch is fully applied —
    *     skip (returns None; checkpoint-lag redelivery, the common case);
    *  2. an `intent` row without `commit` ⇒ a prior attempt may have
    *     died mid-append — run `scrub` (the index family's exact
    *     deletion verb over the batch's ids; a no-op scrub pays one
    *     compaction pass) and fall through;
    *  3. record `intent`, run `apply` (the plain ingest), record
    *     `commit`, return Some(result).
    *
    * Correct because Structured Streaming replays a failed batch with
    * the SAME batchId and — for deterministic sources — the same rows,
    * so the scrub removes exactly the partial residue. The happy path
    * costs two one-row ledger appends; the O(index) deletion rewrite is
    * paid only on actual crash recovery. Downstream OUTPUT of a skipped
    * redelivery needs its own idempotency, which is Spark's standard
    * contract for foreachBatch sinks.
    */
  private[graft] def exactlyOnceBatch[T](
      spark: SparkSession,
      ledgerTable: String,
      batchId: Long)(scrub: => Unit)(apply: => T): Option[T] = {
    val phases: Set[String] =
      if (spark.catalog.tableExists(ledgerTable))
        spark.table(ledgerTable).filter(col("batch_id") === batchId)
          .select("phase").distinct().collect().map(_.getString(0)).toSet
      else Set.empty
    if (phases.contains("commit")) None
    else {
      if (phases.contains("intent")) scrub
      recordLedger(spark, ledgerTable, batchId, "intent")
      val result = apply
      recordLedger(spark, ledgerTable, batchId, "commit")
      Some(result)
    }
  }

  /** In-place compaction (vacuum) of a managed catalog table — the index
    * lifecycle pass the append-maintained bucketed indexes need: per-batch
    * appends accumulate one file per bucket per batch FOREVER (a year of
    * daily ingest = hundreds of small files per bucket and, for the gram
    * index, N_batches partial rows per gram), so probes degrade into
    * metadata storms even though the bucket layout itself is intact.
    *
    * Semantics-preserving by construction: the rewrite goes through the
    * table's OWN catalog bucket spec (same bucket count, columns, sort),
    * so probe plans keep consuming the layout with zero Exchange on the
    * index side — pinned by spec alongside probe-result hash parity. The
    * optional `rewrite` hook transforms the row set inside the same
    * stage-then-swap: semantics-preserving re-aggregations (gram-df
    * partials re-sum to one row per gram — exact, the measure is
    * additive) and deliberate row deletions (bucket-aligned anti-join of
    * taken-down document ids) both ride it.
    *
    * Atomicity: stage-then-swap. The compacted data lands in a staging
    * table, then two catalog renames swap it in (original → `__cold`,
    * stage → original) and the old data is dropped last — a crash leaves
    * either the original intact or both tables present, never neither.
    * Non-bucketed tables (e.g. the IVF-PQ `_vecs` side table) compact
    * through the same path sized by `targetFileBytes`, like [[compact]].
    *
    * Returns (input parquet file count, output parquet file count).
    */
  def compactTable(
      spark: SparkSession,
      table: String,
      rewrite: DataFrame => DataFrame = identity,
      targetFileBytes: Long = 128L << 20): (Int, Int) = {
    require(table.matches("[A-Za-z0-9_]+"),
      s"compactTable expects an unqualified [A-Za-z0-9_]+ identifier, got '$table'")
    val before = parquetFileCount(spark, table)
    val stage = s"${table}__cstage"
    val old = s"${table}__cold"
    Seq(stage, old).foreach(dropManagedTable(spark, _))
    stageCompactedInto(spark, table, stage, rewrite, targetFileBytes)
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
    dropManagedTable(spark, old)
    (before, parquetFileCount(spark, table))
  }

  /** Parquet data files currently backing a managed catalog table. */
  private def parquetFiles(
      spark: SparkSession, table: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  private[graft] def parquetFileCount(spark: SparkSession, table: String): Int =
    parquetFiles(spark, table).length

  /** The compaction STAGE write shared by [[compactTable]] (stage → two
    * renames, for standalone tables) and [[compactFamilyCutover]] (stage
    * into a fresh generation, for pointer-managed families): writes
    * `rewrite(src)` into `dst` through src's OWN bucket spec at one file
    * per bucket — or size-targeted files when unbucketed — with src's
    * column order re-pinned.
    */
  private def stageCompactedInto(
      spark: SparkSession,
      table: String,
      stage: String,
      rewrite: DataFrame => DataFrame,
      targetFileBytes: Long): Unit = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val catalog = spark.sessionState.catalog
    val spec = catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).bucketSpec
    // a rewrite hook must preserve the column SET (it writes back into
    // the same table), but Spark's USING joins put join keys first — so
    // an anti-join deletion rewrite would silently reorder a long-lived
    // index table's schema on every take-down. Re-pin the table's own
    // column order; a rewrite that dropped or renamed a column fails
    // loudly here instead of corrupting the table.
    val origCols = spark.table(table).columns.toSeq
    def ordered(df: DataFrame): DataFrame = df.select(origCols.map(col): _*)
    spec match {
      case Some(s) =>
        // repartition on the bucket columns with the bucket count — the
        // same hash family as the bucket-id assignment, so each write
        // task holds exactly one bucket's rows → ONE file per bucket.
        // Two planner interactions must be pinned for the stage write,
        // because a V1 file write declares no required distribution:
        //  - the bucketed scan must stay ENABLED (autoBucketedScan off):
        //    the planner elides the repartition because the bucketed
        //    scan satisfies HashPartitioning(bucketCols, n) — correct,
        //    and it makes compaction shuffle-free (one task per bucket,
        //    merging that bucket's fragments) — but only if
        //    DisableUnnecessaryBucketedScan doesn't then ALSO drop the
        //    bucketed read, which would leave plain file splits writing
        //    one file per task×bucket (measured: 114 → 31 instead of 4);
        //  - AQE's local shuffle reader must not rewrite the exchange
        //    into mapper-local mixed-bucket chunks when the repartition
        //    DOES survive (a `rewrite` hook that reshuffles).
        val pinned = Map(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false",
          "spark.sql.adaptive.localShuffleReader.enabled" -> "false")
        val prev = pinned.keys.map(k => k -> spark.conf.getOption(k)).toMap
        pinned.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val cols = s.bucketColumnNames.map(col)
          val w = ordered(rewrite(spark.table(table))).repartition(s.numBuckets, cols: _*)
            .write.mode(SaveMode.Overwrite)
            .bucketBy(s.numBuckets, s.bucketColumnNames.head, s.bucketColumnNames.tail: _*)
          val ws = if (s.sortColumnNames.nonEmpty)
            w.sortBy(s.sortColumnNames.head, s.sortColumnNames.tail: _*) else w
          ws.format("parquet").saveAsTable(stage)
        } finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      case None =>
        val totalBytes = math.max(1L, parquetFiles(spark, table).map(_.getLen).sum)
        val nOut = math.min(
          math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes),
          Int.MaxValue.toLong).toInt
        ordered(rewrite(spark.table(table))).repartition(nOut)
          .write.mode(SaveMode.Overwrite)
          .format("parquet").saveAsTable(stage)
    }
  }

  /** Family-level compaction THROUGH THE GENERATION POINTER — closes
    * [[compactTable]]'s reader gap for pointer-managed index families: the
    * stage-then-two-renames swap leaves a window where a concurrent
    * reader resolves NEITHER table name, while here every table of the
    * compacted family stages into a fresh generation (same one-file-per-
    * bucket write, `_meta` LAST as the completeness marker), the flip is
    * the one-row `_current` overwrite every probe already resolves
    * through, and the retired generation drops after — a reader holds a
    * complete serving generation at every instant (the
    * [[rebuildCutover]] crash-window contract, applied to vacuuming).
    *
    * `rewrites` transforms individual member tables inside the same
    * staging pass (tombstone-fold anti-joins, stats/bounds re-sums,
    * meta re-stamps); unnamed members copy-compact verbatim. Reads
    * inside a rewrite closure resolve against the OLD generation for
    * the whole staging pass (the pointer flips after), so closures may
    * freely read sibling tables of the generation being compacted.
    *
    * Returns (new generation, per-suffix (input files, output files)).
    */
  private[graft] def compactFamilyCutover(
      spark: SparkSession,
      tablePrefix: String,
      suffixes: Seq[String],
      rewrites: Map[String, DataFrame => DataFrame] = Map.empty,
      targetFileBytes: Long = 128L << 20): (Long, Map[String, (Int, Int)]) = {
    require(suffixes.contains("_meta"),
      "compactFamilyCutover: family must include _meta (the completeness marker)")
    require(rewrites.keySet.subsetOf(suffixes.toSet),
      s"rewrites name non-member suffixes: ${rewrites.keySet.diff(suffixes.toSet)}")
    val from = activeTablePrefix(spark, tablePrefix)
    val counts = scala.collection.mutable.Map.empty[String, (Int, Int)]
    val gen = rebuildCutover(spark, tablePrefix, suffixes) { g =>
      val (meta, data) = suffixes.partition(_ == "_meta")
      (data ++ meta).foreach { sfx =>
        val src = s"$from$sfx"
        val dst = s"$g$sfx"
        stageCompactedInto(spark, src, dst,
          rewrites.getOrElse(sfx, identity[DataFrame] _), targetFileBytes)
        counts(sfx) = (parquetFileCount(spark, src), parquetFileCount(spark, dst))
      }
    }
    (gen, counts.toMap)
  }

  /** Sink-choosing seam: one destination's write + audit pair. The parquet
    * leg is [[parquetAdapter]] (verified end-to-end here); the production
    * BigQuery leg is [[BigQuerySink.adapter]] (structural — no connector
    * jar or network in this environment).
    */
  trait SinkAdapter {
    def name: String
    def write(df: DataFrame, daily: Boolean, dayPartitionField: Option[String]): Unit
    def countAudit(): Long
  }

  def parquetAdapter(spark: SparkSession, path: String, table: Option[String] = None): SinkAdapter =
    new SinkAdapter {
      val name: String = table.getOrElse(path.split('/').last)
      def write(df: DataFrame, daily: Boolean, dayPartitionField: Option[String]): Unit =
        Sinks.write(df, path, daily, dayPartitionField)
      def countAudit(): Long = Sinks.countAudit(spark, path)
    }

  /** K1+K2+K3+K5 composite against any [[SinkAdapter]] — the whole
    * `load_to_bigquery` contract (`bigquery_operations.py:21-48`): bind the
    * declared schema, write with the disposition, read back the audit
    * count. Returns (rowsLoaded, rowsTotalAfterLoad) like the reference's
    * two log lines (`bigquery_operations.py:47-48`).
    */
  def loadVia(
      sink: SinkAdapter,
      df: DataFrame,
      schema: StructType,
      daily: Boolean = false,
      dayPartitionField: Option[String] = None): LoadReport = {
    val bound = SchemaRegistry.enforce(df, schema)
    val loaded = bound.count()
    sink.write(bound, daily, dayPartitionField)
    LoadReport(sink.name, loaded, sink.countAudit())
  }

  /** [[loadVia]] against the parquet destination. */
  def load(
      spark: SparkSession,
      df: DataFrame,
      schema: StructType,
      path: String,
      daily: Boolean = false,
      dayPartitionField: Option[String] = None,
      table: Option[String] = None): LoadReport =
    loadVia(parquetAdapter(spark, path, table), df, schema, daily, dayPartitionField)
}
