package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's surface (SURVEY.md §2.5) that
  * need more than a one-liner of the DataFrame API. Everything here is
  * composed from built-in operators so Catalyst keeps full visibility —
  * no custom plan nodes are needed for these semantics.
  */
object Relational {

  /** Top-k rows per group, deterministic via explicit tie-breaking order.
    * The shuffle is one hash partition by `partitionCols`; no global sort.
    */
  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[String],
      order: Seq[Column],
      k: Int,
      rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("bigint"))
      .filter(col(rankCol) <= k)
  }

  /** As-of join: for each left row, the latest right row with
    * `right.timeCol <= left.timeCol` within the same key.
    *
    * Implemented as the MERGE-join formulation: tag both sides, union, one
    * window pass per key ordered by (time, side), then keep left rows with
    * the last-seen right attributes. Cost is a single shuffle on the key —
    * no range cross-product — so it scales linearly with input size, unlike
    * a theta-join + dedup which explodes on hot keys at 100 TB.
    *
    * Right rows must be unique per (key, time); callers dedup first (see
    * `RelationalQueries.q_asof_join`) or results are tie-arbitrary.
    *
    * @param rightCols right-side payload columns carried to the output.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 sorts before side 1 at equal timestamps, so a right row at
    // exactly t is visible to a left row at t (>= semantics).
    val taggedRight = right.select(
      Seq(col(rightKey).as("__key"), col(rightTime).as("__time"), lit(0).as("__side")) ++
        rightCols.map(c => col(c).as(s"__r_$c")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(leftKey).as("__key"), col(leftTime).as("__time"), lit(1).as("__side")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) ++
        leftCols.map(col): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(taggedRight.unionByName(taggedLeft)) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__r_$c").as(c)): _*)
  }

  /** Salted equi-join for skewed keys: the left (large, skewed) side gets a
    * random-ish salt in [0, `salts`) derived deterministically from a
    * tie-break column; the right side is replicated `salts` times. The
    * shuffle then spreads each hot key over `salts` reducers instead of
    * one straggler task. AQE's skew-join handles moderate skew on its own —
    * this is the explicit treatment for the "one key is 10% of the table"
    * regime where even split sub-partitions overwhelm a single join key.
    *
    * Exact same rows as the unsalted join (salt columns are dropped).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      saltSource: String): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(hash(col(saltSource)), lit(salts)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Latest-wins upsert — MERGE semantics as one shuffle: union base and
    * updates, keep one row per key ranked by (version desc, updates-beat-
    * base on version ties). No join: the window pass replaces the
    * MERGE's matched/not-matched branches, and at 100 TB it is a single
    * hash partition by key (the same shuffle a MERGE implementation
    * bottoms out in), with no second pass for the not-matched inserts.
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      key: String,
      version: String): DataFrame = {
    // withColumn REPLACES an existing column, so a user column named like a
    // temp column would be silently destroyed — fail loudly instead.
    require(!(base.columns ++ updates.columns).exists(c => c == "__src" || c == "__rn"),
      "upsert reserves temp columns __src/__rn; rename them in the input first")
    // Rows sharing (key, version) WITHIN updates have no defined winner:
    // row_number breaks the tie by shuffle order. Callers needing stability
    // there must pre-dedup updates.
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(key).orderBy(col(version).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. Spark's hash aggregate
    * already does map-side partial combine, which covers most skew; this
    * explicit form exists for aggregates whose partial state is large
    * (e.g. collect-like) where the per-reducer state for a hot key must be
    * split. `partial` and `merge` must form a commutative monoid.
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      salts: Int,
      saltSource: String,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(hash(col(saltSource)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)

  /** EXACT global rank over a total order WITHOUT the single-partition
    * window (`row_number() OVER (ORDER BY …)` funnels the whole corpus
    * through one task — the textbook scale-killer a CCNet-style
    * head/middle/tail cut would otherwise pay):
    *
    *   1. one approx-quantile pass picks `buckets`-1 value boundaries
    *      (balance only — correctness never depends on where they fall);
    *   2. the bucket id becomes a row-local pure function of the value
    *      (count of boundaries ≤ v), so every downstream pass agrees on
    *      the assignment with no reliance on a partitioner's sampling;
    *   3. one aggregate pass counts rows per bucket; the cumulative
    *      offsets (≤ `buckets` longs — driver/broadcast-sized) shift each
    *      bucket's local `row_number` to the exact global rank;
    *   4. one window per bucket — P independent ~n/P-row sorts, never a
    *      corpus-wide one.
    *
    * The rank is exactly the rank a global `ORDER BY valueCol, tieCols`
    * window would assign: buckets are value-monotone, equal values share a
    * bucket, and the in-bucket window applies the tie-break. Requires
    * (valueCol, tieCols) to be a total order (callers append a unique id)
    * and `valueCol` non-null and non-NaN (NaN would land in bucket 0 via
    * the `b <= v` comparison while the in-bucket ORDER BY sorts NaN last
    * — a silently wrong low rank instead of the highest ranks a true
    * global sort assigns).
    *
    * HEAVY-TIE hardening (r14 verdict): equal values must share a value
    * bucket, so a degenerate distribution (one dominant value — e.g. a
    * corpus where most docs share one NLL) would funnel that tie mass
    * through a single per-bucket window task, re-creating the scale
    * problem this operator exists to kill. When the per-bucket counts
    * reveal a value holding more than ~2 buckets' share of rows, that
    * tie mass is SPLIT across sub-buckets on `tieCols.head` (a tie
    * group's internal order is exactly the tieCols order, so per-(value,
    * sub-bucket) offsets stay exact — the same offset algebra one level
    * down). The split path requires a NUMERIC first tie column; a
    * non-numeric one with heavy ties throws loudly rather than silently
    * serializing (callers append a numeric unique id by convention).
    * `buckets = 1` is the caller explicitly requesting one window and is
    * never split. Detection rides the offset pass's existing per-bucket
    * counts — the non-degenerate path pays nothing new.
    */
  def globalRank(
      df: DataFrame,
      valueCol: String,
      tieCols: Seq[String],
      rankCol: String = "rnk",
      buckets: Int = 64): DataFrame =
    globalRankUnits(df, valueCol, tieCols, rankCol, buckets)
      .drop("__gr_b", "__gr_m", "__gr_h", "__gr_s", "__gr_off")

  /** [[globalRank]] with the internal unit columns (`__gr_b` value
    * bucket, `__gr_m`/`__gr_h` heavy-value split position, `__gr_s` tie
    * sub-bucket) retained — the spec surface that pins the per-task row
    * bound on degenerate tie distributions.
    */
  private[graft] def globalRankUnits(
      df: DataFrame,
      valueCol: String,
      tieCols: Seq[String],
      rankCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val unitCols = Seq("__gr_b", "__gr_m", "__gr_h", "__gr_s")
    val bounds: Array[Double] =
      if (buckets == 1) Array.empty
      else df.stat
        .approxQuantile(valueCol,
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .distinct.sorted
    val withB =
      if (bounds.isEmpty) df.withColumn("__gr_b", lit(0))
      else df.withColumn("__gr_b",
        size(filter(lit(bounds), b => b <= col(valueCol))))
    val bCounts = withB.groupBy("__gr_b").agg(count(lit(1)).as("__gr_c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = bCounts.map(_._2).sum
    // one bucket's fair share of rows; a bucket holding > 4 shares (and
    // enough rows for a split to matter) is suspected tie mass
    val target = math.max(total / math.max(buckets, 1), 1L)
    val heavyBuckets = bCounts
      .filter { case (_, c) => buckets > 1 && c > 4 * target && c > 64 }
      .map(_._1)
    // heavy VALUES inside those buckets: > 2 shares each. Bounded
    // collect: at most total / (2·target) ≈ buckets/2 rows qualify.
    val vCol = col(valueCol).cast("double")
    val heavyVals: Array[(Double, Long)] =
      if (heavyBuckets.isEmpty) Array.empty
      else withB.filter(col("__gr_b").isin(heavyBuckets.map(Int.box): _*))
        .groupBy(vCol.as("__gr_v")).agg(count(lit(1)).as("__gr_c"))
        .filter(col("__gr_c") > 2 * target)
        .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val withUnits =
      if (heavyVals.isEmpty || tieCols.isEmpty) {
        withB.withColumn("__gr_m", lit(0))
          .withColumn("__gr_h", lit(1)).withColumn("__gr_s", lit(0))
      } else {
        val tieHead = tieCols.head
        require(df.schema(tieHead).dataType
            .isInstanceOf[org.apache.spark.sql.types.NumericType],
          s"globalRank: value ${heavyVals.head._1} holds ${heavyVals.head._2}" +
            s" of $total rows (> 2 buckets' share) and the first tie column" +
            s" '$tieHead' is not numeric, so the tie mass cannot be" +
            " sub-bucketed — pass a numeric unique id first in tieCols")
        // per-heavy-value tie boundaries on tieCols.head: ~target rows per
        // sub-bucket, one tiny quantile job per heavy value (few by
        // construction — each holds > 2 shares)
        val hvBounds: Seq[(Double, Array[Double])] = heavyVals.toSeq.map {
          case (v, c) =>
            val k = math.min(buckets.toLong, (c + target - 1) / target).toInt
            val qs = (1 until k).map(_.toDouble / k).toArray
            val bs =
              if (qs.isEmpty) Array.empty[Double]
              else withB.filter(vCol === v).stat
                .approxQuantile(tieHead, qs, 0.001).distinct.sorted
            (v, bs)
        }
        // all row-local pure functions of (value, tieHead) given the
        // broadcast boundary lists — every pass agrees on the assignment
        val hvLit = lit(heavyVals.map(_._1))
        val m = size(filter(hvLit, h => h <= vCol))
        val isHeavy = heavyVals.map(_._1)
          .map(h => vCol === h).reduce(_ || _)
        val sExpr = hvBounds.foldRight(lit(0)) { case ((v, bs), rest) =>
          if (bs.isEmpty) rest
          else when(vCol === v,
            size(filter(lit(bs), b => b <= col(tieHead).cast("double"))))
            .otherwise(rest)
        }
        withB.withColumn("__gr_m", m)
          .withColumn("__gr_h", when(isHeavy, 0).otherwise(1))
          .withColumn("__gr_s", when(isHeavy, sExpr).otherwise(0))
      }
    // offsets per unit, cumulated in the units' total-order position
    // (lexicographic on the 4 unit cols — see the ordering argument in
    // the scaladoc); unit count is bounded by buckets + Σ sub-buckets
    val uCounts = withUnits.groupBy(unitCols.map(col): _*)
      .agg(count(lit(1)).as("__gr_c"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)),
        r.getLong(4)))
      .sortBy(_._1)
    var acc = 0L
    val offRows = uCounts.map { case ((b, mm, h, s), c) =>
      val off = acc; acc += c; (b, mm, h, s, off)
    }.toSeq
    val offDf = offRows.toDF(unitCols :+ "__gr_off": _*)
    val w = Window.partitionBy(unitCols.map(col): _*)
      .orderBy((valueCol +: tieCols).map(col): _*)
    withUnits.join(broadcast(offDf), unitCols)
      .withColumn(rankCol, row_number().over(w).cast("long") + col("__gr_off"))
  }
}
