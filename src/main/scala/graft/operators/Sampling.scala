package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Deterministic sampling for training-data pipelines (extension tier,
  * SURVEY.md §7). `df.sample()` is seed-dependent per partitioning and
  * unreproducible across engines; these samplers decide membership from a
  * salted content hash instead, so
  *  - the same row is kept or dropped on EVERY run, engine, and partition
  *    layout (resumable pipelines, auditable samples),
  *  - sampling composes with dedup (a survivor stays a survivor),
  *  - the DuckDB oracle can replay the exact membership test.
  * Cost is one hash per row, no shuffle — the filter pushes into the scan
  * stage at any scale.
  */
object Sampling {

  /** The shared membership test: the row's salted-hash bucket in
    * [0, 1000). A row is kept iff its bucket is below the keep rate —
    * every sampler (and the oracle SQL) derives from this one expression.
    */
  private def bucketOf(key: Column, salt: String): Column =
    pmod(h60(concat(lit(s"$salt:"), key)), lit(1000L))

  private def requirePermille(p: Int): Unit =
    require(p >= 0 && p <= 1000, s"permille=$p must be in [0, 1000]")

  /** Keep a row iff h60(salt:key) mod 1000 < permille. The salt namespaces
    * the decision: two samples with different salts are independent.
    */
  def hashSample(key: Column, permille: Int, salt: String): Column = {
    requirePermille(permille)
    bucketOf(key, salt) < permille
  }

  /** Stratified variant: per-stratum keep rates (missing strata keep
    * nothing), e.g. downsampling over-represented languages. One hash per
    * row, membership decided row-locally — no per-stratum counts, no
    * shuffle, unlike `sampleBy` (which is also seed/partitioning
    * dependent).
    */
  def stratifiedHashSample(
      df: DataFrame,
      stratumCol: Column,
      key: Column,
      permilleByStratum: Map[String, Int],
      salt: String): DataFrame = {
    permilleByStratum.values.foreach(requirePermille)
    val rate = permilleByStratum.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(stratumCol === s, lit(p)).otherwise(acc)
    }
    df.filter(bucketOf(key, salt) < rate)
  }

  /** Temperature-rebalanced sampling at α = 0.5 — the square-root scaling
    * used to flatten skewed group distributions (over-represented
    * languages/domains) in multilingual pretraining mixes: each group's
    * keep-rate is floor(1000·√(n_min/n_g) + ε) permille, so a group
    * n_min-sized keeps everything and a k×-larger group keeps √(1/k).
    *
    * Unlike [[stratifiedHashSample]] the rates derive from the DATA: one
    * small aggregation over group counts, broadcast back onto the corpus,
    * then the same salted-hash membership rule. √ of a rational is
    * IEEE-exactly-rounded, so the computed rate is bit-identical across
    * engines (no pow(), whose last-ulp drift could flip the floor).
    *
    * Output: the sampled rows plus the group's `n_group` and applied
    * `rate_permille` (audit columns a curation run records).
    */
  def sqrtBalancedSample(
      df: DataFrame,
      groupCol: Column,
      key: Column,
      salt: String): DataFrame = {
    val counts = df.groupBy(groupCol.as("__g"))
      .agg(count(lit(1)).as("n_group"))
    val minN = counts.agg(min("n_group").as("__nmin"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("__g"), col("n_group"),
        floor(lit(1000) * sqrt(col("__nmin").cast("double") / col("n_group"))
          + 1e-9).cast("int").as("rate_permille"))
    df.join(broadcast(rates), groupCol === col("__g"))
      .filter(bucketOf(key, salt) < col("rate_permille"))
      .drop("__g")
  }

  /** Token-budget mixture sampling — the data-mixing recipe that turns a
    * heterogeneous corpus into a training mix: given target mixture weights
    * per group (permille of the budget that each group should contribute)
    * and a global unit budget (tokens/chars/bytes — whatever `unitCol`
    * measures), derive each group's keep-rate
    *
    *   rate_g = min(1000, ⌊budget · w_g / units_g⌋) permille
    *
    * so a group's expected sampled mass is its budget share, capped at
    * keeping everything when the group is smaller than its allocation
    * (the cap is the under-represented-group case every published mix —
    * Pile/ROOTS/Dolma-style — hits in practice). Membership is then the
    * same salted-hash rule as every other sampler here: reproducible
    * across runs, engines, and partitionings.
    *
    * All-integer rate arithmetic (the numerator is reduced to an exact
    * multiple before dividing, operands < 2^53), so the oracle replays the
    * exact rates; one small aggregation over group unit sums, broadcast
    * back, zero additional shuffle on the corpus itself.
    *
    * Output: the sampled rows plus `group_units` and `rate_permille`
    * audit columns. Groups without a weight keep nothing.
    */
  def budgetMixtureSample(
      df: DataFrame,
      groupCol: Column,
      key: Column,
      unitCol: Column,
      weightPermille: Map[String, Int],
      budget: Long,
      salt: String): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    weightPermille.values.foreach(requirePermille)
    val sizes = df.groupBy(groupCol.as("__g"))
      .agg(sum(unitCol.cast("long")).as("group_units"))
    val w = weightPermille.foldLeft(lit(0L)) { case (acc, (g, p)) =>
      when(col("__g") === g, lit(p.toLong)).otherwise(acc)
    }
    val num = lit(budget) * w
    val rates = sizes.select(col("__g"), col("group_units"),
      least(lit(1000L),
        ((num - pmod(num, col("group_units"))) / col("group_units")).cast("long"))
        .cast("int").as("rate_permille"))
    df.join(broadcast(rates), groupCol === col("__g"))
      .filter(bucketOf(key, salt) < col("rate_permille"))
      .drop("__g")
  }

  /** Uniform integer priority in [0, 2^20): rank rows by it (ascending,
    * id tie-break) and take the first k for a deterministic fixed-SIZE
    * sample — the reproducible twin of reservoir sampling. Row-local, no
    * shuffle until the top-k itself, which Spark executes as
    * TakeOrderedAndProject (per-partition heaps, no full sort).
    */
  def uniformPriority(key: Column, salt: String): Column =
    pmod(h60(concat(lit(s"$salt:"), key)), lit(1L << 20))

  /** Weighted-sampling priority (without replacement): the row with the
    * k smallest `floor(r · 2^20 / w)` values is the sample, where
    * r = h60-uniform in [0, 2^20) and w ≥ 1 is the row's integer weight —
    * the integer fixed-point form of the exponential-race key −ln(u)/w
    * (A-ES / Efraimidis–Spirakis), so inclusion probability is
    * weight-increasing and first-order proportional to w for small
    * sampling fractions. All-integer arithmetic: the numerator is reduced
    * to an exact multiple of w before dividing, and both operands sit
    * below 2^53, so the IEEE division is exact and every engine computes
    * the identical priority (pow()/ln() last-ulp drift could flip ranks).
    */
  def weightedPriority(key: Column, weight: Column, salt: String): Column = {
    val r = pmod(h60(concat(lit(s"$salt:"), key)), lit(1L << 20))
    val w = greatest(weight.cast("long"), lit(1L))
    val num = r * lit(1L << 20)
    ((num - pmod(num, w)) / w).cast("long")
  }
}
