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
}
