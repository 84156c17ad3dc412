package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-area registries; each area object pairs
  * its Spark implementations with DuckDB oracle SQL over the same parquet
  * tables. Registries must not reuse names (asserted at load).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5 shape: 5-way star join with broadcast dimensions.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  private val registries: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ParityQueries.queries, ParityQueries.oracles),
      (RelationalQueries.queries, RelationalQueries.oracles),
      (WarehouseQueries.queries, WarehouseQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (SimilarityQueries.queries, SimilarityQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (SessionQueries.queries, SessionQueries.oracles),
      (FunctionQueries.queries, FunctionQueries.oracles),
      (StreamQueries.queries, StreamQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = registries.map(_._1)
    val names = merged.flatMap(_.keys)
    require(names.distinct.size == names.size,
      s"duplicate query names across registries: ${names.diff(names.distinct).distinct}")
    merged.reduce(_ ++ _)
  }

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check
    * (reserved for genuinely non-SQL-expressible ops).
    */
  val oracleSql: Map[String, String] = registries.map(_._2).reduce(_ ++ _)
}
