package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production JDBC source — the Spark-native successor of the reference's
  * SQLAlchemy extract layer (`mysql_operations.py:8-41`).
  *
  * Differences by design:
  *  - credentials go through the options map, never string-interpolated SQL
  *    (the reference f-strings the table name and date into the query,
  *    `mysql_operations.py:23,25` — injection-prone);
  *  - reads are partitioned (`partitionColumn/lowerBound/upperBound/
  *    numPartitions`) so a large table lands as N parallel range scans
  *    instead of one driver-side materialization (`pd.read_sql`,
  *    `mysql_operations.py:27`);
  *  - the incremental predicate is a Column filter, which Catalyst compiles
  *    into the remote `WHERE` clause (observable in the JDBC scan's
  *    PushedFilters), equivalent to `mysql_operations.py:21-23`.
  *
  * Untestable in this environment (no database, zero egress); exercised
  * structurally via option-map unit tests only.
  */
final case class JdbcConfig(
    url: String,
    user: String,
    password: String,
    driver: String = "com.mysql.cj.jdbc.Driver",
    fetchSize: Int = 10000)

object Jdbc {

  private def reader(spark: SparkSession, cfg: JdbcConfig) =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("fetchsize", cfg.fetchSize)

  /** S1 over JDBC. `partitioning = (column, lower, upper, n)` splits the scan
    * into n range predicates executed in parallel by n tasks.
    */
  def read(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = reader(spark, cfg).option("dbtable", table)
    val withParts = partitioning.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c)
        .option("lowerBound", lo)
        .option("upperBound", hi)
        .option("numPartitions", n)
    }
    withParts.load()
  }

  /** S2 over JDBC: the daily date-equality semantics as a half-open
    * timestamp range — attribute-vs-literal comparisons translate directly
    * into the remote WHERE clause (a `to_date(col)` wrapper would depend
    * on the optimizer unwrapping it before source translation).
    */
  def readIncremental(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      tsCol: String,
      day: java.time.LocalDate): DataFrame = {
    val df = read(spark, cfg, table)
    // type-aware UTC-pinned bounds (shared with the file source) — the JVM
    // default timezone never participates, so the pushed WHERE range is the
    // same on any host.
    val (lo, hi) = Tables.dayBounds(df.schema(tsCol).dataType, day)
    df.filter(col(tsCol) >= lo && col(tsCol) < hi)
  }

  /** S3 over JDBC: base-table discovery via information_schema (the portable
    * spelling of `SHOW FULL TABLES WHERE Table_type = 'BASE TABLE'`).
    */
  def discoverBaseTables(spark: SparkSession, cfg: JdbcConfig, database: String): DataFrame =
    reader(spark, cfg)
      .option("dbtable",
        s"""(SELECT table_name FROM information_schema.tables
           | WHERE table_schema = '${database.replace("'", "''")}'
           |   AND table_type = 'BASE TABLE') AS t""".stripMargin)
      .load()
}
