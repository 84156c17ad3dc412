package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet-backed table source over the harness testdata layout
  * (`<sfDir>/<table>.parquet`).
  *
  * Mirrors the reference's source surface: full scan (S1) and incremental
  * scan (S2) from `mysql_operations.py:15-41`, catalog discovery (S3) and
  * allowlisting (S4) from `mysql_operations.py:43-55`. The production JDBC
  * path lives in [[Jdbc]]; this file is the file-based equivalent the
  * verification harness exercises.
  */
object Tables {

  /** Columns stored as parquet TIMESTAMP(NANOS), which Spark reads as
    * LongType under `spark.sql.legacy.parquet.nanosAsLong=true` (plain reads
    * fail with PARQUET_TYPE_ILLEGAL). Converted back to micros timestamps on
    * load; integer `div` avoids the precision loss a double division would
    * incur on ~1.7e18 nano values.
    */
  private val nanosColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  /** S1: full table scan. Column pruning + predicate pushdown are Catalyst's
    * job — callers just compose on the returned (lazy) DataFrame.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    nanosColumns.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.columns.contains(c) && df.schema(c).dataType == LongType)
        df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      else df
    }
  }

  /** S2: incremental ("daily") scan — the `WHERE DATE(backup_date) = d`
    * semantics of `mysql_operations.py:21-23`, written as the equivalent
    * half-open timestamp range rather than `to_date(col) === d`: plain
    * attribute-vs-literal comparisons are pushable by every source
    * (parquet row-group skipping, JDBC WHERE translation), with no
    * reliance on the optimizer unwrapping the date cast.
    */
  def incremental(df: DataFrame, tsCol: String, day: java.time.LocalDate): DataFrame = {
    val (lo, hi) = dayBounds(df.schema(tsCol).dataType, day)
    df.filter(col(tsCol) >= lo && col(tsCol) < hi)
  }

  /** Half-open [day, day+1) bounds as literals of the COLUMN's own type, so
    * the comparison stays attribute-vs-literal (pushable) with no implicit
    * cast on either side. TIMESTAMP_NTZ gets wall-clock bounds (timezone-
    * free by definition); TIMESTAMP gets UTC-pinned instants — derived from
    * `ZoneOffset.UTC`, never the JVM default zone, so a non-UTC JVM computes
    * the same range as the UTC session the engine pins everywhere else.
    */
  private[sources] def dayBounds(
      dt: org.apache.spark.sql.types.DataType,
      day: java.time.LocalDate): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
    dt match {
      case TimestampNTZType =>
        (lit(day.atStartOfDay()), lit(day.plusDays(1).atStartOfDay()))
      case DateType =>
        (lit(java.sql.Date.valueOf(day)), lit(java.sql.Date.valueOf(day.plusDays(1))))
      case _ =>
        val z = java.time.ZoneOffset.UTC
        (lit(day.atStartOfDay(z).toInstant), lit(day.plusDays(1).atStartOfDay(z).toInstant))
    }

  /** S2 fused with the scan: for nanos-backed columns the day range is
    * applied to the RAW long column BEFORE the micros conversion, so the
    * comparison is attribute-vs-literal and reaches the parquet scan
    * (row-group skipping); filtering the converted column cannot push.
    * Non-nanos tables fall through to [[incremental]] (already pushable).
    */
  def loadIncremental(
      spark: SparkSession,
      sfDir: String,
      name: String,
      tsCol: String,
      day: java.time.LocalDate): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val isNanos = nanosColumns.getOrElse(name, Nil).contains(tsCol) &&
      raw.columns.contains(tsCol) && raw.schema(tsCol).dataType == LongType
    if (isNanos) {
      val zone = java.time.ZoneOffset.UTC
      val loNanos = day.atStartOfDay(zone).toInstant.getEpochSecond * 1000000000L
      val hiNanos = day.plusDays(1).atStartOfDay(zone).toInstant.getEpochSecond * 1000000000L
      val filtered = raw.filter(col(tsCol) >= loNanos && col(tsCol) < hiNanos)
      nanosColumns(name).foldLeft(filtered) { (df, c) =>
        if (df.columns.contains(c) && df.schema(c).dataType == LongType)
          df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
        else df
      }
    } else incremental(load(spark, sfDir, name), tsCol, day)
  }

  /** S3: catalog discovery — the parquet-directory analogue of
    * `SHOW FULL TABLES WHERE Table_type = 'BASE TABLE'`
    * (`mysql_operations.py:50`). Local listing; a cluster deployment would
    * swap in the Hadoop FileSystem API or a catalog, same contract.
    */
  def discover(sfDir: String): Seq[String] = {
    val files = Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
    files.toSeq.map(_.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }

  /** S4: allowlist filter (`mysql_operations.py:45,51`). */
  def allowlisted(tables: Seq[String], allowed: Set[String]): Seq[String] =
    tables.filter(allowed)

  /** S3+S4 as a DataFrame, for oracle-comparable query registration. */
  def catalog(spark: SparkSession, sfDir: String, allowed: Option[Set[String]] = None): DataFrame = {
    import spark.implicits._
    val names = allowed.fold(discover(sfDir))(a => allowlisted(discover(sfDir), a))
    names.toDF("table_name").orderBy("table_name")
  }
}
