package graft

import java.time.LocalDate
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.SchemaRegistry
import graft.operators.Transforms
import graft.sources.{Sinks, Tables}

/** O5: `KEY=VALUE` credential/config file grammar (`config.py:8-24`). */
object Credentials {
  def parse(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.take(i).trim -> l.drop(i + 1).trim
      }
      .toMap
}

/** Orchestration (O1-O3): per-table Extract → (empty guard) → Transform →
  * Load, the Spark rendering of `etl_process.py:12-29`.
  *
  * Unlike the reference's sequential loop (`etl_process.py:18`), tables run
  * concurrently — each pipeline is an independent lazy DataFrame chain, so
  * driver-side Futures just overlap their job submissions; executors then
  * schedule tasks from all pipelines. Errors stay fail-fast per reference O3
  * (first failure propagates after in-flight tables drain).
  */
object Etl {

  /** Which tables get incremental extraction in daily mode and which sink
    * gets DAY partitioning, mirroring `mysql_operations.py:21` and
    * `bigquery_operations.py:30-34`.
    */
  final case class TableSpec(
      name: String,
      incrementalCol: Option[String] = None,
      dayPartitionField: Option[String] = None)

  final case class RunReport(table: String, extracted: Long, loaded: Long, total: Long)

  def runTable(
      spark: SparkSession,
      spec: TableSpec,
      source: String => DataFrame,
      registry: SchemaRegistry.Registry,
      outBase: String,
      daily: Boolean,
      day: LocalDate): Option[RunReport] = {
    val raw = source(spec.name)
    val extracted = spec.incrementalCol match {
      case Some(c) if daily => Tables.incremental(raw, c, day)
      case _                => raw
    }
    // P7: skip transform+load on empty extract (etl_process.py:21,24-25).
    Transforms.nonEmptyGuard(extracted).map { df =>
      val transformed = Transforms.forTable(spec.name)(df)
      val schema = SchemaRegistry.schemaFor(registry, spec.name)
      val report = Sinks.load(
        spark, transformed, schema, s"$outBase/${spec.name}",
        daily = daily, dayPartitionField = spec.dayPartitionField,
        table = Some(spec.name))
      // transforms are row-preserving (rename/drop/cast), so rowsLoaded IS
      // the extract count — recounting `extracted` would re-run the whole
      // source scan (a second full table transfer on the JDBC path).
      RunReport(spec.name, report.rowsLoaded, report.rowsLoaded, report.rowsTotal)
    }
  }

  def run(
      spark: SparkSession,
      specs: Seq[TableSpec],
      source: String => DataFrame,
      registry: SchemaRegistry.Registry,
      outBase: String,
      daily: Boolean = false,
      day: LocalDate = LocalDate.now().minusDays(1),
      parallelism: Int = 4): Seq[RunReport] = {
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = specs.map { spec =>
        Future(Try(runTable(spark, spec, source, registry, outBase, daily, day)))
      }
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      results.collect { case Failure(e) => throw e } // fail-fast, O3
      results.collect { case Success(Some(r)) => r }
    } finally pool.shutdown()
  }
}
