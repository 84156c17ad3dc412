package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources beyond parquet — CSV and JSON-lines with declared
  * schemas (schema-on-read from the [[graft.model.SchemaRegistry]] shape),
  * plus a binary-file reader for the multimodal tier. The reference reads
  * only MySQL (`mysql_operations.py`); these are the file-based equivalents
  * a Spark deployment uses for landing zones.
  *
  * Scale notes: schemas are always declared (no `inferSchema` pass — that
  * doubles the read at 100 TB); CSV/JSON readers parallelize per file
  * split, binaryFile per file.
  */
object Files {

  /** CSV with declared schema; header expected, malformed rows fail the
    * job (PERMISSIVE would silently null-fill — fail-fast matches the
    * reference's O3 error contract).
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  /** JSON-lines with declared schema, fail-fast. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "FAILFAST")
      .schema(schema)
      .json(path)

  /** Opaque media files as (path, modificationTime, length, content) —
    * the real ingestion path for [[graft.operators.Multimodal]] payloads.
    */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
}
