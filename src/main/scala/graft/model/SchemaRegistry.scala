package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Declared-write-schema registry — the Spark-native equivalent of the
  * reference's JSON schema config (`{table: [{"name":…, "type":…}, …]}`,
  * loaded at `config.py:27-29`, converted to `bigquery.SchemaField` at
  * `bigquery_operations.py:14-17` and enforced by the load job at
  * `bigquery_operations.py:27`).
  *
  * Here the same JSON shape parses to `StructType`s; [[enforce]] binds a
  * schema to a DataFrame before the write (select declared columns in
  * declared order, cast to declared types).
  */
object SchemaRegistry {

  type Registry = Map[String, StructType]

  /** BigQuery-style type names → Spark types. */
  def dataTypeFor(t: String): DataType = t.trim.toUpperCase match {
    case "STRING"                    => StringType
    case "INTEGER" | "INT64"         => LongType
    case "FLOAT" | "FLOAT64"         => DoubleType
    case "BOOLEAN" | "BOOL"          => BooleanType
    case "TIMESTAMP" | "DATETIME"    => TimestampType
    case "DATE"                      => DateType
    case "BYTES"                     => BinaryType
    case "NUMERIC" | "BIGNUMERIC"    => DecimalType(38, 9)
    case other =>
      throw new IllegalArgumentException(s"Unsupported registry type: $other")
  }

  /** Parse the registry JSON. Unknown shapes fail loudly — the registry is
    * the write-side source of truth, silently skipping entries would let
    * malformed config pass as "table not declared".
    */
  def fromJson(json: String): Registry = {
    JsonMethods.parse(json) match {
      case JObject(tables) =>
        tables.map {
          case (table, JArray(fields)) =>
            val structFields = fields.map { f =>
              (f \ "name", f \ "type") match {
                case (JString(n), JString(t)) => StructField(n, dataTypeFor(t))
                case _ =>
                  throw new IllegalArgumentException(
                    s"Malformed field entry for table $table: $f")
              }
            }
            table -> StructType(structFields)
          case (table, other) =>
            throw new IllegalArgumentException(
              s"Registry entry for $table is not an array: $other")
        }.toMap
      case other =>
        throw new IllegalArgumentException(s"Registry root is not an object: $other")
    }
  }

  /** K6: lookup with hard failure on a missing entry, mirroring the
    * reference's `ValueError` (`bigquery_operations.py:11-12`).
    */
  def schemaFor(registry: Registry, table: String): StructType =
    registry.getOrElse(
      table,
      throw new IllegalArgumentException(s"No schema defined for table: $table"))

  /** K1: bind the declared schema — project declared columns in declared
    * order, cast each to its declared type. Referencing a column the frame
    * lacks fails analysis, which is the schema-enforcement contract.
    */
  def enforce(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
}
