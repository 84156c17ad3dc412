package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
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

  /** What to do when the source frame's columns have drifted from the
    * declared schema — the case the reference hits whenever its registry
    * JSON changes under a live source (`bigquery_operations.py:14-27`
    * enforces the declared fields on every load; pandas frames with extra /
    * missing columns fail the job).
    */
  sealed trait EvolutionPolicy
  object EvolutionPolicy {

    /** Any drift fails loudly BEFORE the write: a missing declared column
      * or an undeclared source column raises with both lists named.
      * Reordered columns are not drift — the projection normalizes order.
      */
    case object Strict extends EvolutionPolicy

    /** Evolve the frame to the declared shape: missing declared columns are
      * filled with typed NULLs (the additive-column migration), undeclared
      * source columns are dropped, order and types are normalized. The
      * registry stays the single source of truth for what lands.
      */
    case object Evolve extends EvolutionPolicy
  }

  /** [[enforce]] with an explicit drift policy. Column matching is exact
    * (case-sensitive) — a renamed-by-case column is real drift, not a
    * match, because downstream stores treat names byte-wise.
    */
  def evolve(df: DataFrame, schema: StructType, policy: EvolutionPolicy): DataFrame = {
    val have = df.columns.toSet
    val declared = schema.fieldNames.toSet
    val missing = schema.fieldNames.toSeq.filterNot(have)
    val unexpected = df.columns.toSeq.filterNot(declared)
    policy match {
      case EvolutionPolicy.Strict =>
        if (missing.nonEmpty || unexpected.nonEmpty)
          throw new IllegalArgumentException(
            "schema drift under Strict policy: " +
              s"missing declared columns [${missing.mkString(", ")}], " +
              s"undeclared source columns [${unexpected.mkString(", ")}]")
        enforce(df, schema)
      case EvolutionPolicy.Evolve =>
        df.select(schema.fields.map { f =>
          (if (have(f.name)) col(f.name) else lit(null)).cast(f.dataType).as(f.name)
        }.toSeq: _*)
    }
  }
}
