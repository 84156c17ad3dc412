package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model.SchemaRegistry

/** End-to-end orchestration spec: the reference's full-refresh and daily
  * pipelines (E1/E2) against a temp parquet destination.
  */
class EtlSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val registry = SchemaRegistry.fromJson(
    """{
      |  "daily_log": [
      |    {"name": "ID", "type": "INTEGER"},
      |    {"name": "BackupDate", "type": "TIMESTAMP"},
      |    {"name": "Server", "type": "STRING"}
      |  ]
      |}""".stripMargin)

  private def sourceDf = Seq(
    (1L, ts("2024-01-14 10:00:00"), "s1", "a.bak"),
    (2L, ts("2024-01-15 11:00:00"), "s2", "b.bak"),
    (3L, ts("2024-01-15 12:00:00"), "s1", "c.bak")
  ).toDF("ID", "backup_date", "server", "fileName")

  test("full refresh: transform dispatch + schema enforce + DAY partitioning") {
    val out = Files.createTempDirectory("graft_etl").toString
    val spec = Etl.TableSpec("daily_log",
      incrementalCol = Some("BackupDate"), dayPartitionField = Some("BackupDate"))
    val reports = Etl.run(spark, Seq(spec), _ => sourceDf, registry, out, daily = false)
    assert(reports == Seq(Etl.RunReport("daily_log", 3, 3, 3)))
    val written = spark.read.parquet(s"$out/daily_log")
    // declared schema only (FileName survives the transform but the registry
    // doesn't declare it, so schema enforcement excludes it; partition col added)
    assert(written.columns.toSet == Set("ID", "BackupDate", "Server", "p_date"))
    assert(written.select("p_date").distinct().count() == 2)
  }

  test("daily mode: incremental extract + append disposition") {
    val out = Files.createTempDirectory("graft_etl").toString
    val spec = Etl.TableSpec("daily_log",
      incrementalCol = Some("backup_date"), dayPartitionField = Some("BackupDate"))
    val day = java.time.LocalDate.parse("2024-01-15")
    val r1 = Etl.run(spark, Seq(spec), _ => sourceDf, registry, out, daily = true, day = day)
    assert(r1 == Seq(Etl.RunReport("daily_log", 2, 2, 2))) // only the two 01-15 rows
    val r2 = Etl.run(spark, Seq(spec), _ => sourceDf, registry, out, daily = true, day = day)
    assert(r2.head.total == 4) // append, not truncate
  }

  test("daily mode skips the table entirely on an empty day (P7 guard)") {
    val out = Files.createTempDirectory("graft_etl").toString
    val spec = Etl.TableSpec("daily_log", incrementalCol = Some("backup_date"))
    val day = java.time.LocalDate.parse("1999-01-01")
    val reports = Etl.run(spark, Seq(spec), _ => sourceDf, registry, out, daily = true, day = day)
    assert(reports.isEmpty)
    assert(!new java.io.File(s"$out/daily_log").exists())
  }

  test("fail-fast: a missing registry entry aborts the run (O3/K6)") {
    val out = Files.createTempDirectory("graft_etl").toString
    val specs = Seq(Etl.TableSpec("daily_log"), Etl.TableSpec("unregistered"))
    intercept[IllegalArgumentException] {
      Etl.run(spark, specs, _ => sourceDf, registry, out)
    }
  }

  test("O4 run log: dated file name, asctime [levelname] line format, append") {
    val dir = Files.createTempDirectory("graft_log")
    val fixed = java.time.Clock.fixed(
      java.time.Instant.parse("2024-01-15T10:30:00Z"), java.time.ZoneOffset.UTC)
    val log = new RunLog(dir, fixed)
    log.info("table=daily_log loaded=3")
    log.error("boom")
    assert(log.file.getFileName.toString == "MYSQL_to_BQ_2024-01-15.log")
    val lines = Files.readAllLines(log.file)
    assert(lines.size == 2)
    assert(lines.get(0) == "2024-01-15 10:30:00 [INFO] table=daily_log loaded=3")
    assert(lines.get(1) == "2024-01-15 10:30:00 [ERROR] boom")
  }

  test("EtlMain CLI end-to-end: config file, --daily, space-form --day, run log") {
    val base = Files.createTempDirectory("graft_cli")
    // source parquet: one table, two days of rows
    sourceDf.write.parquet(s"$base/src/daily_log.parquet")
    Files.writeString(base.resolve("registry.json"),
      """{"daily_log": [
        |  {"name": "ID", "type": "INTEGER"},
        |  {"name": "BackupDate", "type": "TIMESTAMP"},
        |  {"name": "Server", "type": "STRING"}
        |]}""".stripMargin)
    Files.writeString(base.resolve("etl.conf"),
      s"""SOURCE_DIR = $base/src
         |OUT_DIR = $base/out
         |TABLES = daily_log
         |REGISTRY = $base/registry.json
         |INCREMENTAL_COL.daily_log = backup_date
         |PARTITION_FIELD.daily_log = BackupDate
         |LOG_DIR = $base/logs
         |""".stripMargin)
    EtlMain.main(Array(s"$base/etl.conf", "--daily", "--day", "2024-01-15"))
    val written = spark.read.parquet(s"$base/out/daily_log")
    assert(written.count() == 2) // only the two 01-15 rows
    assert(written.columns.toSet == Set("ID", "BackupDate", "Server", "p_date"))
    val logs = new java.io.File(s"$base/logs").listFiles().map(_.getName).toSeq
    assert(logs.exists(_.matches("MYSQL_to_BQ_\\d{4}-\\d{2}-\\d{2}\\.log")))
    // and the session this spec owns must survive the CLI run
    assert(!spark.sparkContext.isStopped)
  }

  test("EtlMain rejects a trailing bare --day instead of silently using yesterday") {
    val e = intercept[IllegalArgumentException] {
      EtlMain.main(Array("/nonexistent.conf", "--daily", "--day"))
    }
    assert(e.getMessage.contains("--day requires a date"))
  }

  test("credentials parser handles comments, blanks, and values with '='") {
    val parsed = Credentials.parse(
      """# comment
        |USER = alice
        |PASS=a=b=c
        |
        |HOST=db.example.com""".stripMargin)
    assert(parsed == Map("USER" -> "alice", "PASS" -> "a=b=c", "HOST" -> "db.example.com"))
  }
}
