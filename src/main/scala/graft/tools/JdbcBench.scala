package graft.tools

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

import graft.sources.{Jdbc, JdbcConfig, JdbcDialect}

/** Timing evidence for `Jdbc.read`'s partitionColumn path (round-8
  * verdict task 8): generates a million-row embedded-Derby table and
  * measures the full-scan wall time at numPartitions 1 / 4 / 8 — the
  * number behind "a production source splits the scan into n range
  * predicates executed by n parallel tasks". Embedded Derby serializes
  * page access under a single JVM-wide lock manager, so the expected
  * shape is a real but sub-linear speedup (the point is that the n
  * range WHERE clauses land server-side and the tasks overlap I/O with
  * decode, not an n× fantasy a single-writer engine cannot deliver);
  * a server-grade engine with per-connection executors is where the
  * n× materializes. Results → dated BASELINE.md table. Not part of the
  * library surface.
  */
object JdbcBench {
  def main(args: Array[String]): Unit = {
    System.setProperty("derby.stream.error.file", "/tmp/derby_bench.log")
    val dir = java.nio.file.Files.createTempDirectory("graft_derby_bench").toString + "/db"
    val conn = DriverManager.getConnection(s"jdbc:derby:$dir;create=true")
    val n = 1000000
    try {
      conn.createStatement().execute(
        "CREATE TABLE big(id BIGINT NOT NULL PRIMARY KEY, v DOUBLE PRECISION, filler VARCHAR(64))")
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement("INSERT INTO big VALUES (?, ?, ?)")
      var i = 0
      while (i < n) {
        ps.setLong(1, i.toLong)
        ps.setDouble(2, i * 0.5)
        ps.setString(3, s"row_$i" + "x" * 40)
        ps.addBatch()
        if (i % 10000 == 9999) { ps.executeBatch(); conn.commit() }
        i += 1
      }
      ps.executeBatch(); conn.commit()
    } finally conn.close()
    println(s"JDBCBENCH generated $n rows in derby at $dir")

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = JdbcConfig(s"jdbc:derby:$dir", user = "app", password = "app",
      dialect = JdbcDialect.Derby)
    // untimed warmup: driver load, codegen
    Jdbc.read(spark, cfg, "big").limit(10).count()
    for (parts <- Seq(1, 4, 8); rep <- 1 to 2) {
      val partitioning =
        if (parts == 1) None else Some(("id", 0L, n.toLong, parts))
      val t0 = System.nanoTime()
      val c = Jdbc.read(spark, cfg, "big", partitioning)
        .selectExpr("sum(v)", "count(*)").collect()(0).getLong(1)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"JDBCBENCH numPartitions=$parts rep=$rep  scan+agg $t%6.2f s  rows=$c")
    }
    spark.stop()
  }
}
