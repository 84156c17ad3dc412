package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Throwaway: standalone timing of one query per scale in fresh sessions —
  * adjudicates whether a ScaleBench ratio is algorithmic or a shared-memo
  * eviction artifact. Not part of the library surface.
  */
object CovScratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d_dup_coverage")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse_covscratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale10", "/tmp/graft_scale100");
         rep <- 1 to 2) {
      val sess = spark.newSession()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(sess, dir).count()
      println(f"$name $dir rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
