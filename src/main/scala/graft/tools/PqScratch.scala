package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Throwaway measurement harness for the PQ-ADC path: recall vs brute
  * force and wall time per SF — the numbers behind PqRecallFloor. Not part
  * of the library surface.
  */
object PqScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val grid = Seq((16, 16, 128, 1))
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); (m, ks, sl, it) <- grid) {
      val d = s"/root/testdata/$sf"
      val e = Tables.load(spark, d, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      val t0 = System.nanoTime()
      val pq = Similarity.pqTopK(q, e, "vec_id", "embedding",
        k = 3, m = m, ks = ks, shortlist = sl, iters = it).cache()
      val pqn = pq.count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 3)
      val hits = brute.join(pq.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      val total = brute.count()
      println(f"PQ $sf m=$m ks=$ks sl=$sl it=$it recall=${hits.toDouble / total}%.3f rows=$pqn time=$t1%.2f s")
      pq.unpersist()
    }
    spark.stop()
  }
}
