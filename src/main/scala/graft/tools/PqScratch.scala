package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Throwaway measurement harness for the PQ-ADC and IVF-PQ paths: recall
  * vs brute force and wall time per SF — the numbers behind PqRecallFloor
  * and IvfPqRecallFloor. Not part of the library surface.
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
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse_pqscratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val e = Tables.load(spark, d, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
      val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 3)
        .localCheckpoint(true)
      val total = brute.count()

      val t0 = System.nanoTime()
      val pq = Similarity.pqTopK(q, e, "vec_id", "embedding",
        k = 3, m = 16, ks = 16, shortlist = 128, iters = 2).cache()
      pq.count()
      val tPq = (System.nanoTime() - t0) / 1e9
      val hitsPq = brute.join(pq.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"PQ     $sf recall=${hitsPq.toDouble / total}%.3f time=$tPq%.2f s")
      pq.unpersist()

      val prefix = "ivfpq_scratch"
      Seq(s"${prefix}_codes", s"${prefix}_vecs", s"${prefix}_cents",
          s"${prefix}_books", s"${prefix}_meta")
        .foreach(graft.sources.Sinks.dropManagedTable(spark, _))
      val t1 = System.nanoTime()
      Similarity.writeIvfPqIndex(e, "vec_id", "embedding", prefix,
        buckets = 8, nlist = 16, nlistIters = 3, m = 16, ks = 16, iters = 2)
      val tBuild = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val ann = Similarity.ivfPqTopKAgainstIndex(q, prefix, "vec_id", "embedding",
        k = 3, nprobe = 4, shortlist = 128).cache()
      ann.count()
      val tProbe = (System.nanoTime() - t2) / 1e9
      val hits = brute.join(ann.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"IVF-PQ $sf recall=${hits.toDouble / total}%.3f build=$tBuild%.2f s probe=$tProbe%.2f s")
      ann.unpersist()
    }
    spark.stop()
  }
}
