package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Measurement harness for the IVF / IVF-PQ recall-latency frontier:
  * sweeps nprobe (multi-probe) × assign (SOAR-style multi-assignment)
  * against brute-force ground truth per SF — the numbers behind the
  * recall floors in SimilarityQueries and the curve recorded in
  * BASELINE.md. Not part of the library surface.
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse_annsweep")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.01", "sf0.1")
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      val e = Tables.load(spark, d, "embeddings").localCheckpoint(true)
      val q = e.filter(col("vec_id") % 50 === 0)
      val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 3)
        .localCheckpoint(true)
      val total = brute.count()
      for (assign <- Seq(1, 2)) {
        val ivfP = s"annsweep_ivf_a$assign"
        Seq(s"${ivfP}_lists", s"${ivfP}_cents", s"${ivfP}_meta")
          .foreach(graft.sources.Sinks.dropManagedTable(spark, _))
        Similarity.writeIvfIndex(e, "vec_id", "embedding", ivfP,
          buckets = 8, nlist = 16, iters = 3, assign = assign)
        val pqP = s"annsweep_ivfpq_a$assign"
        Seq(s"${pqP}_codes", s"${pqP}_vecs", s"${pqP}_cents",
            s"${pqP}_books", s"${pqP}_meta")
          .foreach(graft.sources.Sinks.dropManagedTable(spark, _))
        Similarity.writeIvfPqIndex(e, "vec_id", "embedding", pqP,
          buckets = 8, nlist = 16, nlistIters = 3, m = 16, ks = 16, iters = 2,
          assign = assign)
        for (nprobe <- Seq(2, 4, 6, 8, 12)) {
          val t0 = System.nanoTime()
          val ivf = Similarity.ivfTopKAgainstIndex(q, ivfP, "vec_id", "embedding",
            k = 3, nprobe = nprobe)
          val tIvf = (System.nanoTime() - t0) / 1e9
          val hIvf = brute.join(ivf.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi").count()
          val t1 = System.nanoTime()
          val pq = Similarity.ivfPqTopKAgainstIndex(q, pqP, "vec_id", "embedding",
            k = 3, nprobe = nprobe, shortlist = 128)
          val tPq = (System.nanoTime() - t1) / 1e9
          val hPq = brute.join(pq.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi").count()
          println(f"$sf assign=$assign nprobe=$nprobe%2d  " +
            f"IVF recall=${hIvf.toDouble / total}%.3f t=$tIvf%5.2f s   " +
            f"IVF-PQ recall=${hPq.toDouble / total}%.3f t=$tPq%5.2f s")
        }
      }
    }
    spark.stop()
  }
}
