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

  /** The nlist-scaling measurement behind the "production grows nlist
    * ~√N, making probes sub-linear in corpus size" claim (asserted in
    * the ScaleBench x100 notes, measured here): at the 500k-vector
    * x100 corpus, a FIXED nprobe with growing nlist shrinks the scanned
    * fraction 2·nprobe/nlist while finer cells + dual assignment hold
    * recall — build cost grows ~nlist (one broadcast-assignment pass per
    * k-means iter), paid once. Run AFTER ScaleBench x100 has
    * materialized /tmp/graft_scale100.
    */
  private def runNlist(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.Similarity
    val dir = s"${sys.props("java.io.tmpdir")}/graft_scale100"
    require(new java.io.File(s"$dir/embeddings.parquet").exists(),
      s"run ScaleBench x100 first to materialize $dir")
    val e = graft.sources.Tables.load(spark, dir, "embeddings").localCheckpoint(true)
    val q = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .filter(col("vec_id") % 50 === 0).localCheckpoint(true)
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 3)
      .localCheckpoint(true)
    val total = brute.count()
    val sweeps = Seq(
      16 -> Seq(6),
      64 -> Seq(6, 10, 14, 18),
      160 -> Seq(6, 15, 25, 35, 45))
    for ((nlist, nprobes) <- sweeps) {
      val prefix = s"annnl_$nlist"
      Seq(s"${prefix}_lists", s"${prefix}_cents", s"${prefix}_meta")
        .foreach(graft.sources.Sinks.dropManagedTable(spark, _))
      val t0 = System.nanoTime()
      Similarity.writeIvfIndex(e, "vec_id", "embedding", prefix,
        buckets = 8, nlist = nlist, iters = 3, assign = 2)
      val tBuild = (System.nanoTime() - t0) / 1e9
      for (nprobe <- nprobes) {
        val t1 = System.nanoTime()
        val ivf = Similarity.ivfTopKAgainstIndex(q, prefix, "vec_id", "embedding",
          k = 3, nprobe = nprobe)
        val tProbe = (System.nanoTime() - t1) / 1e9
        val hits = brute.join(ivf.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count()
        println(f"x100 nlist=$nlist%3d nprobe=$nprobe%2d assign=2  " +
          f"recall=${hits.toDouble / total}%.3f build=$tBuild%6.1f s probe=$tProbe%6.2f s " +
          f"frac=${2.0 * nprobe / nlist}%.3f")
      }
    }
  }

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
    if (args.headOption.contains("nlist")) {
      runNlist(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("filtered")) {
      // recall of PRE-filtered search vs brute force over the filtered
      // corpus, per SF at the serving config — the numbers behind
      // SimilarityQueries.IvfFilteredRecallFloor
      for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
        val d = s"/root/testdata/$sf"
        val e = Tables.load(spark, d, "embeddings").localCheckpoint(true)
        val q = e.filter(col("vec_id") % 50 === 0)
        val brute = Similarity.bruteForceTopK(
            q, e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", k = 3)
          .localCheckpoint(true)
        val total = brute.count()
        val p = "annsweep_filt"
        Seq(s"${p}_lists", s"${p}_cents", s"${p}_meta")
          .foreach(graft.sources.Sinks.dropManagedTable(spark, _))
        Similarity.writeIvfIndex(e, "vec_id", "embedding", p,
          buckets = 8, nlist = 16, iters = 3, assign = 2)
        for (nprobe <- Seq(6, 8, 10)) {
          val ivf = Similarity.ivfTopKAgainstIndex(q, p, "vec_id", "embedding",
            k = 3, nprobe = nprobe,
            candidateFilter = col("neighbor_id") % 3 === 0)
          val hits = brute.join(ivf.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi").count()
          println(f"FILTERED sf=$sf nprobe=$nprobe%2d " +
            f"recall=${hits.toDouble / total}%.3f ($hits/$total)")
        }
      }
      spark.stop()
      return
    }
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
