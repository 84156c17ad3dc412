package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.CrossHash._
import graft.operators.Dedup
import graft.sources.Tables

/** Throwaway profiling harness for the dedup family at sf0.1 — not part of
  * the library surface. Each measurement clears the SQL cache first so a
  * persisted plan from a previous run can't satisfy the next one via
  * canonical-plan cache reuse (which silently turns "fresh run" timings
  * into cache-hit timings).
  */
object ProfileScratch {
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
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val r = f
      println(f"TIMING $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val df = Tables.load(spark, d, "documents")
    df.count() // footer/page-cache warm

    if (args.headOption.contains("ragbatchmmr")) {
      // measure sim_rag_batch_mmr's served-vs-exact selected-set overlap
      // (the number RagBatchMmrFloor gates) at the three verify SFs
      import graft.operators.Similarity
      import org.apache.spark.sql.DataFrame
      for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
        val dir = s"/root/testdata/$sf"
        val (exactF, servedF) =
          graft.queries.SimilarityQueries.ragBatchFused(spark, dir)
        val c = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("embedding").as("emb"))
        def toCand(f: DataFrame): DataFrame = f
          .select(col("query_id"), col("doc_id"), col("rrf").as("rel"))
          .join(c, Seq("doc_id"))
          .select("query_id", "doc_id", "emb", "rel")
        val ex = Similarity.mmrSelect(toCand(exactF), kSel = 8, lambda = 0.7)
          .select("query_id", "doc_id")
        val sv = Similarity.mmrSelect(toCand(servedF), kSel = 8, lambda = 0.7)
          .select("query_id", "doc_id").withColumn("hit", lit(1))
        val ov = ex.join(sv, Seq("query_id", "doc_id"), "left")
          .groupBy("query_id")
          .agg((sum(coalesce(col("hit"), lit(0))).cast("double")
            / count(lit(1))).as("ov"))
          .orderBy("query_id")
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        println(s"RAGBATCHMMR $sf per-query overlap: " +
          ov.map { case (q, o) => f"q$q=$o%.3f" }.mkString(" ") +
          f"  min=${ov.map(_._2).min}%.3f")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("rag")) {
      // measure sim_rag_retrieve's served-vs-exact top-15 overlap (the
      // number RagFusionRecallFloor gates) at the three verify SFs —
      // replicates the query's construction on self-built indexes
      import graft.operators.{Similarity, Text, TextIndex}
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      val terms = graft.queries.TextQueries.BmQueryTerms
      def overlap(dir: String): Double = {
        val e = Tables.load(spark, dir, "embeddings")
        val docs = Tables.load(spark, dir, "documents")
        val anchor = e.filter(col("vec_id") === 0L)
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val ti = s"rag_ti_$tag"; val iv = s"rag_iv_$tag"
        (TextIndex.Suffixes.map(ti + _) :+ s"${ti}_current" :+
          s"${iv}_lists" :+ s"${iv}_cents" :+ s"${iv}_meta" :+ s"${iv}_current")
          .foreach(graft.sources.Sinks.dropManagedTable(spark, _))
        TextIndex.writeTextIndex(docs.filter(col("doc_id") % 4 =!= 3),
          "doc_id", tokens(col("text")), ti, buckets = 8)
        Similarity.writeIvfIndex(e, "vec_id", "embedding", iv,
          buckets = 8, nlist = 16, iters = 3, assign = 2)
        def fuse(dense: DataFrame, sparse: DataFrame): DataFrame =
          dense.join(sparse, Seq("doc_id"), "full_outer")
            .withColumn("rrf", round(
              coalesce(lit(1.0) / (lit(60.0) + col("dense_rank")), lit(0.0))
                + coalesce(lit(1.0) / (lit(60.0) + col("sparse_rank")), lit(0.0)), 7))
            .orderBy(col("rrf").desc, col("doc_id")).limit(15)
        def rankSparse(top: DataFrame): DataFrame = top
          .withColumn("sparse_rank", row_number()
            .over(Window.orderBy(col("bm25").desc, col("id"))).cast("long"))
          .select(col("id").as("doc_id"), col("sparse_rank"))
        val denseExact = Similarity.bruteForceTopK(
            anchor, e.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", k = 50)
          .select(col("neighbor_id").as("doc_id"), col("rank").as("dense_rank"))
        val sparseExact = rankSparse(
          Text.bm25(docs.filter(col("doc_id") % 4 =!= 3), "doc_id",
              tokens(col("text")), terms)
            .filter(col("id") % 3 === 0)
            .orderBy(col("bm25").desc, col("id")).limit(50).localCheckpoint(true))
        val exact = fuse(denseExact, sparseExact).select("doc_id").collect()
          .map(_.getLong(0)).toSet
        val denseServed = Similarity.ivfTopKAgainstIndex(anchor, iv,
            "vec_id", "embedding", k = 50, nprobe = 8,
            candidateFilter = col("neighbor_id") % 3 === 0)
          .select(col("neighbor_id").as("doc_id"), col("rank").as("dense_rank"))
        val sparseServed = rankSparse(
          TextIndex.bm25FilteredAgainstIndex(spark, ti, terms,
            docs.filter(col("doc_id") % 3 === 0).select("doc_id"), kTop = 50)
            .localCheckpoint(true))
        val served = fuse(denseServed, sparseServed).select("doc_id").collect()
          .map(_.getLong(0)).toSet
        exact.intersect(served).size.toDouble / exact.size
      }
      Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
        .foreach(dir => println(f"RAG overlap $dir ${overlap(dir)}%.3f"))
      spark.stop(); return
    }

    if (args.headOption.contains("nll")) {
      // isolate tx_bigram_nll's 100×-decade super-linearity (x100text
      // batch measured e(10-100) = 1.11): time the operator alone on the
      // scaled corpora, then its stages.
      val dir = args.lift(1).getOrElse("/tmp/graft_scale100")
      val big = spark.read.parquet(s"$dir/documents.parquet")
      big.count()
      val toksCol = tokens(col("text"))
      val t = big.select(col("doc_id").as("id"), toksCol.as("tk"))
      val bi = t.filter(size(col("tk")) >= 2)
        .select(col("id"), explode(transform(
          sequence(lit(0), size(col("tk")) - 2),
          i => struct(element_at(col("tk"), i + 1).as("a"),
            element_at(col("tk"), i + 2).as("b")))).as("bg"))
        .select(col("id"), col("bg.a").as("a"), col("bg.b").as("b"))
      val tf = bi.groupBy("id", "a", "b").agg(count(lit(1)).as("tf"))
      time("tf agg alone")(tf.count())
      val cab = tf.groupBy("a", "b").agg(sum("tf").as("cab"))
      time("cab from tf")(cab.count())
      time("full bigramNll")(
        graft.operators.Text.bigramNll(big, "doc_id", toksCol).count())
      spark.stop(); return
    }

    if (args.headOption.contains("spans")) {
      val toksCol = tokens(col("text"))
      val g = df.select(col("doc_id").as("id"), posexplode(wordShingles(toksCol, 5)))
        .select(col("id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("gram"))
      time("span grams explode")(g.count())
      time("span grams explode 2")(g.count())
      val gMat = df.select(col("doc_id").as("id"), toksCol.as("tk"))
        .select(col("id"), posexplode(wordShingles(col("tk"), 5)))
        .select(col("id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("gram"))
      time("span grams explode (materialized toks)")(gMat.count())
      time("span grams explode (materialized toks) 2")(gMat.count())
      val dup = g.groupBy("gram").agg(countDistinct(col("id")).as("nd"))
        .filter(col("nd") >= 2).select("gram")
      time("dup gram agg")(println("dup grams = " + dup.count()))
      time("semi join back")(g.join(dup, Seq("gram"), "left_semi").count())
      time("full dupSpans A")(
        Dedup.dupSpans(df, "doc_id", toksCol, 5, 2, 2).count())
      time("full dupSpans B")(
        Dedup.dupSpans(df, "doc_id", toksCol, 5, 2, 2).count())
      time("full dupGramCoverage")(
        Dedup.dupGramCoverage(df, "doc_id", toksCol, 5, 2).count())
      // does the established word-shingle signing path gain the same way?
      val wsInline = df.select(col("doc_id").as("id"),
        explode(array_distinct(wordShingles(toksCol, 3))).as("s"))
        .select(col("id"), (h60(col("s")) % Dedup.MinhashMod).as("h"))
      val wsMat = df.select(col("doc_id").as("id"), toksCol.as("tk"))
        .select(col("id"), explode(array_distinct(wordShingles(col("tk"), 3))).as("s"))
        .select(col("id"), (h60(col("s")) % Dedup.MinhashMod).as("h"))
      time("ws sign inline toks")(wsInline.count())
      time("ws sign inline toks 2")(wsInline.count())
      time("ws sign materialized toks")(wsMat.count())
      time("ws sign materialized toks 2")(wsMat.count())
      time("minhashPairs inline toks")(Dedup.minhashPairs(
        df, "doc_id", wordShingles(toksCol, 3), 16, 4, 0.7,
        assumeUnboundedVocab = true).count())
      time("minhashPairs materialized toks")(Dedup.minhashPairs(
        df.withColumn("__tk", toksCol), "doc_id", wordShingles(col("__tk"), 3),
        16, 4, 0.7, assumeUnboundedVocab = true).count())
      spark.stop()
      return
    }

    // stage costs, char-gram variant (d_ngram_jaccard)
    val grams = df.select(col("doc_id").as("id"),
      explode(array_distinct(charGrams(col("text"), 4))).as("s"))
    time("gram explode (no hash)")(grams.count())
    time("gram explode (no hash) 2")(grams.count())
    val hashed = grams.select(col("id"), (h60(col("s")) % Dedup.MinhashMod).as("h"))
    time("explode+md5")(hashed.count())
    time("explode+md5 2")(hashed.count())
    val k = 24
    val aggCols = (0 until k).map(i =>
      min((col("h") * (2 * i + 1) + (97L + 31L * i)) % Dedup.MinhashMod).as(s"m$i")) :+
      collect_set(col("h")).as("sh")
    val sigd = hashed.groupBy("id").agg(aggCols.head, aggCols.tail: _*)
    time("sigd no-persist")(sigd.count())
    time("sigd no-persist 2")(sigd.count())
    val minsOnly = hashed.groupBy("id").agg(aggCols.init.head, aggCols.init.tail: _*)
    time("mins-only agg (no collect_set)")(minsOnly.count())
    val setOnly = hashed.groupBy("id").agg(collect_set(col("h")).as("sh"))
    time("collect_set-only agg")(setOnly.count())

    // distinct gram dictionary size — is a hash-once dictionary worth it?
    time("global distinct grams")(println("distinct grams = " + grams.select("s").distinct().count()))
    println("total gram rows = " + grams.count())

    // word-shingle stage costs (d_minhash_lsh path)
    val wsh = df.select(col("doc_id").as("id"),
      explode(array_distinct(wordShingles(tokens(col("text")), 3))).as("s"))
      .select(col("id"), (h60(col("s")) % Dedup.MinhashMod).as("h"))
    time("ws explode+md5")(wsh.count())
    println("ws vocab = " + wsh.select("h").distinct().count())
    println("ws rows = " + wsh.count())
    val wAgg = (0 until 16).map(i =>
      min((col("h") * (2 * i + 1) + (97L + 31L * i)) % Dedup.MinhashMod).as(s"m$i"))
    time("ws mins-only")(wsh.groupBy("id").agg(wAgg.head, wAgg.tail: _*).count())
    time("ws mins+collect_set")(wsh.groupBy("id")
      .agg((wAgg :+ collect_set(col("h")).as("sh")).head,
        (wAgg :+ collect_set(col("h")).as("sh")).tail: _*).count())

    // full operators, warm JIT but cold cache
    time("d_ngram_jaccard full A")(Dedup.ngramJaccardPairs(df, "doc_id", col("text"), 4, 0.6).count())
    time("d_ngram_jaccard full B")(Dedup.ngramJaccardPairs(df, "doc_id", col("text"), 4, 0.6).count())
    val toks = tokens(col("text"))
    time("d_minhash_lsh full A")(
      Dedup.minhashPairs(df, "doc_id", wordShingles(toks, 3), 16, 4, 0.7).count())
    time("d_minhash_lsh full B")(
      Dedup.minhashPairs(df, "doc_id", wordShingles(toks, 3), 16, 4, 0.7).count())
    time("d_simhash_pairs full")(
      Dedup.simhashPairs(Dedup.simhash(df, "doc_id", wordShingles(toks, 3)), maxHamming = 3).count())
    spark.stop()
  }
}
