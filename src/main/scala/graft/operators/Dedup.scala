package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash._

/** Deduplication operators for large text/embedding corpora — the
  * LLM-data-pipeline tier (extension over the reference, which has no dedup;
  * see SURVEY.md §2.5/§7).
  *
  * Scale design: every variant is shuffle-bounded — candidates come from
  * hash-bucket self-joins (LSH bands, simhash bands, blocking keys), never a
  * full cross product, so cost is O(n · bucket_width) not O(n²). At 100 TB
  * the bucket join is a plain hash shuffle on the band key; skewed buckets
  * (degenerate shingles) are AQE's skew-join case.
  */
object Dedup {

  /** Exact dedup: group by a content fingerprint, keep the smallest id as
    * representative. `fingerprint` defaults to md5 of the raw content;
    * callers can pass a normalized fingerprint (e.g. sorted bag of words)
    * for "exact up to normalization" semantics.
    */
  def exact(df: DataFrame, idCol: String, fingerprint: Column): DataFrame =
    df.groupBy(fingerprint.as("fp"))
      .agg(
        min(col(idCol)).as("rep_" + idCol),
        count(lit(1)).as("n_copies"))

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle → k minhashes → `bands` band keys → self-join per band →
    * distinct candidate pairs → exact Jaccard verify ≥ `threshold`.
    * The band self-join is the only shuffle that grows with data size.
    *
    * @param shingles column producing the shingle array per row
    * @return (a, b, jaccard) with a < b, jaccard rounded to 4 decimals
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      shingles: Column,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val rows = k / bands
    val sigd = df
      .select(col(idCol).as("id"), array_distinct(shingles).as("sh"))
      .withColumn("sig", minhashSig(col("sh"), k))
    val banded = sigd.select(
      col("id"), posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("band", "key")))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val sets = sigd.select(col("id"), col("sh"))
    cand
      .join(sets.select(col("id").as("a"), col("sh").as("sh_a")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("sh_b")), "b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 60-bit SimHash per row from a token array.
    *
    * Relational formulation: explode distinct tokens, hash each once, then
    * one aggregation computes all 60 bit-votes (sum of ±1 per bit) — a
    * single shuffle on the id, with each token's md5 computed exactly once
    * (an expression-level formulation would recompute it per bit after
    * Catalyst collapses projections).
    */
  def simhash(df: DataFrame, idCol: String, toks: Column): DataFrame = {
    val hashed = df
      .select(col(idCol).as("id"), explode(array_distinct(toks)).as("t"))
      .select(col("id"), h60(col("t")).as("h"))
    val votes = (0 until 60).map { b =>
      sum((shiftright(col("h"), b).bitwiseAND(1) * 2 - 1)).as(s"v$b")
    }
    val bitsSet = (0 until 60).map { b =>
      when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    hashed.groupBy("id")
      .agg(votes.head, votes.tail: _*)
      .select(col("id"), bitsSet.reduce(_ + _).as("simhash"))
  }

  /** Near-duplicate pairs by SimHash hamming distance ≤ `maxHamming`.
    *
    * Blocking: the 60-bit simhash cut into `maxHamming + 1` bands — by
    * pigeonhole, any pair within the distance budget matches at least one
    * band exactly, so the band self-join loses nothing while avoiding the
    * O(n²) compare. Output (a, b, hamming).
    */
  def simhashPairs(
      sims: DataFrame,
      idCol: String = "id",
      simCol: String = "simhash",
      maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val width = 60 / nBands
    val mask = (1L << width) - 1
    val bandKeyCols = (0 until nBands).map { i =>
      struct(lit(i).as("band"), (shiftright(col(simCol), i * width).bitwiseAND(mask)).as("key"))
    }
    val banded = sims.select(
      col(idCol).as("id"), col(simCol).as("sh"),
      explode(array(bandKeyCols: _*)).as("bk"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Character n-gram Jaccard near-dup pairs with neighbor-bucket length
    * blocking: rows are bucketed by length div `bucketWidth`; each row
    * publishes keys {bucket, bucket+1}, so any pair whose buckets differ by
    * at most 1 collides on a key — sound for high-similarity pairs
    * (near-identical texts have near-identical lengths) and an equi-join,
    * not a theta-join, so it stays a hash shuffle at scale.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      n: Int = 4,
      threshold: Double = 0.6,
      bucketWidth: Int = 50): DataFrame = {
    val grams = df.select(
      col(idCol).as("id"),
      array_distinct(charGrams(textCol, n)).as("g"),
      (length(textCol).cast("long") / bucketWidth).cast("long").as("bucket"))
    val keyed = grams.select(
      col("id"), explode(array(col("bucket"), col("bucket") + 1)).as("k"))
    val cand = keyed.as("x")
      .join(keyed.as("y"), col("x.k") === col("y.k") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val sets = grams.select(col("id"), col("g"))
    cand
      .join(sets.select(col("id").as("a"), col("g").as("g_a")), "a")
      .join(sets.select(col("id").as("b"), col("g").as("g_b")), "b")
      .withColumn("jaccard", round(jaccard(col("g_a"), col("g_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Embedding near-dup pairs: cosine ≥ `threshold` within a blocking key
    * (here a precomputed cluster/label; at 100 TB the block key would come
    * from LSH — see [[Similarity.hyperplaneSignature]] — keeping the
    * self-join O(n · block_width)).
    */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("blk"), col(idCol).as("id"), col(embCol).as("e"))
    v.as("x").join(v.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .withColumn("cos", round(cosine(col("x.e"), col("y.e")), 4))
      .filter(col("cos") >= threshold)
      .select(col("x.blk").as("block"), col("x.id").as("a"), col("y.id").as("b"), col("cos"))
  }
}
