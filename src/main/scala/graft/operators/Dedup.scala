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

  /** Modulus of the derived MinHash family: 2^31 - 1 (Mersenne prime).
    * h stays < 2^31, so a_i * h + b_i never overflows a signed 64-bit int
    * in either engine.
    */
  val MinhashMod = 2147483647L

  /** i-th derived hash of the family over a base hash already reduced
    * mod [[MinhashMod]]: (h * (2i+1) + 97 + 31i) mod M. One md5 per
    * shingle total — deriving the family arithmetically instead of salting
    * k md5 calls measured ~5× faster on the hashing stage.
    */
  private def familyHash(h: Column, i: Int): Column =
    (h * (2 * i + 1) + (97L + 31L * i)) % MinhashMod

  /** MinHash + LSH near-duplicate pairs.
    *
    * Relational formulation: explode distinct shingles, md5 each ONCE,
    * aggregate all k per-family minima in a single groupBy — then `bands`
    * band keys → self-join per band → distinct candidate pairs → exact
    * Jaccard verify ≥ `threshold`. The band self-join is the only shuffle
    * that grows superlinearly, and only on colliding buckets.
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
    require(bands > 0 && k % bands == 0,
      s"k=$k must be a positive multiple of bands=$bands — otherwise signature " +
        "values are silently dropped (or every band key degenerates to \"\" " +
        "and the join becomes an O(n²) cross product)")
    val rows = k / bands
    val hashed = df
      .select(col(idCol).as("id"), explode(array_distinct(shingles)).as("s"))
      .select(col("id"), (h60(col("s")) % MinhashMod).as("h"))
    // one aggregation produces the k signature minima AND the hashed
    // shingle set: the Jaccard verify then intersects long arrays, which
    // measured ~4× faster than intersecting the original string shingles
    // (identical result — h60 collisions are negligible at 2^31 space, and
    // the oracle mirrors the same hashed-set formulation).
    val aggCols = (0 until k).map(i => min(familyHash(col("h"), i)).as(s"m$i")) :+
      collect_set(col("h")).as("sh")
    val sigd = hashed.groupBy("id")
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"), col("sh"))
      // consumed by three branches (two band-join sides + the verify join);
      // persisting stops the md5 pass from running once per branch. At
      // cluster scale this is the "materialize signatures before the
      // bucket join" step every LSH pipeline has.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigd.select(
      col("id"), posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("band", "key")))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    cand
      .join(sigd.select(col("id").as("a"), col("sh").as("sh_a")), "a")
      .join(sigd.select(col("id").as("b"), col("sh").as("sh_b")), "b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")) + 1e-9, 4))
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
    // persisted: the x/y self-join would otherwise recompute the upstream
    // simhash aggregation once per side.
    val banded = sims.select(
      col(idCol).as("id"), col(simCol).as("sh"),
      explode(array(bandKeyCols: _*)).as("bk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded.as("x")
      .join(banded.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Character n-gram Jaccard near-dup pairs. Candidates come from MinHash
    * LSH over the gram set with 4 bands × 6 rows: the background char-gram
    * Jaccard of unrelated documents here is ~0.26 (tiny shared vocabulary,
    * p90 ≈ 0.35), so the band collision rate needs r=6's steep s-curve —
    * P(collide | j=0.26) ≈ 0.1% vs ≈ 95% at j=0.9. r=4 measured 1.2M
    * candidate pairs at sf0.1 (~80× too many), and the Jaccard verify at
    * ~70µs/pair dominated the whole query; r=6 cuts candidates to ~15k.
    * Length-bucket blocking was worse still (quadratic in bucket width).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      n: Int = 4,
      threshold: Double = 0.6): DataFrame =
    minhashPairs(df, idCol, charGrams(textCol, n), k = 24, bands = 4, threshold = threshold)

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
    // norms precomputed per vector (O(n)), so the O(pairs) join evaluates
    // only the dot product — measured 3× over per-pair norm recompute.
    val v = df.select(col(blockCol).as("blk"), col(idCol).as("id"), col(embCol).as("e"))
      .withColumn("nrm", l2Norm(col("e")))
    v.as("x").join(v.as("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .select(
        col("x.blk").as("block"), col("x.id").as("a"), col("y.id").as("b"),
        round(dotD(col("x.e"), col("y.e")) / (col("x.nrm") * col("y.nrm")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
