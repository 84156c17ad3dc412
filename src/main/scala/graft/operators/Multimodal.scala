package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, plus frame-sampling / feature-extraction operators (extension
  * tier, SURVEY.md §7).
  *
  * The container has no image/audio codecs, so the decode step is a STUB —
  * a deterministic fingerprint of the bytes stands in for "decoded frame
  * features" (marked below). Everything around it is real and is the part
  * that matters at scale: the binary schema, the per-frame explode, the
  * partition-iterator batch shape a native decoder would slot into.
  */
object Multimodal {

  /** Schema of a media asset: payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false))),
      nullable = false)))

  /** Wrap any (id, text) frame as media rows: payload = UTF-8 bytes, with
    * deterministic fake dimensions derived from the byte length. Stands in
    * for `spark.read.format("binaryFile")` in environments with real media.
    *
    * `n_bytes` is the OCTET length of the binary payload (`length` over
    * BinaryType counts bytes), not the character count of the source text —
    * `sampleFrames` derives frame counts from `n_bytes` and slices the
    * payload bytewise, so the two must agree on non-ASCII input.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = col(textCol).cast("binary")
    df.select(
      col(idCol).cast("long").as("asset_id"),
      payload.as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(payload).cast("long").as("n_bytes"),
        (length(payload) % 320 + 16).cast("int").as("width"),
        (length(payload) % 240 + 16).cast("int").as("height")).as("meta"))
  }

  /** Frame sampling: split the payload into fixed-size byte windows and
    * fingerprint each — the explode shape a video frame-sampler produces
    * (one row per sampled frame), with md5 standing in for the decoded
    * frame's feature vector (STUB: no codec in this container).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int): DataFrame =
    media.select(
      col("asset_id"),
      col("meta.n_bytes").as("n_bytes"),
      posexplode(
        // empty payload -> no frames: sequence(0, -1) would count DOWN and
        // fabricate two bogus frames, so guard the degenerate case.
        when(col("meta.n_bytes") <= 0, lit(Array.empty[Array[Byte]]).cast("array<binary>"))
          .otherwise(transform(
            sequence(lit(0), ceil(col("meta.n_bytes") / frameBytes).cast("long") - 1),
            i => substr(col("payload"), i * frameBytes + 1, lit(frameBytes)))))
        .as(Seq("frame_no", "frame")))
      .select(
        col("asset_id"),
        col("frame_no").cast("long").as("frame_no"),
        md5(col("frame")).as("frame_fingerprint"),
        length(col("frame")).cast("long").as("frame_bytes"))

  /** Batched decode via a partition iterator — the Scala analogue of a
    * Pandas-UDF/`mapInPandas` decode stage: rows stream through per
    * partition, a real decoder would process `payload` batches here.
    * The "features" are a STUB fingerprint (first 8 bytes of md5 as a
    * little feature vector); the plumbing — schema in/out, per-partition
    * batching, no driver collection — is the real part.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame, dims: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val digest = md.digest(r.getAs[Array[Byte]]("payload"))
        val feats = (0 until dims).map(i => (digest(i % digest.length) & 0xff) / 255.0)
        Row(r.getLong(0), feats)
      }
    }(enc)
  }
}
