package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, plus frame-sampling / feature-extraction operators (extension
  * tier, SURVEY.md §7).
  *
  * The image path is REAL end-to-end: [[synthesizePng]] encodes
  * deterministic pixel rasters through `javax.imageio` (JDK-bundled PNG
  * codec — no external jar), and [[decodeImageFeatures]] decodes those
  * payloads back to pixels inside the partition iterator and reduces them
  * to channel statistics. Because the pixel raster is a pure arithmetic
  * function of (asset_id, x, y, channel), the oracle can recompute the same
  * statistics in SQL without any codec — a hash match therefore certifies
  * that the decode produced the original pixels (PNG is lossless), not just
  * that bytes moved through the plumbing.
  *
  * Audio and multi-frame video-shaped media are real too:
  * [[synthesizeWav]]/[[decodeAudioFeatures]] run the JDK's
  * `javax.sound.sampled` RIFF/PCM codec, and
  * [[synthesizeGif]]/[[decodeGifFrames]] run the JDK's animated-GIF
  * sequence writer/reader (multi-frame container, explicit 256-gray
  * palette so the codec is exactly lossless). Only general video codecs
  * (H.264 etc.) are genuinely absent from the JDK; for those,
  * [[sampleFrames]] keeps the honest byte-window-fingerprint shape (one
  * row per frame, no driver collection) without pretending to decode.
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

  /** Deterministic raster dimensions / pixel values — the shared contract
    * between the PNG encoder here and the SQL oracle (which recomputes the
    * channel means arithmetically). Channel c ∈ {0=R, 1=G, 2=B}.
    */
  def pngWidth(id: Long): Int = (Math.floorMod(id, 13) + 4).toInt
  def pngHeight(id: Long): Int = (Math.floorMod(id, 11) + 4).toInt
  def pixelValue(id: Long, x: Int, y: Int, c: Int): Int =
    Math.floorMod(id * 37 + x * 11 + y * 17 + c * 29, 256).toInt

  /** Synthesize one real PNG per input id: raster from [[pixelValue]],
    * encoded via the JDK's ImageIO PNG writer inside the partition
    * iterator (the ingest shape `spark.read.format("binaryFile")` produces
    * in environments where media arrives as files).
    */
  def synthesizePng(df: DataFrame, idCol: String): DataFrame =
    synthesizePngImpl(df, idCol, idOffset = 0L, perturb = false)

  private def synthesizePngImpl(
      df: DataFrame, idCol: String, idOffset: Long, perturb: Boolean): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        // the SQL oracle recomputes pixelValue with plain %, which
        // diverges from floorMod for negative ids — keep the contract loud
        require(id >= 0, s"synthesizePng requires non-negative ids, got $id")
        val w = pngWidth(id); val h = pngHeight(id)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val bump = if (perturb && x == 0 && y == 0) 1 else 0
            img.setRGB(x, y,
              (((pixelValue(id, x, y, 0) + bump) % 256) << 16) |
              (((pixelValue(id, x, y, 1) + bump) % 256) << 8) |
              ((pixelValue(id, x, y, 2) + bump) % 256))
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        // memory-cache stream: the default ImageIO path spools every
        // encode through a DISK cache temp file — pure overhead for an
        // in-memory payload, and at 10× corpus volume the per-task file
        // churn exhausts handles ("Can't create cache file")
        val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        ImageIO.write(img, "png", mos)
        mos.close()
        val bytes = bos.toByteArray
        Row(id + idOffset, bytes, Row("image/png", bytes.length.toLong, w, h))
      }
    }(enc)
  }

  /** One NEAR-DUPLICATE twin per input id — the BASE id's raster with the
    * single pixel (0,0) bumped by +1 per channel (mod 256, same wrap the
    * oracle replays), encoded as a fresh PNG under `id + idOffset`:
    * visually identical, byte-different. The planted positive for the
    * perceptual-hash dedup query — exact/byte dedup can never pair these
    * (different payloads), which is precisely the gap aHash closes.
    */
  def synthesizePngNearDup(
      df: DataFrame, idCol: String, idOffset: Long = 10000000L): DataFrame =
    synthesizePngImpl(df, idCol, idOffset, perturb = true)

  /** 8×8 average-hash (aHash) of each decoded image — the perceptual
    * fingerprint behind IMAGE near-dup dedup (the modality exact/byte
    * dedup cannot cover: a re-encoded or single-pixel-retouched image
    * has a different payload but the same picture). Entirely integer
    * and decode-exact, so the SQL oracle replays every bit:
    *  - sample the raster on an 8×8 grid, nearest pixel (gx·w/8, gy·h/8);
    *  - integer luminance (r+g+b)/3 per sample;
    *  - bit i (= gy·8+gx) set iff 64·lum_i > Σ lums (the ">" against the
    *    mean kept in integers — no division anywhere).
    * Returns (asset_id, h_lo, h_hi): 32 bits per long, split so neither
    * engine plays sign games with bit 63. Scale shape: one partition-
    * local decode pass, 64 ints of state per image, no shuffle.
    */
  def imageAHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("h_lo", LongType, nullable = false),
      StructField("h_hi", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val img = ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload"))))
        require(img != null, s"undecodable payload for asset_id=${r.getLong(0)}")
        val w = img.getWidth; val h = img.getHeight
        val lums = new Array[Int](64)
        var total = 0L
        var i = 0
        while (i < 64) {
          val rgb = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
          val lum = (((rgb >> 16) & 255) + ((rgb >> 8) & 255) + (rgb & 255)) / 3
          lums(i) = lum; total += lum
          i += 1
        }
        var lo = 0L; var hi = 0L
        i = 0
        while (i < 64) {
          if (64L * lums(i) > total) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          i += 1
        }
        Row(r.getLong(0), lo, hi)
      }
    }(enc)
  }

  /** Banded hamming near-dup pairs over [[imageAHash]] fingerprints: the
    * 64-bit hash splits into 8 disjoint 8-bit bands, candidates collide
    * on ANY identical band, exact hamming re-verifies — pigeonhole-
    * LOSSLESS for hamming ≤ 7 (8 differing bits cannot dirty all 8
    * bands), which the all-pairs oracle certifies empirically every
    * round. The same banded shape as the MinHash/SimHash tiers: shuffle
    * on (band_no, band_val), O(Σ bucket²) candidates, never all-pairs.
    * Returns (a, b, hamming), a < b.
    */
  def aHashPairs(
      hashes: DataFrame, maxHamming: Int = 7, hotBucketCap: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      s"8 x 8-bit bands are pigeonhole-lossless only for hamming <= 7, got $maxHamming")
    val banded = hashes.select(col("asset_id"), col("h_lo"), col("h_hi"),
      explode(array((0 until 8).map { j =>
        val src = if (j < 4) col("h_lo") else col("h_hi")
        struct(lit(j).as("band_no"),
          shiftright(src, 8 * (j % 4)).bitwiseAND(lit(255L)).as("band_val"))
      }: _*)).as("b"))
      .select(col("asset_id"), col("h_lo"), col("h_hi"),
        col("b.band_no").as("band_no"), col("b.band_val").as("band_val"))
    // hot-bucket cap (the minhashPairs idiom): a degenerate corpus —
    // many visually-identical assets — concentrates a band value into
    // one bucket whose self-join is O(width²); with the cap, buckets
    // wider than `hotBucketCap` are left-anti-excluded BEFORE the join,
    // bounding every bucket at C(cap, 2) candidates. A true pair is
    // lost only if EVERY band it collides in is over-cap — the same
    // missed-pair bound as the minhash cap, oracle-replayed by the
    // capped query. 0 = off (the pigeonhole-lossless exact path).
    val bands =
      if (hotBucketCap <= 0) banded
      else {
        val hot = banded.groupBy("band_no", "band_val")
          .agg(count(lit(1)).as("w")).filter(col("w") > hotBucketCap)
          .select("band_no", "band_val")
        banded.join(hot, Seq("band_no", "band_val"), "left_anti")
      }
    val l = bands.select(col("band_no"), col("band_val"),
      col("asset_id").as("a"), col("h_lo").as("la"), col("h_hi").as("ha"))
    val r = bands.select(col("band_no"), col("band_val"),
      col("asset_id").as("b"), col("h_lo").as("lb"), col("h_hi").as("hb"))
    l.join(r, Seq("band_no", "band_val")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (bit_count(col("la").bitwiseXOR(col("lb")))
          + bit_count(col("ha").bitwiseXOR(col("hb")))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

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
    * content-fingerprint each — the explode shape a video frame-sampler
    * produces (one row per sampled frame). The md5 is a fingerprint for
    * downstream dedup/joins, not a decode: video codecs aren't in the JDK,
    * so frame CONTENT stays opaque here by design (contrast the image path,
    * which decodes for real via [[decodeImageFeatures]]).
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

  /** Deterministic PCM contract — the shared arithmetic between the WAV
    * encoder here and the SQL oracle (which recomputes every sample):
    * clip `id` has `id % 256 + 64` mono samples at 8 kHz, sample i =
    * `(id·31 + i·7919) mod 65536 − 32768` (full-range signed 16-bit; the
    * 7919 stride makes the waveform cross zero aperiodically so the
    * zero-crossing count actually discriminates).
    */
  def wavSamples(id: Long): Int = (Math.floorMod(id, 256) + 64).toInt
  def sampleValue(id: Long, i: Int): Int =
    Math.floorMod(id * 31 + i.toLong * 7919, 65536).toInt - 32768

  /** Synthesize one REAL WAV (RIFF/PCM16LE mono 8 kHz) per input id via
    * the JDK's `javax.sound.sampled` encoder inside the partition
    * iterator — the audio twin of [[synthesizePng]]: a genuine container
    * format written by a genuine JDK codec, no external jars, no stub.
    */
  def synthesizeWav(df: DataFrame, idCol: String): DataFrame =
    synthesizeWavImpl(df, idCol, idOffset = 0L, perturb = false)

  private def synthesizeWavImpl(
      df: DataFrame, idCol: String, idOffset: Long, perturb: Boolean): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      rows.map { r =>
        val id = r.getLong(0)
        require(id >= 0, s"synthesizeWav requires non-negative ids, got $id")
        val n = wavSamples(id)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val base = sampleValue(id, i)
          val v = if (perturb && i == 0)
            Math.floorMod(base + 32768 + 1, 65536) - 32768 else base
          pcm(2 * i) = (v & 0xff).toByte          // little-endian
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val bytes = bos.toByteArray
        // width/height carry (sampleRate, sampleBits) — the closest typed
        // metadata the shared media schema offers an audio clip
        Row(id + idOffset, bytes, Row("audio/wav", bytes.length.toLong, 8000, 16))
      }
    }(enc)
  }

  /** Batched REAL audio decode via a partition iterator — the audio twin
    * of [[decodeImageFeatures]]: `AudioSystem.getAudioInputStream` parses
    * the RIFF container back to PCM16LE frames, and the features are
    * genuine waveform statistics emitted as EXACT integers (sample
    * count, amplitude sum, energy sum, zero crossings) — integer sums
    * rather than floats so the oracle's arithmetic replay certifies
    * bit-lossless sample recovery with no rounding escape hatch. A
    * zero crossing is a sign-bit flip between consecutive samples
    * (`(a < 0) != (b < 0)`).
    */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_amp", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("zero_cross", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"asset_id=${r.getLong(0)}: expected PCM16LE mono, got $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        var sumAmp = 0L; var sumSq = 0L; var zc = 0L
        var prevNeg = false
        var i = 0
        while (i < n) {
          val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toLong
          sumAmp += v; sumSq += v * v
          val neg = v < 0
          if (i > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          i += 1
        }
        Row(r.getLong(0), n.toLong, sumAmp, sumSq, zc)
      }
    }(enc)
  }

  /** One NEAR-DUPLICATE audio twin per input id — the BASE clip's samples
    * with sample 0 bumped by +1 (16-bit wrap kept in the floorMod
    * convention the oracle replays), re-encoded under `id + idOffset`:
    * inaudible, byte-different. The planted positive for the audio
    * perceptual-hash dedup query — exact/byte dedup can never pair it.
    */
  def synthesizeWavNearDup(
      df: DataFrame, idCol: String, idOffset: Long = 10000000L): DataFrame =
    synthesizeWavImpl(df, idCol, idOffset, perturb = true)

  /** 64-band energy hash of a decoded clip — the audio sibling of
    * [[imageAHash]] (a chromaprint-shaped fingerprint reduced to its
    * exactly-replayable core): sample i belongs to frame `i·64 / n`
    * (integer division — 64 non-empty frames for any n ≥ 64), frame
    * energy is the EXACT integer Σ v², bit f set iff 64·e_f > Σ e (the
    * mean compare kept in integers; bounds: e_f ≤ ⌈n/64⌉·2³⁰ and
    * 64·e_f ≈ Σ e ≤ n·2³⁰ ≪ 2⁶³). Same (asset_id, h_lo, h_hi) shape as
    * the image hash, so [[aHashPairs]]' banded hamming join serves both
    * modalities unchanged.
    */
  def audioEnergyHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("h_lo", LongType, nullable = false),
      StructField("h_hi", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"asset_id=${r.getLong(0)}: expected PCM16LE mono, got $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        require(n >= 64,
          s"asset_id=${r.getLong(0)}: energy hash needs >= 64 samples, got $n")
        val energy = new Array[Long](64)
        var total = 0L
        var i = 0
        while (i < n) {
          val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toLong
          // Long numerator: i*64 overflows Int at >= 2^25 samples
          // (~12 min at 44.1 kHz), which would index energy() negatively
          val f = ((i.toLong * 64) / n).toInt
          energy(f) += v * v; total += v * v
          i += 1
        }
        var lo = 0L; var hi = 0L
        var f = 0
        while (f < 64) {
          if (64L * energy(f) > total) {
            if (f < 32) lo |= 1L << f else hi |= 1L << (f - 32)
          }
          f += 1
        }
        Row(r.getLong(0), lo, hi)
      }
    }(enc)
  }

  /** REAL image resize via a partition iterator — the remaining verb of
    * the decode / feature-extract / resize / frame-sample quartet: each
    * payload decodes through `javax.imageio`, resamples to `outW`×`outH`
    * by NEAREST-NEIGHBOR (source pixel (x'·w ÷ outW, y'·h ÷ outH), integer
    * floor division — chosen over bilinear because it is exactly
    * arithmetic-replayable, so the oracle certifies the resample grid
    * pixel-for-pixel rather than trusting an interpolator's rounding),
    * and reduces the resized raster to channel means. Emits the decoded
    * source dimensions alongside — a decoder that lied about `w`/`h`
    * would shift every sampled coordinate and hash-mismatch.
    */
  def resizeImageFeatures(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, s"resize target must be positive: ${outW}x$outH")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("src_w", IntegerType, nullable = false),
      StructField("src_h", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        // memory-cache stream: ImageIO.read(InputStream) spools through a
        // disk cache temp file per image (closed, but pure churn for
        // in-memory payloads); read(ImageInputStream) closes the stream
        val img = ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload"))))
        require(img != null, s"undecodable payload for asset_id=${r.getLong(0)}")
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            val rgb = img.getRGB(x * w / outW, sy)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = (outW.toLong * outH).toDouble
        Row(r.getLong(0), w, h, sr / n, sg / n, sb / n)
      }
    }(enc)
  }

  /** REAL audio resample (integer decimation) — the audio twin of
    * [[resizeImageFeatures]], completing the per-modality verb symmetry
    * (decode / features / resample / frames): the decoded PCM keeps
    * every `factor`-th sample (the plain decimation every
    * sample-rate-reduction pipeline starts from; no anti-alias filter —
    * a filter would interpolate, and the point of the integer contract
    * is exact arithmetic replay), then reduces the decimated stream to
    * the same exact integer statistics as [[decodeAudioFeatures]]. The
    * decoded source length rides along: a decoder that dropped samples
    * would shift the kept index set and hash-mismatch.
    */
  def decimateAudioFeatures(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor=$factor must be >= 1")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("src_samples", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_amp", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("zero_cross", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"asset_id=${r.getLong(0)}: expected PCM16LE mono, got $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        var kept = 0L; var sumAmp = 0L; var sumSq = 0L; var zc = 0L
        var prevNeg = false
        var i = 0
        while (i < n) {
          val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toLong
          val neg = v < 0
          if (kept > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          kept += 1; sumAmp += v; sumSq += v * v
          i += factor
        }
        Row(r.getLong(0), n.toLong, kept, sumAmp, sumSq, zc)
      }
    }(enc)
  }

  /** Frame-level audio features — the real-decode analogue of
    * [[sampleFrames]]'s byte-window fingerprints: the decoded PCM stream
    * is cut into fixed `frameSamples` windows (last window partial) and
    * each frame reduces to exact integer statistics (sample count,
    * energy sum) — the framing step every audio pipeline (VAD, feature
    * extraction, CTC alignment) runs before modeling. One output row per
    * frame, emitted from the partition iterator — no driver collection,
    * and the explode happens AFTER the decode so payload bytes are read
    * once per clip.
    */
  def decodeAudioFrames(media: DataFrame, frameSamples: Int): DataFrame = {
    require(frameSamples >= 1, s"frameSamples=$frameSamples must be >= 1")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"asset_id=${r.getLong(0)}: expected PCM16LE mono, got $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val id = r.getLong(0)
        (0 until (n + frameSamples - 1) / frameSamples).iterator.map { f =>
          val lo = f * frameSamples
          val hi = math.min(lo + frameSamples, n)
          var sumSq = 0L
          var i = lo
          while (i < hi) {
            val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toLong
            sumSq += v * v
            i += 1
          }
          Row(id, f.toLong, (hi - lo).toLong, sumSq)
        }
      }
    }(enc)
  }

  /** Deterministic multi-frame raster contract — the shared arithmetic
    * between the animated-GIF encoder here and the SQL oracle: clip `id`
    * has `id % 5 + 2` frames of `(id % 9 + 4)`×`(id % 7 + 4)` gray
    * pixels, frame f's pixel (x, y) = `(id·37 + f·101 + x·11 + y·17)
    * mod 256`. The per-frame 101 stride makes consecutive frames differ
    * everywhere, so a decoder that replayed frame 0 for every frame (the
    * classic GIF frame-disposal bug) mismatches immediately.
    */
  def gifFrames(id: Long): Int = (Math.floorMod(id, 5) + 2).toInt
  def gifWidth(id: Long): Int = (Math.floorMod(id, 9) + 4).toInt
  def gifHeight(id: Long): Int = (Math.floorMod(id, 7) + 4).toInt
  def gifPixel(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id * 37 + f * 101 + x * 11 + y * 17, 256).toInt

  /** Synthesize one REAL animated GIF per input id — the video twin of
    * [[synthesizePng]]/[[synthesizeWav]]: a genuine multi-frame container
    * written by the JDK's own GIF sequence writer (`prepareWriteSequence`
    * / `writeToSequence`), no external jars, no stub. Frames are encoded
    * through an EXPLICIT 256-gray `IndexColorModel` so the palette maps
    * index i to gray i and the codec is exactly lossless (GIF's 256-color
    * limit is the reason the contract is grayscale: an arbitrary RGB
    * raster would force the writer to quantize and break the arithmetic
    * oracle).
    */
  def synthesizeGif(df: DataFrame, idCol: String): DataFrame =
    synthesizeGifImpl(df, idCol, idOffset = 0L, perturb = false)

  private def synthesizeGifImpl(
      df: DataFrame, idCol: String, idOffset: Long, perturb: Boolean): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      // palette + writer are per-partition state, reused across rows
      val grays = Array.tabulate[Byte](256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      rows.map { r =>
        val id = r.getLong(0)
        require(id >= 0, s"synthesizeGif requires non-negative ids, got $id")
        val nf = gifFrames(id); val w = gifWidth(id); val h = gifHeight(id)
        val bos = new ByteArrayOutputStream()
        // memory-cache stream, not createImageOutputStream: the default
        // spools through a disk cache temp file per clip (see synthesizePng)
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        val writer = ImageIO.getImageWritersBySuffix("gif").next()
        writer.setOutput(ios)
        // GIF "progressive" = interlaced, and the JDK writer's default
        // interlace path scrambles rows for rasters shorter than the
        // 8-row interlace stride (rows land in pass order, reader
        // composites garbage) — force sequential row order
        val param = writer.getDefaultWriteParam
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nf) {
          val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val bump = if (perturb && f == 0 && x == 0 && y == 0) 1 else 0
              raster.setSample(x, y, 0, (gifPixel(id, f, x, y) + bump) % 256)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        val bytes = bos.toByteArray
        Row(id + idOffset, bytes, Row("image/gif", bytes.length.toLong, w, h))
      }
    }(enc)
  }

  /** One NEAR-DUPLICATE clip twin per input id — the BASE clip's frames
    * with pixel (0,0) of frame 0 bumped by +1 (mod 256), re-encoded
    * under `id + idOffset`: one sub-visible retouch in one frame,
    * byte-different container. The planted positive for the video
    * near-dup query.
    */
  def synthesizeGifNearDup(
      df: DataFrame, idCol: String, idOffset: Long = 10000000L): DataFrame =
    synthesizeGifImpl(df, idCol, idOffset, perturb = true)

  /** Per-FRAME 8×8 average-hash over a decoded multi-frame clip — the
    * video fingerprint feeding [[clipContainmentPairs]]: every frame
    * gets the [[imageAHash]] treatment (nearest-sample grid, the single
    * gray channel as luminance, `64·v > Σ` mean compare in integers),
    * one row per frame from the partition iterator. Returns (asset_id,
    * frame_no, h_lo, h_hi).
    */
  def gifFrameAHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("h_lo", LongType, nullable = false),
      StructField("h_hi", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val reader = ImageIO.getImageReadersBySuffix("gif").next()
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        reader.setInput(in)
        try {
          val nf = reader.getNumImages(true)
          (0 until nf).map { f =>
            val img = reader.read(f)
            val w = img.getWidth; val h = img.getHeight
            val lums = new Array[Int](64)
            var total = 0L
            var i = 0
            while (i < 64) {
              lums(i) = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8) & 0xff
              total += lums(i)
              i += 1
            }
            var lo = 0L; var hi = 0L
            i = 0
            while (i < 64) {
              if (64L * lums(i) > total) {
                if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
              }
              i += 1
            }
            Row(id, f.toLong, lo, hi)
          }
        } finally { reader.dispose(); in.close() }
      }
    }(enc)
  }

  /** Clip-level near-dup via frame-hash CONTAINMENT — the video version
    * of the CDC-containment idiom: clips pair when at least HALF of the
    * smaller-id clip's frames have a perceptually-identical frame
    * (exact [[gifFrameAHash]] equality) in the other clip — all-integer
    * (`2·m ≥ nf`, no float share), so the oracle replays it exactly.
    * The hash IS the blocking key: candidates come from one shuffle on
    * (h_lo, h_hi), O(bucket²) like every banded tier, never all-pairs.
    * Returns (a, b, m_a, nf_a): matched and total frames of the
    * smaller-id clip.
    */
  def clipContainmentPairs(
      frameHashes: DataFrame, hotBucketCap: Int = 0): DataFrame = {
    val nf = frameHashes.groupBy("asset_id").agg(count(lit(1)).as("nf_a"))
    // hot-bucket cap, same idiom as aHashPairs/minhashPairs: a frame
    // hash shared by more than `hotBucketCap` frames is excluded before
    // the join (its bucket's candidate volume is O(width²)); a clip
    // pair is lost only if EVERY frame hash it shares is over-cap.
    // nf_a stays the TRUE frame count — capping reduces m_a only.
    val fh =
      if (hotBucketCap <= 0) frameHashes
      else {
        val hot = frameHashes.groupBy("h_lo", "h_hi")
          .agg(count(lit(1)).as("w")).filter(col("w") > hotBucketCap)
          .select("h_lo", "h_hi")
        frameHashes.join(hot, Seq("h_lo", "h_hi"), "left_anti")
      }
    val l = fh.select(col("h_lo"), col("h_hi"),
      col("asset_id").as("a"), col("frame_no").as("fa"))
    val r = fh.select(col("h_lo"), col("h_hi"), col("asset_id").as("b"))
    l.join(r, Seq("h_lo", "h_hi")).filter(col("a") < col("b"))
      .select("a", "b", "fa").distinct() // a-frames with >= 1 match in b
      .groupBy("a", "b").agg(count(lit(1)).as("m_a"))
      .join(nf.withColumnRenamed("asset_id", "a"), Seq("a"))
      .filter(col("m_a") * 2 >= col("nf_a"))
      .select("a", "b", "m_a", "nf_a")
  }

  /** REAL multi-frame decode — the video analogue of [[sampleFrames]]
    * with the content actually decoded: `javax.imageio`'s GIF reader
    * walks every frame of the container (`getNumImages(true)` forces a
    * full scan, so a truncated payload fails loudly instead of
    * short-counting), and each frame reduces to exact integer pixel
    * statistics. One output row per frame from the partition iterator —
    * payload bytes are parsed once per clip, frames explode after the
    * decode. Decoded dimensions ride along so a geometry lie shifts
    * every coordinate and hash-mismatches; a frame-disposal bug (frame 0
    * replayed) breaks the per-frame sums.
    */
  def decodeGifFrames(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_px", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val reader = ImageIO.getImageReadersBySuffix("gif").next()
        // memory-cache stream, and CLOSED below: createImageInputStream's
        // default disk-cache temp file was never closed here — each clip
        // leaked one until GC, which at 10× corpus volume exhausts file
        // handles in a long-lived executor ("Can't create cache file")
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        reader.setInput(in)
        try {
          val nf = reader.getNumImages(true)
          (0 until nf).map { f =>
            val img = reader.read(f)
            val w = img.getWidth; val h = img.getHeight
            var sum = 0L; var sumSq = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = (img.getRGB(x, y) & 0xff).toLong
                sum += v; sumSq += v * v
                x += 1
              }
              y += 1
            }
            Row(id, f.toLong, w, h, sum, sumSq)
          }
        } finally { reader.dispose(); in.close() }
      }
    }(enc)
  }

  /** Keyframe (scene-change) detection over a REAL multi-frame decode —
    * the selection step a video-training pipeline runs after frame
    * extraction: per frame, the exact integer L1 pixel delta against the
    * PREVIOUS decoded frame; a frame is a keyframe iff it opens the clip
    * or its mean per-pixel change clears `perPixelThreshold` (scene cut
    * vs continuous motion). Decode state is one previous-frame raster
    * per clip inside the partition iterator — frames stream through
    * once, no per-clip frame matrix is materialized. All-integer delta
    * arithmetic, so the oracle replays it exactly from the synthetic
    * pixel function; on real footage the same operator runs unchanged
    * (the threshold is the only tunable).
    */
  def decodeGifKeyframes(media: DataFrame, perPixelThreshold: Double = 128.0): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("delta_l1", LongType, nullable = false),
      StructField("is_key", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val reader = ImageIO.getImageReadersBySuffix("gif").next()
        // memory-cache stream + close (see decodeGifFrames)
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
        reader.setInput(in)
        try {
          val nf = reader.getNumImages(true)
          var prev: Array[Int] = null
          var prevW = -1; var prevH = -1
          (0 until nf).map { f =>
            val img = reader.read(f)
            val w = img.getWidth; val h = img.getHeight
            val cur = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                cur(y * w + x) = img.getRGB(x, y) & 0xff
                x += 1
              }
              y += 1
            }
            // a mid-clip geometry change (legal in GIF) IS a scene cut:
            // no pixel correspondence exists, so delta stays 0 and the
            // frame is a keyframe by definition (same as the clip opener).
            // Both dims are compared — a w×h → h×w transpose keeps the
            // flattened length but still destroys pixel correspondence
            val geomChange = prev != null && (prevW != w || prevH != h)
            var delta = 0L
            if (prev != null && !geomChange) {
              var i = 0
              while (i < cur.length) {
                delta += math.abs(cur(i) - prev(i)); i += 1
              }
            }
            prev = cur; prevW = w; prevH = h
            // frame 0 opens the clip: keyframe by definition, delta 0
            val isKey = f == 0 || geomChange || delta >= perPixelThreshold * w * h
            Row(id, f.toLong, delta, isKey)
          }
        } finally { reader.dispose(); in.close() }
      }
    }(enc)
  }

  /** Batched REAL image decode via a partition iterator — the Scala
    * analogue of a Pandas-UDF/`mapInPandas` decode stage: payload bytes
    * stream through per partition, `javax.imageio` decodes each PNG back
    * to pixels, and the features are genuine pixel statistics (decoded
    * dimensions + per-channel means). No driver collection; decoder state
    * is per-partition, not per-row.
    */
  def decodeImageFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        // memory-cache stream: ImageIO.read(InputStream) spools through a
        // disk cache temp file per image (closed, but pure churn for
        // in-memory payloads); read(ImageInputStream) closes the stream
        val img = ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("payload"))))
        require(img != null, s"undecodable payload for asset_id=${r.getLong(0)}")
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        Row(r.getLong(0), w, h, sr / n, sg / n, sb / n)
      }
    }(enc)
  }
}
