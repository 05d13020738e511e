package graft.northstar

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north-star; SURVEY.md §7.4):
  * image/audio/video travel as opaque BINARY columns + a typed metadata
  * struct; decode / feature-extraction / resize / frame-sampling run as
  * partition-local batch functions over the binary payloads.
  *
  * IMAGE decode is real — [[ImageCodec]] over the JDK's ImageIO
  * (PNG/BMP/GIF/JPEG), producing true pixel dimensions and
  * luminance-stripe features. AUDIO decode is real for WAV —
  * [[AudioCodec]] over javax.sound.sampled (PCM 8/16-bit), producing
  * frame/channel counts and RMS-stripe features. Video (and non-WAV
  * audio containers) remain STUBBED (no av libraries in this
  * environment — see [[StubCodec.decode]]): a deterministic fake
  * derived from the payload bytes. The surrounding plumbing — asset
  * schema, partition-batched execution shape, metadata extraction,
  * feature vectors, frame sampling — is identical for all three;
  * swapping in a real video codec changes only the function body.
  *
  * Scale notes: payloads never pass through the driver; the decode is
  * mapPartitions (one codec init per partition, not per row, mirroring the
  * batch shape of Arrow-based UDFs); derived features are small fixed-size
  * arrays so downstream shuffles move features, not payloads. For 100 TB
  * of media, partition sizing is governed by files.maxPartitionBytes on
  * the payload table, and decode parallelism = partitions.
  */
object Multimodal {

  /** The asset table schema: id, modality tag, opaque payload, typed
    * metadata known WITHOUT decoding (byte length, source id).
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true))), nullable = false),
  ))

  /** Wrap any table with a text/blob-ish column into asset form (used by
    * tests and the bench queries to synthesize binary payloads from the
    * documents table: payload = utf-8 bytes of the text).
    */
  def toAssets(df: DataFrame, idCol: String, payloadExpr: String,
               modality: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      expr(payloadExpr).cast("binary").as("payload"),
      struct(
        coalesce(length(expr(payloadExpr).cast("binary")).cast("long"), lit(0L))
          .as("n_bytes"),
        col(sourceCol).cast("string").as("source")).as("meta"))

  /** Decoded representation produced by the (stubbed) codec. */
  case class Decoded(assetId: Long, width: Int, height: Int, format: String,
                     features: Array[Float])

  /** Deterministic stand-in for the real image/audio codec. */
  object StubCodec {
    val FeatureDim = 8

    /** STUB — a real implementation would parse the container format and
      * decode pixels/samples here. This fake derives (width, height,
      * format, features) deterministically from the bytes so the plumbing
      * is testable: dims from the first bytes, features = per-stripe byte
      * means normalized to [0,1].
      */
    def decode(assetId: Long, payload: Array[Byte]): Decoded = {
      if (payload == null || payload.isEmpty)
        return Decoded(assetId, 0, 0, "empty", Array.fill(FeatureDim)(0f))
      val w = 16 + (math.abs(payload.head.toInt) % 64)
      val h = 16 + (math.abs(payload.last.toInt) % 64)
      val stripe = math.max(1, payload.length / FeatureDim)
      val feats = Array.tabulate(FeatureDim) { i =>
        val from = i * stripe
        val until = math.min(payload.length, from + stripe)
        if (from >= payload.length) 0f
        else {
          var s = 0L; var j = from
          while (j < until) { s += (payload(j) & 0xFF); j += 1 }
          (s.toFloat / (until - from)) / 255f
        }
      }
      Decoded(assetId, w, h, "stub", feats)
    }
  }

  /** Real image codec over the JDK's `javax.imageio.ImageIO` — zero extra
    * dependencies. Handles the formats the JDK ships readers for
    * (PNG/BMP/GIF/JPEG): real pixel dimensions, container format from the
    * magic bytes, and features = mean luminance (Rec.601 weights) per
    * vertical stripe normalized to [0,1]. Payloads that are not images
    * (wrong magic, or truncated/corrupt containers ImageIO rejects)
    * return None and fall back to [[StubCodec]] — audio/video decode
    * still needs libraries this environment lacks.
    */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors

    /** Cheap magic-byte pre-screen so non-image payloads never pay for an
      * ImageIO probe.
      */
    def looksLikeImage(p: Array[Byte]): Boolean =
      p != null && p.length >= 4 &&
        ((p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
          (p(0) == 'B' && p(1) == 'M') ||
          (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
          (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte))

    private def formatOf(p: Array[Byte]): String =
      if (p(0) == 0x89.toByte) "png"
      else if (p(0) == 'B') "bmp"
      else if (p(0) == 'G') "gif"
      else "jpeg"

    def decode(assetId: Long, payload: Array[Byte]): Option[Decoded] =
      if (!looksLikeImage(payload)) None
      else Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val dim = StubCodec.FeatureDim
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            val s = math.min(dim - 1, x * dim / w)
            sums(s) += lum
            counts(s) += 1
            x += 1
          }
          y += 1
        }
        val feats = Array.tabulate(dim)(i =>
          if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat)
        Decoded(assetId, w, h, formatOf(payload), feats)
      }
  }

  /** Real audio codec for WAV payloads over the JDK's
    * `javax.sound.sampled` — zero extra dependencies. Decodes PCM
    * signed 8/16-bit WAV: `width` carries the frame count, `height` the
    * channel count, features = RMS amplitude per time-stripe normalized
    * to [0,1]. Non-WAV or non-PCM payloads return None and fall back to
    * [[StubCodec]] (video still needs libraries this environment
    * lacks).
    */
  object AudioCodec {

    /** RIFF....WAVE magic pre-screen. */
    def looksLikeWav(p: Array[Byte]): Boolean =
      p != null && p.length >= 12 &&
        p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

    def decode(assetId: Long, payload: Array[Byte]): Option[Decoded] =
      if (!looksLikeWav(payload)) None
      else try {
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            (bits != 8 && bits != 16)) None
          else {
            val bytes = in.readAllBytes()
            val channels = fmt.getChannels
            val bytesPerSample = bits / 8
            val nSamples = bytes.length / bytesPerSample
            val frames = if (channels == 0) 0 else nSamples / channels
            val dim = StubCodec.FeatureDim
            val sumSq = new Array[Double](dim)
            val counts = new Array[Long](dim)
            var i = 0
            while (i < nSamples) {
              val v =
                if (bits == 8) bytes(i).toDouble / 128.0
                else {
                  val lo = bytes(2 * i) & 0xFF
                  val hi = bytes(2 * i + 1)
                  val s = (hi << 8) | lo // WAV 16-bit PCM is little-endian
                  s.toDouble / 32768.0
                }
              val frame = i / math.max(1, channels)
              val stripe = if (frames == 0) 0
                else math.min(dim - 1, frame * dim / frames)
              sumSq(stripe) += v * v
              counts(stripe) += 1
              i += 1
            }
            val feats = Array.tabulate(dim)(s =>
              if (counts(s) == 0) 0f
              else math.sqrt(sumSq(s) / counts(s)).toFloat)
            Some(Decoded(assetId, frames, channels, "wav", feats))
          }
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** Deterministic tiny PNG payload from an id — a payload synthesizer
    * for tests and harness runs, so driver-visible queries exercise the
    * REAL image codec without shipping binary fixtures. The pixel
    * pattern (and therefore dims, format, and luminance features after
    * decode) is a pure function of the id.
    */
  def syntheticPng(id: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (((id * 31 + x * 7 + y * 13) % 256).toInt + 256) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Partition-batched decode: binary payloads → typed decoded rows.
    * mapPartitions gives the per-batch execution shape (codec initialized
    * once per partition); output is a compact feature frame, payloads are
    * dropped immediately after decode. Image payloads get the real
    * [[ImageCodec]], WAV audio the real [[AudioCodec]]; everything else
    * falls back to the deterministic stub.
    */
  def decodeAssets(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[Decoded] = assets
      .select(col("asset_id"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        // codec registry lookups are JVM-wide; per-partition init is the
        // seam where a real av codec would allocate its context
        rows.map { r =>
          val id = r.getAs[Long]("asset_id")
          val p = r.getAs[Array[Byte]]("payload")
          ImageCodec.decode(id, p)
            .orElse(AudioCodec.decode(id, p))
            .getOrElse(StubCodec.decode(id, p))
        }
      }
    ds.toDF("asset_id", "width", "height", "format", "features")
  }

  /** "Resize": recompute features at a coarser grid — expressed on the
    * already-decoded feature frame (real pipelines resize pixels; the
    * stub pools adjacent feature stripes). Pure column math.
    */
  def poolFeatures(decoded: DataFrame, factor: Int = 2): DataFrame = {
    val n = StubCodec.FeatureDim / factor
    val pooled = array((0 until n).map { i =>
      val group = (0 until factor).map(j =>
        element_at(col("features"), i * factor + j + 1).cast("double"))
      round((group.reduce(_ + _) / factor), 6).cast("float")
    }: _*)
    decoded.withColumn("features_pooled", pooled)
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk of
    * `frameBytes` from the payload as its own row (asset_id, frame_no,
    * frame_bytes). Pure slice arithmetic over the binary column.
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 64,
                   stride: Int = 4): DataFrame = {
    val nFrames = (length(col("payload")) / frameBytes).cast("int")
    assets
      .select(col("asset_id"), col("payload"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)))
          .as("frame_no"))
      .select(col("asset_id"), col("frame_no"),
        col("payload").substr(col("frame_no") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
      .filter(length(col("frame_bytes")) > 0)
  }
}
