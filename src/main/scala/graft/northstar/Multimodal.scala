package graft.northstar

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north-star; SURVEY.md §7.4):
  * image/audio/video travel as opaque BINARY columns + a typed metadata
  * struct; decode / feature-extraction / resize / frame-sampling run as
  * partition-local batch functions over the binary payloads.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment — see [[StubCodec.decode]]): it produces a deterministic
  * fake decode from the payload bytes. Everything AROUND the stub — the
  * asset schema, the partition-batched execution shape, metadata
  * extraction, feature vectors, frame sampling — is real, tested Spark
  * plumbing; swapping in a real codec changes only the function body.
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

  /** Partition-batched decode: binary payloads → typed decoded rows.
    * mapPartitions gives the per-batch execution shape (codec initialized
    * once per partition); output is a compact feature frame, payloads are
    * dropped immediately after decode.
    */
  def decodeAssets(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[Decoded] = assets
      .select(col("asset_id"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        // real codec would init here, once per partition
        rows.map { r =>
          StubCodec.decode(r.getAs[Long]("asset_id"), r.getAs[Array[Byte]]("payload"))
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
