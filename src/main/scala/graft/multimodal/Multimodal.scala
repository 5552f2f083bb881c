package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (extension surface).
  *
  * Design: media content is an opaque `binary` column with a typed
  * metadata struct riding next to it; decode/feature-extraction run as
  * per-partition batch transforms (`mapPartitions` over a typed Dataset —
  * the JVM analog of arrow-batched Python UDFs): one iterator per
  * partition, so a codec can amortize init across the batch, and the
  * operation is map-only (no shuffle; `.explain` shows no Exchange).
  *
  * The actual byte decoding is a STUB — this container ships no
  * image/audio codecs — implemented as a deterministic fake
  * ([[StubCodec]]) so the Spark-side plumbing (schema, partitioning,
  * batch shape, downstream joins into the similarity stack) is real and
  * tested end-to-end. Swap [[StubCodec]] for a real codec (e.g. javacv)
  * without touching any plumbing.
  */
object Multimodal {

  /** One media row: opaque bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long, kind: String, content: Array[Byte],
      mime: String, duration_ms: Long)

  /** Decoded features: fixed-width embedding + decoded dimensions. */
  final case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, features: Array[Float])

  val FeatureDim = 16

  /** Deterministic fake codec: every output is a pure function of the
    * content bytes, so tests are stable and the pipeline is runnable
    * anywhere. CLEARLY A STUB — a real deployment replaces exactly these
    * three functions with codec calls. */
  object StubCodec {
    def decodeDims(content: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(content)
      (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1)
    }

    def frameCount(kind: String, durationMs: Long): Int =
      if (kind == "video") math.max(1, (durationMs / 1000).toInt) else 1

    /** Fake feature extractor: a strided byte histogram, L2-normalized —
      * shaped exactly like a real embedding head's output. */
    def features(content: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < content.length) {
        acc(java.lang.Byte.toUnsignedInt(content(i)) % FeatureDim) += 1f
        i += 1
      }
      val norm = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat
      if (norm == 0f) acc else acc.map(_ / norm)
    }
  }

  /** Deterministic synthetic media table, generated distributively (one
    * `spark.range` — no driver-side data): content bytes derive from
    * md5(media_id), kind cycles image/audio/video. */
  def synthesize(spark: SparkSession, n: Long, partitions: Int = 8): DataFrame =
    spark.range(0, n, 1, partitions)
      .select(
        col("id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("id") % 3 + 1).cast("int")).as("kind"),
        // 64 deterministic pseudo-random bytes per row
        unhex(concat((0 until 4).map(i => md5(concat(col("id"), lit(i)))): _*))
          .as("content"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("id") % 3 + 1).cast("int")).as("mime"),
        (col("id") % 30000 + 1000).as("duration_ms"))

  /** Decode + featurize: per-partition batch transform over the typed
    * Dataset. Map-only — preserves the input partitioning. */
  def decodeAndFeaturize(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content", "mime", "duration_ms")
      .as[MediaRecord]
      .mapPartitions { batch =>
        // per-partition init happens here (codec handles, model weights…)
        batch.map { m =>
          val (w, h) = StubCodec.decodeDims(m.content)
          MediaFeatures(m.media_id, m.kind, w, h,
            StubCodec.frameCount(m.kind, m.duration_ms),
            StubCodec.features(m.content))
        }
      }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * (every `everyMs` milliseconds) — a generate/explode, not a shuffle. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .select(col("media_id"), col("frame_ms"), col("content"))

  /** Resize plan: metadata-level transform (the stub records the target;
    * a real codec would re-encode content). Shape of a real resize op:
    * map-only, content column carried through. */
  def withResizeTarget(decoded: Dataset[MediaFeatures], maxSide: Int): DataFrame = {
    val d = decoded.toDF()
    val scale = least(
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"), lit(1.0))
    d.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }
}
