package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched executor-side passes.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration shape) is
  * real and tested; the codec calls themselves are STUBBED with
  * deterministic fakes because no image/audio libraries exist in this
  * container — each stub is clearly marked and would be replaced by a JNI /
  * library call at the same call site.
  *
  * Scale notes: binary payloads ride the normal columnar batches; decode is
  * a mapPartitions pass (no shuffle), so a 100 TB media corpus decodes at
  * scan parallelism. Metadata-only pipelines should project before decode so
  * the binary column is pruned from the parquet scan entirely.
  */
object Multimodal {

  final case class MediaMeta(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB decode: derives deterministic fake dimensions from the payload
    * hash. Real implementation: image codec (JPEG/PNG header parse).
    */
  private def decodeMetaStub(id: Long, mediaType: String, bytes: Array[Byte]): MediaMeta = {
    val h = java.util.Arrays.hashCode(bytes)
    MediaMeta(
      media_id = id,
      media_type = mediaType,
      n_bytes = bytes.length.toLong,
      width = 64 + math.abs(h % 1024),         // STUB: header parse
      height = 64 + math.abs((h / 1024) % 1024), // STUB: header parse
      n_frames = 1 + math.abs(h % 8))           // STUB: container probe
  }

  /** Attach a media-type column from a filename/source hint. */
  def withMediaType(df: DataFrame, hintCol: String): DataFrame =
    df.withColumn("media_type",
      when(col(hintCol).rlike("(?i)\\.(jpe?g|png)$"), "image")
        .when(col(hintCol).rlike("(?i)\\.(wav|mp3|flac)$"), "audio")
        .when(col(hintCol).rlike("(?i)\\.(mp4|mkv|webm)$"), "video")
        .otherwise("binary"))

  /** Batched metadata extraction over (id, type, payload) — one pass, no
    * shuffle; the Dataset boundary keeps the payload bytes off the driver.
    */
  def extractMeta(df: DataFrame, idCol: String, typeCol: String,
      binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(typeCol), col(binCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, t, b) => decodeMetaStub(id, t, b) })
  }

  /** STUB frame sampling: emits `n` deterministic pseudo-frames per media
    * row (real implementation: keyframe extraction). Shows the 1→N expansion
    * shape (flatMap, still shuffle-free).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      n: Int): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (0 until n).iterator.map { i =>
          // STUB: a real decoder would seek frame i; we slice the payload
          // Long arithmetic: i * length overflows Int for GB-scale payloads
          val start = if (bytes.isEmpty) 0
            else (i.toLong * bytes.length / math.max(n, 1)).toInt
          MediaFrame(id, i, java.util.Arrays.copyOfRange(
            bytes, start, math.min(bytes.length, start + 16)))
        }
      }
  }

  /** STUB resize: passthrough marking the target size in metadata (real
    * implementation: pixel resample). Demonstrates binary→binary transforms
    * staying columnar.
    */
  def resizeImages(meta: Dataset[MediaMeta], targetW: Int, targetH: Int): DataFrame = {
    import meta.sparkSession.implicits._
    meta.toDF().withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))
      .withColumn("resized", lit(true))
  }

  /** Demo pipeline over the documents table: text bytes stand in for media
    * payloads (the container has no real media), exercising the full
    * binary-column path: cast → type tag → batched meta extract.
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    val media = docs.select(
      col("doc_id").as("media_id"),
      concat(col("source"), lit(".png")).as("uri"),
      col("text").cast("binary").as("payload"))
    extractMeta(withMediaType(media, "uri"), "media_id", "media_type", "payload")
  }
}
