package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("binary-column pipeline: cast -> type tag -> batched meta extract") {
    val meta = Multimodal.documentsAsMedia(spark, docs)
    assert(meta.count() == docs.count())
    val r = meta.head()
    assert(r.media_type == "image") // .png hint
    assert(r.n_bytes > 0)
    assert(r.width >= 64 && r.height >= 64)
    // deterministic stub: same input → same fake dims
    val again = Multimodal.documentsAsMedia(spark, docs)
    assert(meta.orderBy("media_id").collect().toSeq ==
      again.orderBy("media_id").collect().toSeq)
  }

  test("media-type tagging by extension") {
    import spark.implicits._
    val df = Seq(
      (1L, "a.JPG", Array[Byte](1)), (2L, "b.wav", Array[Byte](2)),
      (3L, "c.mp4", Array[Byte](3)), (4L, "d.bin", Array[Byte](4)))
      .toDF("media_id", "uri", "payload")
    val tagged = Multimodal.withMediaType(df, "uri")
      .orderBy("media_id").select("media_type").as[String].collect().toSeq
    assert(tagged == Seq("image", "audio", "video", "binary"))
  }

  test("frame sampling expands 1->N without shuffle") {
    // filter (pushes to scan) instead of limit (which inserts an Exchange)
    val media = docs.where(col("doc_id") < 10).select(
      col("doc_id"), col("text").cast("binary").as("payload"))
    val frames = Multimodal.sampleFrames(media, "doc_id", "payload", n = 4)
    assert(frames.count() == 40)
    assert(frames.where(col("frame_idx") >= 4).count() == 0)
    // no exchange in the plan: decode runs at scan parallelism
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in decode plan:\n$plan")
  }

  test("resize stub keeps rows and marks the target size") {
    val meta = Multimodal.documentsAsMedia(spark, docs.limit(5))
    val resized = Multimodal.resizeImages(meta, 224, 224)
    assert(resized.count() == 5)
    assert(resized.where(col("width") =!= 224 || col("height") =!= 224).count() == 0)
  }
}
