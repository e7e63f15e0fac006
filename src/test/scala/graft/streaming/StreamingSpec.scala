package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private def stageEvents(): String = {
    // stage a batch of testdata events as a stream source directory
    val dir = Files.createTempDirectory("graft_stream_").toString
    graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(s"$dir/drop1")
    s"$dir/drop1"
  }

  test("windowed per-type aggregation over a file stream matches batch") {
    val dir = stageEvents()
    val stream = Streaming.readEventStream(spark, dir)
    assert(stream.isStreaming)
    // Complete mode so the finite source's last (not-yet-watermark-closed)
    // windows are visible to the assertions
    val q = Streaming.runToMemory(
      Streaming.windowedTypeAgg(stream, "1 hour", "2 hours"), "win_agg",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    q.awaitTermination(120000); q.stop()

    val got = spark.table("win_agg")
    assert(got.count() > 0)
    // cross-check one cell against the equivalent batch aggregation
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val batchTotal = batch.agg(sum("n_events")).head().getLong(0)
    val streamTotal = got.agg(sum("n_events")).head().getLong(0)
    assert(streamTotal == batchTotal)
    // all events accounted for
    assert(streamTotal == spark.read.parquet(dir).count())
  }

  test("streaming dedup drops in-stream duplicates, watermark bounds state") {
    import spark.implicits._
    // stage events UNIONED with a duplicated slice — the stream must emit
    // each event_id exactly once
    val dir = Files.createTempDirectory("graft_stream_dup_").toString
    val base = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    base.unionAll(base.limit(200)).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/drop1")

    val q = Streaming.runToMemory(
      Streaming.dedupStream(Streaming.readEventStream(spark, s"$dir/drop1")),
      "dedup_stream")
    q.awaitTermination(120000); q.stop()

    val got = spark.table("dedup_stream")
    assert(got.count() == base.count(), "each event_id must survive exactly once")
    assert(got.select("event_id").distinct().count() == got.count())
  }

  test("stream-static enrichment joins every event, no rows lost") {
    import spark.implicits._
    val dir = stageEvents()
    // static dim derived from the same data: every user gets a tier
    val dim = spark.read.parquet(dir)
      .select($"user_id").distinct()
      .withColumn("tier", when($"user_id" % 2 === 0, "even").otherwise("odd"))
    val q = Streaming.runToMemory(
      Streaming.enrichStream(
        Streaming.readEventStream(spark, dir), dim, Seq("user_id")),
      "enriched")
    q.awaitTermination(120000); q.stop()
    val got = spark.table("enriched")
    assert(got.count() == spark.read.parquet(dir).count())
    assert(got.where($"tier".isNull).count() == 0, "every event must enrich")
  }

  test("stateful running totals per user via mapGroupsWithState") {
    import spark.implicits._
    val dir = stageEvents()
    val stream = Streaming.readEventStream(spark, dir)
      .select($"user_id", $"ts", $"value").as[Streaming.SessionInput]
    val q = Streaming.runningUserTotals(stream)
      .writeStream.outputMode("update").format("memory")
      .queryName("user_totals")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000); q.stop()
    val got = spark.table("user_totals")
    assert(got.count() > 0)
    // state accumulated: per-user counts must match batch groupBy
    val batch = spark.read.parquet(dir).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("t"))
    val joined = got.join(batch, Seq("user_id"))
      .where(col("n_events") =!= col("n") ||
        abs(col("total_value") - col("t")) > 1e-9)
    assert(joined.count() == 0)
  }
}
