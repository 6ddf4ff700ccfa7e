package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.streaming.StreamOps

class StreamingMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** File stream sources read directories; stage the fixture into one. */
  private lazy val eventsDir: String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_events_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming hourly stats over the events fixture match the batch computation") {
    val stream = StreamOps.readEventsStream(spark, eventsDir)
    assert(stream.isStreaming)
    val q = StreamOps.hourlyTypeStats(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_test")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("graft_stream_test")
      .select(col("hour"), col("event_type"), col("n"), round(col("total"), 6).as("total"))
      .collect().map(_.toSeq).toSet
    val batch = StreamOps.hourlyTypeStats(Tables(spark, sfDir, "events"))
      .select(col("hour"), col("event_type"), col("n"), round(col("total"), 6).as("total"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("embed-on-arrival: the batch embedder runs unchanged on a stream") {
    val stream = StreamOps.readEventsStream(spark, eventsDir)
    val embedded = StreamOps.embedStream(stream, "event_type", HashingEmbedder(dim = 8))
    assert(embedded.isStreaming)
    val q = embedded.select(col("event_id"), col("embedding"))
      .writeStream.outputMode("append").format("memory").queryName("graft_embed_stream")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("graft_embed_stream")
    assert(rows.count() == 1000)
    assert(rows.where(size(col("embedding")) === 8).count() == 1000)
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_dedup_stream")
    // stage the same file twice: every event arrives twice
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val stream = StreamOps.readEventsStream(spark, dir.toString)
    val q = StreamOps.dedupStream(stream, Seq("event_id"))
      .select("event_id")
      .writeStream.outputMode("append").format("memory").queryName("graft_dedup_test")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graft_dedup_test")
    assert(got.count() == 1000, "2000 delivered, 1000 distinct")
    assert(got.distinct().count() == 1000)
  }

  test("flatMapGroupsWithState running stats converge to the batch totals") {
    val stream = StreamOps.readEventsStream(spark, eventsDir)
    val q = StreamOps.runningUserStats(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_state_test").start()
    try q.processAllAvailable() finally q.stop()
    // last emitted row per user = final running totals
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("userId")).orderBy(desc("nEvents"))
    val finals = spark.table("graft_state_test")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("userId"), col("nEvents"), round(col("totalValue"), 4).as("tv"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = Tables(spark, sfDir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("tv"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(finals == batch)
    assert(batch.nonEmpty)
  }

  test("multimodal: packed bytes round-trip and metadata reflects payload size") {
    val docs = Seq((1L, "hello world"), (2L, "ü")).toDF("doc_id", "text")
    val packed = Multimodal.withMeta(Multimodal.packTextAsMedia(docs, "text"), "media")
    val rows = packed.select("doc_id", "meta.n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 11L)
    assert(rows(2L) == 2L) // ü is two UTF-8 bytes — byte length, not char length
  }

  test("multimodal feature extraction: fixed dim, unit norm, deterministic, null-safe") {
    val docs = Seq((1L, Some("hello world")), (2L, Some("hello world")), (3L, None))
      .toDF("doc_id", "text")
      .withColumn("media", when(col("text").isNotNull, encode(col("text"), "UTF-8")))
    val out = Multimodal.extractFeatures(docs, "media", dim = 16)
    val feats = out.select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).length == 16)
    assert(feats(1L) == feats(2L), "same bytes must give same features")
    assert(feats(3L).forall(_ == 0f), "null payload -> zero vector")
    val norm = math.sqrt(feats(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }
}
