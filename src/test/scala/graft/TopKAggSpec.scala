package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Scored, TopKScored}
import graft.operators.SimJoin
import graft.streaming.StreamOps

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TopKScored keeps the k best with (score desc, id asc) tie-breaks across merges") {
    val agg = new TopKScored(3)
    val items = Seq(Scored(0.5, 7), Scored(0.9, 2), Scored(0.5, 1),
      Scored(0.1, 9), Scored(0.9, 5), Scored(0.7, 4))
    // split across two "partitions" and merge, like Spark would
    val (p1, p2) = items.splitAt(3)
    val merged = agg.merge(
      p1.foldLeft(agg.zero)(agg.reduce), p2.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == Seq(Scored(0.9, 2), Scored(0.9, 5), Scored(0.7, 4)))
  }

  test("knnJoinAgg produces exactly the window-based knnJoin results") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val viaWindow = SimJoin.knnJoin(q, e, "query_id", "qe", "embedding", k = 4,
      corpusTieBreak = Seq(asc("vec_id")))
      .select(col("query_id"), col("vec_id"), round(col("similarity"), 9).as("s"))
      .collect().map(_.toSeq).toSet
    val viaHeap = SimJoin.knnJoinAgg(q, e, "query_id", "qe", "vec_id", "embedding", k = 4)
      .select(col("query_id"), col("vec_id"), round(col("similarity"), 9).as("s"))
      .collect().map(_.toSeq).toSet
    assert(viaHeap == viaWindow)
    assert(viaHeap.size == 20)
  }

  test("streaming nearestPerBatch: every micro-batch query gets k exact matches") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_stream_knn")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val emb = HashingEmbedder(dim = 8)
    // static corpus: one embedded exemplar per event type
    val corpus = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type")).distinct()
      .withColumn("corpus_id", monotonically_increasing_id())
    val corpusEmb = emb.embed(corpus, "event_type", "embedding")
    val stream = StreamOps.embedStream(
      StreamOps.readEventsStream(spark, dir.toString), "event_type", emb, "qe")
      .select(col("event_id").as("query_id"), col("qe"))
    val results = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = StreamOps.nearestPerBatch(stream, corpusEmb,
      "query_id", "qe", "corpus_id", "embedding", k = 1) { (df, _) =>
      results ++= df.collect()
    }
    try q.processAllAvailable() finally q.stop()
    assert(results.size == 1000) // 1000 events x k=1
    // every query's best match is its own type's exemplar: similarity 1
    assert(results.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-6))
  }
}
