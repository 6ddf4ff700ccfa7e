package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** [[TextAnalysis.packShards]] — global token-budget shard assignment
  * via the two-level prefix sum. The load-bearing property: the
  * assignment is a pure function of (order, tokens, budget) —
  * bucketing and partitioning cancel out exactly. */
class PackShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shardsOf(rows: Seq[(Long, Long)], budget: Long, nBuckets: Int = 256,
      parts: Int = 1): Seq[(Long, Long)] =
    TextAnalysis.packShards(
        rows.toDF("id", "toks").repartition(parts), "toks", "id", budget, nBuckets)
      .select("id", "shard").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("hand-computed assignment; an exact-budget boundary starts the next shard") {
    // cum0 = 0,5,10,15 at budget 10 -> shards 0,0,1,1: doc 3's
    // exclusive cumsum hits the boundary exactly and opens shard 1
    assert(shardsOf(Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)), 10) ==
      Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("a document larger than the budget stays atomic and later ids skip") {
    // cum0 = 0,3,28 at budget 10 -> shards 0,0,2 (id 1 skipped)
    assert(shardsOf(Seq((1L, 3L), (2L, 25L), (3L, 4L)), 10) ==
      Seq((1L, 0L), (2L, 0L), (3L, 2L)))
  }

  test("assignment is invariant to nBuckets and input partitioning") {
    val rows = (1L to 500L).map(i => (i * 7 % 501, i % 37 + 1)) // shuffled ids
    val base = shardsOf(rows, 100, nBuckets = 1)
    for (nb <- Seq(3, 16, 256); p <- Seq(1, 7)) {
      assert(shardsOf(rows, 100, nb, p) == base, s"nBuckets=$nb parts=$p diverged")
    }
  }

  test("empty frame yields an empty frame") {
    assert(shardsOf(Seq.empty, 10).isEmpty)
  }

  test("refuses duplicate or null order keys, negative tokens, and bad knobs") {
    assertThrows[IllegalArgumentException] { // duplicate id
      shardsOf(Seq((1L, 5L), (1L, 5L)), 10)
    }
    assertThrows[IllegalArgumentException] { // null order key
      TextAnalysis.packShards(
        Seq((Some(1L), 5L), (None, 5L)).toDF("id", "toks"), "toks", "id", 10).collect()
    }
    assertThrows[IllegalArgumentException] { // ALL-null order keys must
      // refuse too, not take the empty-frame early return and silently
      // drop the whole input
      TextAnalysis.packShards(
        Seq((None: Option[Long], 5L), (None, 5L)).toDF("id", "toks"), "toks", "id", 10)
    }
    assertThrows[IllegalArgumentException] { // negative token count
      shardsOf(Seq((1L, 5L), (2L, -1L)), 10)
    }
    assertThrows[IllegalArgumentException] { // null token count
      TextAnalysis.packShards(
        Seq((1L, Some(5L)), (2L, None)).toDF("id", "toks"), "toks", "id", 10).collect()
    }
    assertThrows[IllegalArgumentException] {
      shardsOf(Seq((1L, 5L)), budget = 0)
    }
    assertThrows[IllegalArgumentException] {
      shardsOf(Seq((1L, 5L)), 10, nBuckets = 0)
    }
    assertThrows[IllegalArgumentException] { // non-numeric order key
      TextAnalysis.packShards(
        Seq(("a", 5L)).toDF("id", "toks"), "toks", "id", 10)
    }
    assertThrows[IllegalArgumentException] { // reserved temp column
      TextAnalysis.packShards(
        Seq((1L, 5L, 0)).toDF("id", "toks", "__bk"), "toks", "id", 10)
    }
  }

  test("packShardsFrom chains batches into one continuous shard sequence") {
    val rows = (1L to 100L).map(i => (i, i % 7 + 1))
    val whole = shardsOf(rows, 40)
    val (h1, h2) = rows.partition(_._1 <= 60)
    val (d1, e1) = TextAnalysis.packShardsFrom(
      h1.toDF("id", "toks"), "toks", "id", 40, 0L)
    val (d2, e2) = TextAnalysis.packShardsFrom(
      h2.toDF("id", "toks"), "toks", "id", 40, e1)
    assert(e1 == h1.map(_._2).sum && e2 == rows.map(_._2).sum)
    assert(e1 % 40 != 0, "the boundary must land mid-shard for the carry to matter")
    val got = (d1.select("id", "shard").collect() ++ d2.select("id", "shard").collect())
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == whole)
    assertThrows[IllegalArgumentException] {
      TextAnalysis.packShardsFrom(h1.toDF("id", "toks"), "toks", "id", 40, -1L)
    }
  }

  test("streaming drain continues the shard sequence across micro-batches") {
    val rows = (1L to 100L).map(i => (i, i % 7 + 1))
    val whole = shardsOf(rows, 40)
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_stream")
    val (h1, h2) = rows.partition(_._1 <= 60)
    h1.toDF("id", "toks").coalesce(1).write.parquet(dir.resolve("b1").toString)
    h2.toDF("id", "toks").coalesce(1).write.parquet(dir.resolve("b2").toString)
    val Seq(f1, f2) = Seq("b1", "b2").map(b =>
      new java.io.File(dir.resolve(b).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    val stream = spark.readStream.schema(h1.toDF("id", "toks").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var batches = 0
    val q = graft.streaming.StreamOps.packShardsPerBatch(
      stream, "toks", "id", budgetTokens = 40) { (packed, _) =>
      got.synchronized {
        batches += 1
        got ++= packed.select("id", "shard").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
      }
    }
    try q.processAllAvailable() finally q.stop()
    assert(batches == 2, s"expected 2 micro-batches, saw $batches")
    assert(got.sortBy(_._1).toSeq == whole,
      "drained stream must equal the batch operator on the concatenation")
  }

  test("closed shards sit within one max-doc of the budget on both sides") {
    // atomic docs: a shard's first doc may enter up to maxDoc-1 tokens
    // past its boundary and its last doc may overshoot the next
    // boundary by up to maxDoc-1, so every non-final shard's mass is
    // in (budget - maxDoc, budget + maxDoc) — the packing never
    // drifts further than one document from the target
    val rows = (1L to 200L).map(i => (i, i % 13 + 1)) // doc sizes 1..13
    val got = TextAnalysis.packShards(rows.toDF("id", "toks"), "toks", "id", 50)
      .groupBy("shard").agg(sum("toks").as("mass"))
      .orderBy("shard").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length > 10)
    got.dropRight(1).foreach { case (s, m) =>
      assert(m > 50 - 13 && m < 50 + 13, s"shard $s mass $m drifted past one doc")
    }
  }
}
