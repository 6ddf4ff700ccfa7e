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
