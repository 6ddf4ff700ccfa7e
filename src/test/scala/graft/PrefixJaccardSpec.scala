package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** PPJoin prefix filtering must be RESULT-IDENTICAL to the all-pairs
  * exact Jaccard path — same pairs, same similarities — while never
  * building an all-pairs stage. */
class PrefixJaccardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = Tables(spark, sfDir, "documents")

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id1").cast("long"), col("id2").cast("long"),
      round(col("similarity"), 9)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix path equals all-pairs path: blocked, t=0.8, unigram") {
    val exact = Dedup.jaccardPairs(docs, "text", "doc_id", 0.8,
      shingleSize = 1, groupCol = Some("source"))
    val prefix = Dedup.prefixJaccardPairs(docs, "text", "doc_id", 0.8,
      shingleSize = 1, groupCol = Some("source"))
    assert(pairsOf(prefix) == pairsOf(exact))
    assert(pairsOf(prefix).nonEmpty, "fixture should contain near-dups")
  }

  test("prefix path equals all-pairs path: UNBLOCKED, t=0.5, unigram") {
    val sample = docs.where(col("doc_id") < 200)
    val exact = Dedup.jaccardPairs(sample, "text", "doc_id", 0.5)
    val prefix = Dedup.prefixJaccardPairs(sample, "text", "doc_id", 0.5)
    assert(pairsOf(prefix) == pairsOf(exact))
  }

  test("prefix path equals all-pairs path: trigram shingles, t=0.7") {
    val sample = docs.where(col("doc_id") < 200)
    val exact = Dedup.jaccardPairs(sample, "text", "doc_id", 0.7, shingleSize = 3)
    val prefix = Dedup.prefixJaccardPairs(sample, "text", "doc_id", 0.7, shingleSize = 3)
    assert(pairsOf(prefix) == pairsOf(exact))
  }

  test("handcrafted corpus: boundary threshold pairs survive the prefix filter") {
    import spark.implicits._
    // J(1,2) = 3/5 = 0.6 exactly; J(1,3) = 1/5; J(2,3) = 1/6
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),
      (3L, "a x y z")).toDF("id", "text")
    val got = pairsOf(Dedup.prefixJaccardPairs(df, "text", "id", 0.6))
    assert(got == Set((1L, 2L, 0.6)))
    // exactly at threshold with the integer predicate — no fp boundary loss
    val none = pairsOf(Dedup.prefixJaccardPairs(df, "text", "id", 0.600001))
    assert(none.isEmpty)
  }

  test("threshold 0 is rejected loudly (overlap index cannot see disjoint pairs)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.prefixJaccardPairs(df, "text", "id", 0.0)
    }
    assert(e.getMessage.contains("threshold"))
  }

  test("empty and whitespace-only docs never pair") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "a b"), (4L, "a b")).toDF("id", "text")
    val got = pairsOf(Dedup.prefixJaccardPairs(df, "text", "id", 0.8))
    assert(got == Set((3L, 4L, 1.0)))
  }
}
