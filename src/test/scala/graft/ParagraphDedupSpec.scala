package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Newline-paragraph semantics of [[Dedup.dedupParagraphs]] — the
  * realistic shape the driver fixture (single-line prose) cannot
  * exercise; the gate query `dedup_paragraphs` covers the same
  * decision path at word granularity against the DuckDB oracle. */
class ParagraphDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "unique intro one\nshared cookie banner\nbody of doc one"),
    (2L, "shared cookie banner\nunique body two\nshared cookie banner"),
    (3L, "unique article three\nshared cookie banner\nsecond unique line"),
    (4L, "shared cookie banner")
  ).toDF("doc_id", "text")

  private def textsOf(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("corpus-wide first occurrence survives; later docs lose the repeated paragraph") {
    val out = textsOf(Dedup.dedupParagraphs(docs, "text", "doc_id"))
    assert(out(1L) == "unique intro one\nshared cookie banner\nbody of doc one")
    // doc 2 repeats the banner twice — BOTH occurrences drop (doc 1
    // holds the (id, pos) minimum), and the within-doc repeat is not
    // resurrected
    assert(out(2L) == "unique body two")
    assert(out(3L) == "unique article three\nsecond unique line")
  }

  test("a document reduced to zero paragraphs disappears") {
    val out = Dedup.dedupParagraphs(docs, "text", "doc_id")
    assert(!out.select("doc_id").collect().map(_.getLong(0)).contains(4L))
  }

  test("within-doc repeats dedup against the doc's own first occurrence") {
    val df = Seq((7L, "refrain\nverse one\nrefrain\nverse two\nrefrain"))
      .toDF("doc_id", "text")
    val out = textsOf(Dedup.dedupParagraphs(df, "text", "doc_id"))
    assert(out(7L) == "refrain\nverse one\nverse two")
  }

  test("identity round-trip: nothing repeats => byte-identical text, all columns kept") {
    val df = Seq(
      (1L, "alpha\nbeta", "en"),
      (2L, "gamma\n\ndelta\n", "de")   // empty + trailing-empty paragraphs survive splitting
    ).toDF("doc_id", "text", "lang")
    val out = Dedup.dedupParagraphs(df, "text", "doc_id")
    assert(out.columns.toSet == Set("doc_id", "text", "lang"))
    val got = textsOf(out)
    assert(got(1L) == "alpha\nbeta" && got(2L) == "gamma\n\ndelta\n")
    assert(out.where(col("lang") === "de").count() == 1)
  }

  test("minLen bypass: short paragraphs repeat everywhere without being deduped") {
    val df = Seq(
      (1L, "long unique paragraph one\n\nok"),
      (2L, "long unique paragraph two\n\nok")
    ).toDF("doc_id", "text")
    // minLen=3: "" and "ok" bypass; the long paragraphs are unique
    val out = textsOf(Dedup.dedupParagraphs(df, "text", "doc_id", minLen = 3))
    assert(out(1L) == "long unique paragraph one\n\nok")
    assert(out(2L) == "long unique paragraph two\n\nok")
    // minLen=1 subjects "ok": doc 1 keeps it, doc 2 loses it ("" still bypasses)
    val strict = textsOf(Dedup.dedupParagraphs(df, "text", "doc_id"))
    assert(strict(1L) == "long unique paragraph one\n\nok")
    assert(strict(2L) == "long unique paragraph two\n")
  }

  test("winner is a pure function of the data, not the partitioning") {
    val base = Dedup.dedupParagraphs(docs, "text", "doc_id")
    val shuffled = Dedup.dedupParagraphs(docs.repartition(7), "text", "doc_id")
    assert(textsOf(base) == textsOf(shuffled))
  }

  test("separator is literal, not regex") {
    val df = Seq((1L, "a.b"), (2L, "a.b")).toDF("doc_id", "text")
    // "." must split on the literal dot (both docs' "a"/"b" dedup),
    // not on every character
    val out = textsOf(Dedup.dedupParagraphs(df, "text", "doc_id", sep = "."))
    assert(out == Map(1L -> "a.b"))
  }
}
