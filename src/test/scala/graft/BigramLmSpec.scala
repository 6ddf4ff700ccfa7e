package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** [[TextAnalysis.lmScoreBigramAgainst]] — the Jelinek-Mercer
  * interpolated bigram completing the frozen-LM family one modeling
  * step toward CCNet's KenLM. */
class BigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureModel = TextAnalysis.fitBigramLm(
    Seq("a b", "a b", "a c").toDF("text"), "text")

  // model: tokens a×3 b×2 c×1 (N=6, V=3); bigrams (a,b)×2 (a,c)×1; ctx a→3
  test("hand-computed interpolated scores on a micro fixture") {
    val m = fixtureModel
    assert(m.uni.nTotal == 6L && m.uni.vocab == 3L)
    val got = TextAnalysis.lmScoreBigramAgainst(
        Seq((1L, "a b")).toDF("doc_id", "text"), m, "text", "doc_id")
      .select("doc_id", "n_toks", "lm_nll").head()
    // pos1 "a": add-one unigram (3+1)/9; pos2 "b"|"a": .75*(2/3) + .25*(3/9)
    val nm1 = math.round(-1e6 * math.log(4.0 / 9.0))
    val nm2 = math.round(-1e6 * math.log(0.75 * (2.0 / 3.0) + 0.25 * (3.0 / 9.0)))
    val want = BigDecimal((nm1 + nm2) / (1e6 * 2)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(1) == 2L)
    assert(got.getDouble(2) == want, s"got ${got.getDouble(2)}, want $want")
  }

  test("a one-token document scores identically under bigram and unigram models") {
    val m = fixtureModel
    val doc = Seq((1L, "b"), (2L, "zzz")).toDF("doc_id", "text") // seen + OOV
    val bi = TextAnalysis.lmScoreBigramAgainst(doc, m, "text", "doc_id")
      .select("doc_id", "lm_nll").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val un = TextAnalysis.lmScoreAgainst(doc, m.uni, "text", "doc_id")
      .select("doc_id", "lm_nll").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi == un)
  }

  test("OOV-only document: every transition pays the lambda-discounted unigram floor") {
    val m = fixtureModel
    val got = TextAnalysis.lmScoreBigramAgainst(
        Seq((1L, "x y z")).toDF("doc_id", "text"), m, "text", "doc_id").head()
    // pos1: ln(9) (add-one at count 0); pos2/3: unseen ctx -> .25 * 1/9
    val nm1 = math.round(-1e6 * math.log(1.0 / 9.0))
    val nmR = math.round(-1e6 * math.log(0.25 * (1.0 / 9.0)))
    val want = BigDecimal((nm1 + 2 * nmR) / (1e6 * 3)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("lm_nll") == want)
  }

  test("fluent repetition beats shuffled word soup with the SAME token multiset") {
    // the discrimination unigram surprisal cannot make: identical
    // multisets score identically under lmScoreAgainst, but the
    // soup's unseen transitions pay the unigram floor here
    val ref = Seq.fill(20)("the quick brown fox").mkString(" ")
    val m = TextAnalysis.fitBigramLm(Seq(ref).toDF("text"), "text")
    val docs = Seq(
      (1L, "the quick brown fox the quick brown fox"),
      (2L, "fox brown the quick quick the fox brown")).toDF("doc_id", "text")
    val bi = TextAnalysis.lmScoreBigramAgainst(docs, m, "text", "doc_id")
      .select("doc_id", "lm_nll").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val un = TextAnalysis.lmScoreAgainst(docs, m.uni, "text", "doc_id")
      .select("doc_id", "lm_nll").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(un(1L) == un(2L), "unigram sees identical multisets as identical")
    assert(bi(1L) < bi(2L), s"fluent ${bi(1L)} should beat soup ${bi(2L)}")
  }

  test("save/load round-trip scores identically; broadcast knob is bit-identical") {
    val m = fixtureModel
    val dir = java.nio.file.Files.createTempDirectory("bigram-lm").toString
    TextAnalysis.saveBigramLm(m, dir)
    val m2 = TextAnalysis.loadBigramLm(spark, dir)
    val docs = Seq((1L, "a b c x"), (2L, "c a b")).toDF("doc_id", "text")
    val a = TextAnalysis.lmScoreBigramAgainst(docs, m, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.lmScoreBigramAgainst(docs, m2, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val c = TextAnalysis.lmScoreBigramAgainst(docs, m, "text", "doc_id",
      broadcastCounts = true).orderBy("doc_id").collect().toSeq
    assert(a == b && a == c)
  }

  test("empty model and degenerate lambda refuse") {
    val m = fixtureModel
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val empty = TextAnalysis.fitBigramLm(Seq.empty[String].toDF("text"), "text")
    assertThrows[IllegalArgumentException] {
      TextAnalysis.lmScoreBigramAgainst(docs, empty, "text", "doc_id")
    }
    assertThrows[IllegalArgumentException] {
      TextAnalysis.lmScoreBigramAgainst(docs, m, "text", "doc_id", lambda = 1.0)
    }
  }

  test("scores are invariant to input partitioning") {
    val m = fixtureModel
    val docs = Seq((1L, "a b c a b"), (2L, "b a"), (3L, "c c c")).toDF("doc_id", "text")
    val p1 = TextAnalysis.lmScoreBigramAgainst(docs.repartition(1), m, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val p7 = TextAnalysis.lmScoreBigramAgainst(docs.repartition(7), m, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(p1 == p7)
  }
}
