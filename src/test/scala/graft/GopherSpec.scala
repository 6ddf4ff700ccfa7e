package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** [[TextAnalysis.gopherStats]]/[[TextAnalysis.gopherKeep]] — the
  * Gopher §A1.1 battery with integer-exact thresholds. */
class GopherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def statsOf(text: String) =
    Seq(text).toDF("t").select(TextAnalysis.gopherStats(col("t")).as("st"))
      .select("st.*").head()

  private def keepOf(text: String, minWords: Long = 1): Boolean =
    Seq(text).toDF("t")
      .select(TextAnalysis.gopherKeep(TextAnalysis.gopherStats(col("t")),
        minWords = minWords).as("k")).head().getBoolean(0)

  test("counters on a hand-built document") {
    val doc = "The cat sat.\n• bullet one\nplain line ends...\n\n  \nEnd 42 # …"
    val st = statsOf(doc)
    assert(st.getAs[Long]("n_words") == 13)
    assert(st.getAs[Long]("sum_wlen") == 43)
    assert(st.getAs[Long]("alpha_words") == 9)  // •, 42, #, … carry none
    assert(st.getAs[Long]("stop_hits") == 1)    // only "the"
    assert(st.getAs[Long]("n_symbols") == 3)    // '#', '...', '…'
    assert(st.getAs[Long]("n_lines") == 4)      // blank lines dropped
    assert(st.getAs[Long]("bullet_lines") == 1)
    assert(st.getAs[Long]("ellipsis_lines") == 2) // '...' line AND '…' line
  }

  test("each rule vetoes independently while every other rule passes") {
    val base = "the cat and dog have fur" // n=6 sum=19 alpha=6 stops=3
    assert(keepOf(base), "base doc must pass")
    assert(!keepOf(base, minWords = 7), "word count below minWords")
    assert(!keepOf("the be a a a a"), "mean wlen 9/6 < 3")
    assert(!keepOf("the and abcdefghijklmnopqrstuvwxyz abcdefghijklmnopqrstuvwxyz"),
      "mean wlen 58/4 > 10")
    assert(!keepOf("the cat and dog have fur tail #"),
      "1 symbol over 8 words: 10*1 >= 8")
    assert(!keepOf(Seq.fill(9)("-abcd efgh").mkString("\n") + "\n" + base + " tail"),
      "9 of 10 bullet lines: 90 >= 9*10 (letters ride the bullet tokens, alpha stays green)")
    assert(!keepOf(Seq.fill(3)("abcd efgh ijkl...").mkString("\n") + "\n" +
      Seq.fill(6)("abcd efgh ijkl").mkString("\n") + "\n" + base + " tail",
      minWords = 1), "3 of 10 ellipsis lines: 30 >= 3*10; 3 symbols over 34 words stays legal")
    assert(!keepOf("the and cat 123456 7890123"), "alpha 3/5 < 0.8")
    assert(!keepOf("cat dog fox run jump walk sing read code play"),
      "zero stopwords")
  }

  test("boundary exactness: thresholds bite exactly where the integers say") {
    assert(keepOf("abc def ghi the and"), "mean exactly 3.0 passes (3n <= sum)")
    assert(!keepOf("ab def ghi the and"), "sum one char under 3n fails")
    assert(keepOf("the and cat dog 12345"), "alpha exactly 0.8 passes (>= inclusive)")
    assert(!keepOf("the and cat 1234"), "alpha 3/4 fails")
    assert(!keepOf("thee cats and dogs have furs tails abcd efgh #"),
      "symbol ratio exactly 0.1 fails (strict <)")
  }

  test("normalizeNfc: composes NFD, idempotent, ASCII untouched, null-safe") {
    val nfd = "cafe\u0301 u\u0308ber" // e+combining acute, u+combining diaeresis
    val nfc = "caf\u00e9 \u00fcber"   // precomposed
    val rows = Seq((1L, Some(nfd)), (2L, Some(nfc)), (3L, Some("plain ascii")),
      (4L, None)).toDF("id", "t")
    val got = rows.select(col("id"), TextAnalysis.normalizeNfc(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains(nfc), "NFD must compose to the precomposed form")
    assert(got(2L).contains(nfc), "already-NFC text must pass through unchanged")
    assert(got(3L).contains("plain ascii"))
    assert(got(4L).isEmpty, "null stays null")
    // the dedup motivation: both spellings share one fingerprint after
    val fps = Seq(nfd, nfc).toDF("t")
      .select(TextAnalysis.contentFingerprint(TextAnalysis.normalizeNfc(col("t"))).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1, "NFD and NFC spellings must fingerprint identically post-normalization")
  }

  test("capPerKey: deterministic winners, hot key capped, null keys dropped") {
    val df = ((1L to 50L).map(i => (i, "hot")) ++ Seq((100L, "cold"), (101L, "cold")) ++
      Seq((200L, null.asInstanceOf[String]))).toDF("id", "src")
    val got = TextAnalysis.capPerKey(df, "src", "id", maxRows = 10)
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("hot" -> 10L, "cold" -> 2L), s"got $bySrc")
    // determinism across partitionings: same winner ids
    val a = got.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = TextAnalysis.capPerKey(df.repartition(7), "src", "id", 10)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // winners are the md5-order prefix, not the id-order prefix
    val md5Order = (1L to 50L).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5").digest(i.toString.getBytes)
        .map("%02x".format(_)).mkString)
    assert(a.filter(_ <= 50L).toSet == md5Order.take(10).toSet)
    assertThrows[IllegalArgumentException] {
      TextAnalysis.capPerKey(df, "src", "id", maxRows = 0)
    }
  }

  test("empty and degenerate documents never pass, never error") {
    assert(!keepOf(""))
    assert(!keepOf("   \n \n  "))
    assert(!keepOf("•"))
    assertThrows[IllegalArgumentException] {
      TextAnalysis.gopherKeep(TextAnalysis.gopherStats(col("t")), minWords = 0)
    }
  }
}
