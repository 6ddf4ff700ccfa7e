package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** [[TextAnalysis.fitBpe]]/[[TextAnalysis.tokenizeBpe]] — BPE as a
  * frozen artifact: hand-checked learning, deterministic fit,
  * order-sensitive application, persistence, and the packShards
  * integration (budgets denominated in subword tokens). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fit learns the hand-computed merge sequence (count desc, pair asc ties)") {
    // words: "aa"×2, "ab"×1. Pairs: (a,a):2, (a,</w>):2, (a,b):1,
    // (b,</w>):1 — tie at 2 breaks lexicographically: "a </w>" < "a a",
    // so the END-OF-WORD merge wins round 1; round 2 merges (a, a</w>);
    // then no pair reaches minPairCount=2.
    val df = Seq("aa aa ab").toDF("text")
    val model = TextAnalysis.fitBpe(df, "text", numMerges = 16)
    assert(model.merges == Seq("a </w>", "a a</w>"),
      s"hand-computed merge order, got ${model.merges}")
    // apply is greedy by RANK: "aaa" → rank0 merges the tail a+</w>,
    // rank1 then builds aa</w>, leaving [a, aa</w>]
    val toks = TextAnalysis.tokenizeBpe(Seq("aaa aa ab").toDF("text"), "text", model)
      .select("bpe_tokens").head().getSeq[String](0)
    assert(toks == Seq("a", "aa</w>", "aa</w>", "a", "b", "</w>"), s"got $toks")
  }

  test("fit is a pure function of the corpus: partitioning cannot change the merges") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(200)
    val a = TextAnalysis.fitBpe(docs.repartition(1), "text", numMerges = 64, maxWords = 4096)
    val b = TextAnalysis.fitBpe(docs.repartition(7), "text", numMerges = 64, maxWords = 4096)
    assert(a.merges == b.merges)
    assert(a.numMerges == 64, "a 200-doc corpus must support 64 merges")
  }

  test("application is order-sensitive in the ranks (why the table must be frozen)") {
    val m1 = TextAnalysis.BpeModel(Seq("a b"))
    val m2 = TextAnalysis.BpeModel(Seq("b c"))
    def tok(m: TextAnalysis.BpeModel) =
      Seq("abc").toDF("text")
        .select(TextAnalysis.bpeTokens(col("text"), m).as("t"))
        .head().getSeq[String](0)
    assert(tok(m1) == Seq("ab", "c", "</w>"))
    assert(tok(m2) == Seq("a", "bc", "</w>"))
  }

  test("tokens losslessly reconstruct the pre-tokenized text (merges never drop bytes)") {
    val model = TextAnalysis.fitBpe(
      Tables(spark, "/root/testdata/sf0.001", "documents"), "text",
      numMerges = 128, maxWords = 8192)
    val rows = TextAnalysis.tokenizeBpe(
      Tables(spark, "/root/testdata/sf0.001", "documents").limit(50), "text", model)
      .select(col("text"), col("bpe_tokens")).collect()
    rows.foreach { r =>
      val rebuilt = r.getSeq[String](1).mkString("").replace("</w>", " ").trim
      val want = r.getString(0).toLowerCase(java.util.Locale.ROOT)
        .split("[\\s ]+").filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == want, s"round trip broke on: ${r.getString(0).take(60)}")
    }
  }

  test("input literally containing </w> is split to chars — and its reconstruction is documented-lossy") {
    // r12 ADVICE / BpeTokens.Eow scaladoc: the marker lives in the
    // text alphabet (the paper's choice), so a literal "</w>" in INPUT
    // pre-tokenizes to '<','/','w','>' and the joined-token
    // reconstruction turns it into a space. Pin both halves: (a)
    // tokenization is deterministic and no SINGLE emitted symbol
    // equals the marker unless the merge table learned to reassemble
    // it — an empty table cannot; (b) the lossy reconstruction is
    // exactly the marker→space substitution, nothing worse.
    val m = TextAnalysis.BpeModel(Seq.empty)
    val toks = Seq("a</w>b").toDF("text")
      .select(TextAnalysis.bpeTokens(col("text"), m).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("a", "<", "/", "w", ">", "b", "</w>"), s"got $toks")
    assert(toks.init.forall(_ != "</w>"),
      "no learned merges ⇒ no spurious marker symbol before word end")
    val rebuilt = toks.mkString("").replace("</w>", " ").trim
    assert(rebuilt == "a b", // NOT "a</w>b" — the documented ambiguity
      s"reconstruction of adversarial input is marker→space, got '$rebuilt'")
  }

  test("save → load round-trips the rank order exactly") {
    val model = TextAnalysis.fitBpe(
      Tables(spark, "/root/testdata/sf0.001", "documents").limit(100), "text",
      numMerges = 32, maxWords = 2048)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    try {
      TextAnalysis.saveBpe(model, dir)
      val re = TextAnalysis.loadBpe(spark, dir)
      assert(re == model)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("astral code points stay whole symbols — a surrogate pair never splits") {
    // U+1F600 is two UTF-16 chars; per-char splitting would produce
    // unpaired surrogates (invalid strings) and merges over halves
    val emoji = new String(Character.toChars(0x1F600))
    val model = TextAnalysis.BpeModel(Seq(s"a $emoji"))
    val toks = Seq(s"a${emoji}b").toDF("text")
      .select(TextAnalysis.bpeTokens(col("text"), model).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq(s"a$emoji", "b", "</w>"), s"got $toks")
    assert(toks.forall(t => !t.exists(c =>
      Character.isSurrogate(c) && t.count(Character.isSurrogate) % 2 == 1)),
      "no token may carry an unpaired surrogate")
  }

  test("null text tokenizes to null; empty text to zero tokens") {
    val model = TextAnalysis.BpeModel(Seq("a b"))
    val got = Seq(Some("ab a"), None, Some("")).toDF("text")
      .select(TextAnalysis.bpeTokens(col("text"), model).as("t"),
        TextAnalysis.bpeTokenCount(col("text"), model).as("n"))
      .collect()
    assert(got(0).getSeq[String](0) == Seq("ab", "</w>", "a", "</w>"))
    assert(got(0).getLong(1) == 4L)
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    assert(got(2).getSeq[String](0) == Seq.empty && got(2).getLong(1) == 0L)
  }

  test("packShards re-runs on BPE counts: same operator, subword-denominated budget") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val model = TextAnalysis.fitBpe(docs, "text", numMerges = 128, maxWords = 8192)
    val counted = docs.select(col("doc_id"),
      TextAnalysis.bpeTokenCount(col("text"), model).as("n_toks"))
    val packed = TextAnalysis.packShards(counted, "n_toks", "doc_id",
      budgetTokens = 4096, nBuckets = 16)
    // the defining invariant: shard = floor(exclusive-cumsum / budget)
    // over doc_id order — i.e. each doc STARTS in the shard its global
    // token offset falls in (the straddling doc may spill a shard past
    // the budget; documents are atomic)
    import org.apache.spark.sql.expressions.Window
    val cum0 = coalesce(sum(col("n_toks")).over(
      Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val bad = packed.withColumn("__cum0", cum0)
      .where(col("shard") =!= floor(col("__cum0") / 4096L)).count()
    assert(bad == 0, s"$bad docs landed outside floor(cum0/budget)")
    // shards are monotone in doc_id: each shard's min doc_id increases
    val byShard = packed.groupBy("shard").agg(min("doc_id").as("lo"))
      .orderBy("shard").collect()
    assert(byShard.nonEmpty)
    val los = byShard.map(_.getLong(1))
    assert(los.sameElements(los.sorted))
    // and BPE counts genuinely differ from whitespace counts under a
    // small merge table (the fixture's 31-word vocab fully merges at
    // 128 merges, where bpe == ws is CORRECT — 16 merges cannot)
    val small = TextAnalysis.fitBpe(docs, "text", numMerges = 16, maxWords = 8192)
    val diff = docs.select(TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.bpeTokenCount(col("text"), small).as("bpe"))
      .where(col("ws") =!= col("bpe")).count()
    assert(diff > 0, "a 16-merge table must leave some word subword-split")
  }
}
