package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Exact substring dedup (Lee et al. 2022 ExactSubstr): the
  * corpus-wide first occurrence of any duplicated k-token span
  * survives, every later occurrence is excised at token granularity,
  * untouched documents stay byte-identical, and the whole decision is
  * a deterministic function of the corpus. */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def textsOf(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def spansOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0),
      r.getAs[Number](1).longValue(), r.getAs[Number](2).longValue())).toSet

  test("cross-doc span: first occurrence survives in place, the later one is excised") {
    val docs = Seq(
      (1L, "x1 x2 aa bb cc dd ee x3"),
      (2L, "y1 aa bb cc dd ee y2 y3")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "text", "doc_id", k = 5)
    assert(spansOf(spans) == Set((2L, 1L, 6L)),
      "only doc 2's copy of the 5-gram is a duplicated span")
    val out = textsOf(Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 5))
    assert(out(1L) == "x1 x2 aa bb cc dd ee x3", "the winner doc stays byte-identical")
    assert(out(2L) == "y1 y2 y3", "the later occurrence's tokens are excised")
  }

  test("within-doc repeat: the second occurrence inside the SAME doc is excised") {
    val docs = Seq(
      (1L, "aa bb cc dd aa bb cc dd tail")).toDF("doc_id", "text")
    val out = textsOf(Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 4))
    assert(out(1L) == "aa bb cc dd tail")
  }

  test("overlapping marked grams merge into ONE island; adjacent islands merge too") {
    // doc 2 copies doc 1's six tokens: with k = 4, doc 2 carries THREE
    // marked grams at pos 0,1,2 — overlapping, one island [0, 6)
    val docs = Seq(
      (1L, "aa bb cc dd ee ff"),
      (2L, "aa bb cc dd ee ff")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "text", "doc_id", k = 4)
    assert(spansOf(spans) == Set((2L, 0L, 6L)), s"got ${spansOf(spans)}")
    val out = textsOf(Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 4))
    assert(out(1L) == "aa bb cc dd ee ff")
    assert(out(2L) == "", "a fully-duplicated doc keeps its row with empty text")
  }

  test("span identity is case-insensitive; surviving text keeps original case") {
    val docs = Seq(
      (1L, "AA BB CC DD EE tail1"),
      (2L, "head2 aa bb cc dd ee")).toDF("doc_id", "text")
    val out = textsOf(Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 5))
    assert(out(1L) == "AA BB CC DD EE tail1", "winner (min id, pos) keeps its case")
    assert(out(2L) == "head2")
  }

  test("docs under k tokens are untouched; no-duplicate corpora come back byte-identical") {
    val docs = Seq(
      (1L, "short doc"),
      (2L, "another   doc with    odd   spacing"),
      (3L, "wholly unique words seven eight nine ten")).toDF("doc_id", "text")
    val out = textsOf(Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 5))
    assert(out == textsOf(docs),
      "untouched docs must not be re-assembled (whitespace preserved)")
    assert(Dedup.duplicateSpans(docs, "text", "doc_id", k = 5).isEmpty)
  }

  test("separated repeats produce TWO islands (the gap survives)") {
    val docs = Seq(
      (1L, "aa bb cc dd"),
      (2L, "ee ff gg hh"),
      (3L, "aa bb cc dd keep me ee ff gg hh")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "text", "doc_id", k = 4)
    assert(spansOf(spans) == Set((3L, 0L, 4L), (3L, 6L, 10L)), s"got ${spansOf(spans)}")
    val out = textsOf(Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 4))
    assert(out(3L) == "keep me")
  }

  test("deterministic across partitionings") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val a = textsOf(Dedup.removeDuplicateSpans(docs.repartition(2), "text", "doc_id", k = 13))
    val b = textsOf(Dedup.removeDuplicateSpans(docs.repartition(17), "text", "doc_id", k = 13))
    assert(a == b)
    // and the fixture actually exercises the operator (planted near-dups
    // share 13-grams — the decontaminate fixture argument)
    assert(a != textsOf(docs), "fixture must contain duplicated 13-token spans")
  }

  test("k = 1 refuses (vocabulary deletion, not dedup); reserved columns refuse") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Dedup.duplicateSpans(docs, "text", "doc_id", k = 1))
    val bad = Seq((1L, "a b c", 0)).toDF("doc_id", "text", "__pos")
    intercept[IllegalArgumentException](
      Dedup.removeDuplicateSpans(bad, "text", "doc_id", k = 2))
  }

  test("across: store hit excises EVERY fresh occurrence; store miss uses the batch winner rule") {
    val base = Seq((0L, "aa bb cc dd tailb")).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "aa bb cc dd tail1 pp qq rr ss"), // store-hit gram AND batch-internal winner of pp..ss
      (3L, "head3 pp qq rr ss")              // batch-internal loser of pp..ss
    ).toDF("doc_id", "text")
    val store = Dedup.substringGramFrame(base, "text", "doc_id", k = 4)
    val spans = spansOf(Dedup.duplicateSpansAcross(fresh, store, "text", "doc_id", k = 4))
    // doc 1's aa..dd duplicates the STORE — marked even though it is
    // the fresh min-(id, pos) occurrence of that gram; doc 1's pp..ss
    // is a store-miss batch winner and survives; doc 3's copy loses
    assert(spans == Set((1L, 0L, 4L), (3L, 1L, 5L)), s"got $spans")
    val out = textsOf(
      Dedup.removeDuplicateSpansAcross(fresh, store, "text", "doc_id", k = 4))
    assert(out(1L) == "tail1 pp qq rr ss")
    assert(out(3L) == "head3")
  }

  test("across on (odd fresh, even base) equals the batch operator's fresh half") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val base = docs.where(col("doc_id") % 2 === 0)
    val fresh = docs.where(col("doc_id") % 2 === 1)
    val across = textsOf(Dedup.removeDuplicateSpansAcross(fresh,
      Dedup.substringGramFrame(base, "text", "doc_id", k = 13),
      "text", "doc_id", k = 13))
    // batch over the union, restricted to fresh docs: base ids < fresh
    // ids is NOT generally true here (ids interleave), so the batch
    // equivalence needs the winner rule to agree — which it does
    // whenever every duplicated gram's winner is in base OR the gram
    // never appears in base. Build the provable comparison instead:
    // re-id base docs BELOW every fresh id, where the across rule and
    // the global min-(id, pos) rule provably coincide.
    val minFresh = fresh.agg(min("doc_id")).head().getLong(0)
    val reIdBase = base.withColumn("doc_id", col("doc_id") - lit(1000000L))
    val unioned = reIdBase.unionByName(fresh)
    val batchFresh = textsOf(
      Dedup.removeDuplicateSpans(unioned, "text", "doc_id", k = 13)
        .where(col("doc_id") >= minFresh))
    val acrossReId = textsOf(Dedup.removeDuplicateSpansAcross(fresh,
      Dedup.substringGramFrame(reIdBase, "text", "doc_id", k = 13),
      "text", "doc_id", k = 13))
    assert(acrossReId == batchFresh,
      "across == batch-on-union's fresh half when base ids precede fresh ids")
    assert(across.keySet == acrossReId.keySet, "re-idding base never changes fresh doc set")
  }

  test("stream drain over two batches equals the batch operator on the concatenation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_substr_stream")
    val b1 = Seq((1L, "aa bb cc dd ee tail1"), (2L, "solo2 unique two")).toDF("doc_id", "text")
    val b2 = Seq(
      (3L, "head3 aa bb cc dd ee"),   // duplicates batch 1 via the store
      (4L, "pp qq rr ss tt pp qq rr ss tt")). // batch-2-internal repeat
      toDF("doc_id", "text")
    b1.coalesce(1).write.parquet(dir.resolve("data").toString)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.resolve("data").toString)
    val got = scala.collection.mutable.Map.empty[Long, String]
    val q = graft.streaming.StreamOps.dedupSubstringPerBatch(
      stream, "text", "doc_id", k = 5) { (cleaned, _) =>
      got.synchronized { got ++= textsOf(cleaned) }
    }
    try {
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(dir.resolve("data").toString)
      q.processAllAvailable()
    } finally q.stop()
    val batch = textsOf(Dedup.removeDuplicateSpans(
      b1.unionByName(b2), "text", "doc_id", k = 5))
    assert(got.toMap == batch,
      "two-batch drain must equal the batch operator when ids arrive in order")
  }

  test("Bloom gram store: honest-size two-batch drain == the exact-store drain; saturated never revives a duplicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_substr_bloom")
    val b1 = Seq((1L, "aa bb cc dd ee tail1"), (2L, "solo2 unique two")).toDF("doc_id", "text")
    val b2 = Seq(
      (3L, "head3 aa bb cc dd ee"),
      (4L, "pp qq rr ss tt pp qq rr ss tt")).toDF("doc_id", "text")
    b1.coalesce(1).write.parquet(dir.resolve("data").toString)
    // exact-store reference drain over both batches
    val gotExact = scala.collection.mutable.Map.empty[Long, String]
    val qe = {
      val stream = spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.resolve("data").toString)
      graft.streaming.StreamOps.dedupSubstringPerBatch(
        stream, "text", "doc_id", k = 5) { (c, _) =>
        gotExact.synchronized { gotExact ++= textsOf(c) } }
    }
    val gotBloom = scala.collection.mutable.Map.empty[Long, String]
    val qb = {
      val stream = spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.resolve("data").toString)
      graft.streaming.StreamOps.dedupSubstringPerBatchBloom(
        stream, "text", "doc_id", k = 5) { (c, _) =>
        gotBloom.synchronized { gotBloom ++= textsOf(c) } }
    }
    try {
      qe.processAllAvailable(); qb.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(dir.resolve("data").toString)
      qe.processAllAvailable(); qb.processAllAvailable()
    } finally { qe.stop(); qb.stop() }
    assert(gotBloom.toMap == gotExact.toMap,
      "an honestly-sized filter must be decision-identical to the exact gram store")
    assert(gotExact(3L) == "head3", "the cross-batch duplicate must have been excised")
    // one-sided under saturation: a deliberately tiny filter may
    // over-excise fresh spans (false positives) but a TRUE duplicate
    // of the store can never survive — surviving text ⊆ exact's
    import graft.operators.ParaBloom
    val tiny = ParaBloom.create(expectedItems = 1, fpp = 0.5) // 64 bits
    tiny.absorb(graft.operators.Dedup.substringGramHashFrame(b1, "text", "doc_id", k = 5))
    val bc = spark.sparkContext.broadcast(tiny.copyStore())
    val out = textsOf(graft.operators.Dedup
      .removeDuplicateSpansAcrossBloom(b2, bc, "text", "doc_id", k = 5))
    val exactOut = textsOf(graft.operators.Dedup.removeDuplicateSpansAcross(b2,
      graft.operators.Dedup.substringGramFrame(b1, "text", "doc_id", k = 5),
      "text", "doc_id", k = 5))
    bc.destroy()
    assert(!out(3L).contains("aa bb cc dd ee"),
      "a true duplicate span must never survive the Bloom store")
    // token-level subset: every surviving token position under the
    // Bloom store also survives under the exact store
    out.foreach { case (id, text) =>
      val b = text.split(" ").filter(_.nonEmpty).toSeq
      val e = exactOut(id).split(" ").filter(_.nonEmpty).toSeq
      assert(b.diff(e).isEmpty,
        s"doc $id: Bloom store may only over-excise, never add back; got '$text' vs '${exactOut(id)}'")
    }
  }

  test("hot-gram cap: decisions identical with the broadcast path forced on (tiny cap)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val default = spansOf(Dedup.duplicateSpans(docs, "text", "doc_id", k = 13)
      .select(col("doc_id"), col("span_start").cast("long"), col("span_end").cast("long")))
    // cap = 2 forces EVERY duplicated gram (count > 2) through the
    // broadcast hot path — the decisions must not move
    val forced = spansOf(Dedup.duplicateSpans(docs, "text", "doc_id", k = 13,
        hotGramCap = 2)
      .select(col("doc_id"), col("span_start").cast("long"), col("span_end").cast("long")))
    assert(forced == default, "hot path must be decision-identical to the shuffle path")
    assert(default.nonEmpty, "fixture must carry duplicated spans or the test has no teeth")
  }

  test("ingest shapes share the hot-gram split: across + Bloom decisions identical at a forced cap") {
    // a first-arrival boilerplate gram is exactly as skewed at ingest
    // as in batch — the store-MISS half must take the same broadcast
    // path (store-hit occurrences never enter the winner shuffle)
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val base = docs.where(col("doc_id") % 2 === 0)
    val fresh = docs.where(col("doc_id") % 2 === 1)
    val store = Dedup.substringGramFrame(base, "text", "doc_id", k = 13)
      .localCheckpoint()
    def spansLong(df: org.apache.spark.sql.DataFrame) = spansOf(
      df.select(col("doc_id"), col("span_start").cast("long"),
        col("span_end").cast("long")))
    val exactDefault = spansLong(
      Dedup.duplicateSpansAcross(fresh, store, "text", "doc_id", k = 13))
    val exactForced = spansLong(
      Dedup.duplicateSpansAcross(fresh, store, "text", "doc_id", k = 13,
        hotGramCap = 2))
    assert(exactForced == exactDefault,
      "across hot path must be decision-identical to the shuffle path")
    assert(exactDefault.nonEmpty, "fixture must carry cross-half spans")
    val bloom = graft.operators.ParaBloom.create(1L << 16, 1e-6)
    bloom.absorb(Dedup.substringGramHashFrame(base, "text", "doc_id", k = 13))
    val bc = spark.sparkContext.broadcast(bloom)
    val bloomDefault = spansLong(
      Dedup.duplicateSpansAcrossBloom(fresh, bc, "text", "doc_id", k = 13))
    val bloomForced = spansLong(
      Dedup.duplicateSpansAcrossBloom(fresh, bc, "text", "doc_id", k = 13,
        hotGramCap = 2))
    assert(bloomForced == bloomDefault,
      "Bloom hot path must be decision-identical to the shuffle path")
    bc.destroy()
  }
}
