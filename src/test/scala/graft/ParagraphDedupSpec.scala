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

  test("dedupParagraphsAcross drops paragraphs ever shipped before, bypass passes the store") {
    val seen = Seq("shared cookie banner").toDF("__para")
    val batch = Seq(
      (10L, "fresh paragraph ten\nshared cookie banner\nok"),
      (11L, "fresh paragraph ten\nanother fresh line\nok")
    ).toDF("doc_id", "text")
    // minLen=3: "ok" bypasses both the store and within-batch dedup;
    // the banner drops everywhere (seen); "fresh paragraph ten" keeps
    // only its (10, 0) occurrence
    val out = textsOf(Dedup.dedupParagraphsAcross(batch, seen, "text", "doc_id", minLen = 3))
    assert(out(10L) == "fresh paragraph ten\nok")
    assert(out(11L) == "another fresh line\nok")
    // empty store == the batch operator
    val empty = spark.createDataset(Seq.empty[String])(
      org.apache.spark.sql.Encoders.STRING).toDF("__para")
    assert(textsOf(Dedup.dedupParagraphsAcross(batch, empty, "text", "doc_id", minLen = 3)) ==
      textsOf(Dedup.dedupParagraphs(batch, "text", "doc_id", minLen = 3)))
  }

  test("a store polluted with sub-minLen strings cannot delete bypass paragraphs") {
    // regression (r9 ADVICE): the anti-join used to run BEFORE the
    // minLen bypass check, so a store containing short strings (built
    // by other means than paragraphFrame) silently deleted bypass
    // paragraphs from every batch document
    val polluted = Seq("ok", "shared cookie banner").toDF("__para")
    val batch = Seq((10L, "fresh paragraph ten\nshared cookie banner\nok"))
      .toDF("doc_id", "text")
    val out = textsOf(Dedup.dedupParagraphsAcross(batch, polluted, "text", "doc_id", minLen = 3))
    assert(out(10L) == "fresh paragraph ten\nok",
      s"bypass paragraph 'ok' must survive a polluted store, got ${out(10L)}")
  }

  test("hashed 128-bit store is decision-identical to the string store across batches") {
    // batch 1 ships; its paragraphs enter BOTH store shapes; batch 2
    // must lose exactly the same occurrences under either store
    val batch1 = Seq(
      (1L, "unique intro one\nshared cookie banner\nok"),
      (2L, "shared cookie banner\nunique body two")).toDF("doc_id", "text")
    val batch2 = Seq(
      (3L, "unique article three\nshared cookie banner\nunique body two\nok"),
      (4L, "shared cookie banner")).toDF("doc_id", "text")
    val emptyS = Seq.empty[String].toDF("__para")
    val emptyH = Seq.empty[(Long, Long)].toDF("__h1", "__h2")
    // string path
    val s1 = Dedup.dedupParagraphsAcross(batch1, emptyS, "text", "doc_id", minLen = 3)
    val storeS = Dedup.paragraphFrame(s1, "text", minLen = 3)
    val s2 = Dedup.dedupParagraphsAcross(batch2, storeS, "text", "doc_id", minLen = 3)
    // hashed path
    val h1 = Dedup.dedupParagraphsAcrossHashed(batch1, emptyH, "text", "doc_id", minLen = 3)
    val storeH = Dedup.paragraphHashFrame(h1, "text", minLen = 3)
    val h2 = Dedup.dedupParagraphsAcrossHashed(batch2, storeH, "text", "doc_id", minLen = 3)
    assert(textsOf(h1) == textsOf(s1))
    assert(textsOf(h2) == textsOf(s2))
    // and the cross-batch drop really happened: doc 3 keeps only its
    // fresh paragraph plus the bypass "ok"
    assert(textsOf(h2)(3L) == "unique article three\nok")
    assert(!textsOf(h2).contains(4L))
    // the hashed store is two longs per paragraph, not text
    assert(storeH.schema.fields.map(_.dataType.typeName).toSeq == Seq("long", "long"))
  }

  test("the store's second hash is seed-independent, not a chain of the first") {
    // Spark folds multi-arg xxhash64 left-to-right using the running
    // hash as the next seed, so the TEXT-FIRST form
    // xxhash64(para, salt) computes hash(salt, seed = h1) — a pure
    // function of h1, silently collapsing the 128-bit store to 64-bit
    // collision resistance. The store must use the SALT-FIRST form
    // (h2 = hash of the paragraph bytes under an unrelated seed); this
    // pins that the two forms actually differ and that __h2 is the
    // salt-first one, so an argument-order swap can't slip back in.
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    val paras = Seq("alpha beta", "gamma delta epsilon", "", "z").map(p => (0L, p))
      .toDF("doc_id", "text")
    val check = paras.select(
        xxhash64(col("text")).as("h1"),
        xxhash64(lit(Dedup.ParaHashSalt), col("text")).as("saltFirst"),
        xxhash64(col("text"), lit(Dedup.ParaHashSalt)).as("textFirst"))
      .collect()
    check.foreach { r =>
      assert(r.getLong(1) != r.getLong(2),
        "salt-first and text-first forms coincided — the test lost its teeth")
    }
    val storePairs = Dedup.paragraphHashFrame(paras, "text", minLen = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    check.filter(r => storePairs.contains(r.getLong(0))).foreach { r =>
      assert(storePairs(r.getLong(0)) == r.getLong(1),
        "__h2 must be the salt-first (independent-seed) hash")
      assert(storePairs(r.getLong(0)) != r.getLong(2),
        "__h2 must NOT be the h1-chained text-first hash")
    }
  }

  test("hashed store: bypass paragraphs never consult the store") {
    val polluted = Dedup.paragraphHashFrame(
      Seq((0L, "ok\nshared cookie banner")).toDF("doc_id", "text"), "text", minLen = 1)
    val batch = Seq((10L, "fresh paragraph ten\nshared cookie banner\nok"))
      .toDF("doc_id", "text")
    // store built at minLen=1 contains the hash of "ok"; at minLen=3
    // "ok" is bypass and must survive anyway
    val out = textsOf(Dedup.dedupParagraphsAcrossHashed(batch, polluted, "text", "doc_id", minLen = 3))
    assert(out(10L) == "fresh paragraph ten\nok")
  }

  test("streaming dedupParagraphsPerBatch drains to the batch operator's output") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream_paradedup")
    val batch1 = Seq(
      (1L, "unique intro one\nshared cookie banner\nbody of doc one"),
      (2L, "shared cookie banner\nunique body two")).toDF("doc_id", "text")
    val batch2 = Seq(
      (3L, "unique article three\nshared cookie banner\nbody of doc one"),
      (4L, "shared cookie banner")).toDF("doc_id", "text")
    batch1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    batch2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    // order the two files by modification time so arrival order == id order
    val Seq(f1, f2) = Seq("b1", "b2").map(b =>
      new java.io.File(dir.resolve(b).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Map.empty[Long, String]
    val q = graft.streaming.StreamOps.dedupParagraphsPerBatch(
      stream, "text", "doc_id") { (cleaned, _) =>
      got.synchronized { got ++= textsOf(cleaned) }
    }
    try q.processAllAvailable() finally q.stop()
    val want = textsOf(Dedup.dedupParagraphs(
      batch1.unionByName(batch2), "text", "doc_id"))
    assert(got.toMap == want, s"stream $got vs batch $want")
    // the cross-batch drop actually happened: doc 3 lost both repeats
    assert(got(3L) == "unique article three")
    assert(!got.contains(4L))
    // the hashed-store twin drains to the identical output
    val gotH = scala.collection.mutable.Map.empty[Long, String]
    val qh = graft.streaming.StreamOps.dedupParagraphsPerBatch(
      stream, "text", "doc_id", hashedStore = true) { (cleaned, _) =>
      gotH.synchronized { gotH ++= textsOf(cleaned) }
    }
    try qh.processAllAvailable() finally qh.stop()
    assert(gotH.toMap == want, s"hashed stream $gotH vs batch $want")
  }

  test("separator is literal, not regex") {
    val df = Seq((1L, "a.b"), (2L, "a.b")).toDF("doc_id", "text")
    // "." must split on the literal dot (both docs' "a"/"b" dedup),
    // not on every character
    val out = textsOf(Dedup.dedupParagraphs(df, "text", "doc_id", sep = "."))
    assert(out == Map(1L -> "a.b"))
  }
}
