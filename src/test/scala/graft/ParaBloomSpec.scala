package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, ParaBloom}

/** The bounded-memory Bloom tier of the streaming seen-paragraph store
  * (r12 VERDICT #1): fixed memory independent of inserts, no false
  * negatives, one-sided conservative error (survivors ⊆ the exact
  * store's), decision-identity to the exact store when honestly sized,
  * and the distributed no-collect delta build. */
class ParaBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def textsOf(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def parasOf(texts: Map[Long, String], sep: String = "\n"): Set[String] =
    texts.values.flatMap(_.split(java.util.regex.Pattern.quote(sep), -1)).toSet

  test("memory is fixed at create time: inserting 10× the design n never grows it") {
    val b = ParaBloom.create(expectedItems = 1000, fpp = 0.01)
    val size0 = b.sizeBytes
    // textbook sizing: m = ceil(-n ln p / ln²2) ≈ 9.585 bits/item at 1%
    assert(size0 * 8 >= 9585 && size0 * 8 <= 9585 + 64,
      s"sizing drifted from the formula: ${size0 * 8} bits for n=1000 p=1%")
    var i = 0L
    while (i < 10000) { b.add(i * 0x9e3779b97f4a7c15L, i + 7); i += 1 }
    assert(b.sizeBytes == size0, "a Bloom filter must never grow")
    // overfeeding is VISIBLE: fill beyond the ~50% design point
    assert(b.fillRatio > 0.5 && b.approxFpp > 0.01,
      s"10× overfeed must saturate past design fpp, fill=${b.fillRatio}")
  }

  test("no false negatives, and fpp at design load stays near the promise") {
    val b = ParaBloom.create(expectedItems = 2000, fpp = 0.01)
    val rnd = new scala.util.Random(42)
    val ins = Array.fill(2000)((rnd.nextLong(), rnd.nextLong()))
    ins.foreach { case (h1, h2) => b.add(h1, h2) }
    assert(ins.forall { case (h1, h2) => b.mightContain(h1, h2) },
      "every inserted pair must probe positive")
    val fresh = Array.fill(20000)((rnd.nextLong(), rnd.nextLong()))
    val fp = fresh.count { case (h1, h2) => b.mightContain(h1, h2) }
    // expected ~1%; allow 3× slack for the fixed seed
    assert(fp <= 600, s"false-positive rate ${fp / 20000.0} blew past 3× the 1% design")
  }

  test("orInPlace is the set union; geometry mismatch refuses") {
    val a = ParaBloom.create(100, 0.01); val b = ParaBloom.create(100, 0.01)
    a.add(1L, 2L); b.add(3L, 4L)
    a.orInPlace(b)
    assert(a.mightContain(1L, 2L) && a.mightContain(3L, 4L))
    intercept[IllegalArgumentException] {
      a.orInPlace(ParaBloom.create(100000, 0.01))
    }
  }

  test("fromHashFrame builds the same filter as driver-side adds, rows never collected") {
    val paras = Seq((1L, "alpha\nbeta\ngamma"), (2L, "delta\nepsilon")).toDF("doc_id", "text")
    val hashes = Dedup.paragraphHashFrame(paras, "text")
    val proto = ParaBloom.create(1024, 0.001)
    val dist = ParaBloom.fromHashFrame(hashes.repartition(5), proto)
    val local = ParaBloom.emptyLike(proto)
    hashes.collect().foreach(r => local.add(r.getLong(0), r.getLong(1)))
    // same bits ⇒ same decisions on a probe battery
    val rnd = new scala.util.Random(7)
    (0 until 5000).foreach { _ =>
      val h1 = rnd.nextLong(); val h2 = rnd.nextLong()
      assert(dist.mightContain(h1, h2) == local.mightContain(h1, h2))
    }
    assert(ParaBloom.fromHashFrame(hashes.limit(0), proto).fillRatio == 0.0,
      "empty delta must be the empty filter")
  }

  test("honestly sized: batch decisions are identical to the exact string store") {
    val batch1 = Seq(
      (1L, "unique intro one\nshared cookie banner\nok"),
      (2L, "shared cookie banner\nunique body two")).toDF("doc_id", "text")
    val batch2 = Seq(
      (3L, "unique article three\nshared cookie banner\nunique body two\nok"),
      (4L, "shared cookie banner")).toDF("doc_id", "text")
    val emptyS = Seq.empty[String].toDF("__para")
    val s1 = Dedup.dedupParagraphsAcross(batch1, emptyS, "text", "doc_id", minLen = 3)
    val s2 = Dedup.dedupParagraphsAcross(batch2,
      Dedup.paragraphFrame(s1, "text", minLen = 3), "text", "doc_id", minLen = 3)
    val bloom = ParaBloom.create(1024, 1e-4)
    def run(b: org.apache.spark.sql.DataFrame) = {
      val bc = spark.sparkContext.broadcast(bloom.copy())
      val out = Dedup.dedupParagraphsAcrossBloom(b, bc, "text", "doc_id", minLen = 3)
        .localCheckpoint(true)
      bloom.orInPlace(ParaBloom.fromHashFrame(
        Dedup.paragraphHashFrame(out, "text", minLen = 3), bloom))
      bc.destroy(); out
    }
    assert(textsOf(run(batch1)) == textsOf(s1))
    assert(textsOf(run(batch2)) == textsOf(s2))
  }

  test("undersized filter: data loss is one-sided — survivors ⊆ exact, duplicates still never survive") {
    // 1 expected item for a 40-paragraph corpus forces false positives
    // (at most a handful of bits total); the failure mode must be
    // DROPPED FRESH paragraphs only, never a surviving duplicate
    val docs = (1L to 20L).map(i => (i, s"fresh paragraph number $i\nshared cookie banner"))
      .toDF("doc_id", "text")
    val exact = Dedup.dedupParagraphs(docs, "text", "doc_id")
    val tiny = ParaBloom.create(1, 0.5) // 64 bits, saturates immediately
    val bc0 = spark.sparkContext.broadcast(tiny.copy())
    val out1 = Dedup.dedupParagraphsAcrossBloom(docs.where(col("doc_id") <= 10), bc0,
      "text", "doc_id").localCheckpoint(true)
    tiny.orInPlace(ParaBloom.fromHashFrame(Dedup.paragraphHashFrame(out1, "text"), tiny))
    val bc1 = spark.sparkContext.broadcast(tiny.copy())
    val out2 = Dedup.dedupParagraphsAcrossBloom(docs.where(col("doc_id") > 10), bc1,
      "text", "doc_id").localCheckpoint(true)
    val bloomParas = parasOf(textsOf(out1)) ++ parasOf(textsOf(out2))
    val exactParas = parasOf(textsOf(exact))
    assert(bloomParas.subsetOf(exactParas),
      s"Bloom survivors must be ⊆ exact survivors; extra: ${bloomParas -- exactParas}")
    // the saturated filter really did bite (strictly fewer survivors)
    assert(tiny.fillRatio > 0.9, "64-bit filter must saturate on 20+ paragraphs")
    assert(bloomParas.size < exactParas.size,
      "a saturated filter that drops nothing means the test lost its teeth")
    // and the shared banner survived at most once across the run
    val bannerDocs = (textsOf(out1) ++ textsOf(out2)).values
      .count(_.contains("shared cookie banner"))
    assert(bannerDocs <= 1, "duplicates must never survive, even saturated")
  }

  test("streaming Bloom store drains to the batch operator's output when honestly sized") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream_bloom")
    val batch1 = Seq(
      (1L, "unique intro one\nshared cookie banner\nbody of doc one"),
      (2L, "shared cookie banner\nunique body two")).toDF("doc_id", "text")
    val batch2 = Seq(
      (3L, "unique article three\nshared cookie banner\nbody of doc one"),
      (4L, "shared cookie banner")).toDF("doc_id", "text")
    batch1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    batch2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val Seq(f1, f2) = Seq("b1", "b2").map(b =>
      new java.io.File(dir.resolve(b).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Map.empty[Long, String]
    val q = graft.streaming.StreamOps.dedupParagraphsPerBatchBloom(
      stream, "text", "doc_id", expectedItems = 1024, fpp = 1e-4) { (cleaned, _) =>
      got.synchronized { got ++= textsOf(cleaned) }
    }
    try q.processAllAvailable() finally q.stop()
    val want = textsOf(Dedup.dedupParagraphs(
      batch1.unionByName(batch2), "text", "doc_id"))
    assert(got.toMap == want, s"bloom stream $got vs batch $want")
    assert(got(3L) == "unique article three")
    assert(!got.contains(4L))
  }

  test("save/load round trip is decision-identical; corrupt files refuse") {
    val b = ParaBloom.create(expectedItems = 4096, fpp = 0.01)
    val rnd = new scala.util.Random(7)
    val inserted = Seq.fill(3000)((rnd.nextLong(), rnd.nextLong()))
    inserted.foreach { case (h1, h2) => b.add(h1, h2) }
    val path = java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/store.bloom"
    ParaBloom.save(b, path)
    val re = ParaBloom.load(path)
    assert(re.numHashes == b.numHashes && re.numBits == b.numBits)
    assert(re.fillRatio == b.fillRatio)
    // identical decisions on members AND on a fresh probe set
    assert(inserted.forall { case (h1, h2) => re.mightContain(h1, h2) })
    val probes = Seq.fill(3000)((rnd.nextLong(), rnd.nextLong()))
    assert(probes.forall { case (h1, h2) =>
      re.mightContain(h1, h2) == b.mightContain(h1, h2) })
    // a reopened store keeps accepting inserts (restart continuation)
    val (h1, h2) = (12345L, 67890L)
    re.add(h1, h2)
    assert(re.mightContain(h1, h2))
    // refusal on garbage, truncation, and wrong magic
    val bad = path + ".bad"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad), Array[Byte](1, 2, 3))
    intercept[IllegalArgumentException](ParaBloom.load(bad))
    val truncated = path + ".trunc"
    java.nio.file.Files.write(java.nio.file.Paths.get(truncated),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)).take(32))
    intercept[IllegalArgumentException](ParaBloom.load(truncated))
  }

  test("stream RESTART: save the store, reopen it, resume a NEW stream - decisions continue exactly") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_bloom_restart")
    val batch1 = Seq(
      (1L, "unique intro one\nshared cookie banner\nbody of doc one"),
      (2L, "shared cookie banner\nunique body two")).toDF("doc_id", "text")
    val batch2 = Seq(
      (3L, "unique article three\nshared cookie banner\nbody of doc one"),
      (4L, "shared cookie banner")).toDF("doc_id", "text")
    batch1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    batch2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val got = scala.collection.mutable.Map.empty[Long, String]
    // phase 1: a fresh caller-owned store over the first shard only
    val bloom1 = ParaBloom.create(expectedItems = 1024, fpp = 1e-4)
    val s1 = spark.readStream.schema(batch1.schema).parquet(dir.resolve("b1").toString)
    val q1 = graft.streaming.StreamOps.dedupParagraphsPerBatchBloomFrom(
      s1, "text", "doc_id", "\n", 1, bloom1) { (cleaned, _) =>
      got.synchronized { got ++= textsOf(cleaned) }
    }
    try q1.processAllAvailable() finally q1.stop()
    val store = dir.resolve("store.bloom").toString
    ParaBloom.save(bloom1, store)
    // phase 2: the RESTART - a brand-new StreamingQuery over the next
    // shard resumes against the REOPENED filter; doc 3's banner and
    // "body of doc one" can only drop if the reopened store still
    // carries phase 1's paragraphs
    val bloom2 = ParaBloom.load(store)
    val s2 = spark.readStream.schema(batch2.schema).parquet(dir.resolve("b2").toString)
    val q2 = graft.streaming.StreamOps.dedupParagraphsPerBatchBloomFrom(
      s2, "text", "doc_id", "\n", 1, bloom2) { (cleaned, _) =>
      got.synchronized { got ++= textsOf(cleaned) }
    }
    try q2.processAllAvailable() finally q2.stop()
    val want = textsOf(Dedup.dedupParagraphs(batch1.unionByName(batch2), "text", "doc_id"))
    assert(got.toMap == want, s"restarted bloom stream $got vs batch $want")
  }

  test("codegen probe expression == direct mightContain, stays inside WholeStageCodegen, refuses non-long inputs") {
    // the BloomMightContain expression replaced the two-long Scala UDF
    // (r15 audit note): decisions must be identical on every row, the
    // filter must stay inside the generated loop (no UDF boxing
    // boundary), and the interpreted path (nullSafeEval) must agree
    // with codegen
    val bloom = ParaBloom.create(1000, 0.01)
    (0L until 500L).foreach(i => bloom.add(i * 31 + 7, i * 17 + 3))
    val bc = spark.sparkContext.broadcast(bloom)
    val df = spark.range(1000).toDF("i")
      .select(col("i"), (col("i") * 31 + 7).as("h1"), (col("i") * 17 + 3).as("h2"))
    val got = df.withColumn("__seen",
        graft.expressions.BloomMightContain.probe(bc)(col("h1"), col("h2")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val want = (0L until 1000L)
      .map(i => i -> bloom.mightContain(i * 31 + 7, i * 17 + 3)).toMap
    assert(got == want, "expression decisions must equal direct store probes")
    assert((0L until 500L).forall(got(_)), "no false negatives through the expression")
    // interpreted path agrees (codegen fallback safety)
    val e = graft.expressions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(123L),
      org.apache.spark.sql.catalyst.expressions.Literal(456L), bc)
    assert(e.eval(null) == bloom.mightContain(123L, 456L))
    // the probe compiles INTO the whole-stage-generated filter — the
    // entire point of replacing the UDF
    val plan = df.where(graft.expressions.BloomMightContain.probe(bc)(
      col("h1"), col("h2"))).queryExecution.executedPlan.toString
    // the `*(n)` prefix is the whole-stage-codegen marker: the Filter
    // carrying the probe must sit inside a generated stage
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter bloom_might_contain") && l.trim.startsWith("+- *(")),
      s"probe filter must be whole-stage-codegen'd:\n$plan")
    assert(!plan.contains("UDF"), s"no UDF boundary expected:\n$plan")
    // type check refuses non-long hashes
    val bad = graft.expressions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(2L), bc)
    assert(bad.checkInputDataTypes().isFailure)
  }
}
