package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, ParaBloom, ParaBloomBank}

/** The sharded Bloom store (r13 VERDICT #1): a hash-partitioned filter
  * bank that lifts the single filter's 2³¹-bit cap while keeping every
  * contract of the single-filter tier — no false negatives, one-sided
  * fpp at the design rate, decision-identity to the exact store when
  * honestly sized, bounded per-task delta builds, save/load restart. */
class ParaBloomBankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def textsOf(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("no false negatives across shards; whole-bank fpp stays near the design rate") {
    val bank = ParaBloomBank.create(expectedItems = 8000, fpp = 0.01, numShards = 4)
    val rnd = new scala.util.Random(42)
    val ins = Array.fill(8000)((rnd.nextLong(), rnd.nextLong()))
    ins.foreach { case (h1, h2) => bank.add(h1, h2) }
    assert(ins.forall { case (h1, h2) => bank.mightContain(h1, h2) },
      "every inserted pair must probe positive — the route is a pure function of h1")
    val fresh = Array.fill(40000)((rnd.nextLong(), rnd.nextLong()))
    val fp = fresh.count { case (h1, h2) => bank.mightContain(h1, h2) }
    // a probe consults exactly one shard sized for its share at 1%
    assert(fp <= 1200, s"bank false-positive rate ${fp / 40000.0} blew past 3× the 1% design")
    // the uniform route loaded every shard: all four carry bits, and
    // fills sit within a loose band of each other (binomial spread)
    val fills = bank.fillRatios
    assert(fills.length == 4 && fills.forall(_ > 0.3),
      s"all shards must carry their share, got ${fills.toSeq}")
    assert(fills.max / fills.min < 1.3,
      s"uniform route should balance shards, got ${fills.toSeq}")
    assert(bank.approxFpps.length == 4)
    // total state matches the single-filter bits-per-item budget
    val single = ParaBloom.create(8000, 0.01)
    assert(math.abs(bank.sizeBytes - single.sizeBytes) <= 4 * 64,
      s"bank total ${bank.sizeBytes} B vs single ${single.sizeBytes} B")
    // and the design capacity reconstructs to what it was sized for —
    // within the k = round(m/n·ln2) integer-rounding slack (~±8%)
    assert(math.abs(bank.designItems - 8000L) <= 800,
      s"designItems ${bank.designItems} drifted from the create-time 8000")
  }

  test("distributed fromHashFrame == driver-side adds (identical decisions), empty delta is empty") {
    val paras = Seq((1L, "alpha\nbeta\ngamma"), (2L, "delta\nepsilon\nzeta"))
      .toDF("doc_id", "text")
    val hashes = Dedup.paragraphHashFrame(paras, "text")
    val proto = ParaBloomBank.create(1024, 0.001, numShards = 4)
    val dist = ParaBloomBank.fromHashFrame(hashes.repartition(5), proto)
    val local = ParaBloomBank.emptyLike(proto)
    hashes.collect().foreach(r => local.add(r.getLong(0), r.getLong(1)))
    val rnd = new scala.util.Random(7)
    (0 until 5000).foreach { _ =>
      val h1 = rnd.nextLong(); val h2 = rnd.nextLong()
      assert(dist.mightContain(h1, h2) == local.mightContain(h1, h2),
        s"distributed and driver-side banks disagree on ($h1, $h2)")
    }
    assert(dist.fillRatios.toSeq == local.fillRatios.toSeq,
      "same inserts must set the same per-shard bits")
    assert(ParaBloomBank.fromHashFrame(hashes.limit(0), proto).maxFillRatio == 0.0,
      "empty delta must be the empty bank")
  }

  test("honestly sized bank: batch decisions identical to the exact string store AND to a single filter") {
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
    def run(store: graft.operators.BloomStore,
        b: org.apache.spark.sql.DataFrame) = {
      val bc = spark.sparkContext.broadcast(store.copyStore())
      val out = Dedup.dedupParagraphsAcrossBloom(b, bc, "text", "doc_id", minLen = 3)
        .localCheckpoint(true)
      store.absorb(Dedup.paragraphHashFrame(out, "text", minLen = 3))
      bc.destroy(); out
    }
    val bank = ParaBloomBank.create(1024, 1e-4, numShards = 4)
    val single = ParaBloom.create(1024, 1e-4)
    val (b1, f1) = (textsOf(run(bank, batch1)), textsOf(run(single, batch1)))
    val (b2, f2) = (textsOf(run(bank, batch2)), textsOf(run(single, batch2)))
    assert(b1 == textsOf(s1) && b2 == textsOf(s2),
      "honestly sized bank must equal the exact store")
    assert(b1 == f1 && b2 == f2, "bank and single filter must decide identically here")
  }

  test("save/load round trip is decision-identical; corrupt banks refuse") {
    val bank = ParaBloomBank.create(4096, 0.01, numShards = 5)
    val rnd = new scala.util.Random(7)
    val inserted = Seq.fill(3000)((rnd.nextLong(), rnd.nextLong()))
    inserted.foreach { case (h1, h2) => bank.add(h1, h2) }
    val dir = java.nio.file.Files.createTempDirectory("graft_bank").toString + "/bank"
    ParaBloomBank.save(bank, dir)
    val re = ParaBloomBank.load(dir)
    assert(re.numShards == 5 && re.sizeBytes == bank.sizeBytes)
    assert(re.fillRatios.toSeq == bank.fillRatios.toSeq)
    assert(inserted.forall { case (h1, h2) => re.mightContain(h1, h2) })
    val probes = Seq.fill(3000)((rnd.nextLong(), rnd.nextLong()))
    assert(probes.forall { case (h1, h2) =>
      re.mightContain(h1, h2) == bank.mightContain(h1, h2) })
    // refusals: missing manifest, missing shard file, mixed geometry
    val noManifest = java.nio.file.Files.createTempDirectory("graft_bank_bad").toString
    intercept[Exception](ParaBloomBank.load(noManifest))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "shard-00003.bloom"))
    intercept[Exception](ParaBloomBank.load(dir))
    // mixed geometry: overwrite a shard with a differently-sized filter
    ParaBloom.save(ParaBloom.create(10, 0.5), s"$dir/shard-00003.bloom")
    intercept[IllegalArgumentException](ParaBloomBank.load(dir))
  }

  test("orInPlace unions shard-wise; bank shape mismatch refuses") {
    val a = ParaBloomBank.create(1000, 0.01, 4)
    val b = ParaBloomBank.create(1000, 0.01, 4)
    a.add(1L, 2L); b.add(3L, 4L)
    a.orInPlace(b)
    assert(a.mightContain(1L, 2L) && a.mightContain(3L, 4L))
    intercept[IllegalArgumentException](
      a.orInPlace(ParaBloomBank.create(1000, 0.01, 8)))
  }

  test("streaming bank store drains to the batch operator's output; restart via save/load continues exactly") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stream_bank")
    val batch1 = Seq(
      (1L, "unique intro one\nshared cookie banner\nbody of doc one"),
      (2L, "shared cookie banner\nunique body two")).toDF("doc_id", "text")
    val batch2 = Seq(
      (3L, "unique article three\nshared cookie banner\nbody of doc one"),
      (4L, "shared cookie banner")).toDF("doc_id", "text")
    batch1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    batch2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val got = scala.collection.mutable.Map.empty[Long, String]
    // phase 1: fresh caller-owned bank over the first shard
    val bank1 = ParaBloomBank.create(1024, 1e-4, numShards = 4)
    val s1 = spark.readStream.schema(batch1.schema).parquet(dir.resolve("b1").toString)
    val q1 = graft.streaming.StreamOps.dedupParagraphsPerBatchBloomFrom(
      s1, "text", "doc_id", "\n", 1, bank1) { (cleaned, _) =>
      got.synchronized { got ++= textsOf(cleaned) }
    }
    try q1.processAllAvailable() finally q1.stop()
    val store = dir.resolve("bank").toString
    ParaBloomBank.save(bank1, store)
    // phase 2: RESTART — a new StreamingQuery resumes against the
    // reopened bank; cross-batch drops only happen if the reloaded
    // shards still carry phase 1's paragraphs
    val bank2 = ParaBloomBank.load(store)
    val s2 = spark.readStream.schema(batch2.schema).parquet(dir.resolve("b2").toString)
    val q2 = graft.streaming.StreamOps.dedupParagraphsPerBatchBloomFrom(
      s2, "text", "doc_id", "\n", 1, bank2) { (cleaned, _) =>
      got.synchronized { got ++= textsOf(cleaned) }
    }
    try q2.processAllAvailable() finally q2.stop()
    val want = textsOf(Dedup.dedupParagraphs(batch1.unionByName(batch2), "text", "doc_id"))
    assert(got.toMap == want, s"restarted bank stream $got vs batch $want")
  }
}
