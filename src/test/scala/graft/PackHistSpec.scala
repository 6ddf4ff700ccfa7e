package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** SPFHP histogram packing (Kosec, Fu & Krell 2021): documents pack
  * whole into fixed-capacity sequences — shortest-pack-first greedy
  * on the length histogram, deterministic pack ids via rank
  * arithmetic, packs never overflow, rows never drop. */
class PackHistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def packsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand-traced SPFHP strategy: shortest-pack-first, depth cap, deterministic order") {
    val docs = Seq((1L, 8), (2L, 5), (3L, 5), (4L, 4), (5L, 2), (6L, 2), (7L, 1))
      .toDF("doc_id", "len")
    val st = TextAnalysis.fitPackStrategy(docs, "len", maxLen = 10, maxPerPack = 3)
    // trace: 8 opens [8](rem 2); the two 5s self-fill [5,5] (closed);
    // 4 opens [4](rem 6); first 2 joins the TIGHTEST fit [8] -> [8,2]
    // (rem 0, closed); second 2 joins [4] -> [4,2]; 1 joins [4,2] ->
    // [4,2,1] (depth 3, closed). Pinned descending-lex order:
    assert(st.types.map(t => (t.lengths, t.count)) ==
      Seq((Vector(8, 2), 1L), (Vector(5, 5), 1L), (Vector(4, 2, 1), 1L)),
      s"got ${st.types}")
    assert(st.numPacks == 3 && st.paddingTokens == 3)
    // assignment replays the same order: rank-within-length arithmetic
    val got = packsOf(TextAnalysis.packWithStrategy(docs, st, "len", "doc_id"))
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 0L, 6L -> 2L, 7L -> 2L), s"got $got")
  }

  // reference: the paper's loop, one sequence at a time
  private def oneAtATime(lens: Seq[Int], maxLen: Int,
      maxPerPack: Int): Map[Vector[Int], Long] = {
    val open = scala.collection.mutable.ArrayBuffer.empty[Vector[Int]]
    val done = scala.collection.mutable.ArrayBuffer.empty[Vector[Int]]
    for (l <- lens.sorted(Ordering.Int.reverse)) {
      val fits = open.zipWithIndex.filter { case (p, _) => maxLen - p.sum >= l }
      if (fits.isEmpty) open += Vector(l)
      else {
        // smallest remaining space; composition tie-break like the operator
        implicit val vecOrd: Ordering[Vector[Int]] =
          Ordering.Implicits.seqOrdering[Vector, Int]
        val i = fits.minBy { case (p, _) =>
          (maxLen - p.sum,
            p.map(x => -x) ++ Vector.fill(maxPerPack - p.length)(0)) }._2
        open(i) = open(i) :+ l
      }
      val (full, rest) = open.partition(p =>
        p.length >= maxPerPack || maxLen - p.sum < 1)
      done ++= full
      open.clear(); open ++= rest
    }
    (done ++ open).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  test("bulk histogram loop is decision-identical to the published one-at-a-time SPFHP") {
    // many seeds, not one (r15 ADVICE: the pre-depth-fill loop passed
    // the single-seed version of this test by luck)
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val lens = Seq.fill(400)(1 + rnd.nextInt(64))
      val want = oneAtATime(lens, maxLen = 64, maxPerPack = 3)
      val st = TextAnalysis.fitPackStrategy(
        lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "len"),
        "len", maxLen = 64, maxPerPack = 3)
      assert(st.types.map(t => t.lengths -> t.count).toMap == want,
        s"bulk strategy diverged from the one-at-a-time reference (seed $seed)")
    }
  }

  test("depth-fill: multiple open copies absorb a same-length run one pack at a time") {
    // r15 ADVICE counterexample: two open [50]s and two 7s must yield
    // {[50,7,7], [50]} (the one-at-a-time depth fill), NOT {[50,7]:2}
    // (the old one-per-pack bulk append)
    val lens = Seq(50, 50, 7, 7)
    val st = TextAnalysis.fitPackStrategy(
      lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "len"),
      "len", maxLen = 64, maxPerPack = 3)
    assert(st.types.map(t => t.lengths -> t.count).toMap ==
      Map(Vector(50, 7, 7) -> 1L, Vector(50) -> 1L), s"got ${st.types}")
    assert(st.types.map(t => t.lengths -> t.count).toMap ==
      oneAtATime(lens, 64, 3))
  }

  test("stale strategy refuses instead of silently dropping uncovered rows") {
    // r15 ADVICE: the rank→pack range join is inner — a strategy fit
    // on a DIFFERENT frame must refuse, not let rows vanish
    val fitted = TextAnalysis.fitPackStrategy(
      Seq((1L, 5), (2L, 6)).toDF("doc_id", "len"), "len", maxLen = 64)
    // surplus rows of a covered length
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.packWithStrategy(
        Seq((1L, 5), (2L, 5), (3L, 6)).toDF("doc_id", "len"),
        fitted, "len", "doc_id")
    }.getMessage.contains("not fit on this frame"))
    // a length the strategy never saw
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.packWithStrategy(
        Seq((1L, 5), (2L, 6), (3L, 7)).toDF("doc_id", "len"),
        fitted, "len", "doc_id")
    }.getMessage.contains("not fit on this frame"))
    // missing rows (phantom pack ids) refuse too
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.packWithStrategy(
        Seq((1L, 5)).toDF("doc_id", "len"), fitted, "len", "doc_id")
    }.getMessage.contains("not fit on this frame"))
  }

  test("uniform-length degenerate: pack_id == rank / floor(maxLen/len) closed form") {
    val docs = (0L until 37L).map(i => (i * 3 + 1, 10)).toDF("doc_id", "len")
    val out = TextAnalysis.packSequencesHist(docs, "len", "doc_id",
      maxLen = 64, maxPerPack = 4)
    val got = packsOf(out)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    ids.zipWithIndex.foreach { case (id, rank) =>
      assert(got(id) == rank / 4, s"doc $id rank $rank: ${got(id)}")
    }
  }

  test("invariants on the fixture corpus: no overflow, no drops, depth cap, determinism") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("int").as("len"))
      .where(col("len").between(1, 64))
    val n = docs.count()
    val out = TextAnalysis.packSequencesHist(docs, "len", "doc_id",
      maxLen = 64, maxPerPack = 3).localCheckpoint()
    assert(out.count() == n, "every row keeps exactly one pack assignment")
    val perPack = out.groupBy("pack_id")
      .agg(sum("len").as("s"), count(lit(1)).as("c"))
    assert(perPack.where(col("s") > 64).count() == 0, "a pack overflowed maxLen")
    assert(perPack.where(col("c") > 3).count() == 0, "a pack exceeded maxPerPack")
    val st = TextAnalysis.fitPackStrategy(docs, "len", maxLen = 64, maxPerPack = 3)
    assert(perPack.count() == st.numPacks, "assignment must realize the strategy")
    val again = packsOf(TextAnalysis.packSequencesHist(docs.repartition(13),
      "len", "doc_id", maxLen = 64, maxPerPack = 3))
    assert(packsOf(out) == again, "pack ids must not depend on partitioning")
  }

  test("refusals: out-of-range lengths, duplicate ids, output clash, state cap") {
    val ok = Seq((1L, 5), (2L, 6)).toDF("doc_id", "len")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.fitPackStrategy(Seq((1L, 70)).toDF("doc_id", "len"), "len",
        maxLen = 64)
    }.getMessage.contains("chunk/truncate"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.fitPackStrategy(Seq((1L, 0)).toDF("doc_id", "len"), "len",
        maxLen = 64)
    }.getMessage.contains("chunk/truncate"))
    // fractional lengths refuse at FIT (they'd truncate into the
    // histogram) and at ASSIGNMENT (they'd miss the integer strategy
    // key and silently vanish — the never-drop contract)
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.fitPackStrategy(Seq((1L, 10.5)).toDF("doc_id", "len"), "len",
        maxLen = 64)
    }.getMessage.contains("non-integral"))
    val st = TextAnalysis.fitPackStrategy(ok, "len", maxLen = 64)
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.packWithStrategy(
        Seq((1L, 10.5)).toDF("doc_id", "len"), st, "len", "doc_id")
    }.getMessage.contains("vanish"))
    // a non-empty frame whose ids are ALL NULL must refuse, never
    // silently return the empty frame (the packShards guard)
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.packWithStrategy(
        Seq((null.asInstanceOf[java.lang.Long], 5)).toDF("doc_id", "len"),
        st, "len", "doc_id")
    }.getMessage.contains("NULL on every row"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.packWithStrategy(
        Seq((1L, 5), (1L, 6)).toDF("doc_id", "len"), st, "len", "doc_id").count()
    }.getMessage.contains("unique"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.packWithStrategy(ok.withColumn("pack_id", lit(0L)), st,
        "len", "doc_id")
    }.getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.fitPackStrategy(
        (1 to 40).map(i => (i.toLong, i)).toDF("doc_id", "len"), "len",
        maxLen = 64, maxPerPack = 3, maxStates = 2)
    }.getMessage.contains("maxStates") ||
      intercept[IllegalArgumentException] {
        TextAnalysis.fitPackStrategy(
          (1 to 40).map(i => (i.toLong, i)).toDF("doc_id", "len"), "len",
          maxLen = 64, maxPerPack = 3, maxStates = 2)
      }.getMessage.contains("compositions"))
  }

  test("two-batch stream: each batch packs independently, pack ids never collide") {
    val b1 = Seq((1L, 30), (2L, 30), (3L, 20)).toDF("doc_id", "len")
    val b2 = Seq((10L, 40), (11L, 20), (12L, 9)).toDF("doc_id", "len")
    val dir = java.nio.file.Files.createTempDirectory("graft_packhist_stream")
    b1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    b2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    // pin file mtimes so the file source's batch ORDER is b1 then b2
    // (equal-millisecond writes would make the carried-base expectation
    // flaky — the PretrainStreamSpec convention)
    for ((sub, ts) <- Seq("b1" -> 1000000L, "b2" -> 2000000L);
         f <- dir.resolve(sub).toFile.listFiles if f.getName.endsWith(".parquet"))
      f.setLastModified(ts)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Map.empty[Long, Long]
    val q = graft.streaming.StreamOps.packHistPerBatch(stream, "len", "doc_id",
      maxLen = 64, maxPerPack = 3) { (packed, _) =>
      got.synchronized { got ++= packsOf(packed) }
    }
    try q.processAllAvailable() finally q.stop()
    assert(got.size == 6, s"every row packed exactly once: $got")
    // batch-local correctness: each batch's assignment equals the
    // batch operator's, shifted by the carried base
    val w1 = packsOf(TextAnalysis.packSequencesHist(b1, "len", "doc_id",
      maxLen = 64, maxPerPack = 3))
    val n1 = w1.values.max + 1
    val w2 = packsOf(TextAnalysis.packSequencesHist(b2, "len", "doc_id",
      maxLen = 64, maxPerPack = 3))
    val want = w1 ++ w2.map { case (id, p) => id -> (p + n1) }
    assert(got.toMap == want, s"stream $got vs shifted batch $want")
    // and the carried base means NO cross-batch pack id collisions
    assert(Set(got(1L), got(2L), got(3L)).intersect(
      Set(got(10L), got(11L), got(12L))).isEmpty)
  }

  test("carried open packs: seeded two-batch fit == the batch operator on the concatenation") {
    // batch order matches SPFHP's own longest-first processing (every
    // b1 length > every b2 length), so the concatenated fit processes
    // b1 then b2 — exactly what the carried seed replays. NOT just a
    // shifted equality: docs from both batches share packs.
    val b1 = Seq((1L, 30), (2L, 30), (3L, 20)).toDF("doc_id", "len")
    val b2 = Seq((10L, 19), (11L, 9), (12L, 4)).toDF("doc_id", "len")
    val all = b1.union(b2)
    val st1 = TextAnalysis.fitPackStrategyFrom(b1, "len", 64, 3, 1000, Nil, 0L)
    val got1 = packsOf(TextAnalysis.packWithStrategy(b1, st1, "len", "doc_id"))
    val st2 = TextAnalysis.fitPackStrategyFrom(b2, "len", 64, 3, 1000,
      st1.openTypes, st1.nextPackId)
    val got2 = packsOf(TextAnalysis.packWithStrategy(b2, st2, "len", "doc_id"))
    val want = packsOf(TextAnalysis.packSequencesHist(all, "len", "doc_id",
      maxLen = 64, maxPerPack = 3))
    assert(got1 ++ got2 == want, s"seeded ${got1 ++ got2} vs concat $want")
    // a batch-2 doc landed in a batch-1 pack (the whole point)
    assert(got2.values.toSet.intersect(got1.values.toSet).nonEmpty,
      s"no pack crossed the seam: $got1 / $got2")
    // padding-accounting identity across the seam: the carried chain's
    // final strategy covers ALL packs ever opened (none re-counted), so
    // its padding equals the one-fit padding on the concatenation
    val stAll = TextAnalysis.fitPackStrategy(all, "len", maxLen = 64, maxPerPack = 3)
    assert(st2.paddingTokens == stAll.paddingTokens,
      s"${st2.paddingTokens} vs ${stAll.paddingTokens}")
    assert(st2.numPacks == stAll.numPacks)
  }

  test("carried stream: cross-batch pack share, replay-stable ids, cap refusal") {
    val b1 = Seq((1L, 30), (2L, 30), (3L, 20)).toDF("doc_id", "len")
    val b2 = Seq((10L, 19), (11L, 9), (12L, 4)).toDF("doc_id", "len")
    val dir = java.nio.file.Files.createTempDirectory("graft_packhist_carried")
    b1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    b2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    for ((sub, ts) <- Seq("b1" -> 1000000L, "b2" -> 2000000L);
         f <- dir.resolve(sub).toFile.listFiles if f.getName.endsWith(".parquet"))
      f.setLastModified(ts)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Map.empty[Long, Long]
    val q = graft.streaming.StreamOps.packHistPerBatchCarried(stream, "len",
      "doc_id", maxLen = 64, maxPerPack = 3) { (packed, _) =>
      got.synchronized { got ++= packsOf(packed) }
    }
    try q.processAllAvailable() finally q.stop()
    val want = packsOf(TextAnalysis.packSequencesHist(b1.union(b2), "len",
      "doc_id", maxLen = 64, maxPerPack = 3))
    assert(got.toMap == want, s"carried stream $got vs concat batch $want")
    // the seam genuinely shares a pack: doc 3 (batch 1) packs with
    // docs 10 and 11 (batch 2)
    assert(got(3L) == got(10L) && got(10L) == got(11L), s"$got")
    // carried state past maxStates refuses, never silently drops
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.fitPackStrategyFrom(b2, "len", 64, 3, maxStates = 1,
        carried = Seq(
          TextAnalysis.PackType(Vector(30), 1L, Some(0L)),
          TextAnalysis.PackType(Vector(20), 1L, Some(1L))), freshBase = 2L)
    }.getMessage.contains("carried"))
  }

  test("carriedFrom: caller-owned state resumes the id sequence across a driver restart (r16 ADVICE)") {
    // two QUERIES over two directories — a simulated process restart:
    // query 1 drains b1 and hands its (carried, frontier) to the caller
    // via onState; query 2 is a FRESH stream seeded from that persisted
    // state. The union must equal the single carried query over both
    // batches (which itself equals the batch operator on the concat).
    val b1 = Seq((1L, 30), (2L, 30), (3L, 20)).toDF("doc_id", "len")
    val b2 = Seq((10L, 19), (11L, 9), (12L, 4)).toDF("doc_id", "len")
    val dir = java.nio.file.Files.createTempDirectory("graft_packhist_restart")
    b1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    b2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val got = scala.collection.mutable.Map.empty[Long, Long]
    var savedCarried: Seq[TextAnalysis.PackType] = Nil
    var savedFrontier = -1L
    val q1 = graft.streaming.StreamOps.packHistPerBatchCarriedFrom(
      spark.readStream.schema(b1.schema).parquet(dir.resolve("b1").toString),
      "len", "doc_id", maxLen = 64, maxPerPack = 3,
      onState = (c, f, _) => { savedCarried = c; savedFrontier = f }) {
      (packed, _) => got.synchronized { got ++= packsOf(packed) }
    }
    try q1.processAllAvailable() finally q1.stop()
    assert(savedFrontier >= 0L && savedCarried.nonEmpty,
      s"onState must hand back the post-batch state: $savedCarried / $savedFrontier")
    val q2 = graft.streaming.StreamOps.packHistPerBatchCarriedFrom(
      spark.readStream.schema(b2.schema).parquet(dir.resolve("b2").toString),
      "len", "doc_id", maxLen = 64, maxPerPack = 3,
      initialCarried = savedCarried, initialFrontier = savedFrontier) {
      (packed, _) => got.synchronized { got ++= packsOf(packed) }
    }
    try q2.processAllAvailable() finally q2.stop()
    val want = packsOf(TextAnalysis.packSequencesHist(b1.union(b2), "len",
      "doc_id", maxLen = 64, maxPerPack = 3))
    assert(got.toMap == want, s"restarted chain $got vs concat batch $want")
    // the pack genuinely crossed the RESTART seam, not just the batch
    // seam: doc 3 (before the restart) shares its pack with 10 and 11
    assert(got(3L) == got(10L) && got(10L) == got(11L), s"$got")
  }

  test("padding accounting: strategy paddingTokens == packs × maxLen − Σ lengths") {
    val docs = Seq((1L, 30), (2L, 30), (3L, 20), (4L, 9)).toDF("doc_id", "len")
    val st = TextAnalysis.fitPackStrategy(docs, "len", maxLen = 64, maxPerPack = 3)
    assert(st.paddingTokens == st.numPacks * 64 - (30 + 30 + 20 + 9))
    // vs concat-then-chunk: zero padding but the 89 tokens span two
    // 64-token windows with doc 2 SPLIT across them — the trade this
    // operator exists to avoid (every doc stays whole here)
    assert(st.types.forall(_.lengths.sum <= 64))
  }
}
