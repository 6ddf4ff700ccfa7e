package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, IvfPqIndex, OpqIvfPqIndex}

/**
 * Exactly-once streaming ingest across CRASH windows (r19 VERDICT #1):
 * the stage-then-promote protocol must leave the layout identical to a
 * no-crash drain after either injected crash —
 *
 *   w1: staged files written, marker MISSING (the old protocol's safe
 *       side — but now also: staged rows must be INVISIBLE to readers
 *       until the marker lands);
 *   w2: marker written, promotion pending (the old protocol's
 *       duplicate-batch window — a replay must COMPLETE the promotion,
 *       never re-append).
 *
 * Simulated with the skeleton's fault-injection `crashPoint` on all
 * three savable tiers; the no-crash twin is a plain two-batch drain on
 * a second copy of the layout.
 */
class IngestCrashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val a = e.where(col("vec_id") % 3 === 0)
  private lazy val b1 = e.where(col("vec_id") % 3 === 1)
  private lazy val b2 = e.where(col("vec_id") % 3 === 2)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_crash_$tag").toString

  private def rm(dir: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(go); f.delete(): Unit
    }
    go(new java.io.File(dir))
  }

  /** (vec_id, cell) pairs of a cell-partitioned data tree, duplicates
    * INCLUDED — a replayed batch that appended twice shows up as twice
    * the pairs, which is exactly what the equality must catch. */
  private def pairs(dataDir: String): Seq[(Long, Int)] =
    spark.read.parquet(dataDir).select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq

  private def stagingDirs(root: String): Seq[String] =
    Option(new java.io.File(s"$root/_ingest").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("staging_"))
      .map(_.getName).toSeq

  test("vector tier: both crash windows recover to the no-crash drain; staged rows invisible; recovery idempotent") {
    val frozen = IvfIndex.build(e, "embedding", nlist = 8).centroidVectors
    val half = IvfIndex.withCentroids(a, "embedding", frozen)
    val clean = tmp("vec_clean"); val w1 = tmp("vec_w1"); val w2 = tmp("vec_w2")
    try {
      half.save(clean)
      assert(half.ingestBatch(clean, b1, 0L))
      assert(half.ingestBatch(clean, b2, 1L))
      val want = pairs(s"$clean/data")

      // w1: crash AFTER stage, BEFORE marker
      half.save(w1)
      assert(half.ingestBatch(w1, b1, 0L))
      val afterB1 = pairs(s"$w1/data")
      intercept[IvfIndex.InjectedIngestCrash](
        half.ingestBatchImpl(w1, b2, 1L, 64, 128L << 20, crashPoint = 1))
      assert(pairs(s"$w1/data") == afterB1,
        "staged rows must be INVISIBLE to readers before the marker")
      assert(stagingDirs(w1) == Seq("staging_1"),
        s"the crashed batch must be parked in staging: ${stagingDirs(w1)}")
      // the replay re-stages and lands the batch exactly once
      assert(half.ingestBatch(w1, b2, 1L))
      assert(pairs(s"$w1/data") == want,
        "post-crash replay must equal the no-crash drain (w1)")
      assert(stagingDirs(w1).isEmpty, "staging must be cleaned up")

      // w2: crash AFTER marker, BEFORE promotion — the old protocol's
      // duplicate window
      half.save(w2)
      assert(half.ingestBatch(w2, b1, 0L))
      intercept[IvfIndex.InjectedIngestCrash](
        half.ingestBatchImpl(w2, b2, 1L, 64, 128L << 20, crashPoint = 2))
      // the replay COMPLETES the promotion instead of re-appending
      assert(half.ingestBatch(w2, b2, 1L),
        "a marker-present replay with staged files must complete the promotion")
      assert(pairs(s"$w2/data") == want,
        "post-crash replay must equal the no-crash drain (w2) — the old " +
          "protocol appended this batch twice")
      assert(stagingDirs(w2).isEmpty, "staging must be cleaned up")
      // a FURTHER replay is a pure no-op
      assert(!half.ingestBatch(w2, b2, 1L))
      assert(pairs(s"$w2/data") == want)
      // and the recovered layout serves identically to the clean one
      val q = e.filter(col("vec_id") === 1).select("embedding")
        .head().getSeq[Float](0).toArray
      def served(p: String) = IvfIndex.load(spark, p)
        .search(q, k = 10, nprobe = 8, tieBreakers = Seq(asc("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(served(w2) == served(clean))
    } finally { rm(clean); rm(w1); rm(w2) }
  }

  test("recoverIngest: the fresh-checkpoint runbook — committed stagings promote, uncommitted discard, idempotent, layout-refused") {
    // the case in-band replay cannot reach: the stream died and is
    // restarting with a NEW checkpoint, so old batchIds never replay —
    // the sweep must promote what committed and discard what did not
    val frozen = IvfIndex.build(e, "embedding", nlist = 8).centroidVectors
    val half = IvfIndex.withCentroids(a, "embedding", frozen)
    val clean = tmp("rec_clean"); val p = tmp("rec")
    try {
      half.save(clean)
      assert(half.ingestBatch(clean, b1, 1L))
      val want = pairs(s"$clean/data")

      half.save(p)
      // batch 1 crashed AFTER its marker (committed, promotion pending)
      intercept[IvfIndex.InjectedIngestCrash](
        half.ingestBatchImpl(p, b1, 1L, 64, 128L << 20, crashPoint = 2))
      // batch 2 crashed BEFORE its marker (never committed)
      intercept[IvfIndex.InjectedIngestCrash](
        half.ingestBatchImpl(p, b2, 2L, 64, 128L << 20, crashPoint = 1))
      assert(stagingDirs(p).sorted == Seq("staging_1", "staging_2"))

      val (promoted, discarded) = IvfIndex.recoverIngest(spark, p)
      assert(promoted == Seq(1L) && discarded == Seq(2L),
        s"sweep must promote the committed batch and discard the " +
          s"uncommitted one: ($promoted, $discarded)")
      assert(pairs(s"$p/data") == want,
        "after the sweep the layout must serve exactly the committed rows")
      assert(stagingDirs(p).isEmpty)
      // idempotent: a second sweep finds nothing
      assert(IvfIndex.recoverIngest(spark, p) == ((Nil, Nil)))
      // and the discarded batch re-delivers cleanly under a new id
      assert(half.ingestBatch(p, b2, 7L))
      assert(pairs(s"$p/data").size == want.size + b2.count().toInt)
      // layout refusal: never sweep a tree this engine did not write
      intercept[Exception](IvfIndex.recoverIngest(spark, s"$p/nope"))
    } finally { rm(clean); rm(p) }
  }

  test("plain coded tier: both crash windows recover to the no-crash drain") {
    // lossless codebooks fit on the FULL corpus, index over the build
    // half — appended batches then code exactly (self-sim 1.0), so the
    // codecGuard stays quiet and the spec isolates the crash protocol
    val base = IvfPqIndex.build(e, "embedding", nlist = 4, m = 4, k = 65536,
      maxTrain = 65536)
    assert(base.model.lossless)
    val idx = IvfPqIndex.withArtifacts(a, "embedding",
      base.centroidVectors, base.model)
    val baseline = idx.codecSelfSimilarity(a, "embedding")
    val clean = tmp("pq_clean"); val w1 = tmp("pq_w1"); val w2 = tmp("pq_w2")
    try {
      idx.save(clean)
      assert(idx.ingestBatch(clean, b1, "embedding", 0L, baseline))
      assert(idx.ingestBatch(clean, b2, "embedding", 1L, baseline))
      val want = pairs(s"$clean/data")

      idx.save(w1)
      assert(idx.ingestBatch(w1, b1, "embedding", 0L, baseline))
      intercept[IvfIndex.InjectedIngestCrash](
        idx.ingestBatchImpl(w1, b2, "embedding", 1L, baseline, _ => (), 64,
          128L << 20, crashPoint = 1))
      assert(idx.ingestBatch(w1, b2, "embedding", 1L, baseline))
      assert(pairs(s"$w1/data") == want)

      idx.save(w2)
      assert(idx.ingestBatch(w2, b1, "embedding", 0L, baseline))
      intercept[IvfIndex.InjectedIngestCrash](
        idx.ingestBatchImpl(w2, b2, "embedding", 1L, baseline, _ => (), 64,
          128L << 20, crashPoint = 2))
      assert(idx.ingestBatch(w2, b2, "embedding", 1L, baseline))
      assert(pairs(s"$w2/data") == want,
        "post-crash replay must equal the no-crash drain — the old " +
          "protocol appended this batch twice")
      assert(!idx.ingestBatch(w2, b2, "embedding", 1L, baseline))
    } finally { rm(clean); rm(w1); rm(w2) }
  }

  test("OPQ stack: both crash windows recover to the no-crash drain; serving stays brute-force-equal") {
    // same full-corpus-lossless staging as the plain tier: rotation +
    // codebooks fit on all of e, index over the build half
    val full = OpqIvfPqIndex.build(e, "embedding", nlist = 4, m = 4,
      k = 65536, maxTrain = 65536)
    assert(full.model.lossless)
    val idx = OpqIvfPqIndex.withArtifacts(a, "embedding", full.rotation,
      full.inner.centroidVectors, full.model)
    val clean = tmp("opq_clean"); val w1 = tmp("opq_w1"); val w2 = tmp("opq_w2")
    try {
      idx.save(clean)
      assert(idx.ingestBatch(clean, b1, "embedding", 0L, Some(1.0)))
      assert(idx.ingestBatch(clean, b2, "embedding", 1L, Some(1.0)))
      val want = pairs(s"$clean/ivfpq/data")

      idx.save(w1)
      assert(idx.ingestBatch(w1, b1, "embedding", 0L, Some(1.0)))
      intercept[IvfIndex.InjectedIngestCrash](
        idx.ingestBatchImpl(w1, b2, "embedding", 1L, Some(1.0), _ => (), 64,
          128L << 20, crashPoint = 1))
      assert(idx.ingestBatch(w1, b2, "embedding", 1L, Some(1.0)))
      assert(pairs(s"$w1/ivfpq/data") == want)

      idx.save(w2)
      assert(idx.ingestBatch(w2, b1, "embedding", 0L, Some(1.0)))
      intercept[IvfIndex.InjectedIngestCrash](
        idx.ingestBatchImpl(w2, b2, "embedding", 1L, Some(1.0), _ => (), 64,
          128L << 20, crashPoint = 2))
      assert(idx.ingestBatch(w2, b2, "embedding", 1L, Some(1.0)))
      assert(pairs(s"$w2/ivfpq/data") == want,
        "post-crash replay must equal the no-crash drain — the old " +
          "protocol appended this batch twice")
      // the recovered layout serves the lossless full-probe degenerate
      // brute-force-equal over the WHOLE union
      val q = e.filter(col("vec_id") === 1).select("embedding")
        .head().getSeq[Float](0).toArray
      val got = graft.operators.AnnIndex.open(spark, w2)
        .search(q, k = 10, nprobe = 4, tieBreakers = Seq(asc("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val exact = graft.operators.Nearest.topK(e, "embedding", lit(q), n = 10,
          tieBreakers = Seq(asc("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got == exact,
        "the crash-recovered OPQ layout must serve brute-force-equal at " +
          "the lossless full-probe degenerate")
    } finally { rm(clean); rm(w1); rm(w2) }
  }
}
