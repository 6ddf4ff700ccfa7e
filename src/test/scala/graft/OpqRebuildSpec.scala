package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Nearest, OpqIvfPqIndex}

/**
 * Re-fit runbook for warned codecs (r19 VERDICT #5): build on half the
 * data, append drifted rows the codecGuard WARNS about, `rebuildSaved`
 * from the grown raw corpus — the guard returns quiet, the shape knobs
 * carry over, and serving is brute-force-equal at the lossless
 * degenerate. Plus the two refusals: a raw corpus that would SHRINK
 * the layout (missing ingested batches), and an interrupted-rebuild
 * staging tree.
 */
class OpqRebuildSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cluster(n: Int, center: Double, idBase: Long) =
    spark.range(n).select(
      (col("id") + idBase).as("vec_id"),
      expr(s"transform(sequence(0, 15), j -> " +
        s"cast($center + pmod(xxhash64(id, j), 1000) / 1000.0 as float))")
        .as("embedding"))

  // any degradation warns, nothing refuses — the spec pins the
  // warn→rebuild→quiet cycle, not a particular drift magnitude
  private val anyDrift = 1e-6
  private val never = 4.0

  test("warned codec → rebuildSaved → guard quiet, knobs carried, serving brute-force-equal; shrink + staging refusals") {
    val a = cluster(100, 1.0, 0L)     // build half
    val b = cluster(50, -1.0, 1000L)  // the drift: opposite orthant
    val dir = java.nio.file.Files.createTempDirectory("graft_rebuild").toString
    val path = s"$dir/idx"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
    }
    try {
      val old = OpqIvfPqIndex.build(a, "embedding", nlist = 2, m = 4,
        k = 65536, maxTrain = 65536)
      assert(old.model.lossless)
      old.save(path)
      // the drifted batch WARNS under the frozen artifacts — the state
      // rebuildSaved exists to remedy
      val warned = old.codecGuard(b, "embedding", warnDrop = anyDrift,
        refuseDrop = never)
      assert(warned.exists(_.contains("WARNING")),
        s"drifted rows must warn under the frozen codec: $warned")
      // ...and they get appended anyway (coded imperfectly): the
      // layout now serves 150 rows under a codec fit on 100
      old.appendToSaved(path, b, "embedding")
      assert(spark.read.parquet(s"$path/ivfpq/data").count() == 150L)

      // REFUSAL: a raw corpus missing the ingested batch would
      // silently forget it — abort, live layout untouched
      val shrink = intercept[IllegalStateException](
        OpqIvfPqIndex.rebuildSaved(spark, path, a, "embedding",
          k = 65536, maxTrain = 65536))
      assert(shrink.getMessage.contains("every row"), shrink.getMessage)
      assert(spark.read.parquet(s"$path/ivfpq/data").count() == 150L,
        "an aborted rebuild must leave the live layout untouched")
      assert(!new java.io.File(s"$path/_rebuild").exists(),
        "an aborted rebuild must delete its staging tree")

      // the REBUILD: rotation + quantizer + codebooks + baseline
      // re-fit on the grown corpus, swapped in
      val rebuilt = OpqIvfPqIndex.rebuildSaved(spark, path,
        a.unionByName(b), "embedding", k = 65536, maxTrain = 65536)
      assert(rebuilt.model.lossless, "the rebuilt fit must stay lossless here")
      // shape knobs carried over from the live layout
      assert(rebuilt.inner.centroidVectors.length == 2 &&
        rebuilt.model.m == 4 && !rebuilt.byResidual)
      // the guard is QUIET on the same drifted rows — the remedy took
      assert(rebuilt.codecGuard(b, "embedding", warnDrop = anyDrift,
        refuseDrop = never).isEmpty,
        "after the re-fit the drifted rows must code cleanly")
      // and the persisted baseline is the new fit's (a reopened stack
      // guards without an explicit baseline)
      val reopened = OpqIvfPqIndex.load(spark, path)
      assert(reopened.codecBaseline.exists(_ >= 1.0 - 1e-9),
        s"rebuild must persist the new lossless baseline: ${reopened.codecBaseline}")
      // serving: lossless ∘ full probe == brute force over the union
      val qv = Array.fill(16)(-0.7f)
      val exact = Nearest.topK(a.unionByName(b), "embedding", lit(qv),
          n = 10, tieBreakers = Seq(asc("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val got = reopened.search(qv, k = 10, nprobe = reopened.nlist,
          tieBreakers = Seq(asc("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got == exact,
        "the rebuilt stack must serve brute-force-equal at the lossless " +
          "full-probe degenerate")

      // a STALE handle from before the rebuild refuses LOUDLY — the
      // swap can never be mixed into silently (the rotation guard
      // fires at stage time, before anything lands)
      val stale = intercept[IllegalArgumentException](
        old.ingestBatch(path, cluster(5, 1.0, 9000L), "embedding", 99L,
          Some(1.0)))
      assert(stale.getMessage.contains("DIFFERENT rotation"), stale.getMessage)
      assert(spark.read.parquet(s"$path/ivfpq/data").count() == 150L,
        "a refused stale-handle ingest must land nothing")
      // ...and the REOPENED handle ingests into the rebuilt layout
      // (known-vector rows: the lossless rebuilt codebook codes them
      // exactly, so the guard stays quiet by construction)
      val dup = a.limit(10).withColumn("vec_id", col("vec_id") + 9000L)
      assert(reopened.ingestBatch(path, dup, "embedding", 100L))
      assert(spark.read.parquet(s"$path/ivfpq/data").count() == 160L)

      // REFUSAL: an interrupted rebuild's staging tree blocks a new
      // one by name (never guess which tree is authoritative)
      new java.io.File(s"$path/_rebuild").mkdirs()
      val staged = intercept[IllegalArgumentException](
        OpqIvfPqIndex.rebuildSaved(spark, path, a.unionByName(b),
          "embedding", k = 65536, maxTrain = 65536))
      assert(staged.getMessage.contains("interrupted rebuild"), staged.getMessage)
    } finally rm(new java.io.File(dir))
  }
}
