package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, IvfIndex, PqIndex}

/** The BOUNDED streaming-SemDeDup retained store (r14 VERDICT #1):
  * full vectors only up to a per-cell cap, PQ codes + norm beyond it,
  * fresh rows screened exactly against the former and by ADC against
  * the latter. The load-bearing contracts: with a LOSSLESS codebook
  * the coded screen is arithmetic-identical to the exact one (so ANY
  * cap drains the same survivors as the full-vector store), and the
  * unit-level store semantics (exact hit drops, coded hit drops,
  * no-hit survives, cells block the comparison). */
class BoundedSemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  /** Drain the bounded stream over the two-file fixture split. */
  private def drainBounded(centroids: Array[Array[Float]],
      model: graft.operators.PqModel, cap: Long): (Set[Long], Int) = {
    val e = emb
    val b1 = e.where(col("vec_id") < 250)
    val b2 = e.where(col("vec_id") >= 250)
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup_bounded")
    b1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    b2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val Seq(f1, f2) = Seq("b1", "b2").map(b =>
      new java.io.File(dir.resolve(b).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Set.empty[Long]
    var batches = 0
    val q = graft.streaming.StreamOps.semanticDedupPerBatchBounded(stream,
      centroids, model, "embedding", "vec_id", 0.35, exactCapPerCell = cap) {
      (survivors, _) =>
        got.synchronized {
          batches += 1
          got ++= survivors.select("vec_id").collect().map(_.getLong(0))
        }
    }
    try q.processAllAvailable() finally q.stop()
    (got.toSet, batches)
  }

  /** Reference: the unbounded full-vector stream over the same split
    * and the same frozen quantizer. */
  private def drainFull(centroids: Array[Array[Float]]): Set[Long] = {
    val e = emb
    val b1 = e.where(col("vec_id") < 250)
    val b2 = e.where(col("vec_id") >= 250)
    val s1 = Dedup.semanticIncrementalSurvivors(b1,
      IvfIndex.withCentroids(b1.limit(0), "embedding", centroids), "vec_id", 0.35)
    val s2 = Dedup.semanticIncrementalSurvivors(b2,
      IvfIndex.withCentroids(s1, "embedding", centroids), "vec_id", 0.35)
    (s1.select("vec_id").collect() ++ s2.select("vec_id").collect())
      .map(_.getLong(0)).toSet
  }

  private lazy val centroids8: Array[Array[Float]] =
    IvfIndex.build(emb, "embedding", nlist = 8).centroidVectors
  private lazy val losslessModel =
    PqIndex.fit(emb, "embedding", m = 8, k = 65536)

  test("cap >= corpus: bounded drain == the full-vector store's, 8 real cells") {
    val (got, batches) = drainBounded(centroids8, losslessModel, cap = 1L << 40)
    assert(batches == 2, s"expected 2 micro-batches, saw $batches")
    assert(got == drainFull(centroids8))
  }

  test("cap = 0 with a LOSSLESS codebook: the all-coded store drains identically") {
    assert(losslessModel.lossless,
      "fixture fit must be lossless (every distinct subvector kept) or the test proves nothing")
    val (got, _) = drainBounded(centroids8, losslessModel, cap = 0L)
    assert(got == drainFull(centroids8),
      "a lossless ADC screen must be decision-identical to the exact screen")
  }

  test("mid cap (mixed store) with a lossless codebook still drains identically") {
    // cap = 3 forces BOTH halves live in most cells: the first three
    // survivors stay exact, the rest go coded — decisions must not move
    val (got, _) = drainBounded(centroids8, losslessModel, cap = 3L)
    assert(got == drainFull(centroids8))
  }

  test("unit store semantics: exact hit drops, coded hit drops, cells block, no-hit survives") {
    // unit vectors on the first two axes: angular geometry makes the
    // cell-vs-cosine interplay explicit. Threshold 0.9 ~ 25.8 deg;
    // centroids at 0 and 40 deg, so the cell boundary sits at 20 deg.
    val dim = 8
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Array.fill(dim)(0f).updated(0, math.cos(r).toFloat).updated(1, math.sin(r).toFloat)
    }
    val centroids = Array(at(0), at(40))
    val storeVecs = Seq(
      (100L, at(0).toSeq),   // cell 0, retained EXACT
      (101L, at(90).toSeq))  // cell 1 (50 deg from c1, 90 from c0), retained CODED
      .toDF("vec_id", "embedding")
    val model = PqIndex.fit(storeVecs, "embedding", m = 2, k = 65536)
    assert(model.lossless)
    val assigned = IvfIndex.withCentroids(storeVecs, "embedding", centroids).indexed
    val exactRow = assigned.where(col("vec_id") === 100L)
      .select(col("vec_id"), col("cell"), col("embedding"),
        lit(null).cast("binary").as("__codes"), lit(null).cast("double").as("__norm"))
    val codedRow = PqIndex.encode(assigned.where(col("vec_id") === 101L),
        "embedding", model, "__codes", "__norm")
      .select(col("vec_id"), col("cell"),
        lit(null).cast("array<float>").as("embedding"), col("__codes"), col("__norm"))
    val store = exactRow.unionByName(codedRow)
    val fresh = Seq(
      (1L, at(10).toSeq), // cell 0; cos 10 deg = 0.985 to the EXACT row -> drops
      (2L, at(75).toSeq), // cell 1; cos 15 deg = 0.966 to the CODED row -> drops via ADC
      (3L, at(22).toSeq), // CELL 1 (22 > 20-deg boundary) but cos 22 deg = 0.927 >= 0.9
                          // to the cell-0 exact row -> SURVIVES: cells block by design
      (4L, at(160).toSeq)) // cell 1, cos 70 deg = 0.34 to the coded row -> survives
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticBoundedSurvivors(fresh, centroids, store, model,
        "embedding", "vec_id", 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L, 4L), s"got $out")
  }

  test("restart path: persist the store after batch 1, resume a NEW stream over batch 2 — equals the continuous drain") {
    val e = emb
    val b1 = e.where(col("vec_id") < 250)
    val b2 = e.where(col("vec_id") >= 250)
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup_resume")
    b1.coalesce(1).write.parquet(dir.resolve("d1").toString)
    b2.coalesce(1).write.parquet(dir.resolve("d2").toString)
    val cap = 3L // mixed store: both halves live in most cells
    val storePath = dir.resolve("store").toString
    // run 1: batch 1 only; onStore persists the mixed store to parquet
    val got1 = scala.collection.mutable.Set.empty[Long]
    val q1 = graft.streaming.StreamOps.semanticDedupPerBatchBoundedFrom(
      spark.readStream.schema(b1.schema).parquet(dir.resolve("d1").toString),
      centroids8, losslessModel, None, "embedding", "vec_id", 0.35, cap,
      onStore = (st, _) => st.write.mode("overwrite").parquet(storePath)) {
      (s, _) => got1.synchronized {
        got1 ++= s.select("vec_id").collect().map(_.getLong(0)) }
    }
    try q1.processAllAvailable() finally q1.stop()
    // run 2: a FRESH stream resumes from the reopened store over batch 2
    val got2 = scala.collection.mutable.Set.empty[Long]
    val q2 = graft.streaming.StreamOps.semanticDedupPerBatchBoundedFrom(
      spark.readStream.schema(b2.schema).parquet(dir.resolve("d2").toString),
      centroids8, losslessModel, Some(spark.read.parquet(storePath)),
      "embedding", "vec_id", 0.35, cap) {
      (s, _) => got2.synchronized {
        got2 ++= s.select("vec_id").collect().map(_.getLong(0)) }
    }
    try q2.processAllAvailable() finally q2.stop()
    assert((got1.toSet ++ got2.toSet) == drainFull(centroids8),
      "persist + reopen + resume must equal the continuous two-batch drain")
    // the reopened store really carried: some batch-2 row must drop
    // against a batch-1 survivor, not just within batch 2
    val b2Only = Dedup.semanticIncrementalSurvivors(b2,
      IvfIndex.withCentroids(b2.limit(0), "embedding", centroids8), "vec_id", 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got2.toSet != b2Only,
      "fixture must exercise a cross-restart drop against the persisted store")
    // a store missing the layout columns refuses at stream creation
    intercept[IllegalArgumentException](
      graft.streaming.StreamOps.semanticDedupPerBatchBoundedFrom(
        spark.readStream.schema(b2.schema).parquet(dir.resolve("d2").toString),
        centroids8, losslessModel, Some(b1), "embedding", "vec_id", 0.35, cap) {
        (_, _) => () })
  }

  test("store layout refusal: a frame without the bounded columns refuses") {
    val fresh = Seq((1L, Seq.fill(8)(1f))).toDF("vec_id", "embedding")
    val notAStore = Seq((2L, Seq.fill(8)(1f))).toDF("vec_id", "embedding")
    val model = PqIndex.fit(fresh, "embedding", m = 2, k = 4)
    intercept[IllegalArgumentException](
      Dedup.semanticBoundedSurvivors(fresh, Array(Array.fill(8)(0f)),
        notAStore, model, "embedding", "vec_id", 0.5))
  }
}
