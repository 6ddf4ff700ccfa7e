package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.StreamOps

/** Multi-batch semantics of [[StreamOps.pipelinePretrainPerBatch]] —
  * the one thing the gate row's one-file fixture cannot exercise: the
  * paragraph seen-store and the frozen artifacts (UnigramLm, bucket
  * boundaries) must CARRY across micro-batches, so the drained stream
  * equals the frozen-artifact batch pipeline over the concatenated
  * corpus when batch ids arrive in order. */
class PretrainStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // short 2-grams + newline paragraphs keep the fixture readable; the
  // eval doc shares the 2-gram "secret answer" with corpus doc 3
  private val N = 2

  private def batch1 = Seq(
    (1L, "en", "alpha beta gamma\nshared cookie banner\ndelta epsilon"),
    (2L, "en", "zeta eta theta\nshared cookie banner"),
    (5L, "de", "der hund lief\nund sprang hoch")).toDF("doc_id", "lang", "text")
  private def batch2 = Seq(
    (3L, "en", "iota kappa\nthe secret answer lives here"),
    (4L, "en", "shared cookie banner\nlambda mu nu xi"),
    (6L, "de", "der hund lief\nganz neu hier")).toDF("doc_id", "lang", "text")
  private def evalDf = Seq((100L, "what is the secret answer")).toDF("doc_id", "text")

  /** The frozen-artifact BATCH pipeline over one corpus — the spec's
    * expected value, stage for stage what the stream composes. */
  private def batchPipeline(corpus: org.apache.spark.sql.DataFrame,
      model: TextAnalysis.UnigramLm,
      bounds: org.apache.spark.sql.DataFrame): Map[Long, (String, Double, String)] = {
    val dd = Dedup.dedupParagraphs(corpus, "text", "doc_id")
    val decon = Dedup.decontaminate(dd, evalDf, "text", "doc_id", n = N)
    val scored = TextAnalysis.lmScoreAgainst(decon, model, "text", "doc_id")
      .join(decon.select(col("doc_id"), col("lang")), "doc_id")
    // ship ALL buckets here so the spec observes every surviving doc's
    // label (the gate row exercises the default head+middle filter)
    TextAnalysis.applyBuckets(scored, bounds, "lm_nll", "lang")
      .select("doc_id", "lang", "lm_nll", "bucket").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3)))).toMap
  }

  test("two-batch drain == frozen batch pipeline; store and model carry across batches") {
    val union = batch1.unionByName(batch2)
    // frozen artifacts fit once, on the batch-equivalent cleaned union
    val cleanRef = Dedup.decontaminate(
      Dedup.dedupParagraphs(union, "text", "doc_id"), evalDf, "text", "doc_id", n = N)
    val model = TextAnalysis.fitUnigramLm(cleanRef, "text")
    val bounds = TextAnalysis.bucketBoundaries(
      TextAnalysis.lmScoreAgainst(cleanRef, model, "text", "doc_id")
        .join(cleanRef.select(col("doc_id"), col("lang")), "doc_id"),
      "lm_nll", "lang")
    val want = batchPipeline(union, model, bounds)

    // sanity on the fixture itself: the decontaminated doc is gone and
    // the cross-batch paragraph drop will bite doc 4
    assert(!want.contains(3L), "doc 3 shares the eval 2-gram and must be dropped")

    val dir = java.nio.file.Files.createTempDirectory("graft_pretrain_stream")
    batch1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    batch2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val Seq(f1, f2) = Seq("b1", "b2").map(b =>
      new java.io.File(dir.resolve(b).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")

    val got = scala.collection.mutable.Map.empty[Long, (String, Double, String)]
    var batches = 0
    val q = StreamOps.pipelinePretrainPerBatch(stream, evalDf, model, bounds,
      "text", "doc_id", "lang", n = N,
      shipLabels = Seq("head", "middle", "tail")) { (shipped, _) =>
      got.synchronized {
        batches += 1
        // the sink's contract: FULL document rows — the cleaned text
        // must ride along or the shipped output is unshippable
        assert(shipped.columns.contains("text"),
          s"sink lost the text column: ${shipped.columns.mkString(",")}")
        got ++= shipped.select("doc_id", "lang", "lm_nll", "bucket").collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
      }
    }
    try q.processAllAvailable() finally q.stop()

    assert(batches == 2, s"expected 2 micro-batches, saw $batches")
    assert(got.toMap == want, s"stream ${got.toMap} vs batch $want")
    // the STORE carried: doc 4's banner arrived in batch 2 but was
    // shipped by batch 1, so its (stream-scored) token count reflects
    // ONLY the surviving paragraph "lambda mu nu xi" — its banner-free
    // lm_nll matches the banner-free batch text by the map equality;
    // pin the fixture's batch side to make that bite
    val dd = Dedup.dedupParagraphs(union, "text", "doc_id")
    val doc4 = dd.where(col("doc_id") === 4L).select("text").head().getString(0)
    assert(doc4 == "lambda mu nu xi", s"doc 4 must lose the cross-batch banner, got '$doc4'")
    assert(got.contains(4L), "doc 4 survives (deduped, not dropped)")
    // cross-batch paragraph dedup also bit doc 6 ("der hund lief" was
    // doc 5's in batch 1); its de-scored text shipped with a bucket
    assert(got.contains(6L))

    // round 14: the SAME two-batch chain on the BOUNDED Bloom store —
    // honestly sized, the drain must equal the exact-store drain
    // decision for decision (including the cross-batch drops the
    // assertions above pinned), proving the 100 TB state shape slots
    // into the composition without changing a single shipped row
    val gotBloom = scala.collection.mutable.Map.empty[Long, (String, Double, String)]
    val s2 = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val q2 = StreamOps.pipelinePretrainPerBatch(s2, evalDf, model, bounds,
      "text", "doc_id", "lang", n = N,
      shipLabels = Seq("head", "middle", "tail"),
      bloomStore = Some(graft.operators.ParaBloom.create(4096, 1e-4))) { (shipped, _) =>
      gotBloom.synchronized {
        gotBloom ++= shipped.select("doc_id", "lang", "lm_nll", "bucket").collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
      }
    }
    try q2.processAllAvailable() finally q2.stop()
    assert(gotBloom.toMap == want, s"bloom-store chain ${gotBloom.toMap} vs batch $want")
  }

  test("substring-staged chain: two-batch drain == batch, the gram store carries a cross-batch span") {
    // doc 7 embeds batch 1's "alpha beta gamma" run INSIDE a longer,
    // unique paragraph — paragraph dedup cannot touch it; only the
    // substring stage's carried gram store can excise it
    val b2s = batch2.unionByName(
      Seq((7L, "en", "prefix7 alpha beta gamma suffix7\nsieben acht neun"))
        .toDF("doc_id", "lang", "text"))
    val union = batch1.unionByName(b2s)
    val k = 3
    def batchPipelineSubstr(corpus: org.apache.spark.sql.DataFrame,
        model: TextAnalysis.UnigramLm,
        bounds: org.apache.spark.sql.DataFrame): Map[Long, (String, Double, String)] = {
      val sx = Dedup.removeDuplicateSpans(
        Dedup.dedupParagraphs(corpus, "text", "doc_id"), "text", "doc_id", k)
      val decon = Dedup.decontaminate(sx, evalDf, "text", "doc_id", n = N)
      val scored = TextAnalysis.lmScoreAgainst(decon, model, "text", "doc_id")
        .join(decon.select(col("doc_id"), col("lang")), "doc_id")
      TextAnalysis.applyBuckets(scored, bounds, "lm_nll", "lang")
        .select("doc_id", "lang", "lm_nll", "bucket").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3)))).toMap
    }
    // frozen artifacts fit on the SUBSTRING chain's cleaned union
    val cleanRef = Dedup.decontaminate(
      Dedup.removeDuplicateSpans(
        Dedup.dedupParagraphs(union, "text", "doc_id"), "text", "doc_id", k),
      evalDf, "text", "doc_id", n = N)
    val model = TextAnalysis.fitUnigramLm(cleanRef, "text")
    val bounds = TextAnalysis.bucketBoundaries(
      TextAnalysis.lmScoreAgainst(cleanRef, model, "text", "doc_id")
        .join(cleanRef.select(col("doc_id"), col("lang")), "doc_id"),
      "lm_nll", "lang")
    val want = batchPipelineSubstr(union, model, bounds)
    // the fixture bites: doc 7 survives but its batch-side text lost
    // the copied run to the substring stage
    val sx7 = Dedup.removeDuplicateSpans(
        Dedup.dedupParagraphs(union, "text", "doc_id"), "text", "doc_id", k)
      .where(col("doc_id") === 7L).select("text").head().getString(0)
    assert(sx7 == "prefix7 suffix7 sieben acht neun",
      s"doc 7 must lose the cross-batch span to the substring stage, got '$sx7'")
    val dir = java.nio.file.Files.createTempDirectory("graft_pretrain_substr_stream")
    batch1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    b2s.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val Seq(f1, f2) = Seq("b1", "b2").map(b =>
      new java.io.File(dir.resolve(b).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Map.empty[Long, (String, Double, String)]
    var batches = 0
    val q = StreamOps.pipelinePretrainPerBatch(stream, evalDf, model, bounds,
      "text", "doc_id", "lang", n = N,
      shipLabels = Seq("head", "middle", "tail"),
      substringK = Some(k)) { (shipped, _) =>
      got.synchronized {
        batches += 1
        got ++= shipped.select("doc_id", "lang", "lm_nll", "bucket").collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
      }
    }
    try q.processAllAvailable() finally q.stop()
    assert(batches == 2, s"expected 2 micro-batches, saw $batches")
    assert(got.toMap == want, s"substring-staged stream ${got.toMap} vs batch $want")
    assert(got.contains(7L), "doc 7 survives with its excised, re-scored text")

    // round 15: the SAME two-batch substring chain on the BOUNDED
    // Bloom gram store — honestly sized, the drain must equal the
    // exact-store drain decision for decision, INCLUDING doc 7's
    // cross-batch span excision (which now rides a filter probe, not
    // a gram-frame semi-join): the fully-bounded chain ships the same
    // rows
    val gotBloom = scala.collection.mutable.Map.empty[Long, (String, Double, String)]
    val s2 = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val q2 = StreamOps.pipelinePretrainPerBatch(s2, evalDf, model, bounds,
      "text", "doc_id", "lang", n = N,
      shipLabels = Seq("head", "middle", "tail"),
      substringK = Some(k),
      substringBloom = Some(graft.operators.ParaBloom.create(4096, 1e-4))) {
      (shipped, _) =>
        gotBloom.synchronized {
          gotBloom ++= shipped.select("doc_id", "lang", "lm_nll", "bucket").collect()
            .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
        }
    }
    try q2.processAllAvailable() finally q2.stop()
    assert(gotBloom.toMap == want,
      s"bloom-gram-store chain ${gotBloom.toMap} vs batch $want")
  }

  test("semantic-staged chain: two-batch drain == batch, the keeper flag carries across batches") {
    // one cell, frozen centroid [1, 0]; eps = 0.5 ⇒ ball = cos ≥ 0.5.
    // Batch 1's doc 1 sits at the centroid and claims the cell; batch
    // 2's doc 4 is deep inside the ball (cos ≈ 0.994) and must DROP on
    // the CARRIED keeper flag — paragraph dedup alone would keep it
    // (its banner drop changes text, not survival). Docs 2/6 are
    // non-ball, doc 5 has NO embedding row (un-screenable, survives).
    val cent = Array(Array(1f, 0f))
    val eps = 0.5
    val embDf = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(0f, 1f)), (4L, Seq(0.9f, 0.1f)),
      (6L, Seq(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val union = batch1.unionByName(batch2)
    def semStage(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val withEmb = df.join(
        embDf.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"), "left")
      Dedup.semanticDedupByCentroid(withEmb,
          graft.operators.IvfIndex.withCentroids(withEmb, "embedding", cent),
          "doc_id", eps)
        .drop("embedding")
    }
    def batchPipelineSem(corpus: org.apache.spark.sql.DataFrame,
        model: TextAnalysis.UnigramLm,
        bounds: org.apache.spark.sql.DataFrame): Map[Long, (String, Double, String)] = {
      val sd = semStage(Dedup.dedupParagraphs(corpus, "text", "doc_id"))
      val decon = Dedup.decontaminate(sd, evalDf, "text", "doc_id", n = N)
      val scored = TextAnalysis.lmScoreAgainst(decon, model, "text", "doc_id")
        .join(decon.select(col("doc_id"), col("lang")), "doc_id")
      TextAnalysis.applyBuckets(scored, bounds, "lm_nll", "lang")
        .select("doc_id", "lang", "lm_nll", "bucket").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3)))).toMap
    }
    val cleanRef = Dedup.decontaminate(
      semStage(Dedup.dedupParagraphs(union, "text", "doc_id")),
      evalDf, "text", "doc_id", n = N)
    val model = TextAnalysis.fitUnigramLm(cleanRef, "text")
    val bounds = TextAnalysis.bucketBoundaries(
      TextAnalysis.lmScoreAgainst(cleanRef, model, "text", "doc_id")
        .join(cleanRef.select(col("doc_id"), col("lang")), "doc_id"),
      "lm_nll", "lang")
    val want = batchPipelineSem(union, model, bounds)
    assert(!want.contains(4L), "doc 4 is a ball member of doc 1's claimed cell")
    assert(want.contains(2L) && want.contains(5L) && want.contains(6L),
      s"non-ball and no-embedding docs survive the screen: $want")
    val dir = java.nio.file.Files.createTempDirectory("graft_pretrain_sem_stream")
    batch1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    batch2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val Seq(f1, f2) = Seq("b1", "b2").map(b =>
      new java.io.File(dir.resolve(b).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Map.empty[Long, (String, Double, String)]
    var batches = 0
    val q = StreamOps.pipelinePretrainPerBatch(stream, evalDf, model, bounds,
      "text", "doc_id", "lang", n = N,
      shipLabels = Seq("head", "middle", "tail"),
      semdedup = Some(StreamOps.SemdedupCentroidStage(
        embDf, "vec_id", "embedding", cent, eps))) { (shipped, _) =>
      got.synchronized {
        batches += 1
        got ++= shipped.select("doc_id", "lang", "lm_nll", "bucket").collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
      }
    }
    try q.processAllAvailable() finally q.stop()
    assert(batches == 2, s"expected 2 micro-batches, saw $batches")
    assert(got.toMap == want, s"semantic-staged stream ${got.toMap} vs batch $want")
    // the carry bit: doc 4 arrived in batch 2, its cell's keeper (doc
    // 1) in batch 1 — only the carried flag can drop it
    assert(!got.contains(4L), "doc 4 must drop on the carried keeper flag")
  }

  test("substringBloom without substringK is refused at wiring time") {
    // the bounded gram store only exists inside the substring stage —
    // silently ignoring it would leave the caller believing their
    // state is bounded
    val model = TextAnalysis.fitUnigramLm(batch1, "text")
    val bounds = TextAnalysis.bucketBoundaries(
      TextAnalysis.lmScoreAgainst(batch1, model, "text", "doc_id")
        .join(batch1.select(col("doc_id"), col("lang")), "doc_id"),
      "lm_nll", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_pretrain_sbk")
    batch1.coalesce(1).write.parquet(dir.resolve("b").toString)
    val stream = spark.readStream.schema(batch1.schema).parquet(s"$dir/*/")
    val err = intercept[IllegalArgumentException] {
      StreamOps.pipelinePretrainPerBatch(stream, evalDf, model, bounds,
        "text", "doc_id", "lang", n = N,
        substringBloom = Some(graft.operators.ParaBloom.create(64, 0.01))) {
        (_, _) => ()
      }
    }
    assert(err.getMessage.contains("substringK"))
  }

  test("a stream already carrying a scorer output column is refused up front") {
    // the full-row join reserves n_toks/lm_nll/bucket on the input; a
    // collision must refuse at wiring time, not kill the query with an
    // ambiguous-reference error on the first micro-batch
    val model = TextAnalysis.fitUnigramLm(batch1, "text")
    val bounds = TextAnalysis.bucketBoundaries(
      TextAnalysis.lmScoreAgainst(batch1, model, "text", "doc_id")
        .join(batch1.select(col("doc_id"), col("lang")), "doc_id"),
      "lm_nll", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_pretrain_clash")
    batch1.withColumn("lm_nll", lit(0.0)).coalesce(1)
      .write.parquet(dir.resolve("b").toString)
    val stream = spark.readStream
      .schema(batch1.withColumn("lm_nll", lit(0.0)).schema)
      .parquet(s"$dir/*/")
    val err = intercept[IllegalArgumentException] {
      StreamOps.pipelinePretrainPerBatch(stream, evalDf, model, bounds,
        "text", "doc_id", "lang", n = N) { (_, _) => () }
    }
    assert(err.getMessage.contains("lm_nll"))
  }
}
