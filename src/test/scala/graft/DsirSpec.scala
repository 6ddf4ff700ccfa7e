package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** DSIR data selection (Xie et al. 2023): per-document importance
  * log-weights log(p_target/p_raw) under add-one smoothed (unigram ∪
  * bigram) feature distributions — the exact (feature-keyed)
  * degenerate's closed forms, the hashed deployment shape's
  * collision behavior, the Gumbel-top-k resampler's determinism and
  * ∝-exp(weight) skew, and the frozen-artifact round trip. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    df.select("doc_id", "n_feats", "dsir_logw").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("unseen-vocabulary doc scores exactly n_feats × zeroLr (closed form)") {
    val target = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq((2L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val model = TextAnalysis.fitDsir(target, raw, "text", numBuckets = 0)
    // target: 3 unigrams + 2 bigrams = 5 occurrences over 5 distinct;
    // raw: 4 + 3 = 7 over 7 distinct; B = 12, Nt = 5, Nr = 7
    assert(model.bEff == 12 && model.nTarget == 5 && model.nRaw == 7)
    val novel = Seq((9L, "one two three")).toDF("doc_id", "text")
    val got = scoresOf(TextAnalysis.dsirScoreAgainst(novel, model, "text", "doc_id"))
    val expected = math.rint(5.0 * model.zeroLrMicro / 1e6 * 1e6) / 1e6
    assert(got(9L)._1 == 5L, "3 unigrams + 2 bigrams")
    assert(math.abs(got(9L)._2 - expected) < 1e-9,
      s"all-unseen doc must score n_feats × zeroLr: ${got(9L)._2} vs $expected")
    // and zeroLr itself: ln(1/(Nt+B)) − ln(1/(Nr+B)) — raw is bigger,
    // so an unseen feature leans TOWARD target-unlike (negative)
    assert(model.zeroLrMicro ==
      BigDecimal(1e6 * (math.log(1.0 / 17) - math.log(1.0 / 19)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  test("zeroLr on a target-heavier-than-raw fit matches Spark's in-plan rounding (negative HALF_UP)") {
    // when the target corpus outweighs the raw pool, zeroLr is
    // NEGATIVE; math.round (floor(x+0.5)) pulls negative halves
    // toward +∞ while the ratios column and the DuckDB oracle round
    // half-AWAY-from-zero — pin the driver constant to the same
    // arithmetic Spark's round produces in-plan
    val target = (0L until 40L).map(i => (i, s"t${i % 9} u${i % 5} v${i % 3}"))
      .toDF("doc_id", "text")
    val raw = Seq((100L, "w x")).toDF("doc_id", "text")
    val model = TextAnalysis.fitDsir(target, raw, "text", numBuckets = 0)
    assert(model.nTarget > model.nRaw && model.zeroLrMicro < 0,
      s"fixture must exercise the negative branch: $model")
    val inPlan = spark.range(1)
      .select(round(lit(1e6) * (log(lit(1.0) / lit((model.nTarget + model.bEff).toDouble))
        - log(lit(1.0) / lit((model.nRaw + model.bEff).toDouble))))
        .cast("long")).head().getLong(0)
    assert(model.zeroLrMicro == inPlan,
      s"driver zeroLr ${model.zeroLrMicro} != Spark in-plan round $inPlan")
  }

  test("target-like docs outscore raw-like docs; zero-token docs are absent") {
    val target = (0L until 20L).map(i => (i, "quantum physics lecture notes"))
      .toDF("doc_id", "text")
    val raw = (100L until 120L).map(i => (i, "buy cheap pills online now"))
      .union(Seq((200L, "quantum physics lecture notes"))).toDF("doc_id", "text")
    val model = TextAnalysis.fitDsir(target, raw, "text", numBuckets = 0)
    val scored = scoresOf(TextAnalysis.dsirScoreAgainst(
      Seq((1L, "quantum physics lecture notes"),
        (2L, "buy cheap pills online now"),
        (3L, "   ")).toDF("doc_id", "text"), model, "text", "doc_id"))
    assert(scored(1L)._2 > 0 && scored(2L)._2 < 0,
      s"target-like must be positive, raw-like negative: $scored")
    assert(scored(1L)._2 > scored(2L)._2)
    assert(!scored.contains(3L), "a doc with no tokens has no features — absent")
  }

  test("numBuckets = 1 all-collisions closed form: every score is exactly 0") {
    // one bucket holds EVERY feature of both corpora: ct = Nt, cr = Nr,
    // so lr = ln((Nt+1)/(Nt+1)) − ln((Nr+1)/(Nr+1)) = 0 — maximal
    // collision degrades DSIR to uninformative, never to garbage
    val target = Seq((1L, "aa bb cc"), (2L, "dd ee")).toDF("doc_id", "text")
    val raw = Seq((3L, "xx yy zz ww"), (4L, "vv")).toDF("doc_id", "text")
    val model = TextAnalysis.fitDsir(target, raw, "text", numBuckets = 1)
    val got = scoresOf(TextAnalysis.dsirScoreAgainst(
      Seq((9L, "aa xx new"), (10L, "bb")).toDF("doc_id", "text"),
      model, "text", "doc_id"))
    assert(got(9L) == ((5L, 0.0)), s"got ${got(9L)}")
    assert(got(10L) == ((1L, 0.0)), s"got ${got(10L)}")
  }

  test("hashed scores are partition-invariant and deterministic") {
    val docs = (0L until 60L)
      .map(i => (i, s"tok${i % 7} tok${i % 11} tok${i % 13} shared words here"))
      .toDF("doc_id", "text")
    val target = docs.where(col("doc_id") % 3 === 0)
    val raw = docs.where(col("doc_id") % 3 =!= 0)
    val model = TextAnalysis.fitDsir(target, raw, "text", numBuckets = 10000)
    val a = scoresOf(TextAnalysis.dsirScoreAgainst(raw, model, "text", "doc_id"))
    val b = scoresOf(TextAnalysis.dsirScoreAgainst(raw.repartition(13), model,
      "text", "doc_id"))
    assert(a == b, "scores must not depend on partitioning")
    val model2 = TextAnalysis.fitDsir(target.repartition(7), raw, "text",
      numBuckets = 10000)
    val c = scoresOf(TextAnalysis.dsirScoreAgainst(raw, model2, "text", "doc_id"))
    assert(a == c, "the fit must not depend on partitioning either")
  }

  test("save/load round trip scores identically (frozen-artifact contract)") {
    val target = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val raw = Seq((2L, "beta gamma epsilon zeta"), (3L, "eta theta"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.fitDsir(target, raw, "text", numBuckets = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_rt").toString
    TextAnalysis.saveDsir(model, dir)
    val back = TextAnalysis.loadDsir(spark, dir)
    assert(back.numBuckets == model.numBuckets && back.bEff == model.bEff &&
      back.nTarget == model.nTarget && back.nRaw == model.nRaw &&
      back.zeroLrMicro == model.zeroLrMicro)
    val a = scoresOf(TextAnalysis.dsirScoreAgainst(raw, model, "text", "doc_id"))
    val b = scoresOf(TextAnalysis.dsirScoreAgainst(raw, back, "text", "doc_id"))
    assert(a == b)
  }

  test("resample: exactly k rows, seed-deterministic, ∝ exp(weight) skew") {
    val scored = ((0L until 99L).map(i => (i, 10L, -20.0)) :+ ((500L, 10L, 20.0)))
      .toDF("doc_id", "n_feats", "dsir_logw")
    val once = TextAnalysis.dsirResample(scored, k = 10, seed = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = TextAnalysis.dsirResample(scored, k = 10, seed = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again, "same (corpus, seed) must resample identically")
    assert(once.size == 10)
    // the +20-logw doc is e^40 more likely than any other — its
    // exclusion from ANY fixed-seed draw is numerically impossible
    assert(once.contains(500L), "the overwhelming-weight doc must be drawn")
    val other = TextAnalysis.dsirResample(scored, k = 10, seed = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once != other, "a different seed draws a different sample")
    // k ≥ n degenerates to the whole corpus
    assert(TextAnalysis.dsirResample(scored, k = 1000).count() == 100)
  }

  test("resample temperature: τ = 0 equals the deterministic top-k greedy; τ = 1 is the published draw; τ separates the orders; refusals") {
    // near-uniform weights with a tiny deterministic tilt: at τ = 0
    // the draw is the greedy (score desc, id); at τ = 1 the Gumbel
    // noise (±several units) dominates the 1e-3 score spread, so the
    // draw provably differs from the greedy — the two-temperature
    // ordering difference, pinned
    val scored = (0L until 100L).map(i => (i, 10L, -i.toDouble * 1e-3))
      .toDF("doc_id", "n_feats", "dsir_logw")
    val greedy = scored.orderBy(desc("dsir_logw"), col("doc_id")).limit(10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val cold = TextAnalysis.dsirResample(scored, k = 10, seed = 1L,
        temperature = 0.0)
      .orderBy(desc("dsir_logw"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(cold == greedy,
      s"τ = 0 must equal the deterministic greedy:\n$cold\n$greedy")
    val warm = TextAnalysis.dsirResample(scored, k = 10, seed = 1L,
        temperature = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(warm != greedy.toSet,
      "τ = 1 noise must dominate a 1e-3 score spread and change the draw")
    // the default temperature IS 1.0 — the published draw, unchanged
    val default = TextAnalysis.dsirResample(scored, k = 10, seed = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(default == warm)
    // refusals: negative and NaN temperatures have no sampling meaning
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.dsirResample(scored, k = 5, temperature = -0.5)
    }.getMessage.contains("temperature"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.dsirResample(scored, k = 5, temperature = Double.NaN)
    }.getMessage.contains("temperature"))
  }

  test("refusals: empty target, empty raw, negative buckets, reserved columns") {
    val some = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val blank = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.fitDsir(none, some, "text")
    }.getMessage.contains("TARGET"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.fitDsir(blank, some, "text")
    }.getMessage.contains("TARGET"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.fitDsir(some, none, "text")
    }.getMessage.contains("RAW"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.fitDsir(some, some, "text", numBuckets = -1)
    }.getMessage.contains("numBuckets"))
    val model = TextAnalysis.fitDsir(some, some, "text")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.dsirScoreAgainst(
        some.withColumn("__feat", lit("x")), model, "text", "doc_id")
    }.getMessage.contains("__feat"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.dsirResample(some.withColumn("dsir_logw", lit(0.0)), k = 0)
    }.getMessage.contains("k must be positive"))
  }

  test("two-batch stream drain equals the batch score (stateless per-doc contract)") {
    val target = Seq((100L, "quantum physics lecture notes")).toDF("doc_id", "text")
    val b1 = Seq((1L, "quantum physics article"), (2L, "cheap pills"))
      .toDF("doc_id", "text")
    val b2 = Seq((3L, "physics lecture recap"), (4L, "buy now"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.fitDsir(target, b1.union(b2), "text", numBuckets = 0)
    val want = scoresOf(TextAnalysis.dsirScoreAgainst(b1.union(b2), model,
      "text", "doc_id"))
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_stream")
    b1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    b2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    var batches = 0
    val q = graft.streaming.StreamOps.dsirScorePerBatch(stream, model,
      "text", "doc_id") { (scored, _) =>
      got.synchronized { got ++= scoresOf(scored); batches += 1 }
    }
    try q.processAllAvailable() finally q.stop()
    assert(batches == 2, s"expected 2 micro-batches, saw $batches")
    assert(got.toMap == want, s"stream drain ${got.toMap} vs batch $want")
  }

  private def statsRow(df: org.apache.spark.sql.DataFrame): Map[String, Any] = {
    val r = df.head()
    df.columns.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
  }

  test("bucket stats at numBuckets=1 (all collisions): closed forms for every column") {
    // target: 5 feature occurrences over 5 distinct; raw: 7 over 7;
    // union 12 distinct. One bucket pools everything: its ratio is
    // EXACTLY 0 (ln((nT+1)/(nT+1)) − ln((nR+1)/(nR+1))), so no strict
    // sign flip is possible and mean_abs_gap is the mean |exact lr|.
    val target = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq((2L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val model = TextAnalysis.fitDsir(target, raw, "text", numBuckets = 1)
    val got = statsRow(TextAnalysis.dsirBucketStats(model, target, raw, "text"))
    assert(got("num_buckets") == 1 && got("buckets_hit") == 1L)
    assert(got("distinct_feats") == 12L && got("sampled_feats") == 12L)
    assert(got("feats_per_bucket") == 12.0)
    assert(got("sign_flips") == 0L && got("sign_flip_frac") == 0.0 &&
      got("flip_mass_frac") == 0.0)
    // mean |exact lr|: 5 target-only features at round(1e6·(ln(2/17) −
    // ln(1/19))) and 7 raw-only at round(1e6·(ln(1/17) − ln(2/19))),
    // each micro-rounded HALF_UP before the average — replicated here
    def lrm(ct: Long, cr: Long): Long =
      BigDecimal(1e6 * (math.log((ct + 1) / 17.0) - math.log((cr + 1) / 19.0)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val gaps = Seq.fill(5)(math.abs(lrm(1, 0))) ++ Seq.fill(7)(math.abs(lrm(0, 1)))
    val want = math.rint(gaps.sum.toDouble / 12 / 1e6 * 1e6) / 1e6
    assert(got("mean_abs_gap") == want,
      s"mean_abs_gap ${got("mean_abs_gap")} vs hand-computed $want")
  }

  test("bucket stats: balanced pools + collision-free buckets are EXACT (B cancels); imbalanced pools flip even without collisions") {
    // BALANCED pools (nT == nR): the smoothed ratio collapses to
    // ln((ct+1)/(cr+1)) — the smoothing mass B cancels — so a
    // collision-free bucketing IS the exact model, micro-round for
    // micro-round: gap exactly 0.0, zero flips, one feature per
    // occupied bucket. The telemetry's clean bill of health.
    val bt = (0L until 40L).map(i =>
      (i, s"t${i % 13}a t${i % 7}b t${i % 5}c")).toDF("doc_id", "text")
    val br = (0L until 40L).map(i =>
      (100L + i, s"r${i % 13}a r${i % 7}b r${i % 5}c")).toDF("doc_id", "text")
    val wide = TextAnalysis.fitDsir(bt, br, "text", numBuckets = 1 << 16)
    val gw = statsRow(TextAnalysis.dsirBucketStats(wide, bt, br, "text"))
    assert(gw("sign_flips") == 0L && gw("mean_abs_gap") == 0.0 &&
      gw("flip_mass_frac") == 0.0,
      s"balanced + collision-free must be exact: $gw")
    assert(gw("feats_per_bucket") == 1.0 &&
      gw("buckets_hit") == gw("distinct_feats"), s"$gw")
    // IMBALANCED pools (tiny target vs 40-doc raw): even with ZERO
    // collisions the bucketed model smooths by B = 65536 while the
    // exact model smooths by its ~105-feature vocab, and that alone
    // flips the rare raw-only features the big pool's smoothing
    // renders target-leaning. Sizing numBuckets is about BOTH
    // collisions and the smoothing mass — which is exactly why the
    // telemetry reports flip counts instead of a collision rate alone.
    val it = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val imb = TextAnalysis.fitDsir(it, br, "text", numBuckets = 1 << 16)
    val gi = statsRow(TextAnalysis.dsirBucketStats(imb, it, br, "text"))
    assert(gi("sign_flips").asInstanceOf[Long] > 0L &&
      gi("mean_abs_gap").asInstanceOf[Double] > 0.0,
      s"imbalanced pools must surface the smoothing distortion: $gi")
  }

  test("bucket stats: sampling thins only the comparison; refusals") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val (t, r) = (docs.where(col("doc_id") % 7 === 0),
      docs.where(col("doc_id") % 7 =!= 0))
    val model = TextAnalysis.fitDsir(t, r, "text", numBuckets = 64)
    val full = statsRow(TextAnalysis.dsirBucketStats(model, t, r, "text"))
    val thin = statsRow(TextAnalysis.dsirBucketStats(model, t, r, "text",
      sampleMod = 3))
    // full-corpus columns identical; the sampled comparison shrinks
    assert(thin("buckets_hit") == full("buckets_hit") &&
      thin("distinct_feats") == full("distinct_feats"))
    val (sf, st) = (full("sampled_feats").asInstanceOf[Long],
      thin("sampled_feats").asInstanceOf[Long])
    assert(st < sf && st > 0, s"1-in-3 feature sample: $st of $sf")
    // deterministic: same inputs, same row
    assert(thin == statsRow(TextAnalysis.dsirBucketStats(model, t, r, "text",
      sampleMod = 3)))
    val exact = TextAnalysis.fitDsir(t, r, "text", numBuckets = 0)
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.dsirBucketStats(exact, t, r, "text")
    }.getMessage.contains("HASHED"))
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.dsirBucketStats(model, t, r, "text", sampleMod = 0)
    }.getMessage.contains("sampleMod"))
  }
}
