package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AvgVector
import graft.operators.{Project, TextAnalysis}

class TextMlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenCount / regexTokenCount / punctCount on known text") {
    val df = Seq("Hello, world!  this is   a test").toDF("t").select(
      TextAnalysis.tokenCount(col("t")).as("n"),
      TextAnalysis.regexTokenCount(col("t")).as("r"),
      TextAnalysis.punctCount(col("t")).as("p"))
    val row = df.head()
    assert(row.getLong(0) == 6)            // whitespace tokens
    assert(row.getLong(1) == 8)            // hello , world ! this is a test
    assert(row.getInt(2) == 2)             // , and !
  }

  test("langId: stopword profiles pick the right language; precedence breaks ties; CJK wins on Han text") {
    val df = Seq(
      ("the cat and the dog is in it", "en"),
      ("der hund ist nicht mit der katze", "de"),
      ("el perro es no por una casa como", "es"),
      ("le chat est pas pour une maison dans", "fr"),
      ("这 是 中文 文本", "zh"),
      ("xyzzy plugh", "en") // no signal -> default en
    ).toDF("t", "want")
    val got = df.select(col("want"), TextAnalysis.langId(col("t")).as("got")).collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0), s"text classified as ${r.getString(1)}, want ${r.getString(0)}"))
  }

  test("qualityScore stays in [0,1] and rewards clean english text") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and that is it for you in the end of this test",
      "!!! ??? ### $$$ %%%").toDF("t")
      .select(TextAnalysis.qualityScore(col("t")).as("q"))
    val Array(good, junk) = df.collect().map(_.getDouble(0))
    assert(good > 0.6 && good <= 1.0)
    assert(junk < 0.3 && junk >= 0.0)
  }

  test("contentFingerprint is whitespace/case-insensitive but content-sensitive") {
    val df = Seq(
      ("a", "The  Quick   Fox"), ("b", "the quick fox"), ("c", "the quick wolf")
    ).toDF("id", "t").select(col("id"), TextAnalysis.contentFingerprint(col("t")).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
  }

  test("bm25: rare query terms outweigh common ones; repetition saturates") {
    import graft.operators.TextSearch
    val docs = Seq(
      (1L, "common common common rare"),
      (2L, "common common common common"),
      (3L, "common rare rare rare"),
      (4L, "other words entirely here")
    ).toDF("doc_id", "text")
    val top = TextSearch.bm25TopK(docs, "text", "doc_id", "rare common", k = 4)
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1))
    // doc3 (most 'rare') must beat doc1 (one 'rare'), which beats doc2 (none)
    val order = top.map(_._1).toSeq
    assert(order.indexOf(3L) < order.indexOf(1L))
    assert(order.indexOf(1L) < order.indexOf(2L))
    assert(top.toMap.apply(4L) == 0.0, "no query terms -> score 0")
    // saturation: tripling 'rare' must NOT triple the score
    val s3 = top.toMap.apply(3L); val s1 = top.toMap.apply(1L)
    assert(s3 < 3 * s1)
  }

  test("redact masks emails, phones, and digit runs in order") {
    val df = Seq("mail bob@x.com or call 555-123-4567 room 42").toDF("t")
      .select(TextAnalysis.redact(col("t")).as("r"))
    assert(df.head().getString(0) == "mail <EMAIL> or call <PHONE> room <NUM>")
  }

  test("splitAssign: deterministic, covers all rows, fractions in the right ballpark") {
    val df = spark.range(10000).toDF("id")
      .select(col("id"), TextAnalysis.splitAssign(col("id")).as("split"))
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 8500 && counts("train") < 9500)
    assert(counts("val") > 250 && counts("val") < 800)
    // stable: same assignment on recompute
    val again = spark.range(10000).toDF("id")
      .select(TextAnalysis.splitAssign(col("id")).as("s2"))
    assert(df.select("split").collect().toSeq == again.collect().toSeq)
    // degenerate fractions
    val allTrain = Seq(1L).toDF("id")
      .select(TextAnalysis.splitAssign(col("id"), trainFrac = 1.0, valFrac = 0.0))
    assert(allTrain.head().getString(0) == "train")
  }

  test("hashSampleBy: fractions just under 1.0 keep ~all rows, not zero (hex wraparound regression)") {
    import graft.operators.TextAnalysis
    val df = spark.range(1000).toDF("id").withColumn("s", lit("x"))
    val kept = df.where(TextAnalysis.hashSampleBy(col("id"), col("s"),
      Map("x" -> 0.999))).count()
    assert(kept > 900, s"0.999 fraction kept only $kept/1000")
    val none = df.where(TextAnalysis.hashSampleBy(col("id"), col("s"),
      Map("x" -> 0.0))).count()
    assert(none == 0)
  }

  test("lmScore: hand-computed surprisal, rare scores above common, zero-token docs absent, partition-invariant") {
    // corpus: tokens a:3 b:1 c:1 -> N=5, V=3; add-one p(a)=4/8, p(b)=p(c)=2/8
    // micro-nats: -ln(1/2) -> 693147, -ln(1/4) -> 1386294 (exact integer quanta)
    val df = Seq((1L, "a A b"), (2L, "a c"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(3L), "zero-token doc must be absent")
    assert(out(1L)._1 == 3 && out(2L)._1 == 2)
    // doc1 = (693147 + 693147 + 1386294)/3e6, doc2 = (693147 + 1386294)/2e6
    assert(math.abs(out(1L)._2 - 2772588.0 / 3e6) < 2e-6)
    assert(math.abs(out(2L)._2 - 2079441.0 / 2e6) < 2e-6)
    assert(out(2L)._2 > out(1L)._2, "doc with the rarer token mix must score higher")
    // integer micro-nat sums commute -> identical under any partitioning
    val p1 = TextAnalysis.lmScore(df.repartition(7), "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val p2 = TextAnalysis.lmScore(df.coalesce(1), "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(p1 == p2)
  }

  test("lmScore broadcastCounts path is bit-identical to the shuffle path") {
    val df = Seq((1L, "a A b"), (2L, "a c"), (3L, "b b a x"), (4L, ""))
      .toDF("doc_id", "text").repartition(5)
    val shuffle = TextAnalysis.lmScore(df, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val bcast = TextAnalysis.lmScore(df, "text", "doc_id", broadcastCounts = true)
      .orderBy("doc_id").collect().toSeq
    assert(shuffle == bcast)
  }

  test("qualityBuckets: hand-computed head/middle/tail cuts, tie cohesion, null drop") {
    // group g: scores 1,2,3,4,5 -> F = 0.2, 0.4, 0.6, 0.8, 1.0
    // cuts (0.3, 0.7): 1 -> head; 2,3 -> middle; 4,5 -> tail
    val df = Seq(
      ("a", "g", 1.0), ("b", "g", 2.0), ("c", "g", 3.0),
      ("d", "g", 4.0), ("e", "g", 5.0),
      // group h: a 3-way tie shares F = 0.75 -> all tail together
      ("f", "h", 7.0), ("g1", "h", 9.0), ("g2", "h", 9.0), ("g3", "h", 9.0),
      // null score and null group are dropped, not mislabeled
      ("x", "g", Double.NaN), ("y", null.asInstanceOf[String], 1.0)
    ).toDF("id", "grp", "score")
      .withColumn("score", when(isnan(col("score")), lit(null)).otherwise(col("score")))
    val got = TextAnalysis.qualityBuckets(df, "score", "grp")
      .collect().map(r => r.getString(r.fieldIndex("id")) ->
        r.getString(r.fieldIndex("bucket"))).toMap
    assert(got == Map("a" -> "head", "b" -> "middle", "c" -> "middle",
      "d" -> "tail", "e" -> "tail",
      "f" -> "head", "g1" -> "tail", "g2" -> "tail", "g3" -> "tail"), s"got $got")
    // every group's bucket fractions are computed within the group,
    // independent of partitioning
    val re = TextAnalysis.qualityBuckets(df.repartition(7), "score", "grp")
      .collect().map(r => r.getString(r.fieldIndex("id")) ->
        r.getString(r.fieldIndex("bucket"))).toMap
    assert(re == got)
  }

  test("qualityBuckets quantizeDp bounds the distinct-score frame and merges half-quantum ties") {
    val df = Seq(
      ("a", "g", 1.0001), ("b", "g", 1.0002), ("c", "g", 2.0), ("d", "g", 3.0)
    ).toDF("id", "grp", "score")
    def run(dp: Int) = TextAnalysis.qualityBuckets(df, "score", "grp", quantizeDp = dp)
      .collect().map(r => r.getString(r.fieldIndex("id")) ->
        r.getString(r.fieldIndex("bucket"))).toMap
    // exact (6 dp): F = .25/.5/.75/1 -> head, middle, tail, tail
    assert(run(6) == Map("a" -> "head", "b" -> "middle", "c" -> "tail", "d" -> "tail"))
    // 3 dp: a and b collapse into one score bin, F(bin) = 0.5 -> both middle
    assert(run(3) == Map("a" -> "middle", "b" -> "middle", "c" -> "tail", "d" -> "tail"))
  }

  test("lmScore on an all-empty corpus returns empty, not an error") {
    val df = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(TextAnalysis.lmScore(df, "text", "doc_id").count() == 0)
  }

  test("sampleTemperature keep-set is monotone in the target (growing T only adds rows)") {
    // per-domain boundaries end_d = min(2³², round(min(1, T/(√n_d·Σ√n_e))·2³²))
    // are nondecreasing in T and the md5 buckets are fixed, so a larger
    // target must keep a SUPERSET — the invariant a boundary-rounding
    // regression would break first
    val df = ((0L until 900L).map(i => (i, "big")) ++
      (1000L until 1010L).map(i => (i, "small"))).toDF("id", "dom")
    val keeps = Seq(30L, 100L, 300L, 910L, 10000L).map { t =>
      TextAnalysis.sampleTemperature(df, "id", "dom", t)
        .select("id").collect().map(_.getLong(0)).toSet
    }
    keeps.sliding(2).foreach { case Seq(a, b) =>
      assert(a.subsetOf(b), s"target growth removed rows: ${(a -- b).take(5)}")
    }
    // at T = N the BIG domain is deliberately undersampled (rate
    // 910/(√900·Σ√n) ≈ 0.91 < 1) while the small one saturates — the
    // temperature shift itself; only T far above N keeps every row
    assert(keeps(3).size < 910 && keeps(3).size > 700)
    assert(keeps.last.size == 910)
  }

  test("sampleTemperature resolves keep rates far below 1/256 (the 100 TB mixture case)") {
    // One dominant web domain of 10⁶ rows and a tiny target: the web
    // keep rate T/(√n·Σ√n) ≈ 2e-4 sits far under 1/256, where the old
    // 2-hex-char (256-bucket) boundary rounded to 0 and silently DROPPED the whole
    // domain (or to 1 — a 2.5× over-keep of a 4e-3 rate). At 2³²
    // buckets the realized keep count must land near n·rate. md5 is
    // deterministic, so the count is exact per run — the band below
    // is uniformity slack (±50% ≈ 7 binomial σ), not flakiness.
    val n = 1000000L
    val df = spark.range(n).select(col("id"), lit("web").as("dom"))
      .union(spark.range(2000000L, 2000100L).select(col("id"), lit("rare").as("dom")))
    val t = 200L
    val sqrtSum = math.sqrt(n.toDouble) + math.sqrt(100.0)
    val rateWeb = t / (math.sqrt(n.toDouble) * sqrtSum) // ≈ 1.98e-4
    val kept = TextAnalysis.sampleTemperature(df, "id", "dom", t)
      .groupBy("dom").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expWeb = n * rateWeb // ≈ 198
    val gotWeb = kept.getOrElse("web", 0L)
    assert(gotWeb > 0, "sub-1/256 keep rate dropped the entire dominant domain")
    assert(math.abs(gotWeb - expWeb) < expWeb * 0.5,
      s"web kept $gotWeb rows, expected ≈ ${expWeb.round} (rate $rateWeb)")
    // the rare domain saturates (rate min(1, 200/(10·1010)) ≈ 0.0198 →
    // a couple of rows) — just pin that it neither vanishes by rounding
    // nor over-keeps past its boundary
    val gotRare = kept.getOrElse("rare", 0L)
    assert(gotRare <= 10L, s"rare domain over-kept: $gotRare")
  }

  test("sampleTemperatureStats reports the exact realized per-domain keep counts") {
    // the audit frame must agree row-for-row with what the sampler
    // actually keeps (same boundary table, same md5 predicate), and
    // carry every domain even when its realized keep count is 0
    val df = ((0L until 900L).map(i => (i, "big")) ++
      (1000L until 1010L).map(i => (i, "small"))).toDF("id", "dom")
    val stats = TextAnalysis.sampleTemperatureStats(df, "id", "dom", 100)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val kept = TextAnalysis.sampleTemperature(df, "id", "dom", 100)
      .groupBy("dom").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.keySet == Set("big", "small"))
    assert(stats("big")._1 == 900L && stats("small")._1 == 10L)
    assert(stats("big")._3 == kept.getOrElse("big", 0L))
    assert(stats("small")._3 == kept.getOrElse("small", 0L))
    // rates replay the α = 0.5 rule exactly
    val sqrtSum = math.sqrt(900.0) + math.sqrt(10.0)
    assert(stats("big")._2 == math.min(1.0, 100.0 / (math.sqrt(900.0) * sqrtSum)))
    assert(stats("small")._2 == math.min(1.0, 100.0 / (math.sqrt(10.0) * sqrtSum)))
  }

  test("lmScoreAgainst == lmScore when the frozen model's corpus IS the scored corpus") {
    // the frozen path must reproduce the self-fit path bit-for-bit on
    // the fitting corpus: same add-one formula, same (N + V)
    // denominator, same micro-nat quantization
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "a completely different sentence here")).toDF("doc_id", "text")
    val self = TextAnalysis.lmScore(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val model = TextAnalysis.fitUnigramLm(df, "text")
    val frozen = TextAnalysis.lmScoreAgainst(df, model, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(frozen == self, s"frozen $frozen vs self-fit $self")
    // broadcastCounts is a physical knob only
    val bcast = TextAnalysis.lmScoreAgainst(df, model, "text", "doc_id",
      broadcastCounts = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(bcast == self)
  }

  test("lmScoreAgainst OOV policy: an all-OOV document scores exactly ln(N + V) per token") {
    // model: 4 tokens, 4 distinct -> N = 4, V = 4; every OOV token has
    // p = (0 + 1)/(N + V) = 1/8, so nll = round(1e6·ln 8)/1e6
    val ref = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val model = TextAnalysis.fitUnigramLm(ref, "text")
    assert(model.nTotal == 4L && model.vocab == 4L)
    val shard = Seq((10L, "zz yy xx")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScoreAgainst(shard, model, "text", "doc_id").head()
    val perTok = math.round(1e6 * math.log(8.0)) / 1e6
    assert(got.getLong(1) == 3L)
    assert(got.getDouble(2) == BigDecimal(perTok).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"OOV nll ${got.getDouble(2)} != ln(N+V) = $perTok")
  }

  test("UnigramLm save/load round-trip scores identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram_lm").toString
    val ref = Seq((1L, "the cat sat"), (2L, "the dog ran")).toDF("doc_id", "text")
    val shard = Seq((10L, "the cat ran fast")).toDF("doc_id", "text")
    val model = TextAnalysis.fitUnigramLm(ref, "text")
    TextAnalysis.saveUnigramLm(model, dir)
    val loaded = TextAnalysis.loadUnigramLm(spark, dir)
    assert(loaded.nTotal == model.nTotal && loaded.vocab == model.vocab)
    val a = TextAnalysis.lmScoreAgainst(shard, model, "text", "doc_id").head()
    val b = TextAnalysis.lmScoreAgainst(shard, loaded, "text", "doc_id").head()
    assert(a == b)
  }

  test("lmScoreAgainst refuses an empty model") {
    val empty = TextAnalysis.fitUnigramLm(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text")
    assert(empty.vocab == 0L && empty.nTotal == 0L)
    val shard = Seq((1L, "anything")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.lmScoreAgainst(shard, empty, "text", "doc_id")
    }
    assert(err.getMessage.contains("vocab"))
  }

  test("applyBuckets over bucketBoundaries reproduces qualityBuckets on the fitting corpus") {
    // the monotone-F boundary argument made concrete — including ties
    // sharing a bucket and a group whose head cut is unreachable
    val df = ((0 until 10).map(i => (i.toLong, i.toDouble, "en")) ++
      Seq((100L, 5.0, "de"), (101L, 5.0, "de"), (102L, 9.0, "de")))
      .toDF("id", "score", "lang")
    val direct = TextAnalysis.qualityBuckets(df, "score", "lang")
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bounds = TextAnalysis.bucketBoundaries(df, "score", "lang")
    val frozen = TextAnalysis.applyBuckets(df, bounds, "score", "lang")
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(frozen == direct, s"frozen $frozen vs direct $direct")
    // "de": the tied 5.0 pair has F = 2/3 > 0.3 → head boundary NULL →
    // nothing labels head; both land in middle, 9.0 in tail
    assert(direct(100L) == "middle" && direct(102L) == "tail")
  }

  test("applyBuckets labels NEW shards against frozen thresholds; unknown groups drop") {
    val ref = (0 until 10).map(i => (i.toLong, i.toDouble, "en")).toDF("id", "score", "lang")
    val bounds = TextAnalysis.bucketBoundaries(ref, "score", "lang")
    // en boundaries: F(q) = (q+1)/10 ⇒ head ≤ 2.0, middle ≤ 6.0
    val shard = Seq((50L, 1.5, "en"), (51L, 6.0, "en"), (52L, 8.5, "en"),
      (53L, 2.0, "fr")).toDF("id", "score", "lang")
    val got = TextAnalysis.applyBuckets(shard, bounds, "score", "lang")
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(50L -> "head", 51L -> "middle", 52L -> "tail"),
      s"unknown-group fr row must drop and thresholds must be the reference's: $got")
  }

  test("sampleTemperatureStats survives the natural column names: domainCol named 'domain', corpus carrying n/rate") {
    // regression (r9 verdict What's wrong #2): the stats helper used to
    // join and group on the PUBLIC output names, so domainCol="domain"
    // threw an ambiguous-reference AnalysisException and corpus columns
    // named n/rate collided; internals are __-prefixed now
    val df = ((0L until 200L).map(i => (i, "web", 1L, 0.5)) ++
      (1000L until 1020L).map(i => (i, "books", 2L, 0.9)))
      .toDF("id", "domain", "n", "rate")
    val stats = TextAnalysis.sampleTemperatureStats(df, "id", "domain", 50)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(stats.keySet == Set("web", "books"))
    assert(stats("web")._1 == 200L && stats("books")._1 == 20L)
    val kept = TextAnalysis.sampleTemperature(df, "id", "domain", 50)
      .groupBy("domain").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("web")._2 == kept.getOrElse("web", 0L))
    assert(stats("books")._2 == kept.getOrElse("books", 0L))
  }

  test("qualityBuckets refuses a group whose quantized-score frame exceeds maxDistinctPerGroup, naming quantizeDp") {
    // 2000 near-unique scores (i·1e-6): at dp=6 all distinct → the
    // per-group window would buffer the whole corpus → refuse; at dp=3
    // the quantized domain collapses to ≤ 3 values → pass
    val df = (0L until 2000L).map(i => (i, i * 1e-6, "en")).toDF("id", "score", "lang")
    // the guard rides in-plan (round 12: one job, no separate check
    // pass), so the refusal surfaces at ACTION time via raise_error
    val err = intercept[Exception] {
      TextAnalysis.qualityBuckets(df, "score", "lang", maxDistinctPerGroup = 1000L)
        .collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + chain(t.getCause)
    val all = chain(err)
    assert(all.contains("quantizeDp") && all.contains("en"),
      s"refusal must name the knob and the group: $all")
    val ok = TextAnalysis.qualityBuckets(df, "score", "lang",
      quantizeDp = 3, maxDistinctPerGroup = 1000L)
    assert(ok.count() == 2000L)
  }

  test("qualityBuckets rejects an input frame that already carries the reserved __q column") {
    val df = Seq((1L, 0.5, "en", "x")).toDF("id", "score", "lang", "__q")
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.qualityBuckets(df, "score", "lang")
    }
    assert(err.getMessage.contains("__q"))
  }

  test("sampleTemperature refuses a non-positive target") {
    val df = Seq((1L, "a")).toDF("id", "dom")
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.sampleTemperature(df, "id", "dom", targetRows = 0)
    }
    assert(err.getMessage.contains("targetRows"))
  }

  test("sampleTemperature: upweights the small domain, keeps everything when target >= N, refuses domain blowup") {
    val big = (0L until 900L).map(i => (i, "big"))
    val small = (1000L until 1010L).map(i => (i, "small"))
    val df = (big ++ small).toDF("id", "dom")
    val kept = TextAnalysis.sampleTemperature(df, "id", "dom", targetRows = 100)
      .groupBy("dom").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // keep RATES: small ~0.95, big ~0.10 — alpha=0.5 upweights the rare domain
    val rBig = kept.getOrElse("big", 0L).toDouble / 900
    val rSmall = kept.getOrElse("small", 0L).toDouble / 10
    assert(rSmall > rBig * 3, s"small rate $rSmall should dominate big rate $rBig")
    assert(rBig > 0.03 && rBig < 0.25, s"big keep rate $rBig out of band")
    // deterministic: identical output on recompute
    val a = TextAnalysis.sampleTemperature(df, "id", "dom", 100).orderBy("id").collect().toSeq
    val b = TextAnalysis.sampleTemperature(df.repartition(5), "id", "dom", 100)
      .orderBy("id").collect().toSeq
    assert(a == b)
    // target >= N keeps every row
    assert(TextAnalysis.sampleTemperature(df, "id", "dom", 10000).count() == 910)
    // NULL domains are dropped, not kept silently
    val withNull = df.union(Seq((5000L, null.asInstanceOf[String])).toDF("id", "dom"))
    assert(TextAnalysis.sampleTemperature(withNull, "id", "dom", 10000).count() == 910)
    // guardrail: more distinct domains than maxDomains refuses loudly
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.sampleTemperature(df, "id", "dom", 100, maxDomains = 1)
    }
    assert(err.getMessage.contains("maxDomains"))
  }

  test("chunk: windows with overlap, partial tail kept, empty text yields no chunks") {
    val df = Seq((1L, "a b c d e f g"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, "text", chunkSize = 3, overlap = 1)
      .select("doc_id", "chunk_idx", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    // step 2: [a b c] [c d e] [e f g] [g]
    assert(doc1 == Seq("a b c", "c d e", "e f g", "g"))
    assert(!out.exists(_._1 == 2L), "empty text produces no chunks")
    assert(out.filter(_._1 == 3L).map(_._3).toSeq == Seq("x"))
  }

  test("avg_vector: element-wise mean, NULL vectors skipped, all-NULL group -> NULL") {
    val df = Seq(
      ("g1", Some(Seq(1f, 2f))), ("g1", Some(Seq(3f, 4f))), ("g1", None),
      ("g2", None)
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(AvgVector.column(col("v")).as("c"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Double](1))).toMap
    assert(out("g1").get == Seq(2.0, 3.0))
    assert(out("g2").isEmpty)
  }

  test("pca projection: 2 coords per embedded row, NULL rows dropped") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val out = Project.pca(e, "embedding")
    assert(out.count() == 50)
    assert(out.columns.contains("x") && out.columns.contains("y"))
    val r = out.select("x", "y").head()
    assert(!r.isNullAt(0) && !r.isNullAt(1))
  }

  test("selectTokenBudget: hand-traced prefix incl. the exact-boundary keep; bucket-count invariance == the naive rule; refusals") {
    // order by (score desc, id): 5(100), 4(200), 3(300), 1(400), 2(400)
    // tokens:                      30       50      40      25      25
    // cum:                         30       80     120     145     170
    val docs = Seq(
      (1L, 400.0, 25L), (2L, 400.0, 25L), (3L, 300.0, 40L),
      (4L, 200.0, 50L), (5L, 100.0, 30L)
    ).toDF("doc_id", "score", "toks")
      .select(col("doc_id"), (lit(500.0) - col("score")).as("score"), col("toks"))
    // score remap makes doc 5 best; budget 120 ends EXACTLY on doc 3 —
    // the inclusive boundary keep
    def ids(budget: Long, buckets: Int) =
      TextAnalysis.selectTokenBudget(docs, "score", "doc_id", "toks",
          budget, numBuckets = buckets)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(120L, 8) == Set(5L, 4L, 3L), "exact-boundary doc must keep")
    assert(ids(119L, 8) == Set(5L, 4L), "one token short drops the boundary doc")
    assert(ids(1000L, 8) == Set(1L, 2L, 3L, 4L, 5L), "everything fits")
    assert(ids(0L, 8) == Set.empty, "zero budget keeps nothing with positive tokens")
    // the id tie-break: budget 145 reaches into the (1, 2) score tie —
    // the lower id enters the prefix first
    assert(ids(145L, 8) == Set(5L, 4L, 3L, 1L))
    // bucket-count INVARIANCE: the two-level threshold-find equals the
    // naive global-window rule at every granularity, on a wider
    // random fixture
    val rnd = new scala.util.Random(13)
    val wide = (0L until 400L).map(i =>
        (i, rnd.nextInt(50).toDouble, rnd.nextInt(30).toLong))
      .toDF("doc_id", "score", "toks")
    val naive = wide.select(col("doc_id"), col("score"), col("toks"))
      .collect()
      .sortBy(r => (-r.getDouble(1), r.getLong(0)))
      .scanLeft((0L, 0L)) { case ((_, cum), r) => (r.getLong(0), cum + r.getLong(2)) }
      .drop(1).takeWhile(_._2 <= 2000L).map(_._1).toSet
    for (buckets <- Seq(1, 7, 64, 1024))
      assert(TextAnalysis.selectTokenBudget(wide, "score", "doc_id", "toks",
          2000L, numBuckets = buckets, maxBoundaryRows = 1000000L)
        .select("doc_id").collect().map(_.getLong(0)).toSet == naive,
        s"two-level at $buckets buckets must equal the naive rule")
    // refusals: NULL score, negative tokens, negative budget, the
    // boundary-funnel cap (single-valued scores put everything in one
    // bucket)
    val nullScore = Seq((1L, Some(1.0), 5L), (2L, None, 5L))
      .toDF("doc_id", "score", "toks")
    assert(intercept[IllegalArgumentException](
      TextAnalysis.selectTokenBudget(nullScore, "score", "doc_id", "toks", 5L)
    ).getMessage.contains("NULL"))
    val negTok = Seq((1L, 1.0, -5L)).toDF("doc_id", "score", "toks")
    assert(intercept[IllegalArgumentException](
      TextAnalysis.selectTokenBudget(negTok, "score", "doc_id", "toks", 5L)
    ).getMessage.contains("negative token"))
    intercept[IllegalArgumentException](
      TextAnalysis.selectTokenBudget(docs, "score", "doc_id", "toks", -1L))
    val flat = Seq((1L, 1.0, 5L), (2L, 1.0, 5L), (3L, 1.0, 5L))
      .toDF("doc_id", "score", "toks")
    assert(intercept[IllegalArgumentException](
      TextAnalysis.selectTokenBudget(flat, "score", "doc_id", "toks", 7L,
        maxBoundaryRows = 2L)
    ).getMessage.contains("boundary bucket"))
    // NaN scores refuse BY NAME (they would bucket to NULL and crash
    // the driver prefix read with a bare NPE)
    val nanScore = Seq((1L, 1.0, 5L), (2L, Double.NaN, 5L))
      .toDF("doc_id", "score", "toks")
    assert(intercept[IllegalArgumentException](
      TextAnalysis.selectTokenBudget(nanScore, "score", "doc_id", "toks", 5L)
    ).getMessage.contains("NaN"))
    // reserved staging column refuses instead of silently destroying it
    assert(intercept[IllegalArgumentException](
      TextAnalysis.selectTokenBudget(docs.withColumn("__cum", lit(1)),
        "score", "doc_id", "toks", 5L)
    ).getMessage.contains("__cum"))
    // NULL token counts refuse BY NAME (SQL sum would silently skip
    // them, charging the doc 0 against the budget) — both the mixed
    // case and the all-NULL case (which formerly NPE'd at the minTok
    // aggregate read instead of refusing)
    val nullTok = Seq((1L, 1.0, Some(5L)), (2L, 2.0, None))
      .toDF("doc_id", "score", "toks")
    assert(intercept[IllegalArgumentException](
      TextAnalysis.selectTokenBudget(nullTok, "score", "doc_id", "toks", 5L)
    ).getMessage.contains("toks"))
    val allNullTok = Seq((1L, 1.0), (2L, 2.0)).toDF("doc_id", "score")
      .withColumn("toks", lit(null).cast("long"))
    assert(intercept[IllegalArgumentException](
      TextAnalysis.selectTokenBudget(allNullTok, "score", "doc_id", "toks", 5L)
    ).getMessage.contains("NULL"))
  }

  test("leakSafeSplit: chains land together transitively; non-dup rows degrade to splitAssign; refusals") {
    // a 3-chain (1~2, 2~3 — NO 1~3 pair) plus isolated rows: the
    // whole chain must share one split even though 1 and 3 were never
    // paired directly — the transitivity a per-pair patch misses
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val got = TextAnalysis.leakSafeSplit(docs, "doc_id", pairs)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L),
      s"the chain must share one split: ${got.filterKeys(_ <= 3L)}")
    // the shared split is the REPRESENTATIVE'S (min id = 1)
    val plain = docs.select(col("doc_id"),
        TextAnalysis.splitAssign(col("doc_id")).as("split"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(3L) == plain(1L), "chain members take the representative's split")
    // rows in no pair keep their plain splitAssign value exactly
    (4L to 40L).foreach(i => assert(got(i) == plain(i),
      s"non-dup row $i must degrade to splitAssign"))
    // no pair straddles splits, by construction — assert anyway on a
    // denser random pair set
    val rnd = new scala.util.Random(3)
    val dense = (0 until 30).map(_ =>
      (rnd.nextInt(40).toLong + 1, rnd.nextInt(40).toLong + 1))
      .filter(p => p._1 != p._2).toDF("id1", "id2")
    val g2 = TextAnalysis.leakSafeSplit(docs, "doc_id", dense)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    dense.collect().foreach { r =>
      assert(g2(r.getLong(0)) == g2(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) straddles splits")
    }
    // refusals: existing split column, reserved staging column
    assert(intercept[IllegalArgumentException](
      TextAnalysis.leakSafeSplit(docs.withColumn("split", lit("x")),
        "doc_id", pairs)
    ).getMessage.contains("split"))
    assert(intercept[IllegalArgumentException](
      TextAnalysis.leakSafeSplit(docs.withColumn("__lss_rep", lit(1L)),
        "doc_id", pairs)
    ).getMessage.contains("__lss_rep"))
  }

  test("leakSafeSample: components keep or drop WHOLE (chains included); isolated rows equal the plain hash rule; fraction edges; refusals") {
    val docs = (1L to 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // a 3-chain again — atomicity must hold transitively
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val kept = TextAnalysis.leakSafeSample(docs, "doc_id", pairs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Seq(1L, 2L, 3L).forall(kept) || Seq(1L, 2L, 3L).forall(!kept(_)),
      s"the chain must keep or drop whole: ${kept.filter(_ <= 3L)}")
    // isolated rows follow the plain per-row md5 rule exactly (the
    // hashSampleBy arithmetic on their own id)
    val plainKeep = docs
      .where(TextAnalysis.hashSampleBy(col("doc_id"), col("doc_id") * 0,
        Map.empty, default = 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    (4L to 60L).foreach(i => assert(kept(i) == plainKeep(i),
      s"isolated row $i must follow the plain rule"))
    // random denser graphs: every pair stays atomic
    val rnd = new scala.util.Random(9)
    val dense = (0 until 40).map(_ =>
      (rnd.nextInt(60).toLong + 1, rnd.nextInt(60).toLong + 1))
      .filter(p => p._1 != p._2).toDF("id1", "id2")
    val k2 = TextAnalysis.leakSafeSample(docs, "doc_id", dense, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    dense.collect().foreach(r => assert(
      k2(r.getLong(0)) == k2(r.getLong(1)),
      s"pair (${r.getLong(0)}, ${r.getLong(1)}) split the sample decision"))
    // fraction edges: 1.0 keeps everything, 0.0 keeps nothing
    assert(TextAnalysis.leakSafeSample(docs, "doc_id", pairs, 1.0).count() == 60)
    assert(TextAnalysis.leakSafeSample(docs, "doc_id", pairs, 0.0).count() == 0)
    // refusals: fraction out of range / NaN, reserved staging column
    intercept[IllegalArgumentException](
      TextAnalysis.leakSafeSample(docs, "doc_id", pairs, 1.5))
    intercept[IllegalArgumentException](
      TextAnalysis.leakSafeSample(docs, "doc_id", pairs, Double.NaN))
    assert(intercept[IllegalArgumentException](
      TextAnalysis.leakSafeSample(docs.withColumn("__lss_rep", lit(1L)),
        "doc_id", pairs, 0.5)
    ).getMessage.contains("__lss_rep"))
  }

  test("streaming budget: two score-ordered batches drain to the batch operator on the concatenation; the remaining-budget state carries") {
    // every batch-1 score > every batch-2 score — the arrival order
    // under which the carried per-batch rule provably equals one
    // global selection (the packHist longest-first convention)
    val b1 = Seq((1L, 90.0, 40L), (2L, 80.0, 30L), (3L, 70.0, 50L))
      .toDF("doc_id", "score", "toks")
    val b2 = Seq((10L, 30.0, 20L), (11L, 20.0, 25L), (12L, 10.0, 60L))
      .toDF("doc_id", "score", "toks")
    val dir = java.nio.file.Files.createTempDirectory("graft_budget_stream")
    b1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    b2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    for ((sub, ts) <- Seq("b1" -> 1000000L, "b2" -> 2000000L);
         f <- dir.resolve(sub).toFile.listFiles if f.getName.endsWith(".parquet"))
      f.setLastModified(ts)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastRemaining = -1L
    val q = graft.streaming.StreamOps.selectTokenBudgetPerBatch(stream,
      "score", "doc_id", "toks", budget = 145L, numBuckets = 8,
      onState = (r, _) => lastRemaining = r) { (sel, _) =>
      got.synchronized { got ++= sel.select("doc_id").collect().map(_.getLong(0)) }
    }
    try q.processAllAvailable() finally q.stop()
    // global order: 1(40) 2(30) 3(50) | 10(20) 11(25) 12(60); cum 40,
    // 70, 120, 140, 165 — the budget 145 crosses INSIDE batch 2
    val want = TextAnalysis.selectTokenBudget(b1.union(b2), "score",
        "doc_id", "toks", 145L, numBuckets = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.toSet == want && got.toSet == Set(1L, 2L, 3L, 10L),
      s"score-ordered drain must equal the batch operator: ${got.toSet} vs $want")
    assert(lastRemaining == 145L - 140L,
      s"carried remaining must be budget minus shipped tokens: $lastRemaining")
  }
}
