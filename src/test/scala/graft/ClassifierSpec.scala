package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def weightsOf(m: Classifier.LinearQualityClassifier): Map[String, Long] =
    m.weights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("one hand-computed gradient-descent iteration, including the negative-half rounding") {
    // d1 = "a a b" (y=1), d2 = "a c c" (y=0); minCount=1 so vocab={a,b,c}.
    // All z start at 0 => p=0.5 => rq = -500000 (d1), +500000 (d2).
    //   g_a = round(-500000*2/3) + round(500000*1/3) = -333333 + 166667 = -166666
    //   g_b = round(-500000*1/3) = -166667
    //   g_c = round( 500000*2/3) =  333333
    // updates (lr=1, nDocs=2):
    //   w_a = -round(-166666/2) = -round(-83333.0) = +83333
    //   w_b = -round(-166667/2) = -round(-83333.5) = +83334   <- HALF-AWAY-FROM-ZERO:
    //         Math.round would give floor(-83333.5+0.5) = -83333 => +83333, a 1-unit
    //         divergence from DuckDB's round — this value pins the semantics
    //   w_c = -round( 333333/2) = -round(166666.5) = -166667
    //   bias: rq sums to 0 => stays 0
    val docs = Seq((1L, "a a b", 1), (2L, "a c c", 0)).toDF("id", "text", "y")
    val m = Classifier.fit(docs, "text", "y", "id", minCount = 1L, iters = 1, lr = 1.0, featScale = 1.0)
    assert(weightsOf(m) == Map("a" -> 83333L, "b" -> 83334L, "c" -> -166667L))
    assert(m.biasMicro == 0L)
    // scoring "b" alone: x=1, zq = 83334 => logit 0.083334 exactly
    val s = Classifier.scoreAgainst(Seq((9L, "b")).toDF("id", "text"), m, "text", "id")
      .head()
    assert(s.getAs[Long]("n_toks") == 1L)
    assert(s.getAs[Double]("clf_logit") == 0.083334)
  }

  test("fit is bit-identical across partitionings (the point of integer-quantized gradients)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").withColumn("y", (col("doc_id") % 3 === 0).cast("int"))
    val a = Classifier.fit(docs.repartition(2), "text", "y", "doc_id", iters = 3)
    val b = Classifier.fit(docs.repartition(17), "text", "y", "doc_id", iters = 3)
    assert(a.biasMicro == b.biasMicro)
    assert(weightsOf(a) == weightsOf(b))
  }

  test("learns a planted marker: held-out accuracy and probability separation") {
    val rnd = new scala.util.Random(11)
    val filler = Array("lorem", "ipsum", "dolor", "sit", "amet", "sed", "do", "eiusmod")
    val rows = (0L until 120L).map { i =>
      val y = (i % 2).toInt
      val base = Seq.fill(8 + rnd.nextInt(8))(filler(rnd.nextInt(filler.length)))
      // three planted occurrences: relative-frequency features need the
      // marker to carry real mass (~0.2 of the doc), like a boilerplate
      // phrase would — a single token in 12 is a 0.08 feature that takes
      // many more epochs than a unit test should spend
      val text = (if (y == 1) rnd.shuffle(base ++ Seq.fill(3)("zzmarker")) else base)
        .mkString(" ")
      (i, text, y)
    }
    val df = rows.toDF("id", "text", "y")
    val fit = df.where(col("id") < 80)
    val heldOut = df.where(col("id") >= 80)
    val m = Classifier.fit(fit, "text", "y", "id", minCount = 1L, iters = 24, lr = 4.0, featScale = 1.0)
    val scored = Classifier.scoreAgainst(heldOut, m, "text", "id")
      .join(heldOut.select(col("id"), col("y")), "id")
      .select(col("y"), col("clf_prob")).collect()
    val acc = scored.count(r => (r.getDouble(1) >= 0.5) == (r.getInt(0) == 1)).toDouble /
      scored.length
    assert(acc >= 0.9, s"held-out accuracy $acc")
    val pos = scored.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val neg = scored.filter(_.getInt(0) == 0).map(_.getDouble(1))
    assert(pos.sum / pos.length > neg.sum / neg.length + 0.2,
      s"mean prob pos ${pos.sum / pos.length} vs neg ${neg.sum / neg.length}")
    // and the marker carries the largest positive weight
    val w = weightsOf(m)
    assert(w("zzmarker") == w.values.max)
  }

  test("save/load round-trips: identical weights, identical scores") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").withColumn("y", (col("doc_id") % 3 === 0).cast("int"))
    val m = Classifier.fit(docs.where(col("doc_id") < 200), "text", "y", "doc_id", iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_clf").toString
    Classifier.save(m, dir)
    val re = Classifier.load(spark, dir)
    assert(re.biasMicro == m.biasMicro && re.iters == m.iters &&
      re.lr == m.lr && re.minCount == m.minCount)
    assert(weightsOf(re) == weightsOf(m))
    val score = docs.where(col("doc_id") >= 200 && col("doc_id") < 260)
    val a = Classifier.scoreAgainst(score, m, "text", "doc_id").orderBy("doc_id").collect()
    val b = Classifier.scoreAgainst(score, re, "text", "doc_id").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("broadcastWeights scoring is bit-identical to the shuffle join") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").withColumn("y", (col("doc_id") % 3 === 0).cast("int"))
    val m = Classifier.fit(docs.where(col("doc_id") < 200), "text", "y", "doc_id", iters = 2)
    val score = docs.where(col("doc_id") >= 200 && col("doc_id") < 300)
    val a = Classifier.scoreAgainst(score, m, "text", "doc_id").orderBy("doc_id").collect()
    val b = Classifier.scoreAgainst(score, m, "text", "doc_id", broadcastWeights = true)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("OOV-only documents are absent from scoring; OOV tokens are invisible to in-vocab docs") {
    val m = Classifier.fit(Seq((1L, "a a b", 1), (2L, "a c c", 0)).toDF("id", "text", "y"),
      "text", "y", "id", minCount = 1L, iters = 1, lr = 1.0, featScale = 1.0)
    val scored = Classifier.scoreAgainst(
      Seq((1L, "qq zz"), (2L, "b qq")).toDF("id", "text"), m, "text", "id").collect()
    assert(scored.map(_.getLong(0)).toSet == Set(2L))
    // doc 2's OOV token contributes to neither numerator nor denominator
    assert(scored.head.getAs[Long]("n_toks") == 1L)
    assert(scored.head.getAs[Double]("clf_logit") == 0.083334)
  }

  test("guards: non-0/1 labels, empty vocab, iters and lr bounds all refuse") {
    val ok = Seq((1L, "a a b", 1), (2L, "a c c", 0)).toDF("id", "text", "y")
    val badLabel = Seq((1L, "a b", 2)).toDF("id", "text", "y")
    assert(intercept[IllegalArgumentException](
      Classifier.fit(badLabel, "text", "y", "id")).getMessage.contains("0/1"))
    assert(intercept[IllegalArgumentException](
      Classifier.fit(ok, "text", "y", "id", minCount = 100L))
      .getMessage.contains("vocabulary"))
    assert(intercept[IllegalArgumentException](
      Classifier.fit(ok, "text", "y", "id", iters = 0)).getMessage.contains("iters"))
    assert(intercept[IllegalArgumentException](
      Classifier.fit(ok, "text", "y", "id", iters = 65)).getMessage.contains("iters"))
    assert(intercept[IllegalArgumentException](
      Classifier.fit(ok, "text", "y", "id", lr = 0.0)).getMessage.contains("lr"))
  }

  test("evaluate: hand-computed accuracy and log-loss; more iterations strictly improve both on the marker task") {
    // hand case: probs 0.9 (y=1, hit, -ln 0.9), 0.4 (y=1, miss, -ln 0.4),
    // 0.2 (y=0, hit, -ln 0.8) => acc 2/3, logloss = mean of the three
    val scored = Seq((1L, Some(1), 0.9), (2L, Some(1), 0.4), (3L, Some(0), 0.2),
        (4L, None: Option[Int], 0.5))
      .toDF("id", "y", "clf_prob")
    val (n, acc, ll) = Classifier.evaluate(scored, "y")
    assert(n == 3L && acc == 2.0 / 3.0)
    val want = (math.round(-1e6 * math.log(0.9)) + math.round(-1e6 * math.log(0.4)) +
      math.round(-1e6 * math.log(0.8))).toDouble / 3e6
    assert(math.abs(ll - want) < 1e-12, s"$ll vs $want")
    // a clamped p=0.0 row contributes ln(1e-6), not infinity
    val (_, _, llClamped) = Classifier.evaluate(
      Seq((1L, Some(1), 0.0)).toDF("id", "y", "clf_prob"), "y")
    assert(llClamped > 13.0 && llClamped < 14.0, llClamped.toString)

    // convergence is MEASURED, not assumed: on the planted-marker task
    // 8 iterations must beat 1 on held-out log-loss
    val rnd = new scala.util.Random(23)
    val filler = Array("lorem", "ipsum", "dolor", "sit", "amet", "sed", "do", "eiusmod")
    val rows = (0L until 120L).map { i =>
      val y = (i % 2).toInt
      val base = Seq.fill(8 + rnd.nextInt(8))(filler(rnd.nextInt(filler.length)))
      val text = (if (y == 1) rnd.shuffle(base ++ Seq.fill(3)("zzmarker")) else base)
        .mkString(" ")
      (i, text, y)
    }
    val df = rows.toDF("id", "text", "y")
    val fit = df.where(col("id") < 80)
    val heldOut = df.where(col("id") >= 80)
    def lossAt(iters: Int): Double = {
      val m = Classifier.fit(fit, "text", "y", "id",
        minCount = 1L, iters = iters, lr = 4.0, featScale = 1.0)
      val scoredHo = Classifier.scoreAgainst(heldOut, m, "text", "id")
        .join(heldOut.select(col("id"), col("y")), "id")
      Classifier.evaluate(scoredHo, "y")._3
    }
    val (l1, l8) = (lossAt(1), lossAt(8))
    assert(l8 < l1, s"held-out log-loss must improve with iterations: $l1 -> $l8")
  }

  test("broadcast-weights fit is bit-identical to the shuffle-join fit") {
    // the r14 default ships the vocab-bounded weight frame broadcast so
    // the feature frame keeps its doc partitioning across iterations;
    // the integer sums commute, so the plan shape must not move a bit
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("y", (col("doc_id") % 3 === 0).cast("int"))
    val a = Classifier.fit(docs, "text", "y", "doc_id", iters = 3)
    val b = Classifier.fit(docs, "text", "y", "doc_id", iters = 3,
      broadcastWeights = false)
    assert(a.biasMicro == b.biasMicro)
    assert(weightsOf(a) == weightsOf(b))
  }

  test("BPE tokenizer seam: subword fits diverge from whitespace and score what the word vocab drops") {
    import graft.operators.TextAnalysis
    val fitDocs = Seq(
      (1L, "goodness goodness brightness brightness", 1),
      (2L, "goodness brightness goodness brightness", 1),
      (3L, "darkness darkness sadness sadness", 0),
      (4L, "sadness darkness sadness darkness", 0)).toDF("id", "text", "y")
    // FEW merges: fit words keep leftover single-char units, so an
    // unseen word's subwords overlap the fit vocab (checked below as a
    // fixture precondition, not assumed)
    val bpe = TextAnalysis.fitBpe(fitDocs, "text", numMerges = 5, maxWords = 1000)
    val tok = Classifier.BpeTokenizer(bpe)
    val ws = Classifier.fit(fitDocs, "text", "y", "id", minCount = 1L, iters = 4, lr = 2.0)
    val sub = Classifier.fit(fitDocs, "text", "y", "id", minCount = 1L, iters = 4,
      lr = 2.0, tokenizer = tok)
    // different unit systems -> different vocabularies and weights
    assert(weightsOf(ws) != weightsOf(sub),
      "whitespace and BPE fits must diverge — they see different feature units")
    // an OOV-heavy probe: "goodish" never occurs as a WORD, so the
    // word-level model drops the doc entirely; its BPE decomposition
    // shares units with the fit corpus, so the subword model scores it
    val probe = Seq((9L, "goodish")).toDF("id", "text")
    val fitUnits = fitDocs.select(explode(TextAnalysis.bpeTokens(col("text"), bpe)).as("t"))
      .distinct().as[String].collect().toSet
    val probeUnits = probe.select(explode(TextAnalysis.bpeTokens(col("text"), bpe)).as("t"))
      .as[String].collect().toSet
    assert(probeUnits.exists(fitUnits), // fixture precondition
      s"probe subwords $probeUnits must overlap fit units")
    assert(Classifier.scoreAgainst(probe, ws, "text", "id").collect().isEmpty,
      "word-level model must drop the all-OOV doc")
    val scored = Classifier.scoreAgainst(probe, sub, "text", "id", tokenizer = tok).collect()
    assert(scored.length == 1, "subword model must score the doc via in-vocab units")
  }

  test("fromWeights import seam refuses duplicate tokens and non-long weights") {
    val dup = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("__tok", "__w_micro")
    val e = intercept[IllegalArgumentException](
      Classifier.fromWeights(dup, 0L, 8, 1.0, 2L, 10.0))
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    val wrong = Seq(("a", 1.0)).toDF("__tok", "__w_micro")
    val e2 = intercept[IllegalArgumentException](
      Classifier.fromWeights(wrong, 0L, 8, 1.0, 2L, 10.0))
    assert(e2.getMessage.contains("LongType"), e2.getMessage)
    // null __tok gets its OWN message (r14 ADVICE) — countDistinct
    // ignores NULLs, so without the explicit check this frame would be
    // refused with a misleading "duplicate" complaint
    val withNull = Seq((Some("a"), 1L), (None: Option[String], 2L))
      .toDF("__tok", "__w_micro")
    val e3 = intercept[IllegalArgumentException](
      Classifier.fromWeights(withNull, 0L, 8, 1.0, 2L, 10.0))
    assert(e3.getMessage.contains("null __tok"), e3.getMessage)
  }

  test("hashed feature buckets: numBuckets=0 is the exact degenerate; buckets bound the artifact") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("y", (col("doc_id") % 3 === 0).cast("int"))
    // the knob's 0 value IS the pre-knob fit, bit for bit
    val exact = Classifier.fit(docs, "text", "y", "doc_id", iters = 2)
    val zero = Classifier.fit(docs, "text", "y", "doc_id", iters = 2, numBuckets = 0)
    assert(zero.exact && weightsOf(zero) == weightsOf(exact) &&
      zero.biasMicro == exact.biasMicro)
    // a hashed fit's weight frame is ≤ numBuckets rows REGARDLESS of
    // vocab — the fastText artifact bound (r15 VERDICT #3); minCount=1
    // opens the full fixture vocab so the bound visibly bites
    val vocabSize = Classifier.fit(docs, "text", "y", "doc_id", iters = 1,
      minCount = 1L).weights.count()
    val hashed = Classifier.fit(docs, "text", "y", "doc_id", iters = 2,
      minCount = 1L, numBuckets = 16)
    assert(!hashed.exact && hashed.numBuckets == 16)
    val nw = hashed.weights.count()
    assert(nw <= 16, s"hashed weight frame has $nw rows > 16 buckets")
    assert(vocabSize > 16,
      s"fixture vocab $vocabSize must exceed the bucket count for the bound to bite")
    // determinism across partitionings survives the hash (xxhash64 is
    // a pure column function; the integer-GD argument is unchanged)
    val h2 = Classifier.fit(docs.repartition(17), "text", "y", "doc_id",
      iters = 2, minCount = 1L, numBuckets = 16)
    assert(weightsOf(h2) == weightsOf(hashed) && h2.biasMicro == hashed.biasMicro)
    // refuse-don't-guess on a negative bucket count
    assert(intercept[IllegalArgumentException](
      Classifier.fit(docs, "text", "y", "doc_id", numBuckets = -1))
      .getMessage.contains("numBuckets"))
  }

  test("hashed model: collisions share weight, fit-OOV tokens score through their bucket, save/load keeps the coding") {
    // two buckets force collisions: every token lands in an occupied
    // bucket, so a doc whose tokens are ALL fit-OOV still scores under
    // the hashed model (the fastText open-vocabulary rung) while the
    // exact model drops it
    val fit = Seq((1L, "alpha alpha beta gamma", 1),
      (2L, "delta delta epsilon zeta", 0),
      (3L, "alpha beta beta gamma", 1),
      (4L, "delta epsilon epsilon zeta", 0)).toDF("id", "text", "y")
    val exact = Classifier.fit(fit, "text", "y", "id", minCount = 1L, iters = 2)
    val hashed = Classifier.fit(fit, "text", "y", "id", minCount = 1L, iters = 2,
      numBuckets = 2)
    assert(hashed.weights.count() <= 2)
    val probe = Seq((9L, "quux xyzzy corge")).toDF("id", "text") // all fit-OOV
    assert(Classifier.scoreAgainst(probe, exact, "text", "id").isEmpty,
      "exact model must drop the all-OOV doc")
    val hs = Classifier.scoreAgainst(probe, hashed, "text", "id").collect()
    assert(hs.length == 1 && hs.head.getAs[Long]("n_toks") == 3L,
      "hashed model must score every token through its bucket")
    // colliding tokens share ONE weight row: any two tokens in the same
    // bucket always contribute the same per-occurrence micro-logit
    val w = hashed.weights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketOf = spark.sql(
      "SELECT CAST(pmod(xxhash64('alpha'), 2) AS STRING) a, " +
        "CAST(pmod(xxhash64('quux'), 2) AS STRING) q").head()
    assert(w.contains(bucketOf.getString(0)), "alpha's bucket must be in-vocab")
    assert(w.contains(bucketOf.getString(1)), "quux scores via an occupied bucket")
    // persistence: numBuckets survives the round trip and the reloaded
    // model scores identically (the frozen-feature-space contract)
    val dir = java.nio.file.Files.createTempDirectory("clf_hashed").toString
    try {
      Classifier.save(hashed, dir)
      val re = Classifier.load(spark, dir)
      assert(re.numBuckets == 2 && !re.exact)
      val a = Classifier.scoreAgainst(fit, hashed, "text", "id")
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
      val b = Classifier.scoreAgainst(fit, re, "text", "id")
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
      assert(a == b)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
