package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AvgVector
import graft.operators.{Fusion, IvfIndex, SimJoin}
import graft.sources.VecIO

/** Loud-failure guarantees added in review: operators that would
  * otherwise silently produce wrong results or degenerate plans must
  * throw instead. */
class GuardrailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Fusion.rrf errors loudly when an input exceeds the bounded-list cap") {
    import spark.implicits._
    val big = (1L to 500L).map(i => (i, 1.0 / i)).toDF("id", "score")
    val fused = Fusion.rrf(Seq(big), "id", "score", maxRows = 100)
    val e = intercept[Exception] { fused.collect() }
    assert(e.getMessage.contains("pre-limited top-N"),
      s"expected the rrf bound message, got: ${e.getMessage}")
    // and a compliant input still works with the guard in the plan
    val small = (1L to 50L).map(i => (i, 1.0 / i)).toDF("id", "score")
    assert(Fusion.rrf(Seq(small), "id", "score", maxRows = 100).count() == 50)
  }

  test("Fusion.rrf cap survives column pruning (id-only consumer still trips it)") {
    import spark.implicits._
    val big = (1L to 500L).map(i => (i, 1.0 / i)).toDF("id", "score")
    val fused = Fusion.rrf(Seq(big), "id", "score", maxRows = 100)
    // a consumer that never evaluates rrf_score would let Catalyst prune
    // the rank columns; the guard rides on the id column, so it fires
    val e = intercept[Exception] { fused.select("id").collect() }
    assert(e.getMessage.contains("pre-limited top-N"),
      s"expected the rrf bound message on an id-only plan, got: ${e.getMessage}")
    // and the converse: a SCORE-only consumer of a single ranking (no
    // join keeping the guarded id alive) must also trip the cap — the
    // guard rides the rank feeding the score too
    val e2 = intercept[Exception] { fused.select("rrf_score").collect() }
    assert(e2.getMessage.contains("pre-limited top-N"),
      s"expected the rrf bound message on a score-only plan, got: ${e2.getMessage}")
  }

  test("approx_count_distinct (HLL) stays within 10% of the exact distinct count") {
    val d = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("events_daily_users_approx")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("events_daily_users")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (day, n) =>
      val a = approx(day)
      assert(math.abs(a - n).toDouble / math.max(n, 1) < 0.1,
        s"$day: approx $a strays >10% from exact $n (rsd was 0.02)")
    }
  }

  test("percentile_approx stays within 5% of the exact per-group median") {
    val d = "/root/testdata/sf0.001"
    val approxRows = SparkEntry.queries("doc_length_stats_approx")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("doc_length_stats")(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(approxRows.keySet == exact.keySet)
    // the sketch returns an actual element while exact percentile()
    // interpolates — on tiny groups those can legitimately diverge, so
    // bound the error only where the group is dense enough for the
    // sketch's accuracy contract to be meaningful
    val dense = exact.filter { case (lang, _) => approxRows(lang)._1 >= 30 }
    assert(dense.nonEmpty, "fixture must have at least one dense language group")
    dense.foreach { case (lang, p50) =>
      val a = approxRows(lang)._2
      assert(math.abs(a - p50) / math.max(p50, 1.0) < 0.05,
        s"$lang: approx p50 $a strays >5% from exact $p50")
    }
  }

  test("avg_vector throws on mixed dimensions instead of truncating") {
    import spark.implicits._
    val mixed = Seq(
      ("a", Seq(1f, 2f)),
      ("a", Seq(1f, 2f, 3f))).toDF("k", "v")
    val e = intercept[Exception] {
      mixed.groupBy("k").agg(AvgVector.column(col("v"))).collect()
    }
    assert(e.getMessage != null)
    // equal dims still aggregate
    val ok = Seq(("a", Seq(1f, 3f)), ("a", Seq(3f, 5f))).toDF("k", "v")
      .groupBy("k").agg(AvgVector.column(col("v")).as("c")).head.getSeq[Double](1)
    assert(ok == Seq(2.0, 4.0))
  }

  test("VecIO sidecar survives quotes/newlines in the embedding column name") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_guardrail").toString
    val df = Seq((1L, "x")).toDF("id", "text")
    val weird = "emb\"col\nwith\tescapes\\"
    VecIO.write(VecFrame(df, weird, None), s"$dir/coll")
    val back = VecIO.read(spark, s"$dir/coll")
    assert(back.embeddingCol == weird)
  }

  test("knnJoinAgg and IvfIndex.searchMany reject non-integral id columns up front") {
    import spark.implicits._
    val corpus = Seq(("a", Seq(1f, 0f)), ("b", Seq(0f, 1f))).toDF("cid", "emb")
    val queries = Seq((1L, Seq(1f, 0f))).toDF("qid", "qe")
    val e1 = intercept[IllegalArgumentException] {
      SimJoin.knnJoinAgg(queries, corpus, "qid", "qe", "cid", "emb", k = 1)
    }
    assert(e1.getMessage.contains("knnJoinAgg"))
    // an index whose corpus ids are strings must refuse the long-id
    // batch path at call time, not encode NULLs mid-job
    val strCorpus = Seq(("a", Seq(1f, 0f)), ("b", Seq(0f, 1f)),
      ("c", Seq(1f, 1f)), ("d", Seq(0.5f, 1f))).toDF("cid", "emb")
    val idx = IvfIndex.build(strCorpus, "emb", nlist = 2)
    val e2 = intercept[IllegalArgumentException] {
      idx.searchMany(queries, "qid", "qe", "cid", k = 1)
    }
    assert(e2.getMessage.contains("searchMany"))
  }

  test("temporal joins and minhash refuse malformed parameters at construction") {
    import spark.implicits._
    import graft.operators.{AsofJoin, Dedup, RangeJoin}
    val df = Seq((1L, "a", new java.sql.Timestamp(1000L))).toDF("id", "k", "t")
    // as-of: payload/tiebreak columns must exist on the right side
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.backward(df, df, "k", "k", "t", "t",
        rightPayload = Seq("nope"), rightTieBreak = "id")
    }
    assert(e1.getMessage.contains("rightPayload"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.backward(df, df, "k", "k", "t", "t",
        rightPayload = Seq("id"), rightTieBreak = "nope")
    }
    assert(e2.getMessage.contains("rightTieBreak"))
    // range join: windows and buckets must be positive durations
    val e3 = intercept[IllegalArgumentException] {
      RangeJoin.pointsInLookback(df, df, "k", "k", "t", "t",
        rightPayload = Seq("id"), lookbackSec = 0L, bucketSec = 60L)
    }
    assert(e3.getMessage.contains("lookbackSec"))
    val e4 = intercept[IllegalArgumentException] {
      RangeJoin.pointsInLookback(df, df, "k", "k", "t", "t",
        rightPayload = Seq("id"), lookbackSec = 60L, bucketSec = -1L)
    }
    assert(e4.getMessage.contains("bucketSec"))
    // minhash: band count must divide the signature width
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val e5 = intercept[IllegalArgumentException] {
      Dedup.minhashPairs(docs, "text", "doc_id", 0.5, numHashes = 128, bands = 7)
    }
    assert(e5.getMessage.contains("divide"))
    // signature expression: bounds on the hash count
    val e6 = intercept[IllegalArgumentException] {
      graft.expressions.MinHashSig(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("text")),
        numHashes = 0)
    }
    assert(e6.getMessage.contains("numHashes"))
  }

  test("winnowOverlapPairs df-cap floors at 2: a 2-doc shared passage survives on a tiny corpus") {
    import spark.implicits._
    import graft.operators.Dedup
    // 3 docs, copied passage shared by exactly 2; ndocs*maxDfFraction =
    // 3*0.05 = 0.15 < 2 — a cap floored at 1 would drop EVERY shared
    // fingerprint and silently return zero pairs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "prelude text then the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely unrelated content about spark shuffles and joins")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, "text", "doc_id",
      minShared = 2, maxDfFraction = 0.05).collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L,
      s"expected the copied passage pair (1,2), got ${pairs.mkString(",")}")
  }

  test("as-of join is deterministic under duplicate (key, time, tieBreak) right rows") {
    import spark.implicits._
    import graft.operators.AsofJoin
    val ts = new java.sql.Timestamp(10000L)
    val left = Seq((100L, "k", new java.sql.Timestamp(20000L))).toDF("lid", "k", "t")
    // two right rows identical in key, time AND tie-break, differing
    // only in payload — the full-payload disambiguator must pick the
    // greatest payload struct regardless of partition order
    val rightRows = Seq(("k", ts, 7L, "alpha"), ("k", ts, 7L, "zeta"))
    for (right <- Seq(rightRows.toDF("k", "t", "tb", "payload").repartition(4),
        rightRows.reverse.toDF("k", "t", "tb", "payload").coalesce(1))) {
      val out = AsofJoin.backward(left, right, "k", "k", "t", "t",
        rightPayload = Seq("payload"), rightTieBreak = "tb").collect()
      assert(out.length == 1 && out.head.getAs[String]("asof_payload") == "zeta",
        s"expected the greatest payload 'zeta' deterministically, got ${out.mkString(",")}")
    }
  }

  test("VocabCountEmbedder refuses vocab terms that would corrupt the params round-trip") {
    val e = intercept[IllegalArgumentException] { VocabCountEmbedder(Seq("ok", "a,b")) }
    assert(e.getMessage.contains("comma"))
    val e2 = intercept[IllegalArgumentException] { VocabCountEmbedder(Seq("two words")) }
    assert(e2.getMessage.contains("whitespace"))
    // clean vocab still round-trips through the registry
    val emb = VocabCountEmbedder(Seq("alpha", "beta"))
    val back = EmbedderRegistry.load(emb.name, emb.params, modelDir = "/nonexistent")
    assert(back == emb)
  }

  test("approxCosineSelfJoin refuses thresholds outside (0, 1]") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("id", "emb")
    // at threshold ≤ 0 the exact join emits zero-vs-real pairs (cosine
    // = 0 by convention) the LSH banding can never generate — refuse
    for (t <- Seq(0.0, -0.5, 1.5)) {
      intercept[IllegalArgumentException] {
        SimJoin.approxCosineSelfJoin(df, "id", "emb", threshold = t)
      }
    }
    // boundary 1.0 is legal
    SimJoin.approxCosineSelfJoin(df, "id", "emb", threshold = 1.0)
  }

  test("RandomProjectionKeys plane cache stays bounded under many configs") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vec = new GenericArrayData(Array[Double](1.0, 2.0, 3.0))
    // 4× the cap of distinct seeds: an unbounded executor-lifetime map
    // would reach 4·cap entries; the bound evicts one entry per insert
    // instead, so the steady state is exactly full — never above, and
    // never the empty map a clear()-style eviction would leave behind
    val cap = graft.expressions.RandomProjectionKeys.MaxCachedPlaneSets
    for (seed <- 0 until cap * 4) {
      graft.expressions.RandomProjectionKeys.keys(vec, isFloat = false,
        numTables = 2, bucketLength = 1.0, seed = seed, projsPerTable = 1)
    }
    assert(graft.expressions.RandomProjectionKeys.planeCacheSize == cap,
      "plane cache should sit exactly at its bound under single-entry eviction")
    // determinism across eviction: regenerating an evicted entry yields
    // identical keys (plane content is a pure function of the key)
    val k1 = graft.expressions.RandomProjectionKeys.keys(vec, isFloat = false,
      numTables = 2, bucketLength = 1.0, seed = 0, projsPerTable = 1)
    val k2 = graft.expressions.RandomProjectionKeys.keys(vec, isFloat = false,
      numTables = 2, bucketLength = 1.0, seed = 0, projsPerTable = 1)
    assert(k1.toLongArray().sameElements(k2.toLongArray()))
  }

  test("IVF cache reap honors the grace period and the exact name shape") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_reap").toFile
    def mk(name: String, ageMs: Long): java.io.File = {
      val f = new java.io.File(tmp, name)
      assert(f.mkdir())
      assert(f.setLastModified(System.currentTimeMillis() - ageMs))
      f
    }
    val keep = mk("graft_ivf_persist_fix_111_222", 7200000L)   // current fp
    val stale = mk("graft_ivf_persist_fix_1_2", 7200000L)      // old fp, past grace
    val recent = mk("graft_ivf_persist_fix_3_4", 1000L)        // old fp, within grace
    val other = mk("graft_ivf_persist_fix_v2_5_6", 7200000L)   // different dataset
    SparkEntry.reapStaleIvfCaches(tmp, "graft_ivf_persist_fix",
      keepName = "graft_ivf_persist_fix_111_222")
    assert(keep.exists(), "current fingerprint must survive")
    assert(!stale.exists(), "old fingerprint past the grace period must be reaped")
    assert(recent.exists(), "a cache touched within the grace period must survive (mid-read race)")
    assert(other.exists(), "a different dataset whose name extends the base must survive")
  }

  test("Bloom saturation guard: quiet below warn, message in the soft band, refusal names the design capacity") {
    import graft.operators.ParaBloom
    // fresh filter: quiet
    val b = ParaBloom.create(expectedItems = 1000, fpp = 0.01)
    assert(ParaBloom.saturationGuard(b).isEmpty)
    // fed to ~design capacity: fill ~50% — still under the 55% warn line
    var i = 0L
    while (i < 1000) { b.add(i * 0x9e3779b97f4a7c15L, i + 7); i += 1 }
    assert(ParaBloom.saturationGuard(b).isEmpty,
      s"design-load fill ${b.fillRatio} should sit under the warn line")
    // soft band: warn with the design capacity named
    while (i < 1400) { b.add(i * 0x9e3779b97f4a7c15L, i + 7); i += 1 }
    assert(b.fillRatio > 0.55 && b.fillRatio <= 0.7,
      s"fixture drifted: fill ${b.fillRatio} not in the warn band")
    val warn = ParaBloom.saturationGuard(b)
    assert(warn.exists(_.contains("expectedItems")), s"warn must name the capacity: $warn")
    // hard band: refuse-with-advice, naming expectedItems and the
    // sharded remedy
    while (i < 3000) { b.add(i * 0x9e3779b97f4a7c15L, i + 7); i += 1 }
    val e = intercept[IllegalStateException](ParaBloom.saturationGuard(b))
    assert(e.getMessage.contains("expectedItems") &&
      e.getMessage.contains(b.designItems.toString) &&
      e.getMessage.contains("ParaBloomBank"),
      s"refusal must name the design capacity and both remedies: ${e.getMessage}")
    // malformed thresholds refuse
    intercept[IllegalArgumentException](ParaBloom.saturationGuard(b, 0.8, 0.7))
  }

  test("bounded SemDeDup store warns ONCE per cell when it crosses exactCapPerCell, naming cap and remedy") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dim = emb.where(col("embedding").isNotNull)
      .select(size(col("embedding"))).head().getInt(0)
    val model = graft.operators.PqIndex.fit(emb, "embedding", m = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup_capwarn")
    emb.where(col("vec_id") < 100).coalesce(1)
      .write.parquet(dir.resolve("d").toString)
    val stream = spark.readStream.schema(emb.schema)
      .parquet(dir.resolve("d").toString)
    // capture the warning: the wrapper prints to System.err
    val errBuf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    System.setErr(new java.io.PrintStream(errBuf, true))
    try {
      // one cell, cap 1: the first batch has ~dozens of survivors in
      // that cell, so the cap is crossed in the very first batch
      val q = graft.streaming.StreamOps.semanticDedupPerBatchBounded(stream,
        Array(Array.fill(dim)(0f)), model, "embedding", "vec_id", 0.95,
        exactCapPerCell = 1L) { (_, _) => () }
      try q.processAllAvailable() finally q.stop()
    } finally System.setErr(realErr)
    val err = errBuf.toString
    assert(err.contains("crossed") && err.contains("exactCapPerCell = 1"),
      s"cap crossing must warn naming the cap; stderr was:\n$err")
    assert(err.contains("raise the cap") || err.contains("refit"),
      s"warning must name a remedy; stderr was:\n$err")
  }

  test("overfed streaming Bloom store refuses mid-stream instead of silently over-dropping") {
    import graft.operators.ParaBloom
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_overfeed")
    val docs = (1L to 40L).map(i => (i, s"wholly unique paragraph number $i"))
      .toDF("doc_id", "text")
    docs.coalesce(1).write.parquet(dir.resolve("b1").toString)
    // a 2-item filter fed 40 distinct paragraphs saturates immediately;
    // the post-absorb guard (r14 ADVICE) makes the OVERFILLING batch
    // itself surface the refusal — after its rows were delivered to
    // the sink (they're absorbed, so a replay would re-drop them), but
    // before any further batch's decisions trust the saturated filter
    val tiny = ParaBloom.create(expectedItems = 2, fpp = 0.5)
    var delivered = 0L
    val s1 = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.resolve("b1").toString)
    val q1 = graft.streaming.StreamOps.dedupParagraphsPerBatchBloomFrom(
      s1, "text", "doc_id", "\n", 1, tiny) { (b, _) => delivered += b.count() }
    def rootChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        .filter(_ != null).toSeq
    val e1 = intercept[Exception] {
      try q1.processAllAvailable() finally q1.stop()
    }
    assert(tiny.fillRatio > 0.7, "fixture must saturate the filter in one batch")
    assert(rootChain(e1).exists(m => m.contains("expectedItems") && m.contains("refusing")),
      s"the overfilling batch itself must fail with the saturation refusal, got: ${rootChain(e1)}")
    assert(delivered > 0L,
      "the overfilling batch's rows must reach the sink BEFORE the refusal — " +
        "they are already absorbed, so dropping them would lose data on replay")
    // any NEW stream over the saturated store refuses at batch entry,
    // before a single membership decision
    val s2 = spark.readStream.schema(docs.schema).parquet(dir.resolve("b1").toString)
    var delivered2 = 0L
    val q2 = graft.streaming.StreamOps.dedupParagraphsPerBatchBloomFrom(
      s2, "text", "doc_id", "\n", 1, tiny) { (b, _) => delivered2 += b.count() }
    val e2 = intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(rootChain(e2).exists(m => m.contains("expectedItems") && m.contains("refusing")),
      s"a fresh stream over the saturated store must refuse at entry, got: ${rootChain(e2)}")
    assert(delivered2 == 0L,
      "entry-time refusal must fire before the saturated store makes any decision")
  }
}
