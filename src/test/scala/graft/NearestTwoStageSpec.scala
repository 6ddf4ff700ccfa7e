package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Nearest

/** [[Nearest.twoStageTopK]] — Matryoshka-style two-stage retrieval:
  * prefix-dim shortlist, full-dim re-rank. Degenerates exactly to
  * [[Nearest.topK]] at a full-width prefix; recovers the exact top-k
  * on prefix-heavy data; honestly misses what the prefix cannot see
  * when the shortlist is too tight. */
class NearestTwoStageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  /** Signal in the first 4 dims, small noise in the tail — the
    * MRL-trained shape the operator serves. */
  private def fixture = {
    val rnd = new scala.util.Random(3)
    (0L until 100L).map { i =>
      val v = Array.tabulate(dim)(d =>
        if (d < 4) math.sin(i * 0.37 + d).toFloat
        else (rnd.nextGaussian() * 0.05).toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private def query(df: org.apache.spark.sql.DataFrame, qid: Long): Array[Float] =
    df.where(col("vec_id") === qid).select("embedding").head().getSeq[Float](0).toArray

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("full-width prefix degenerates to topK exactly; staging column dropped") {
    val df = fixture
    val q = query(df, 7L)
    val two = Nearest.twoStageTopK(df, "embedding", q, n = 5, prefixDims = dim,
      shortlist = 100, tieBreakers = Seq(asc("vec_id")))
    val one = Nearest.topK(df, "embedding", lit(q), n = 5,
      tieBreakers = Seq(asc("vec_id")))
    assert(ids(two) == ids(one), "prefixDims = dim + full shortlist must BE topK")
    assert(!two.columns.contains("__pre_sim"))
  }

  test("prefix-heavy data: a real prefix + modest shortlist recovers the exact top-k") {
    val df = fixture
    val q = query(df, 7L)
    val got = ids(Nearest.twoStageTopK(df, "embedding", q, n = 5,
      prefixDims = 4, shortlist = 20, tieBreakers = Seq(asc("vec_id"))))
    val want = ids(Nearest.topK(df, "embedding", lit(q), n = 5,
      tieBreakers = Seq(asc("vec_id"))))
    assert(got == want,
      s"prefix-4 shortlist-20 must recover the exact top-5 on prefix-heavy data:\n$got\n$want")
  }

  test("the trade is honest: a full-sim winner invisible to the prefix is missed at shortlist = n") {
    // doc 900 matches the query EXACTLY in the tail dims and opposes it
    // in the prefix: full cosine ranks it high, the prefix ranks it
    // last — a tight shortlist loses it, a generous one recovers it
    val base = fixture
    val q = Array(1f, 1f, 1f, 1f, 2f, 2f, 2f, 2f)
    val decoy = Seq((900L, Seq(-1f, -1f, -1f, -1f, 2f, 2f, 2f, 2f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val df = base.unionByName(decoy)
    val exact = ids(Nearest.topK(df, "embedding", lit(q), n = 3,
      tieBreakers = Seq(asc("vec_id")))).map(_._1)
    assert(exact.contains(900L), s"decoy must be a true top-3 row: $exact")
    val tight = ids(Nearest.twoStageTopK(df, "embedding", q, n = 3,
      prefixDims = 4, shortlist = 3, tieBreakers = Seq(asc("vec_id")))).map(_._1)
    assert(!tight.contains(900L),
      s"a prefix-invisible winner must be missed at shortlist = n: $tight")
    val wide = ids(Nearest.twoStageTopK(df, "embedding", q, n = 3,
      prefixDims = 4, shortlist = 101, tieBreakers = Seq(asc("vec_id")))).map(_._1)
    assert(wide == exact, s"a full shortlist must recover it: $wide vs $exact")
  }

  test("NULL embeddings score 0 in both stages; refusals") {
    val df = fixture.unionByName(
      Seq((901L, None: Option[Seq[Float]])).toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val q = query(df, 7L)
    val all = Nearest.twoStageTopK(df, "embedding", q, n = 101,
      prefixDims = 4, shortlist = 101, tieBreakers = Seq(asc("vec_id")))
    val nullRow = all.where(col("vec_id") === 901L).select("similarity").collect()
    assert(nullRow.length == 1 && nullRow.head.getDouble(0) == 0.0,
      "the unembedded row must score exactly 0, not vanish")
    intercept[IllegalArgumentException](
      Nearest.twoStageTopK(fixture, "embedding", q, n = 5, prefixDims = 0,
        shortlist = 10))
    intercept[IllegalArgumentException](
      Nearest.twoStageTopK(fixture, "embedding", q, n = 5, prefixDims = 4,
        shortlist = 4))
    intercept[IllegalArgumentException](
      Nearest.twoStageTopK(fixture.withColumn("__pre_sim", lit(1)),
        "embedding", q, n = 5, prefixDims = 4, shortlist = 10))
  }

  test("MMR: lambda = 1 degenerates to topK; diversity breaks up a duplicate cluster; deterministic; refusals") {
    // TWO near-duplicate clusters on orthogonal directions, query
    // tilted toward cluster A: pure relevance returns A twice;
    // MMR's redundancy term (≈1 within a cluster, ≈0 across) forces
    // the second slot to cluster B
    val emb = Seq(
      (1L, Seq(1.000f, 0.000f, 0.0f)), // cluster A
      (2L, Seq(0.999f, 0.001f, 0.0f)),
      (3L, Seq(0.999f, 0.000f, 0.001f)),
      (4L, Seq(0.000f, 1.000f, 0.0f)), // cluster B
      (5L, Seq(0.001f, 0.999f, 0.0f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = Array(0.75f, 0.66f, 0f)
    def picks(lambda: Double, n: Int = 3) =
      Nearest.mmrTopK(emb, "embedding", "vec_id", q, n = n, lambda = lambda,
        shortlist = 5)
        .orderBy(col("mmr_rank")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // λ = 1: pure relevance — exactly topK's order (all of cluster A
    // before any of B)
    val rel = Nearest.topK(emb, "embedding", lit(q), n = 3,
        tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(picks(1.0).map(_._1) == rel, s"λ=1 must be relevance order: ${picks(1.0)}")
    assert(picks(1.0).map(_._2) == Seq(1, 2, 3), "mmr_rank is selection order")
    val (a, b) = (Set(1L, 2L, 3L), Set(4L, 5L))
    assert(rel.toSet.subsetOf(a), s"relevance-only top-3 is all cluster A: $rel")
    // λ = 0.5: slot 1 = the relevance winner (cluster A); slot 2 must
    // CROSS to cluster B — an A near-copy pays redundancy ≈ 1 while B
    // pays ≈ 0
    val div = picks(0.5).map(_._1)
    assert(div.head == rel.head && a(div.head) && b(div(1)),
      s"MMR must cross clusters at slot 2: $div")
    // deterministic across runs
    assert(picks(0.5) == picks(0.5))
    // refusals: λ out of range, shortlist < n, shortlist over the
    // driver-collect cap
    intercept[IllegalArgumentException](
      Nearest.mmrTopK(emb, "embedding", "vec_id", q, n = 2, lambda = 1.5,
        shortlist = 5))
    intercept[IllegalArgumentException](
      Nearest.mmrTopK(emb, "embedding", "vec_id", q, n = 5, lambda = 0.5,
        shortlist = 3))
    intercept[IllegalArgumentException](
      Nearest.mmrTopK(emb, "embedding", "vec_id", q, n = 2, lambda = 0.5,
        shortlist = 5000))
  }

  test("MMR from the coded index: lossless full probe == flat mmrTopK at BOTH lambdas; refusals") {
    import graft.operators.IvfPqIndex
    val emb = Seq(
      (1L, Seq(1.000f, 0.000f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.001f, 0.0f, 0.0f)),
      (3L, Seq(0.999f, 0.000f, 0.001f, 0.0f)),
      (4L, Seq(0.000f, 1.000f, 0.0f, 0.0f)),
      (5L, Seq(0.001f, 0.999f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val idx = IvfPqIndex.build(emb, "embedding", nlist = 2, m = 2, k = 65536)
    assert(idx.model.lossless)
    val q = Array(0.75f, 0.66f, 0f, 0f)
    def viaIndex(lambda: Double) =
      Nearest.mmrTopKFromIndex(idx, emb, "vec_id", "embedding", q, n = 3,
          lambda = lambda, shortlist = 5, nprobe = 2)
        .orderBy(col("mmr_rank")).collect()
        .map(r => (r.getLong(0), r.getInt(1),
          math.rint(r.getDouble(2) * 1e9) / 1e9)).toSeq
    def flat(lambda: Double) =
      Nearest.mmrTopK(emb, "embedding", "vec_id", q, n = 3, lambda = lambda,
          shortlist = 5)
        .orderBy(col("mmr_rank")).collect()
        .map(r => (r.getLong(0), r.getInt(1),
          math.rint(r.getDouble(2) * 1e9) / 1e9)).toSeq
    for (lambda <- Seq(1.0, 0.5))
      assert(viaIndex(lambda) == flat(lambda),
        s"λ=$lambda index-served MMR must equal the flat operator:\n" +
          s"${viaIndex(lambda)}\n${flat(lambda)}")
    // the diversity behavior survives the coded shortlist: slot 2
    // crosses clusters at λ = 0.5
    assert(Set(4L, 5L)(viaIndex(0.5).apply(1)._1), s"${viaIndex(0.5)}")
    intercept[IllegalArgumentException](
      Nearest.mmrTopKFromIndex(idx, emb, "vec_id", "embedding", q, n = 3,
        lambda = 1.5, shortlist = 5))
    intercept[IllegalArgumentException](
      Nearest.mmrTopKFromIndex(idx, emb, "vec_id", "embedding", q, n = 3,
        lambda = 0.5, shortlist = 9999))
  }

  test("AnnIndex trait: the OPQ stack serves MMR through the same door (rotation applied inside); trait call == concrete call, same plan") {
    import graft.operators.{AnnIndex, OpqIvfPqIndex}
    val emb = Seq(
      (1L, Seq(1.000f, 0.000f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.001f, 0.0f, 0.0f)),
      (3L, Seq(0.999f, 0.000f, 0.001f, 0.0f)),
      (4L, Seq(0.000f, 1.000f, 0.0f, 0.0f)),
      (5L, Seq(0.001f, 0.999f, 0.0f, 0.0f)),
      (6L, Seq(0.500f, 0.500f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    // a LEARNED rotation with a lossless codebook IN ROTATED SPACE:
    // at full probe the ADC shortlist is exact, so index-served MMR
    // must equal the flat operator — which can only happen if the
    // query rotates inside the index (shortlist = 3 < corpus, so a
    // wrong-space query would change membership, not just scores)
    val opq = OpqIvfPqIndex.build(emb, "embedding", nlist = 2, m = 2,
      k = 65536, opqIters = 4)
    assert(opq.model.lossless)
    val q = Array(0.75f, 0.66f, 0f, 0f)
    def viaOpq(lambda: Double) =
      Nearest.mmrTopKFromIndex(opq, emb, "vec_id", "embedding", q, n = 3,
          lambda = lambda, shortlist = 3, nprobe = 2)
        .orderBy(col("mmr_rank")).collect()
        .map(r => (r.getLong(0), r.getInt(1),
          math.rint(r.getDouble(2) * 1e9) / 1e9)).toSeq
    def flat(lambda: Double) =
      Nearest.mmrTopK(emb, "embedding", "vec_id", q, n = 3, lambda = lambda,
          shortlist = 3)
        .orderBy(col("mmr_rank")).collect()
        .map(r => (r.getLong(0), r.getInt(1),
          math.rint(r.getDouble(2) * 1e9) / 1e9)).toSeq
    for (lambda <- Seq(1.0, 0.5))
      assert(viaOpq(lambda) == flat(lambda),
        s"λ=$lambda OPQ-served MMR must equal the flat operator:\n" +
          s"${viaOpq(lambda)}\n${flat(lambda)}")
    // the trait path IS the concrete path — same virtual dispatch,
    // same plan SHAPE. Object identities (the per-call ADC lookup
    // table, a fresh array each search) are normalized out: r21's
    // build-time materialization shortened the plan string below the
    // maxToStringFields truncation that previously hid them, and two
    // calls can never share a freshly-built LUT instance.
    val asTrait: AnnIndex = opq
    def planShape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.canonicalized.toString
        .replaceAll("@[0-9a-f]+", "@id")
    assert(planShape(asTrait.search(q, 3, nprobe = 2)) ==
      planShape(opq.search(q, 3, nprobe = 2)),
      "trait-typed and concrete-typed calls must produce the same plan")
  }

  test("batch MMR from the coded index: lossless full probe == mmrTopKMany at both lambdas, for the plain AND the OPQ stack; refusals") {
    import graft.operators.{IvfPqIndex, OpqIvfPqIndex}
    val emb = Seq(
      (1L, Seq(1.000f, 0.000f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.001f, 0.0f, 0.0f)),
      (3L, Seq(0.999f, 0.000f, 0.001f, 0.0f)),
      (4L, Seq(0.000f, 1.000f, 0.0f, 0.0f)),
      (5L, Seq(0.001f, 0.999f, 0.0f, 0.0f)),
      (6L, Seq(0.500f, 0.500f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val queries = Seq(
      (100L, Seq(0.75f, 0.66f, 0f, 0f)),
      (200L, Seq(0.66f, 0.75f, 0f, 0f))
    ).toDF("query_id", "qe").withColumn("qe", col("qe").cast("array<float>"))
    val ivfpq = IvfPqIndex.build(emb, "embedding", nlist = 2, m = 2, k = 65536)
    val opq = OpqIvfPqIndex.build(emb, "embedding", nlist = 2, m = 2,
      k = 65536, opqIters = 4)
    assert(ivfpq.model.lossless && opq.model.lossless)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          math.rint(r.getDouble(3) * 1e9) / 1e9))
        .sortBy(t => (t._1, t._3)).toSeq
    for (lambda <- Seq(1.0, 0.5)) {
      val raw = canon(Nearest.mmrTopKMany(queries, emb, "query_id", "qe",
        "vec_id", "embedding", n = 3, lambda = lambda, shortlist = 4))
      // shortlist = 4 < corpus (6): a wrong-space batch query would
      // change shortlist MEMBERSHIP, so equality proves the in-plan
      // rotation fires inside searchMany
      for ((name, idx) <- Seq("ivfpq" -> (ivfpq: graft.operators.AnnIndex),
          "opq" -> (opq: graft.operators.AnnIndex))) {
        val got = canon(Nearest.mmrTopKManyFromIndex(idx, queries, emb,
          "query_id", "qe", "vec_id", "embedding", n = 3, lambda = lambda,
          shortlist = 4, nprobe = 2))
        assert(got == raw,
          s"λ=$lambda $name-served batch MMR must equal the raw-scan " +
            s"operator:\n$got\n$raw")
      }
    }
    // refusals: byte bound (each collected row carries a vector),
    // lambda range, shortlist < n
    val e1 = intercept[IllegalArgumentException](
      Nearest.mmrTopKManyFromIndex(ivfpq, queries, emb, "query_id", "qe",
        "vec_id", "embedding", n = 2, lambda = 0.5, shortlist = 4,
        nprobe = 2, maxCollectBytes = 1L))
    assert(e1.getMessage.contains("maxCollectBytes"))
    intercept[IllegalArgumentException](
      Nearest.mmrTopKManyFromIndex(ivfpq, queries, emb, "query_id", "qe",
        "vec_id", "embedding", n = 2, lambda = 1.5, shortlist = 4))
    intercept[IllegalArgumentException](
      Nearest.mmrTopKManyFromIndex(ivfpq, queries, emb, "query_id", "qe",
        "vec_id", "embedding", n = 5, lambda = 0.5, shortlist = 4))
  }

  test("streaming batch MMR from the index: two-batch drain == batch operator on the union (per-query independence); frozen index reused") {
    import graft.operators.IvfPqIndex
    val emb = Seq(
      (1L, Seq(1.000f, 0.000f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.001f, 0.0f, 0.0f)),
      (3L, Seq(0.999f, 0.000f, 0.001f, 0.0f)),
      (4L, Seq(0.000f, 1.000f, 0.0f, 0.0f)),
      (5L, Seq(0.001f, 0.999f, 0.0f, 0.0f)),
      (6L, Seq(0.500f, 0.500f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val idx = IvfPqIndex.build(emb, "embedding", nlist = 2, m = 2, k = 65536)
    assert(idx.model.lossless)
    val q1 = Seq((100L, Seq(0.75f, 0.66f, 0f, 0f)))
      .toDF("query_id", "qe").withColumn("qe", col("qe").cast("array<float>"))
    val q2 = Seq((200L, Seq(0.66f, 0.75f, 0f, 0f)))
      .toDF("query_id", "qe").withColumn("qe", col("qe").cast("array<float>"))
    def canon(rows: Seq[(Long, Long, Int, Double)]) = rows.sortBy(t => (t._1, t._3))
    val want = canon(Nearest.mmrTopKManyFromIndex(idx, q1.union(q2), emb,
        "query_id", "qe", "vec_id", "embedding", n = 3, lambda = 0.5,
        shortlist = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        math.rint(r.getDouble(3) * 1e9) / 1e9)).toSeq)
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr_stream")
    q1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    q2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val stream = spark.readStream.schema(q1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
    var batches = 0
    val q = graft.streaming.StreamOps.mmrManyFromIndexPerBatch(stream, idx,
      emb, "query_id", "qe", "vec_id", "embedding", n = 3, lambda = 0.5,
      shortlist = 4, nprobe = 2) { (res, _) =>
      buf.synchronized {
        buf ++= res.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getInt(2), math.rint(r.getDouble(3) * 1e9) / 1e9))
        batches += 1
      }
    }
    try q.processAllAvailable() finally q.stop()
    assert(batches == 2, s"expected 2 micro-batches, saw $batches")
    assert(canon(buf.toSeq) == want,
      s"stream drain must equal the batch operator:\n${canon(buf.toSeq)}\n$want")
  }

  test("materialized prefix: twoStagePrefixTopK == twoStageTopK (same floats), stage-1 scan pruned; refusals") {
    val df = fixture
    val q = query(df, 7L)
    val withPref = Nearest.materializePrefix(df, "embedding", 4)
    val got = ids(Nearest.twoStagePrefixTopK(withPref, "embedding",
      "embedding_prefix", "vec_id", q, n = 5, prefixDims = 4, shortlist = 20,
      tieBreakers = Seq(asc("vec_id"))))
    val want = ids(Nearest.twoStageTopK(df, "embedding", q, n = 5,
      prefixDims = 4, shortlist = 20, tieBreakers = Seq(asc("vec_id"))))
    assert(got == want,
      s"the prefix-column path must equal the in-plan slice path:\n$got\n$want")
    // the artifact is definitionally the slice
    assert(withPref.select(max(size(col("embedding_prefix")))).head().getInt(0) == 4)
    // refusals: output clash, shortlist over the id-collect cap,
    // shortlist < n
    intercept[IllegalArgumentException](
      Nearest.materializePrefix(withPref, "embedding", 4))
    intercept[IllegalArgumentException](
      Nearest.twoStagePrefixTopK(withPref, "embedding", "embedding_prefix",
        "vec_id", q, n = 2, prefixDims = 4, shortlist = 5000))
    intercept[IllegalArgumentException](
      Nearest.twoStagePrefixTopK(withPref, "embedding", "embedding_prefix",
        "vec_id", q, n = 5, prefixDims = 4, shortlist = 3))
  }

  test("batch MMR: per query == single-query mmrTopK at both lambdas; lambda = 1 == knnJoinAgg + rank; refusals") {
    // the MMR fixture's two near-duplicate clusters, served to TWO
    // queries with opposite tilts — per-query independence is the
    // batch operator's whole contract
    val emb = Seq(
      (1L, Seq(1.000f, 0.000f, 0.0f)),
      (2L, Seq(0.999f, 0.001f, 0.0f)),
      (3L, Seq(0.999f, 0.000f, 0.001f)),
      (4L, Seq(0.000f, 1.000f, 0.0f)),
      (5L, Seq(0.001f, 0.999f, 0.0f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val qA = Array(0.75f, 0.66f, 0f) // tilted to cluster A
    val qB = Array(0.66f, 0.75f, 0f) // tilted to cluster B
    val queries = Seq((100L, qA.toSeq), (200L, qB.toSeq))
      .toDF("query_id", "qe")
      .withColumn("qe", col("qe").cast("array<float>"))
    def many(lambda: Double) =
      Nearest.mmrTopKMany(queries, emb, "query_id", "qe", "vec_id",
          "embedding", n = 3, lambda = lambda, shortlist = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          math.rint(r.getDouble(3) * 1e9) / 1e9))
        .groupBy(_._1)
    for (lambda <- Seq(1.0, 0.5)) {
      val got = many(lambda)
      for ((qid, qv) <- Seq(100L -> qA, 200L -> qB)) {
        val single = Nearest.mmrTopK(emb, "embedding", "vec_id", qv, n = 3,
            lambda = lambda, shortlist = 5)
          .orderBy(col("mmr_rank")).collect()
          .map(r => (qid, r.getLong(0), r.getInt(1),
            math.rint(r.getDouble(2) * 1e9) / 1e9)).toSeq
        assert(got(qid).sortBy(_._3).toSeq == single,
          s"λ=$lambda query $qid: batch must equal single-query MMR:\n" +
            s"${got(qid).toSeq}\n$single")
      }
    }
    // λ = 0.5 genuinely diversifies PER QUERY: each query's slot 2
    // crosses to its non-preferred cluster
    val div = many(0.5)
    assert(Set(4L, 5L)(div(100L).sortBy(_._3).apply(1)._2), s"${div(100L).toSeq}")
    assert(Set(1L, 2L, 3L)(div(200L).sortBy(_._3).apply(1)._2), s"${div(200L).toSeq}")
    // refusals: the maxCollect LIMIT probe (2 queries × 5-shortlist =
    // 10 rows > 5), the cheap maxCollect < shortlist require, lambda
    // range, shortlist < n
    intercept[IllegalArgumentException](
      Nearest.mmrTopKMany(queries, emb, "query_id", "qe", "vec_id",
        "embedding", n = 2, lambda = 0.5, shortlist = 5, maxCollect = 5))
    intercept[IllegalArgumentException](
      Nearest.mmrTopKMany(queries, emb, "query_id", "qe", "vec_id",
        "embedding", n = 2, lambda = 0.5, shortlist = 5, maxCollect = 3))
    intercept[IllegalArgumentException](
      Nearest.mmrTopKMany(queries, emb, "query_id", "qe", "vec_id",
        "embedding", n = 2, lambda = -0.1, shortlist = 5))
    intercept[IllegalArgumentException](
      Nearest.mmrTopKMany(queries, emb, "query_id", "qe", "vec_id",
        "embedding", n = 6, lambda = 0.5, shortlist = 5))
    // the BYTE-denominated bound: every collected row carries a full
    // embedding vector, so a tiny maxCollectBytes caps rows below the
    // 10-row shortlist result even at the default maxCollect — and the
    // refusal says vectors collect, naming the right remedy
    val byteRefusal = intercept[IllegalArgumentException](
      Nearest.mmrTopKMany(queries, emb, "query_id", "qe", "vec_id",
        "embedding", n = 2, lambda = 0.5, shortlist = 5,
        maxCollectBytes = 1L))
    assert(byteRefusal.getMessage.contains("embedding vector") &&
      byteRefusal.getMessage.contains("maxCollectBytes"))
    // a generous byte budget changes nothing — results identical to the
    // row-bounded default path
    val loose = Nearest.mmrTopKMany(queries, emb, "query_id", "qe", "vec_id",
        "embedding", n = 3, lambda = 0.5, shortlist = 5,
        maxCollectBytes = 1L << 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(loose == many(0.5).values.flatten.map(t => (t._1, t._2, t._3)).toSet)
  }

  test("batch MMR on an empty query table drains empty (documented schema); a fully-filtered micro-batch doesn't crash the stream; NULL first embedding refuses by name") {
    import graft.operators.IvfPqIndex
    val emb = Seq(
      (1L, Seq(1.000f, 0.000f, 0.0f)),
      (2L, Seq(0.999f, 0.001f, 0.0f)),
      (3L, Seq(0.000f, 1.000f, 0.0f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val queries = Seq((100L, Seq(0.75f, 0.66f, 0f)))
      .toDF("query_id", "qe").withColumn("qe", col("qe").cast("array<float>"))
    val idx = IvfPqIndex.build(emb, "embedding", nlist = 2, m = 3, k = 65536)
    val none = queries.where(col("query_id") < 0L)
    // both batch forms: zero queries → zero rows, with the SAME schema
    // a non-empty call produces (r18 ADVICE — was NoSuchElementException
    // from the dim probe)
    val viaRaw = Nearest.mmrTopKMany(none, emb, "query_id", "qe", "vec_id",
      "embedding", n = 2, lambda = 0.5, shortlist = 3)
    val viaIdx = Nearest.mmrTopKManyFromIndex(idx, none, emb, "query_id",
      "qe", "vec_id", "embedding", n = 2, lambda = 0.5, shortlist = 3,
      nprobe = 2)
    val nonEmpty = Nearest.mmrTopKMany(queries, emb, "query_id", "qe",
      "vec_id", "embedding", n = 2, lambda = 0.5, shortlist = 3)
    for (got <- Seq(viaRaw, viaIdx)) {
      assert(got.count() == 0L)
      assert(got.schema == nonEmpty.schema,
        s"empty-input schema must match the documented output schema:\n" +
          s"${got.schema}\n${nonEmpty.schema}")
    }
    // the acute case: a micro-batch whose rows are ALL filtered out
    // still fires foreachBatch — the StreamingQuery must drain it
    // empty, not die
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr_empty_batch")
    queries.coalesce(1).write.parquet(dir.resolve("b1").toString)
    val stream = spark.readStream.schema(queries.schema)
      .parquet(s"$dir/*/").where(col("query_id") < 0L)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var batches = 0
    val q = graft.streaming.StreamOps.mmrManyFromIndexPerBatch(stream, idx,
      emb, "query_id", "qe", "vec_id", "embedding", n = 2, lambda = 0.5,
      shortlist = 3, nprobe = 2) { (res, _) =>
      buf.synchronized { buf ++= res.collect().map(_.getLong(0)); batches += 1 }
    }
    try {
      q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"fully-filtered micro-batch crashed the stream: ${q.exception}")
    } finally q.stop()
    assert(batches >= 1 && buf.isEmpty)
    // a PRESENT first row with a NULL embedding is a data bug, not an
    // empty batch — refuse by name
    val nullQ = Seq((100L, Option.empty[Seq[Float]]))
      .toDF("query_id", "qe").withColumn("qe", col("qe").cast("array<float>"))
    val refusal = intercept[IllegalArgumentException](
      Nearest.mmrTopKMany(nullQ, emb, "query_id", "qe", "vec_id",
        "embedding", n = 2, lambda = 0.5, shortlist = 3))
    assert(refusal.getMessage.contains("NULL or empty"))
  }
}
