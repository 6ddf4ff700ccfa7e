package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPqIndex, Nearest, OpqIndex, OpqIvfPqIndex, PqIndex}

/** [[OpqIvfPqIndex]] — the FAISS `OPQ,IVF,PQ` factory stack as a
  * first-class index (r16 VERDICT #1): rotation persisted in the
  * layout, corpus rotated in-plan at build, queries rotated inside
  * search/searchMany, composed with residual coding. Exact when all
  * three tiers' degenerates compose; the learned rotation's recall
  * lever over plain residual coding is measured on correlated data. */
class OpqIvfPqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  /** Anisotropic axis-aligned energy MIXED by a fixed dense rotation
    * (the OpqIndexSpec regime OPQ exists for), but CLUSTERED so the
    * coarse quantizer has real cells: 4 cluster centers plus the
    * mixed anisotropic noise. */
  private def correlated = {
    val rnd = new scala.util.Random(5)
    val q = randomRotation(dim, new scala.util.Random(7))
    (0L until 300L).map { i =>
      val c = (i % 4).toInt
      val z = Array.tabulate(dim)(d =>
        math.sin(c * 2.1 + d * 0.7) * 0.8 + rnd.nextGaussian() * math.pow(0.62, d))
      val x = Array.tabulate(dim) { r =>
        var s = 0.0; var j = 0
        while (j < dim) { s += q(r)(j) * z(j); j += 1 }
        s.toFloat
      }
      (i, x.toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private def randomRotation(d: Int, rnd: scala.util.Random): Array[Array[Double]] = {
    val a = Array.fill(d, d)(rnd.nextGaussian())
    for (j <- 0 until d) {
      for (p <- 0 until j) {
        val dot = (0 until d).map(i => a(i)(j) * a(i)(p)).sum
        for (i <- 0 until d) a(i)(j) -= dot * a(i)(p)
      }
      val n = math.sqrt((0 until d).map(i => a(i)(j) * a(i)(j)).sum)
      for (i <- 0 until d) a(i)(j) /= n
    }
    a
  }

  private def exactTopK(df: org.apache.spark.sql.DataFrame, qid: Long, n: Int) =
    Nearest.topK(df.crossJoin(broadcast(
        df.where(col("vec_id") === qid).select(col("embedding").as("qe")))),
        "embedding", col("qe"), n = n, tieBreakers = Seq(asc("vec_id")))

  private def queryVec(df: org.apache.spark.sql.DataFrame, qid: Long) =
    df.where(col("vec_id") === qid).select("embedding")
      .head().getSeq[Float](0).toArray

  test("composed degenerates == brute force: identity rotation ∘ origin cell ∘ lossless codebook, raw AND residual") {
    val df = correlated
    val model = PqIndex.fit(df, "embedding", m = 8, k = 65536)
    assert(model.lossless)
    for (byResidual <- Seq(false, true)) {
      val idx = OpqIvfPqIndex.withArtifacts(df, "embedding",
        OpqIndex.identityRotation(dim), Array(Array.fill(dim)(0f)), model,
        byResidual = byResidual)
      val got = idx.search(queryVec(df, 0L), k = 10, nprobe = 1,
          tieBreakers = Seq(asc("vec_id")))
        .select(col("vec_id"), round(col("similarity"), 6).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = exactTopK(df, 0L, 10)
        .select(col("vec_id"), round(col("similarity"), 6).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want,
        s"byResidual=$byResidual composed degenerates must equal brute force:\n$got\n$want")
    }
  }

  test("learned rotation ∘ residual coding: recall >= plain residual at equal m/k (the factory stack's lever)") {
    val df = correlated
    // nprobe = nlist on both sides isolates CODEC quality — no cell-
    // pruning noise; the only difference is rotated-residual codebooks
    // vs raw-residual codebooks at the same budget
    val nlist = 4
    val opq = OpqIvfPqIndex.build(df, "embedding", nlist = nlist, m = 8,
      k = 8, opqIters = 6, byResidual = true)
    val res = IvfPqIndex.build(df, "embedding", nlist = nlist, m = 8,
      k = 8, byResidual = true)
    def recall(search: Long => Set[Long]): Double =
      (0L until 8L).map { qid =>
        val want = exactTopK(df, qid, 10).select("vec_id")
          .collect().map(_.getLong(0)).toSet
        (search(qid) & want).size.toDouble / want.size
      }.sum / 8
    val ro = recall(qid => opq.search(queryVec(df, qid), 10, nprobe = nlist,
        tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet)
    val rr = recall(qid => res.search(queryVec(df, qid), 10, nprobe = nlist,
        tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet)
    assert(ro >= rr,
      s"OPQ∘residual recall $ro must be >= plain residual $rr at equal m/k")
    assert(ro > 0.5, s"the composed stack must actually retrieve: $ro")
  }

  test("save → load round-trips the rotation and serves identical results; wrong-class loads refuse by name") {
    val df = correlated
    val idx = OpqIvfPqIndex.build(df, "embedding", nlist = 4, m = 8, k = 8,
      opqIters = 4, byResidual = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_opqivfpq").toString
    try {
      idx.save(dir)
      val re = OpqIvfPqIndex.load(spark, dir)
      assert(re.rotation.toSeq == idx.rotation.toSeq)
      assert(re.byResidual && re.dim == dim)
      def run(i: OpqIvfPqIndex) =
        i.search(queryVec(df, 2L), 5, nprobe = 2, tieBreakers = Seq(asc("vec_id")))
          .select(col("vec_id"), col("similarity"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(run(re) == run(idx),
        "the reopened stack must serve the in-memory stack's results")
      // a plain IvfPqIndex.load at the stack root must REFUSE (no
      // _ivfpq.json there) — rotated codes can never silently serve
      // un-rotated queries
      intercept[Exception](IvfPqIndex.load(spark, dir))
      // the dispatching opener returns the OPQ class for this layout
      // (probing OPQ FIRST — $dir/ivfpq is itself a valid plain
      // layout, and opening that half would serve un-rotated queries)
      val opened = graft.operators.AnnIndex.open(spark, dir)
      assert(opened.isInstanceOf[OpqIvfPqIndex], opened.getClass.getName)
      assert(run(opened.asInstanceOf[OpqIvfPqIndex]) == run(idx),
        "the dispatch-opened stack must serve the in-memory stack's results")
      // and the OPQ loader refuses a plain IVFADC layout by name
      val plainDir = java.nio.file.Files.createTempDirectory("graft_plain_ivfpq").toString
      try {
        IvfPqIndex.build(df, "embedding", nlist = 2, m = 4, k = 8).save(plainDir)
        val e = intercept[IllegalArgumentException](
          OpqIvfPqIndex.load(spark, plainDir))
        assert(e.getMessage.contains("not an OPQ∘IVFADC layout"), e.getMessage)
        // the dispatcher opens the plain layout as IvfPqIndex
        assert(graft.operators.AnnIndex.open(spark, plainDir)
          .isInstanceOf[IvfPqIndex])
      } finally rm(new java.io.File(plainDir))
      // and a directory with no sidecar at all refuses by name
      val emptyDir = java.nio.file.Files.createTempDirectory("graft_not_an_index").toString
      try {
        val e2 = intercept[IllegalArgumentException](
          graft.operators.AnnIndex.open(spark, emptyDir))
        assert(e2.getMessage.contains("not an index layout"), e2.getMessage)
      } finally rm(new java.io.File(emptyDir))
    } finally rm(new java.io.File(dir))
  }

  test("appendToSaved: matching rotation appends row-for-row like addBatch; a DIFFERENT rotation refuses by name; a plain IVFADC layout refuses") {
    val df = correlated
    val a = df.where(col("vec_id") < 150)
    val b = df.where(col("vec_id") >= 150)
    val full = OpqIvfPqIndex.build(df, "embedding", nlist = 4, m = 8, k = 8,
      opqIters = 4, byResidual = true)
    val half = OpqIvfPqIndex.withArtifacts(a, "embedding", full.rotation,
      full.inner.centroidVectors, full.model, byResidual = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_opq_append").toString
    try {
      half.save(dir)
      half.appendToSaved(dir, b, "embedding")
      val re = OpqIvfPqIndex.load(spark, dir)
      def codedRows(i: OpqIvfPqIndex) = i.inner.encoded
        .select(col("vec_id"), col("cell"), hex(col("pq_codes")).as("codes"))
        .orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      assert(codedRows(re) == codedRows(half.addBatch(b, "embedding")),
        "persisted append must code row-for-row like the in-memory addBatch")
      // compaction through the rotation seam: files rewritten, rows
      // and the served results untouched, total files reduced.
      // (capture the pre-compaction rows FIRST — `re`'s file index was
      // resolved at load time and goes stale once the tree swaps)
      val preRows = codedRows(re)
      val preFiles = OpqIvfPqIndex.layoutStats(spark, dir)
        .agg(sum(col("n_files"))).head().getLong(0)
      OpqIvfPqIndex.compactSaved(spark, dir)
      val postFiles = OpqIvfPqIndex.layoutStats(spark, dir)
        .agg(sum(col("n_files"))).head().getLong(0)
      assert(postFiles <= preFiles, s"$preFiles -> $postFiles")
      assert(codedRows(OpqIvfPqIndex.load(spark, dir)) == preRows,
        "compaction must not change the rotated coded rows")
      // an index holding a DIFFERENT rotation must refuse to append into
      // this layout — appending would mix rotated spaces (the footgun
      // the nested-layout load refusal guards; the guard must hold at
      // APPEND time too)
      val otherRot = full.rotation.clone()
      otherRot(0) = otherRot(0) + 0.5f
      val other = OpqIvfPqIndex.withArtifacts(a, "embedding", otherRot,
        full.inner.centroidVectors, full.model, byResidual = true)
      val e = intercept[IllegalArgumentException](
        other.appendToSaved(dir, b, "embedding"))
      assert(e.getMessage.contains("DIFFERENT rotation"), e.getMessage)
      // pointing append at a plain IVFADC layout refuses by name (no
      // _opqivfpq.json — nothing to verify the rotation against)
      val plainDir = java.nio.file.Files.createTempDirectory("graft_plain_append").toString
      try {
        IvfPqIndex.build(df, "embedding", nlist = 2, m = 4, k = 8).save(plainDir)
        val e2 = intercept[IllegalArgumentException](
          half.appendToSaved(plainDir, b, "embedding"))
        assert(e2.getMessage.contains("not an OPQ∘IVFADC layout"), e2.getMessage)
      } finally rm(new java.io.File(plainDir))
    } finally rm(new java.io.File(dir))
  }

  private def codedRowsAt(dir: String) = OpqIvfPqIndex.load(spark, dir)
    .inner.encoded
    .select(col("vec_id"), col("cell"), hex(col("pq_codes")).as("codes"))
    .orderBy("vec_id")
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq

  test("ingestBatch: two-batch drain == two batch appends row-for-row; replay is append-idempotent; empty batch is a no-op; the compaction cadence fires") {
    val df = correlated
    val a = df.where(col("vec_id") < 100)
    val b1 = df.where(col("vec_id") >= 100 && col("vec_id") < 200)
    val b2 = df.where(col("vec_id") >= 200)
    val full = OpqIvfPqIndex.build(df, "embedding", nlist = 4, m = 8, k = 8,
      opqIters = 4, byResidual = true)
    val half = OpqIvfPqIndex.withArtifacts(a, "embedding", full.rotation,
      full.inner.centroidVectors, full.model, byResidual = true)
    val baseline = half.codecSelfSimilarity(a, "embedding")
    val viaIngest = java.nio.file.Files.createTempDirectory("graft_opq_ing").toString
    val viaAppend = java.nio.file.Files.createTempDirectory("graft_opq_app2").toString
    try {
      half.save(viaIngest); half.save(viaAppend)
      // the ingest path IS a drained two-batch stream (foreachBatch
      // calls this body serially with batchIds 0, 1) — with the
      // cadence threshold at 1 so every append triggers compaction
      assert(half.ingestBatch(viaIngest, b1, "embedding", 0L,
        Some(baseline), compactFilesPerCell = 1))
      assert(half.ingestBatch(viaIngest, b2, "embedding", 1L,
        Some(baseline), compactFilesPerCell = 1))
      half.appendToSaved(viaAppend, b1, "embedding")
      half.appendToSaved(viaAppend, b2, "embedding")
      assert(codedRowsAt(viaIngest) == codedRowsAt(viaAppend),
        "a drained ingest must leave the layout two batch appends would")
      // the cadence fired: every cell is back to one file on the
      // ingest side, while the append-only side accreted files
      val ingFiles = OpqIvfPqIndex.layoutStats(spark, viaIngest)
        .agg(max(col("n_files"))).head().getLong(0)
      val appFiles = OpqIvfPqIndex.layoutStats(spark, viaAppend)
        .agg(max(col("n_files"))).head().getLong(0)
      assert(ingFiles == 1L, s"cadence must compact to 1 file/cell, saw $ingFiles")
      assert(appFiles >= 2L, s"append-only side should accrete, saw $appFiles")
      // checkpoint-recovery replay: the SAME batchId is skipped —
      // rows unchanged, return false
      val before = codedRowsAt(viaIngest)
      assert(!half.ingestBatch(viaIngest, b1, "embedding", 0L, Some(baseline)))
      assert(codedRowsAt(viaIngest) == before,
        "a replayed batch must not append twice")
      // an empty batch is a no-op: false, no marker, no codecGuard
      // measurement refusal
      assert(!half.ingestBatch(viaIngest, df.where(lit(false)), "embedding",
        7L, Some(baseline)))
      assert(!new java.io.File(s"$viaIngest/_ingest/batch_7.json").exists(),
        "empty batches leave no marker")
      assert(codedRowsAt(viaIngest) == before)
    } finally { rm(new java.io.File(viaIngest)); rm(new java.io.File(viaAppend)) }
  }

  test("annIngestPerBatch: a real StreamingQuery drains documents into the saved layout; a stale-codec batch fails the stream by refusal") {
    val df = correlated
    val a = df.where(col("vec_id") < 100)
    val b1 = df.where(col("vec_id") >= 100 && col("vec_id") < 200)
    val b2 = df.where(col("vec_id") >= 200)
    val full = OpqIvfPqIndex.build(df, "embedding", nlist = 4, m = 8, k = 8,
      opqIters = 4, byResidual = true)
    val half = OpqIvfPqIndex.withArtifacts(a, "embedding", full.rotation,
      full.inner.centroidVectors, full.model, byResidual = true)
    val baseline = half.codecSelfSimilarity(a, "embedding")
    val streamed = java.nio.file.Files.createTempDirectory("graft_opq_sing").toString
    val batched = java.nio.file.Files.createTempDirectory("graft_opq_sapp").toString
    val src = java.nio.file.Files.createTempDirectory("graft_opq_ssrc")
    try {
      half.save(streamed); half.save(batched)
      b1.coalesce(1).write.parquet(src.resolve("b1").toString)
      b2.coalesce(1).write.parquet(src.resolve("b2").toString)
      val docs = spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*/")
      val q = graft.streaming.StreamOps.annIngestPerBatch(docs, half,
        streamed, "embedding", baselineSelfSim = Some(baseline))
      try {
        q.processAllAvailable()
        assert(q.exception.isEmpty, s"ingest stream died: ${q.exception}")
      } finally q.stop()
      half.appendToSaved(batched, b1, "embedding")
      half.appendToSaved(batched, b2, "embedding")
      assert(codedRowsAt(streamed) == codedRowsAt(batched),
        "the drained ingest stream must leave the layout batch appends would")
      // refuse-don't-degrade: a batch whose distribution the frozen
      // rotation/codebooks code badly (the codecGuard spec's planted
      // ±-pattern drift — structureless vectors sharing nothing with
      // the correlated fixture's subspaces) must FAIL the
      // StreamingQuery, not land drifted codes
      val rnd = new scala.util.Random(11)
      val drifted = (1000L until 1100L).map { i =>
        (i, Array.tabulate(dim)(_ => (if (rnd.nextBoolean()) 1f else -1f) *
          (1f + rnd.nextFloat())).toSeq)
      }.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
      assert(baseline - half.codecSelfSimilarity(drifted, "embedding") > 0.05,
        "fixture must plant a drop past the refuse band")
      drifted.coalesce(1).write.parquet(src.resolve("drift").toString)
      val docs2 = spark.readStream.schema(b1.schema)
        .parquet(src.resolve("drift").toString)
      val dir2 = java.nio.file.Files.createTempDirectory("graft_opq_sref").toString
      try {
        half.save(dir2)
        val q2 = graft.streaming.StreamOps.annIngestPerBatch(docs2, half,
          dir2, "embedding", baselineSelfSim = Some(baseline))
        val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          try q2.processAllAvailable() finally q2.stop()
        }
        val messages = Iterator.iterate(died: Throwable)(_.getCause)
          .takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).toSeq
        assert(messages.exists(_.contains("drifted")),
          s"expected the codecGuard refusal in the cause chain, got: $messages")
      } finally rm(new java.io.File(dir2))
    } finally {
      rm(new java.io.File(streamed)); rm(new java.io.File(batched))
      rm(src.toFile)
    }
  }

  test("addBatch under frozen artifacts == building from the union; searchMany == per-query search") {
    val df = correlated
    val a = df.where(col("vec_id") < 150)
    val b = df.where(col("vec_id") >= 150)
    val full = OpqIvfPqIndex.build(df, "embedding", nlist = 4, m = 8, k = 8,
      opqIters = 4, byResidual = true)
    val grown = OpqIvfPqIndex.withArtifacts(a, "embedding", full.rotation,
        full.inner.centroidVectors, full.model, byResidual = true)
      .addBatch(b, "embedding")
    val fromUnion = OpqIvfPqIndex.withArtifacts(df, "embedding", full.rotation,
      full.inner.centroidVectors, full.model, byResidual = true)
    def codedRows(i: OpqIvfPqIndex) = i.inner.encoded
      .select(col("vec_id"), col("cell"), hex(col("pq_codes")).as("codes"),
        col("emb_norm"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(3))).toSeq
    assert(codedRows(grown) == codedRows(fromUnion),
      "append must code row-for-row like the union build")
    // searchMany through the in-plan query rotation == per-query search
    val queries = df.where(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val many = full.searchMany(queries, "query_id", "qe", "vec_id", k = 5,
        nprobe = 4)
      .select(col("query_id"), col("vec_id"), round(col("similarity"), 9).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = (0L until 6L).flatMap { qid =>
      full.search(queryVec(df, qid), 5, nprobe = 4,
          tieBreakers = Seq(asc("vec_id")))
        .select(col("vec_id"), round(col("similarity"), 9).as("s"))
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(many == single, s"searchMany vs per-query:\n$many\n$single")
  }

  test("refine through the rotation seam: exact scores on raw vectors, batch == per-query, degenerates == brute force") {
    val df = correlated
    val raw = df.select(col("vec_id"), col("embedding"))
    // degenerates: identity rotation + origin cell + lossless ⇒
    // refined == brute force
    val model = PqIndex.fit(df, "embedding", m = 8, k = 65536)
    assert(model.lossless)
    val exactIdx = OpqIvfPqIndex.withArtifacts(df, "embedding",
      OpqIndex.identityRotation(dim), Array(Array.fill(dim)(0f)), model,
      byResidual = true)
    val got = exactIdx.searchRefine(raw, "vec_id", "embedding",
        queryVec(df, 0L), n = 10, shortlist = 20, nprobe = 1,
        tieBreakers = Seq(asc("vec_id")))
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = exactTopK(df, 0L, 10)
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"degenerate refine must equal brute force:\n$got\n$want")
    // learned lossy stack: refined scores are the exact cosines
    // (rotation-invariance is the whole claim — shortlists in rotated
    // space, scores from raw vectors), and batch == per-query
    val lossy = OpqIvfPqIndex.build(df, "embedding", nlist = 4, m = 8,
      k = 8, opqIters = 4, byResidual = true)
    val refined = lossy.searchRefine(raw, "vec_id", "embedding",
        queryVec(df, 1L), n = 5, shortlist = 30, nprobe = 4,
        tieBreakers = Seq(asc("vec_id")))
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exactAll = exactTopK(df, 1L, 300)
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    refined.foreach { case (id, sc) =>
      assert(exactAll(id) == sc, s"refined score for $id must be exact: $sc")
    }
    val queries = df.where(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val batch = lossy.searchManyRefine(queries, "query_id", "qe", raw,
        "vec_id", "embedding", n = 5, shortlist = 30, nprobe = 4)
      .select(col("query_id"), col("vec_id"), round(col("similarity"), 9).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = (0L until 4L).flatMap { qid =>
      lossy.searchRefine(raw, "vec_id", "embedding", queryVec(df, qid),
          n = 5, shortlist = 30, nprobe = 4, tieBreakers = Seq(asc("vec_id")))
        .select(col("vec_id"), round(col("similarity"), 9).as("s"))
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == single, s"batch refine must equal per-query:\n$batch\n$single")
    intercept[IllegalArgumentException](
      lossy.searchRefine(raw, "vec_id", "embedding", queryVec(df, 1L),
        n = 5, shortlist = 3))
  }

  test("codecGuard: quiet at design load, warns in the band, refuses on planted rotation drift with the re-fit remedy") {
    val df = correlated
    // a LOSSY stack (k = 8 codewords per subspace) — drift must show
    // up as codec quality, which a lossless codebook would mask
    val idx = OpqIvfPqIndex.build(df, "embedding", nlist = 4, m = 8, k = 8,
      opqIters = 4, byResidual = true)
    // the build MEASURED the baseline (one bounded pass while raw
    // vectors still existed) and it equals an explicit re-measure
    val baseline = idx.codecSelfSimilarity(df, "embedding")
    assert(idx.codecBaseline.contains(baseline),
      s"build must store the measured baseline: ${idx.codecBaseline} vs $baseline")
    assert(baseline > 0.5 && baseline <= 1.0, s"implausible baseline $baseline")
    // design load: the build distribution itself measures AT the
    // baseline — quiet, with the STORED default (no explicit arg)
    assert(idx.codecGuard(df, "embedding").isEmpty)
    assert(idx.codecGuard(df, "embedding", baseline).isEmpty)
    // save → load round-trips the baseline, so a reopened layout
    // guards for free; a withArtifacts index carries none and the
    // no-arg guard refuses by name
    val bdir = java.nio.file.Files.createTempDirectory("graft_opq_baseline").toString
    try {
      idx.save(bdir)
      val re = OpqIvfPqIndex.load(spark, bdir)
      assert(re.codecBaseline.contains(baseline),
        s"persisted baseline must round-trip: ${re.codecBaseline} vs $baseline")
    } finally rm(new java.io.File(bdir))
    val bare = OpqIvfPqIndex.withArtifacts(df, "embedding", idx.rotation,
      idx.inner.centroidVectors, idx.model, byResidual = true)
    assert(bare.codecBaseline.isEmpty)
    val noBase = intercept[IllegalArgumentException](
      bare.codecGuard(df, "embedding"))
    assert(noBase.getMessage.contains("no build-time codec baseline"),
      noBase.getMessage)
    // planted drift: structureless ±-pattern vectors share nothing
    // with the correlated fixture's subspaces — the frozen rotation
    // and codebooks code them badly, and the guard must REFUSE with
    // the re-fit remedy
    val rnd = new scala.util.Random(11)
    val drifted = (1000L until 1200L).map { i =>
      (i, Array.tabulate(dim)(_ => (if (rnd.nextBoolean()) 1f else -1f) *
        (1f + rnd.nextFloat())).toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val driftSim = idx.codecSelfSimilarity(drifted, "embedding")
    assert(baseline - driftSim > 0.05,
      s"fixture must plant a real drop: baseline $baseline vs drift $driftSim")
    val e = intercept[IllegalStateException](
      idx.codecGuard(drifted, "embedding", baseline))
    assert(e.getMessage.contains("stale rotation") &&
      e.getMessage.contains("OpqIvfPqIndex.build"), e.getMessage)
    // the warn band returns the warning instead of throwing
    val warned = idx.codecGuard(drifted, "embedding", baseline,
      warnDrop = 0.001, refuseDrop = 2.0)
    assert(warned.exists(_.contains("WARNING")), s"$warned")
    // a batch that codes BETTER than baseline is quiet (only
    // degradation is drift)
    assert(idx.codecGuard(df, "embedding", baseline - 0.2,
      warnDrop = 0.001, refuseDrop = 0.002).isEmpty)
    // refusals: out-of-range baseline, inverted bands, empty batch
    intercept[IllegalArgumentException](
      idx.codecGuard(df, "embedding", baselineSelfSim = 1.5))
    intercept[IllegalArgumentException](
      idx.codecGuard(df, "embedding", baseline, warnDrop = 0.1,
        refuseDrop = 0.05))
    intercept[IllegalArgumentException](
      idx.codecSelfSimilarity(df.where(col("vec_id") < 0), "embedding"))
  }

  test("refusals: mismatched rotation size, wrong-dim query") {
    val df = correlated
    val model = PqIndex.fit(df, "embedding", m = 8, k = 8)
    intercept[IllegalArgumentException](
      OpqIvfPqIndex.withArtifacts(df, "embedding", new Array[Float](9),
        Array(Array.fill(dim)(0f)), model))
    val idx = OpqIvfPqIndex.withArtifacts(df, "embedding",
      OpqIndex.identityRotation(dim), Array(Array.fill(dim)(0f)), model)
    intercept[IllegalArgumentException](idx.search(new Array[Float](3), 5))
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
  }
}
