package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Nearest, OpqIndex, PqIndex}

/** [[OpqIndex]] — Optimized Product Quantization (Ge et al. 2013):
  * the learned-rotation rung of the ANN ladder. Identity rotation is
  * bit-for-bit the plain-PQ path (the exactness anchor); the learned
  * rotation is orthogonal, deterministic across partitionings, drives
  * the training distortion down, and beats plain PQ's recall on
  * cross-subspace-correlated data — the published claim, measured. */
class OpqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  /** 4 loose clusters (the PqIndexSpec fixture shape). */
  private def fixture = {
    val rnd = new scala.util.Random(11)
    (0L until 200L).map { i =>
      val c = (i % 4).toInt
      val base = Array.tabulate(dim)(d => math.sin(c * 2.1 + d * 0.7).toFloat)
      val v = base.map(x => x + (rnd.nextGaussian() * 0.15).toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  /** Anisotropic axis-aligned energy MIXED by a fixed dense rotation —
    * the regime OPQ exists for: correlated energy straddles every
    * fixed subspace boundary, so plain PQ wastes its codewords and the
    * learned rotation un-mixes it. */
  private def correlated = {
    val rnd = new scala.util.Random(5)
    val q = randomRotation(dim, new scala.util.Random(7))
    (0L until 300L).map { i =>
      val z = Array.tabulate(dim)(d =>
        rnd.nextGaussian() * math.pow(0.62, d))
      val x = Array.tabulate(dim) { r =>
        var s = 0.0; var j = 0
        while (j < dim) { s += q(r)(j) * z(j); j += 1 }
        s.toFloat
      }
      (i, x.toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  /** Seeded dense orthogonal matrix via modified Gram-Schmidt. */
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

  test("identity rotation is BIT-identical to the plain PQ path: codes, norms, search") {
    val df = fixture
    val pq = PqIndex.fit(df, "embedding", m = 4, k = 65536, maxTrain = 65536)
    assert(pq.lossless)
    val opq = OpqIndex.withArtifacts(OpqIndex.identityRotation(dim), pq)
    def rows(enc: org.apache.spark.sql.DataFrame) = enc
      .select(col("vec_id"), hex(col("pq_codes")), col("emb_norm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val plain = rows(PqIndex.encode(df, "embedding", pq).drop("embedding"))
    val viaOpq = rows(OpqIndex.encode(df, "embedding", opq))
    assert(viaOpq == plain, "identity-rotated codes/norms must be bit-identical")
    val q = df.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val enc = OpqIndex.encode(df, "embedding", opq)
    val got = OpqIndex.search(enc, q, 10, opq, tieBreakers = Seq(asc("vec_id")))
      .select(col("vec_id"), col("similarity"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = PqIndex.search(PqIndex.encode(df, "embedding", pq), q, 10, pq,
        tieBreakers = Seq(asc("vec_id")))
      .select(col("vec_id"), col("similarity"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, "identity-rotated search must be bit-identical")
    // and the brute-force result through the lossless codebook — the
    // gate row's composition
    val exact = exactTopK(df, 0L, 10)
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map { case (id, s) => (id, math.rint(s * 1e6) / 1e6) } == exact)
  }

  test("learned rotation: orthogonal, norm-preserving, deterministic across partitionings, distortion falls") {
    val df = correlated
    val m1 = OpqIndex.fit(df.repartition(2), "embedding", m = 8, k = 8, opqIters = 6)
    val m2 = OpqIndex.fit(df.repartition(17), "embedding", m = 8, k = 8, opqIters = 6)
    assert(m1.rotation.toSeq == m2.rotation.toSeq &&
      m1.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
        m2.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "hash-ordered sample ⇒ the fit is a pure function of the data")
    // R orthogonal: RᵀR == I to float tolerance
    val r = m1.rotation
    for (i <- 0 until dim; j <- 0 until dim) {
      val dot = (0 until dim).map(l => r(l * dim + i).toDouble * r(l * dim + j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-5, s"RᵀR[$i][$j] = $dot")
    }
    // norms preserved through the in-plan rotation
    val withNorms = OpqIndex.encode(df, "embedding", m1)
      .join(df.select(col("vec_id"),
        graft.functions.vectors.vector_norm(col("embedding")).as("__raw")), "vec_id")
    val drift = withNorms.agg(max(abs(col("emb_norm") - col("__raw")))).head().getDouble(0)
    assert(drift < 1e-4, s"‖Rx‖ must equal ‖x‖ up to float rounding, drift $drift")
    // the alternating objective actually fell
    assert(m1.distortions.last < m1.distortions.head,
      s"distortion must fall: ${m1.distortions.toSeq}")
  }

  test("learned rotation beats plain PQ recall on cross-subspace-correlated data (the Ge et al. claim)") {
    val df = correlated
    def recall(opq: Boolean): Double = {
      val got: Long => Set[Long] =
        if (opq) {
          val model = OpqIndex.fit(df, "embedding", m = 8, k = 8, opqIters = 6)
          assert(!model.pq.lossless)
          val enc = OpqIndex.encode(df, "embedding", model).localCheckpoint(true)
          qid => {
            val q = df.where(col("vec_id") === qid).select("embedding")
              .head().getSeq[Float](0).toArray
            OpqIndex.search(enc, q, 10, model, tieBreakers = Seq(asc("vec_id")))
              .select("vec_id").collect().map(_.getLong(0)).toSet
          }
        } else {
          val model = PqIndex.fit(df, "embedding", m = 8, k = 8)
          val enc = PqIndex.encode(df, "embedding", model).localCheckpoint(true)
          qid => {
            val q = df.where(col("vec_id") === qid).select("embedding")
              .head().getSeq[Float](0).toArray
            PqIndex.search(enc, q, 10, model, tieBreakers = Seq(asc("vec_id")))
              .select("vec_id").collect().map(_.getLong(0)).toSet
          }
        }
      (0L until 8L).map { qid =>
        val want = exactTopK(df, qid, 10).select("vec_id")
          .collect().map(_.getLong(0)).toSet
        (got(qid) & want).size.toDouble / want.size
      }.sum / 8
    }
    val (ro, rp) = (recall(opq = true), recall(opq = false))
    assert(ro > rp, s"OPQ recall $ro must beat plain PQ $rp at equal m/k")
    // and the codec-quality face of the same claim: corpus-wide mean
    // self-similarity (cos(Rx, q(Rx)) — what ADC serving compares)
    // improves under the learned rotation
    val om = OpqIndex.fit(df, "embedding", m = 8, k = 8, opqIters = 6)
    val pm = PqIndex.fit(df, "embedding", m = 8, k = 8)
    val so = OpqIndex.selfSimilarity(df, "embedding", om)
      .agg(avg("self_sim")).head().getDouble(0)
    val sp = PqIndex.selfSimilarity(df, "embedding", pm)
      .agg(avg("self_sim")).head().getDouble(0)
    assert(so > sp, s"OPQ mean self-sim $so must beat plain PQ $sp")
  }

  test("OPQ composes with IVFADC as a pretransform: rotated build + rotated query == brute force at the composed degenerates") {
    // the FAISS `OPQ,IVF,PQ` factory string: rotate the corpus once
    // (in-plan RotateVector), build the IVFADC index on the rotated
    // column, rotate each query driver-side — at identity rotation +
    // lossless codebooks + nprobe = nlist the whole composition
    // provably returns the brute-force result (and the rotation seam
    // is the SAME column both tiers then quantize)
    import graft.operators.IvfPqIndex
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val df = fixture
    val opqRot = OpqIndex.identityRotation(dim)
    val rotated = df.select(col("vec_id"), ColumnBridge.column(
      graft.expressions.RotateVector(
        ColumnBridge.expression(col("embedding")), opqRot, dim)).as("embedding"))
    val idx = IvfPqIndex.build(rotated, "embedding", nlist = 4, m = 4,
      k = 65536, maxTrain = 65536)
    assert(idx.model.lossless)
    val q = df.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val rq = OpqIndex.withArtifacts(opqRot, idx.model).rotateLocal(q)
    val got = idx.search(rq, k = 10, nprobe = 4, tieBreakers = Seq(asc("vec_id")))
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = exactTopK(df, 0L, 10)
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"OPQ∘IVFADC composed degenerates must equal brute force:\n$got\n$want")
  }

  test("save/load round-trips rotation and codebooks; refusals") {
    val df = correlated
    val model = OpqIndex.fit(df, "embedding", m = 4, k = 8, opqIters = 3)
    val dir = java.nio.file.Files.createTempDirectory("opq").toString
    try {
      OpqIndex.save(model, dir)
      val re = OpqIndex.load(spark, dir)
      assert(re.rotation.toSeq == model.rotation.toSeq)
      val q = df.where(col("vec_id") === 2).select("embedding").head().getSeq[Float](0).toArray
      val enc = OpqIndex.encode(df, "embedding", model)
      def run(m: graft.operators.OpqModel) =
        OpqIndex.search(enc, q, 5, m, tieBreakers = Seq(asc("vec_id")))
          .select(col("vec_id"), col("similarity"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(run(re) == run(model))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
    intercept[IllegalArgumentException](
      OpqIndex.fit(df, "embedding", m = 4, k = 8, opqIters = 0))
    intercept[IllegalArgumentException](model.rotateLocal(new Array[Float](3)))
    // a wrong-length row REFUSES at encode (zero-padding would code garbage)
    val mixed = Seq((900L, Seq(1f, 2f))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val ex = intercept[Exception](
      OpqIndex.encode(mixed, "embedding", model).collect())
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("rotate_vector")) || mentions(t.getCause))
    assert(mentions(ex), s"encode must refuse wrong-dim rows by name: $ex")
  }

  test("learned-rotation lossless models reconstruct the SERVING rotation bit-for-bit (r16 ADVICE)") {
    // 20 distinct rows under k = 256 keep the distinct-set codebooks ⇒
    // lossless = true WITH a genuinely learned rotation. The flag's
    // claim is about SERVING: the codebooks must contain exactly the
    // float32-rotated subvectors encode produces — a final refit on the
    // loop's full-double rotation would differ in the last bits and the
    // bit-compare below would fail (the pre-fix behavior).
    val df = correlated.where(col("vec_id") < 20)
    val model = OpqIndex.fit(df, "embedding", m = 8, k = 256, opqIters = 4)
    assert(model.pq.lossless,
      "20 distinct rows under k = 256 must keep the distinct set")
    assert(model.rotation.zipWithIndex.exists { case (v, i) =>
      v != (if (i / dim == i % dim) 1f else 0f)
    }, "the fixture must produce a non-identity rotation")
    val sub = model.pq.sub
    val rows = OpqIndex.encode(df, "embedding", model)
      .join(df, "vec_id")
      .select("vec_id", "pq_codes", "embedding").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val codes = r.getAs[Array[Byte]]("pq_codes")
      // rotateLocal is the same double-accumulate kernel as the in-plan
      // RotateVector, so this IS the serving-side rotated vector
      val rotated = model.rotateLocal(r.getSeq[Float](2).toArray)
      for (j <- 0 until model.pq.m) {
        val cw = model.pq.codebooks(j)(codes(j) & 0xFF)
        assert(java.util.Arrays.equals(cw,
          java.util.Arrays.copyOfRange(rotated, j * sub, (j + 1) * sub)),
          s"row ${r.getLong(0)} subspace $j: stored codeword is not the " +
            "float32-rotated subvector — lossless would be a lie at serving")
      }
    }
  }
}
