package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Nearest, PqIndex}

/** [[PqIndex]] — product-quantization ADC search: lossless when the
  * codebook covers the domain, recall-bounded when it compresses. */
class PqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  // 200 vectors in 4 loose clusters + planted exact near-dups of vec 0
  private def fixture = {
    val rnd = new scala.util.Random(7)
    (0L until 200L).map { i =>
      val c = (i % 4).toInt
      val base = Array.tabulate(dim)(d => math.sin(c * 2.1 + d * 0.7).toFloat)
      val v = base.map(x => x + (rnd.nextGaussian() * 0.15).toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("distinct-set codebooks are lossless: ADC top-k == exact top-k, scores included") {
    val df = fixture
    val model = PqIndex.fit(df, "embedding", m = 4, k = 65536, maxTrain = 65536)
    assert(model.codebooks.forall(_.length == 200), "each subspace holds all distinct subvectors")
    assert(model.lossless, "full sample + distinct-set codebooks must report lossless")
    val q = df.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val enc = PqIndex.encode(df, "embedding", model).drop("embedding")
    val got = PqIndex.search(enc, q, n = 10, model, tieBreakers = Seq(asc("vec_id")))
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Nearest.topK(df.crossJoin(broadcast(
        df.where(col("vec_id") === 0).select(col("embedding").as("qe")))),
        "embedding", col("qe"), n = 10, tieBreakers = Seq(asc("vec_id")))
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"lossless ADC must equal brute force:\n$got\n$want")
  }

  test("lossy path: shortlist recall — the ADC top-50 contains the true top-20") {
    // the metric that matters in production: ADC ranks a SHORTLIST the
    // re-rank stage then orders exactly; within-cluster fine ordering
    // at codeword granularity is noise and is not claimed
    val df = fixture
    val model = PqIndex.fit(df, "embedding", m = 4, k = 16)
    assert(model.codebooks.forall(_.length == 16))
    val q = df.where(col("vec_id") === 1).select("embedding").head().getSeq[Float](0).toArray
    val enc = PqIndex.encode(df, "embedding", model).drop("embedding")
    val shortlist = PqIndex.search(enc, q, n = 50, model, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = Nearest.topK(df.crossJoin(broadcast(
        df.where(col("vec_id") === 1).select(col("embedding").as("qe")))),
        "embedding", col("qe"), n = 20, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (shortlist & want).size.toDouble / want.size
    assert(recall >= 0.9, s"shortlist recall $recall under 0.9 at m=4/k=16")
    assert(!model.lossless, "Lloyd-compressed codebooks must NOT report lossless")
    // the shipped-row claim: the classic m-byte PQ code + a norm vs dim floats
    assert(model.codeBytes == 1, "k=16 codebooks must pack to one byte per code")
    assert(model.m * model.codeBytes + 8 < dim * 4, "code bytes must undercut vector bytes")
    // and the column really IS that layout, in memory and through shuffles
    import org.apache.spark.sql.types.BinaryType
    assert(enc.schema("pq_codes").dataType == BinaryType)
    val widths = enc.select("pq_codes").collect().map(_.getAs[Array[Byte]](0).length).toSet
    assert(widths == Set(model.m * model.codeBytes),
      s"every code value must be exactly m*codeBytes bytes, got widths $widths")
  }

  test("refine: lossless shortlist + exact re-rank == brute force; lossy refine beats bare ADC and reports EXACT scores; refusals") {
    val df = fixture
    def exact(qid: Long, n: Int) =
      Nearest.topK(df.crossJoin(broadcast(
          df.where(col("vec_id") === qid).select(col("embedding").as("qe")))),
          "embedding", col("qe"), n = n, tieBreakers = Seq(asc("vec_id")))
        .select(col("vec_id"), round(col("similarity"), 6).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val raw = df.select(col("vec_id"), col("embedding"))
    // lossless: refined == brute force (the gate row's claim)
    val lossless = PqIndex.fit(df, "embedding", m = 4, k = 65536, maxTrain = 65536)
    assert(lossless.lossless)
    val encL = PqIndex.encode(df, "embedding", lossless).drop("embedding")
    val q0 = df.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val gotL = PqIndex.searchRefine(encL, raw, "vec_id", "embedding", q0,
        n = 10, shortlist = 20, lossless, tieBreakers = Seq(asc("vec_id")))
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotL == exact(0L, 10), s"lossless refine must equal brute force: $gotL")
    // lossy: the refined top-k's ID RECALL is >= the bare ADC top-k's
    // (the published refine lever), and its SCORES are the exact
    // cosines by construction
    val lossy = PqIndex.fit(df, "embedding", m = 4, k = 16)
    val encY = PqIndex.encode(df, "embedding", lossy).drop("embedding")
    val q1 = df.where(col("vec_id") === 1).select("embedding").head().getSeq[Float](0).toArray
    val want = exact(1L, 10)
    val refined = PqIndex.searchRefine(encY, raw, "vec_id", "embedding", q1,
        n = 10, shortlist = 50, lossy, tieBreakers = Seq(asc("vec_id")))
      .select(col("vec_id"), round(col("similarity"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bare = PqIndex.search(encY, q1, n = 10, lossy, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val wantIds = want.map(_._1).toSet
    val recRefined = (refined.map(_._1).toSet & wantIds).size
    val recBare = (bare & wantIds).size
    assert(recRefined >= recBare,
      s"refined recall $recRefined must be >= bare ADC $recBare")
    // every refined score is the exact cosine of that id
    val exactById = exact(1L, 200).toMap
    refined.foreach { case (id, sc) =>
      assert(exactById(id) == sc, s"refined score for $id must be exact: $sc")
    }
    // refusals
    intercept[IllegalArgumentException](
      PqIndex.searchRefine(encY, raw, "vec_id", "embedding", q1, n = 10,
        shortlist = 5, lossy))
    intercept[IllegalArgumentException](
      PqIndex.searchRefine(encY, raw, "vec_id", "embedding", q1, n = 2,
        shortlist = 5000, lossy))
  }

  test("a sample truncated by maxTrain reports lossless = false even on the distinct path") {
    // 200 rows, maxTrain = 150: every SAMPLED vector reconstructs
    // exactly (distinct-set codebooks), but a quarter of the corpus
    // never trained — an 'exact' caller must be able to see that
    val model = PqIndex.fit(fixture, "embedding", m = 4, k = 150, maxTrain = 150)
    assert(model.codebooks.forall(_.length == 150))
    assert(!model.lossless, "truncated sample must not report lossless")
  }

  test("fit is deterministic across partitionings; save/load searches identically") {
    val df = fixture
    val m1 = PqIndex.fit(df.repartition(1), "embedding", m = 4, k = 16)
    val m7 = PqIndex.fit(df.repartition(7), "embedding", m = 4, k = 16)
    assert(m1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      m7.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "hash-ordered sample + seeded Lloyd must not depend on partitioning")
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    PqIndex.save(m1, dir)
    val m2 = PqIndex.load(spark, dir)
    val q = df.where(col("vec_id") === 2).select("embedding").head().getSeq[Float](0).toArray
    val enc = PqIndex.encode(df, "embedding", m1).drop("embedding")
    val a = PqIndex.search(enc, q, 5, m1, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id", "similarity").collect().toSeq
    val b = PqIndex.search(PqIndex.encode(df, "embedding", m2).drop("embedding"),
        q, 5, m2, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id", "similarity").collect().toSeq
    assert(a == b, "reloaded codebooks must search bit-identically")
    assert(m2.lossless == m1.lossless, "lossless flag must survive the round-trip")
    // by-name meta reads: a column-reordered rewrite (another engine,
    // mergeSchema) must load correctly, not swap m and dim silently
    val reordered = spark.read.parquet(s"$dir/meta").select("lossless", "dim", "m")
      .collect()
    import spark.implicits._
    reordered.map(r => (r.getAs[Boolean]("lossless"), r.getAs[Int]("dim"), r.getAs[Int]("m")))
      .toSeq.toDF("lossless", "dim", "m")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val m3 = PqIndex.load(spark, dir)
    assert(m3.m == m1.m && m3.dim == m1.dim && m3.lossless == m1.lossless,
      "meta must read by NAME — a reordered rewrite swapped nothing")
  }

  test("NULL embeddings ride through encode and score exactly 0 — the nearest rule") {
    val df = fixture.unionByName(
      Seq((999L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val model = PqIndex.fit(df, "embedding", m = 4, k = 16)
    val q = df.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val got = PqIndex.search(PqIndex.encode(df, "embedding", model).drop("embedding"),
        q, n = 201, model, tieBreakers = Seq(asc("vec_id")))
      .where(col("vec_id") === 999L).select("similarity").collect()
    assert(got.length == 1 && got.head.getDouble(0) == 0.0,
      "an unembedded row must appear with similarity exactly 0, not NULL")
  }

  test("kernel refusals: ragged rows and foreign-model codes throw, not corrupt") {
    val df = fixture
    val model = PqIndex.fit(df, "embedding", m = 4, k = 16)
    // ragged row: 8 floats under a dim-16 model
    val ragged = Seq((1L, (0 until 8).map(_.toFloat))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val e1 = intercept[Exception] {
      PqIndex.encode(ragged, "embedding", model).collect()
    }
    assert(e1.getMessage != null)
    // mixed-dim corpus refuses at fit
    assertThrows[IllegalArgumentException] {
      PqIndex.fit(df.unionByName(ragged), "embedding", m = 4)
    }
    // codes encoded under a bigger-k model searched with a smaller one
    val big = PqIndex.fit(df, "embedding", m = 4, k = 65536, maxTrain = 65536)
    val encBig = PqIndex.encode(df, "embedding", big).drop("embedding")
    val q = df.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val e2 = intercept[Exception] {
      PqIndex.search(encBig, q, 5, model).collect()
    }
    assert(e2.getMessage != null)
  }

  test("guardrails: dim divisibility, empty fit, bad knobs, column clashes") {
    val df = fixture
    assertThrows[IllegalArgumentException] {
      PqIndex.fit(df, "embedding", m = 3) // 16 % 3 != 0
    }
    assertThrows[IllegalArgumentException] {
      PqIndex.fit(df.where(lit(false)), "embedding", m = 4)
    }
    assertThrows[IllegalArgumentException] {
      PqIndex.fit(df, "embedding", m = 4, k = 0)
    }
    assertThrows[IllegalArgumentException] {
      PqIndex.fit(df, "embedding", m = 4, k = 256, maxTrain = 10)
    }
    val model = PqIndex.fit(df, "embedding", m = 4, k = 16)
    assertThrows[IllegalArgumentException] {
      PqIndex.encode(df.withColumn("pq_codes", lit(1)), "embedding", model)
    }
    assertThrows[IllegalArgumentException] {
      PqIndex.search(PqIndex.encode(df, "embedding", model), new Array[Float](8), 5, model)
    }
  }
}
