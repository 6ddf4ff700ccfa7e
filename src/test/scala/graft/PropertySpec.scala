package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.vectors._

/** The SURVEY §5.2 ScalaCheck properties: algebraic invariants of the
  * similarity kernels over generated vectors, checked through the real
  * engine (the expressions run in eval/codegen, not reimplemented in
  * the test). Raw Gen sampling with pinned seeds — the
  * scalatest/scalacheck bridge artifact isn't in the offline cache. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecGen: Gen[Array[Float]] = for {
    n <- Gen.choose(1, 16)
    xs <- Gen.listOfN(n, Gen.choose(-100f, 100f))
  } yield xs.toArray

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def eval(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).head().getDouble(0)

  test("cosine is within [-1,1], symmetric; self-cosine 1 on nonzero vectors") {
    samples(Gen.zip(vecGen, vecGen), 40).foreach { case (a, b0) =>
      val b = b0.padTo(a.length, 0f).take(a.length) // equal dims
      val ab = eval(cosine_similarity(typedlit(a), typedlit(b)))
      val ba = eval(cosine_similarity(typedlit(b), typedlit(a)))
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9, s"cosine $ab out of range")
      assert(math.abs(ab - ba) < 1e-12)
      if (a.exists(_ != 0f))
        assert(math.abs(eval(cosine_similarity(typedlit(a), typedlit(a))) - 1.0) < 1e-6)
    }
  }

  test("leakSafeSplit properties on random pair graphs: no pair ever straddles splits; isolated rows equal splitAssign; splits partition the corpus") {
    import graft.operators.TextAnalysis
    val n = 60L
    val docs = (1L to n).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val plain = docs.select(col("doc_id"),
        TextAnalysis.splitAssign(col("doc_id")).as("split"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val edgeGen = for {
      m <- Gen.choose(0, 50)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(1L, n), Gen.choose(1L, n)))
    } yield es.filter(e => e._1 != e._2)
    samples(edgeGen, 12).foreach { edges =>
      val pairs = edges.toDF("id1", "id2")
      val got = TextAnalysis.leakSafeSplit(docs, "doc_id", pairs)
        .select("doc_id", "split").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      // total: every row gets exactly one split from the valid set
      assert(got.size == n && got.values.forall(Set("train", "val", "test")))
      // no pair straddles
      edges.foreach { case (a, b) =>
        assert(got(a) == got(b), s"pair ($a, $b) straddles: ${got(a)} vs ${got(b)}")
      }
      // rows in no pair keep their plain splitAssign value
      val paired = edges.flatMap(e => Seq(e._1, e._2)).toSet
      (1L to n).filterNot(paired).foreach(i =>
        assert(got(i) == plain(i), s"isolated row $i drifted"))
    }
  }

  test("euclidean similarity in (0,1]; dot symmetric; norm nonnegative") {
    samples(Gen.zip(vecGen, vecGen), 40).foreach { case (a, b0) =>
      val b = b0.padTo(a.length, 0f).take(a.length)
      val es = eval(euclidean_similarity(typedlit(a), typedlit(b)))
      assert(es > 0.0 && es <= 1.0 + 1e-12, s"euclidean sim $es out of range")
      assert(math.abs(eval(dot_product(typedlit(a), typedlit(b))) -
        eval(dot_product(typedlit(b), typedlit(a)))) < 1e-6)
      assert(eval(vector_norm(typedlit(a))) >= 0.0)
    }
  }

  test("l2_normalize is idempotent and produces unit norm on nonzero vectors") {
    samples(vecGen, 40).filter(_.exists(x => math.abs(x) > 1e-3)).foreach { a =>
      val once = Seq(1).toDF("x").select(l2_normalize(typedlit(a)).as("v"))
        .head().getSeq[Float](0)
      val twice = Seq(1).toDF("x")
        .select(l2_normalize(l2_normalize(typedlit(a))).as("v"))
        .head().getSeq[Float](0)
      once.zip(twice).foreach { case (x, y) => assert(math.abs(x - y) < 1e-5) }
      assert(math.abs(eval(vector_norm(l2_normalize(typedlit(a)))) - 1.0) < 1e-5)
    }
  }

  test("nearest(k) is a prefix of nearest(k+1) under the tie-break, for random queries") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    samples(Gen.listOfN(64, Gen.choose(-1f, 1f)), 5).foreach { q =>
      val qv = typedlit(q.toArray)
      def ids(k: Int) = graft.operators.Nearest
        .topK(e, "embedding", qv, n = k, tieBreakers = Seq(asc("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val k5 = ids(5); val k8 = ids(8)
      assert(k8.take(k5.length) == k5)
    }
  }

  test("quantize/dequantize round trip keeps every component within one quantization step") {
    samples(vecGen, 30).foreach { a =>
      val n = l2_normalize(typedlit(a))
      val rt = Seq(1).toDF("x")
        .select(dequantize_int8(quantize_int8(n, 1.0), 1.0).as("v"), n.as("o"))
        .head()
      val (v, o) = (rt.getSeq[Float](0), rt.getSeq[Float](1))
      v.zip(o).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1.0 / 127.0 + 1e-6, s"component drift $x vs $y")
      }
    }
  }

  test("MinHashSig is an unbiased Jaccard estimator: matching-slot fraction tracks true J") {
    import graft.expressions.{MinHashSig, ShingleHashes}
    import org.apache.spark.unsafe.types.UTF8String
    val H = 256
    def sig(t: String): Array[Long] =
      MinHashSig.signature(UTF8String.fromString(t), H, 1, 42).toLongArray()
    def trueJ(a: String, b: String): Double = {
      def s(t: String) = ShingleHashes.tokenize(UTF8String.fromString(t)).toSet
      val (sa, sb) = (s(a), s(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    // word pools built so overlap is controlled; sd of the estimator at
    // H=256 is sqrt(J(1-J)/256) <= 0.032 — assert within 5 sd
    val pool = (0 until 60).map(i => s"w$i")
    val pairs = Seq(
      (pool.take(40), pool.take(40)),                 // J = 1
      (pool.take(40), pool.slice(20, 60)),            // J = 20/60
      (pool.take(30), pool.slice(15, 45)),            // J = 15/45
      (pool.take(20), pool.slice(20, 40)))            // J = 0
    pairs.foreach { case (wa, wb) =>
      val (a, b) = (wa.mkString(" "), wb.mkString(" "))
      val j = trueJ(a, b)
      val (sa, sb) = (sig(a), sig(b))
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / H
      val tol = 5 * math.sqrt(j * (1 - j) / H) + 1e-9
      assert(math.abs(est - j) <= tol,
        s"estimate $est strays from true J=$j beyond 5sd ($tol)")
    }
  }
}
