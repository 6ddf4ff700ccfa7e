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
}
