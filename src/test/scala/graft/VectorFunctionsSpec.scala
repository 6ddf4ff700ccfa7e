package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.vectors._

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("s")).head().getDouble(0)

  private def vec(xs: Float*) = typedlit(xs.toArray)

  test("cosine of a vector with itself is 1") {
    assert(math.abs(score(cosine_similarity(vec(1f, 2f, 3f), vec(1f, 2f, 3f))) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0; opposite is -1") {
    assert(score(cosine_similarity(vec(1f, 0f), vec(0f, 1f))) == 0.0)
    assert(math.abs(score(cosine_similarity(vec(1f, 0f), vec(-1f, 0f))) + 1.0) < 1e-12)
  }

  test("cosine with a zero vector is 0.0, not NaN (SURVEY 2.4.2 guard)") {
    assert(score(cosine_similarity(vec(0f, 0f), vec(1f, 2f))) == 0.0)
  }

  test("dot product matches manual sum") {
    assert(score(dot_product(vec(1f, 2f, 3f), vec(4f, 5f, 6f))) == 32.0)
  }

  test("l2 distance and bounded euclidean similarity") {
    assert(score(l2_distance(vec(0f, 3f), vec(4f, 0f))) == 5.0)
    assert(score(euclidean_similarity(vec(0f, 3f), vec(4f, 0f))) == 1.0 / 6.0)
    // self distance 0 -> similarity exactly 1 (upper bound of (0,1])
    assert(score(euclidean_similarity(vec(1f, 1f), vec(1f, 1f))) == 1.0)
  }

  test("NULL vector propagates NULL (callers coalesce to 0)") {
    val r = Seq(1).toDF("x")
      .select(cosine_similarity(lit(null).cast("array<float>"), vec(1f, 2f)).as("s"))
      .head()
    assert(r.isNullAt(0))
  }

  test("l2_normalize produces unit norm and preserves direction; zero vector unchanged") {
    val n = score(vector_norm(l2_normalize(vec(3f, 4f))))
    assert(math.abs(n - 1.0) < 1e-6)
    val z = Seq(1).toDF("x").select(l2_normalize(vec(0f, 0f)).as("v")).head().getSeq[Float](0)
    assert(z == Seq(0f, 0f))
  }

  test("expressions work from SQL text after registration") {
    graft.expressions.VectorExpressions.register(spark)
    val r = spark.sql("SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS s").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    val r2 = spark.sql(
      """SELECT euclidean_similarity(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS e,
        |       size(hashing_embed('hello world', 16)) AS d,
        |       simhash64('the quick fox') = simhash64('fox quick the') AS same
        |""".stripMargin).head()
    assert(r2.getDouble(0) == 1.0 / 6.0)
    assert(r2.getInt(1) == 16)
    assert(r2.getBoolean(2))
  }

  test("similarity() rejects unknown methods") {
    intercept[IllegalArgumentException] { similarity(vec(1f), vec(1f), "manhattan") }
  }

  test("int8 quantization round trip: cosine preserved within 1% on real embeddings") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(100)
    val q = e.select(
      col("vec_id"),
      cosine_similarity(col("embedding"), l2_normalize(col("embedding"))).as("self"),
      cosine_similarity(
        dequantize_int8(quantize_int8(l2_normalize(col("embedding")), 1.0), 1.0),
        l2_normalize(col("embedding"))).as("qcos"))
    val rows = q.collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - 1.0) < 0.01,
        s"vec ${r.getLong(0)}: quantized cosine ${r.getDouble(2)} drifted >1%")
    }
    // and the quantized column is actually bytes
    val dt = e.select(quantize_int8(col("embedding"), 1.0).as("qv")).schema("qv").dataType
    assert(dt.simpleString == "array<tinyint>")
  }
}
