package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewVecFrameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the plain inner join on skewed data") {
    // 90% of the big side lands on one key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "hot", i))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("k10", "A"), ("k20", "B"), ("nomatch", "X"))
      .toDF("k", "tag")
    val plain = big.join(small, "k").select("k", "v", "tag")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", factor = 8).select("k", "v", "tag")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("relational passthroughs keep the collection attributes (the `[.tidyvec` rule)") {
    val books = Seq(("b1", 2020.0, "alpha beta"), ("b2", 2021.0, "gamma delta"))
      .toDF("id", "year", "description")
    val vf = VecFrame.vec(books, embeddingCol = "emb",
      embedder = Some(HashingEmbedder(8))).embed("description")
    val chained = vf.filter(col("year") >= 2021).withColumn("flag", lit(1))
      .orderBy(col("id")).limit(5)
    assert(chained.embeddingCol == "emb")
    assert(chained.embedder.exists(_.name == "hashing"))
    assert(chained.df.count() == 1)
    // and search still works downstream of the chain
    val hit = chained.nearest("gamma delta", n = 1).df.head()
    assert(hit.getAs[String]("id") == "b2")
  }
}
