package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Nearest}

class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val query: Array[Float] =
    e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

  test("every vector lands in exactly one of nlist cells") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    assert(idx.indexed.count() == 500)
    val cells = idx.indexed.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until 8).toSet) && cells.size == 8)
    assert(idx.centroids.count() == 8)
  }

  test("probing ALL cells reproduces the exact top-k (recall = 1 at nprobe = nlist)") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    val exact = Nearest.topK(e, "embedding", lit(query), n = 10,
      tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val full = idx.search(query, k = 10, nprobe = 8, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == exact)
  }

  test("probe-limited search returns only vectors from probed cells, self first") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    val probed = idx.probeCells(query, 2).toSet
    val hits = idx.search(query, k = 10, nprobe = 2, tieBreakers = Seq(asc("vec_id")))
    val hitCells = hits.select("cell").collect().map(_.getInt(0)).toSet
    assert(hitCells.subsetOf(probed))
    // vec_id 0 sits in the best-probed cell, so the self-match leads
    assert(hits.select("vec_id").head().getLong(0) == 0L)
  }

  test("recall@10 at nprobe=4/8 is usable on the clustered fixture") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    val exact = Nearest.topK(e, "embedding", lit(query), n = 10,
      tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = idx.search(query, k = 10, nprobe = 4, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 was $recall")
  }
}
