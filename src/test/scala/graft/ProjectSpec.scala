package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Project

/** Driver-local layouts (t-SNE, UMAP): determinism, neighborhood
 *  preservation, loud caps and refusals. */
class ProjectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Two tight 8-dim clusters around distant centers. */
  private def clustered(nPerCluster: Int) = {
    import spark.implicits._
    (0 until 2 * nPerCluster).map { i =>
      val c = i % 2
      val base = if (c == 0) 0f else 10f
      // deterministic low-amplitude jitter, distinct per point
      val v = (0 until 8).map(k => base + ((i * 31 + k * 7) % 10) / 100f)
      (i.toLong, c, v)
    }.toDF("id", "cluster", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("tsne is deterministic across runs and partitionings") {
    val df = clustered(15)
    val a = Project.tsne(df, "embedding", "id", iterations = 120)
      .orderBy("id").collect()
    val b = Project.tsne(df.repartition(7), "embedding", "id", iterations = 120)
      .orderBy("id").collect()
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.getLong(0) == rb.getLong(0))
      assert(ra.getDouble(1) == rb.getDouble(1) && ra.getDouble(2) == rb.getDouble(2),
        s"coords drifted for id ${ra.getLong(0)}")
    }
  }

  test("tsne preserves planted cluster structure (intra < inter distance)") {
    val df = clustered(15)
    val coords = Project.tsne(df, "embedding", "id", iterations = 250)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val byCluster = coords.groupBy(_._1 % 2)
    def centroid(ps: Array[(Long, Double, Double)]) =
      (ps.map(_._2).sum / ps.length, ps.map(_._3).sum / ps.length)
    val (c0, c1) = (centroid(byCluster(0L)), centroid(byCluster(1L)))
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val inter = dist(c0, c1)
    val intra = coords.map { case (id, x, y) =>
      dist((x, y), if (id % 2 == 0) c0 else c1)
    }.max
    assert(inter > intra,
      s"clusters not separated: inter-centroid $inter <= max intra $intra")
  }

  test("tsne refuses inputs over maxRows instead of collecting them") {
    import spark.implicits._
    val big = (0L until 60L).map(i => (i, Seq.fill(4)(i.toFloat)))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val e = intercept[IllegalArgumentException] {
      Project.tsne(big, "embedding", "id", maxRows = 50)
    }
    assert(e.getMessage.contains("maxRows"))
  }

  test("tsne refuses degenerate and mixed-dimension inputs loudly") {
    import spark.implicits._
    // n < 4: the clamped perplexity would have no attainable entropy
    // target and every coordinate would come back NaN — refuse instead
    val tiny = Seq((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f)))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val e1 = intercept[IllegalArgumentException] {
      Project.tsne(tiny, "embedding", "id")
    }
    assert(e1.getMessage.contains("at least 4"))
    // mixed dims: refuse, never truncate to the common prefix
    val mixed = Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f)), (3L, Seq(2f, 1f)),
      (4L, Seq(1f, 2f, 3f)))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val e2 = intercept[IllegalArgumentException] {
      Project.tsne(mixed, "embedding", "id")
    }
    assert(e2.getMessage.contains("dimension"))
  }

  test("tsne drops NULL embeddings like viz_embeddings") {
    import spark.implicits._
    val df = clustered(5).unionByName(
      Seq((100L, -1, null.asInstanceOf[Seq[Float]])).toDF("id", "cluster", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val out = Project.tsne(df, "embedding", "id", iterations = 50)
    assert(out.count() == 10 && out.filter(col("id") === 100L).isEmpty)
  }

  test("umap curve fit lands near umap-learn's constants at the defaults") {
    // umap-learn's curve_fit gives (a, b) ≈ (1.577, 0.895) for
    // (minDist = 0.1, spread = 1.0); the log-space linearization should
    // land in the same neighborhood — and exactly the same value on
    // every call (no RNG, no tolerance)
    val (a1, b1) = Project.fitAB(0.1, 1.0)
    val (a2, b2) = Project.fitAB(0.1, 1.0)
    assert(a1 == a2 && b1 == b2, "fitAB must be bit-deterministic")
    assert(a1 > 1.0 && a1 < 2.5, s"a=$a1 out of the expected neighborhood")
    assert(b1 > 0.7 && b1 < 1.2, s"b=$b1 out of the expected neighborhood")
    // larger minDist flattens the curve near 0 -> smaller a
    val (aWide, _) = Project.fitAB(0.5, 1.0)
    assert(aWide < a1, s"a should shrink as minDist grows: $aWide !< $a1")
  }

  test("umap is deterministic across runs and partitionings") {
    val df = clustered(15)
    val a = Project.umap(df, "embedding", "id", nEpochs = 100)
      .orderBy("id").collect()
    val b = Project.umap(df.repartition(7), "embedding", "id", nEpochs = 100)
      .orderBy("id").collect()
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.getLong(0) == rb.getLong(0))
      assert(ra.getDouble(1) == rb.getDouble(1) && ra.getDouble(2) == rb.getDouble(2),
        s"coords drifted for id ${ra.getLong(0)}")
    }
  }

  test("umap preserves planted cluster structure (intra < inter distance)") {
    val df = clustered(15)
    val coords = Project.umap(df, "embedding", "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val byCluster = coords.groupBy(_._1 % 2)
    def centroid(ps: Array[(Long, Double, Double)]) =
      (ps.map(_._2).sum / ps.length, ps.map(_._3).sum / ps.length)
    val (c0, c1) = (centroid(byCluster(0L)), centroid(byCluster(1L)))
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val inter = dist(c0, c1)
    val intra = coords.map { case (id, x, y) =>
      dist((x, y), if (id % 2 == 0) c0 else c1)
    }.max
    assert(inter > intra,
      s"clusters not separated: inter-centroid $inter <= max intra $intra")
  }

  test("umap refuses oversize, degenerate, and mixed-dimension inputs loudly") {
    import spark.implicits._
    val big = (0L until 60L).map(i => (i, Seq.fill(4)(i.toFloat)))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val e = intercept[IllegalArgumentException] {
      Project.umap(big, "embedding", "id", maxRows = 50)
    }
    assert(e.getMessage.contains("maxRows"))
    val mixed = Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f)), (3L, Seq(2f, 1f)),
      (4L, Seq(1f, 2f, 3f)))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val e2 = intercept[IllegalArgumentException] {
      Project.umap(mixed, "embedding", "id")
    }
    assert(e2.getMessage.contains("dimension"))
  }

  test("umap drops NULL embeddings like viz_embeddings") {
    import spark.implicits._
    val df = clustered(5).unionByName(
      Seq((100L, -1, null.asInstanceOf[Seq[Float]])).toDF("id", "cluster", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val out = Project.umap(df, "embedding", "id", nEpochs = 50)
    assert(out.count() == 10 && out.filter(col("id") === 100L).isEmpty)
  }
}
