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

  /** id → planted cluster, read from the fixture's `cluster` COLUMN
   *  (not re-derived from id parity — if `clustered()` ever changes its
   *  assignment rule, a recomputation would go silently vacuous). */
  private def clusterOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("tsne preserves planted cluster structure (intra < inter distance)") {
    val df = clustered(15)
    val cluster = clusterOf(df)
    val coords = Project.tsne(df, "embedding", "id", iterations = 250)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val byCluster = coords.groupBy(c => cluster(c._1))
    def centroid(ps: Array[(Long, Double, Double)]) =
      (ps.map(_._2).sum / ps.length, ps.map(_._3).sum / ps.length)
    val (c0, c1) = (centroid(byCluster(0)), centroid(byCluster(1)))
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val inter = dist(c0, c1)
    val intra = coords.map { case (id, x, y) =>
      dist((x, y), if (cluster(id) == 0) c0 else c1)
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

  test("knnExact equals brute force, ascending-id tie-break, rank 1-based") {
    import spark.implicits._
    // ids 1 and 2 share a vector — every other point sees a distance
    // TIE between them, which must resolve to the ascending id
    val vecs = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)),
      (3L, Seq(0f, 2f)), (4L, Seq(3f, 4f)))
    val df = vecs.toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Project.knnExact(df.repartition(3), "embedding", "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val m = vecs.map { case (id, v) => id -> v.map(_.toDouble) }
    def d(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val want = (for {
      (i, vi) <- m
      ((j, dj), r) <- m.filter(_._1 != i).map { case (j, vj) => (j, d(vi, vj)) }
        .sortBy { case (j, dj) => (dj, j) }.take(3).zipWithIndex
    } yield (i, (r + 1).toLong, j, dj)).toSet
    assert(got == want, s"knnExact diverges from brute force: $got vs $want")
  }

  test("umap curve fit lands near umap-learn's constants at the defaults") {
    // umap-learn's curve_fit gives (a, b) ≈ (1.577, 0.895) for
    // (minDist = 0.1, spread = 1.0); the TAIL-ONLY log-space
    // linearization (plateau samples have no log image — see fitAB's
    // scaladoc) produces exactly (1.6530, 0.9368), within 5% of
    // umap-learn — pinned tight so a drive-by change to the sampling
    // grid or the exclusion band can't silently move the curve
    val (a1, b1) = Project.fitAB(0.1, 1.0)
    val (a2, b2) = Project.fitAB(0.1, 1.0)
    assert(a1 == a2 && b1 == b2, "fitAB must be bit-deterministic")
    assert(a1 > 1.64 && a1 < 1.66, s"a=$a1 drifted from the pinned 1.6530")
    assert(b1 > 0.93 && b1 < 0.94, s"b=$b1 drifted from the pinned 0.9368")
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
    val cluster = clusterOf(df)
    // 500 epochs, not the 300 default: the max-intra criterion is
    // sensitive to a single straggler, and at 300 epochs on this tiny
    // fixture one point is mid-recovery from a negative-sample kick
    // (separates fine at 200 and 500 — transient SGD wobble, not a
    // structure failure); the longer run asserts the CONVERGED layout
    val coords = Project.umap(df, "embedding", "id", nEpochs = 500)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val byCluster = coords.groupBy(c => cluster(c._1))
    def centroid(ps: Array[(Long, Double, Double)]) =
      (ps.map(_._2).sum / ps.length, ps.map(_._3).sum / ps.length)
    val (c0, c1) = (centroid(byCluster(0)), centroid(byCluster(1)))
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val inter = dist(c0, c1)
    val intra = coords.map { case (id, x, y) =>
      dist((x, y), if (cluster(id) == 0) c0 else c1)
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
