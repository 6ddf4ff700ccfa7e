package graft.operators

import org.apache.spark.ml.feature.{PCA, StandardScaler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/**
 * 2-D projection of the embedding space — the engine half of
 * `viz_embeddings` (/root/reference/R/visualization.R:17-113): drop
 * NULL rows (:28-29), standardize (the reference's `prcomp(scale. =
 * TRUE)`, :58-61), project to the top components, append `x`, `y`
 * (:66-67). Rendering is presentation, not dataflow — out of engine
 * scope.
 *
 * Three projection methods, mirroring the reference's `method`
 * argument (visualization.R:40-57, default umap, fallback pca):
 *  - `pca` — fully distributed (treeAggregate moments + d×d Gramian on
 *    the driver); THE method for corpus-scale frames.
 *  - `umap` — the reference's DEFAULT method, here the published
 *    algorithm (McInnes/Healy/Melville 2018) made deterministic:
 *    exact kNN instead of NN-descent, seeded init, and a sequential
 *    single-threaded edge-sampling SGD instead of uwot's hogwash-
 *    parallel one (parallel SGD is where uwot's run-to-run
 *    nondeterminism comes from — serializing it changes only the
 *    update interleaving, not the objective). DRIVER-side with a hard
 *    `maxRows` refusal, same locality as the reference's own
 *    uwot::umap call (which also collects the matrix into R memory).
 *  - `tsne` — exact Barnes-Hut-free t-SNE, DRIVER-side, seeded and
 *    deterministic, same `maxRows` refusal contract — project a
 *    sample or use pca at scale.
 *
 * Scale shape: StandardScaler and PCA both reduce via treeAggregate —
 * one pass for moments, one d×d Gramian solved on the driver (fine for
 * d up to a few thousand); the projection itself is a narrow map.
 */
object Project {

  def pca(df: DataFrame, embCol: String, k: Int = 2): DataFrame = {
    val vecCol = "__graft_vec"; val scaledCol = "__graft_scaled"; val pcaCol = "__graft_pca"
    val embedded = df.where(col(embCol).isNotNull)
    val assembled = embedded.withColumn(vecCol, array_to_vector(col(embCol)))
    val scaler = new StandardScaler().setInputCol(vecCol).setOutputCol(scaledCol)
      .setWithMean(true).setWithStd(true)
    val scaled = scaler.fit(assembled).transform(assembled)
    val pcaModel = new PCA().setK(k).setInputCol(scaledCol).setOutputCol(pcaCol).fit(scaled)
    val coords = vector_to_array(col(pcaCol))
    pcaModel.transform(scaled)
      .withColumn("x", coords.getItem(0))
      .withColumn("y", coords.getItem(1))
      .drop(vecCol, scaledCol, pcaCol)
  }

  /**
   * Exact t-SNE (van der Maaten & Hinton 2008) to 2-D. Deterministic:
   * seeded Gaussian init, fixed iteration schedule (early exaggeration
   * ×12 through iter 100, momentum 0.5→0.8 at iter 250), perplexity
   * calibrated per point by binary search. O(n²) per iteration on the
   * DRIVER — the same locality as the reference's umap path, made safe
   * by a hard `maxRows` refusal (no silent corpus collect; the guard is
   * a count, not a truncation).
   *
   * Returns (idCol, x, y). NULL embeddings are dropped, matching
   * `viz_embeddings`'s filter (R/visualization.R:28-29).
   */
  def tsne(df: DataFrame, embCol: String, idCol: String,
      perplexity: Double = 30.0, iterations: Int = 300, seed: Long = 42L,
      maxRows: Int = 5000): DataFrame = {
    val spark = df.sparkSession
    // orderBy before collect: the row→seeded-init pairing must not
    // depend on partition arrival order
    val rows = df.where(col(embCol).isNotNull)
      .select(col(idCol), col(embCol)).orderBy(col(idCol)).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"tsne collects the embedding matrix to the driver (like the reference's " +
        s"umap) and refuses inputs over maxRows=$maxRows — sample first, or use " +
        "Project.pca for corpus-scale projection")
    val n = rows.length
    val ids = rows.map(_.get(0))
    val xs = rows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    // n >= 4 keeps the clamped perplexity >= 1 (entropy target >= 0);
    // below that the beta search has no attainable target, every P
    // underflows, and the output would be silent NaNs
    require(n >= 4, s"tsne needs at least 4 embedded rows, got $n")
    // refuse mixed dimensions instead of silently truncating to the
    // common prefix — the library-wide guardrail convention
    val dim0 = xs.head.length
    val badDim = xs.indexWhere(_.length != dim0)
    require(badDim < 0,
      s"tsne embeddings must share one dimension: row ${ids(badDim)} has " +
        s"${xs(badDim).length}, expected $dim0")
    val perp = math.max(1.0, math.min(perplexity, (n - 1) / 3.0)) // >= 1 by the n guard

    // pairwise squared euclidean distances
    val d2 = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0; var k = 0
        val a = xs(i); val b = xs(j)
        // dims are uniform by the guard above — no truncation possible
        while (k < dim0) { val d = a(k) - b(k); s += d * d; k += 1 }
        d2(i)(j) = s; d2(j)(i) = s
        j += 1
      }
      i += 1
    }

    // per-point sigma by binary search on perplexity, then symmetrized P
    val p = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      var lo = 1e-20; var hi = 1e20; var beta = 1.0
      var iter = 0
      while (iter < 64) {
        var sum = 0.0; var hBeta = 0.0
        var j = 0
        while (j < n) {
          if (j != i) { val e = math.exp(-d2(i)(j) * beta); sum += e; hBeta += d2(i)(j) * e }
          j += 1
        }
        val h = if (sum > 0) math.log(sum) + beta * hBeta / sum else 0.0
        if (h > math.log(perp)) { lo = beta; beta = if (hi >= 1e20) beta * 2 else (beta + hi) / 2 }
        else { hi = beta; beta = (beta + lo) / 2 }
        iter += 1
      }
      var sum = 0.0
      var j = 0
      while (j < n) { if (j != i) { p(i)(j) = math.exp(-d2(i)(j) * beta); sum += p(i)(j) }; j += 1 }
      j = 0
      while (j < n) { if (j != i && sum > 0) p(i)(j) /= sum; j += 1 }
      i += 1
    }
    // symmetrize + normalize (sum over the full matrix = 1)
    val pSym = Array.ofDim[Double](n, n)
    var pTot = 0.0
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) { pSym(i)(j) = (p(i)(j) + p(j)(i)) / (2.0 * n); pTot += pSym(i)(j); j += 1 }
      i += 1
    }
    // defensive: pTot > 0 is guaranteed by the n/perplexity guards
    // above, but a zero here would turn into NaN coordinates (0/0 then
    // max(NaN, eps) = NaN) — fail loudly instead
    require(pTot > 0, "t-SNE affinity matrix underflowed to zero — " +
      "inputs may be degenerate (all points identical?)")
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) { pSym(i)(j) = math.max(pSym(i)(j) / pTot, 1e-12); j += 1 }
      i += 1
    }

    // seeded init + gradient descent with momentum
    val rnd = new java.util.Random(seed)
    val y = Array.fill(n, 2)(rnd.nextGaussian() * 1e-4)
    val dy = Array.ofDim[Double](n, 2)
    val gains = Array.fill(n, 2)(1.0) // per-coordinate adaptive gains (vdM's schedule)
    val q = Array.ofDim[Double](n, n)
    var it = 0
    while (it < iterations) {
      val exag = if (it < 100) 12.0 else 1.0
      val momentum = if (it < 250) 0.5 else 0.8
      // student-t Q
      var qTot = 0.0
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val dx = y(i)(0) - y(j)(0); val dyy = y(i)(1) - y(j)(1)
          val num = 1.0 / (1.0 + dx * dx + dyy * dyy)
          q(i)(j) = num; q(j)(i) = num; qTot += 2 * num
          j += 1
        }
        i += 1
      }
      // full gradient from a CONSISTENT position snapshot, THEN update:
      // moving y(i) inside the gradient loop would let later points see
      // already-moved earlier ones (positions inconsistent with the
      // qTot above), and the error compounds exponentially within one
      // sweep
      val gx = new Array[Double](n); val gy = new Array[Double](n)
      i = 0
      while (i < n) {
        var sx = 0.0; var sy = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val num = q(i)(j)
            val coef = 4.0 * (exag * pSym(i)(j) - math.max(num / qTot, 1e-12)) * num
            sx += coef * (y(i)(0) - y(j)(0))
            sy += coef * (y(i)(1) - y(j)(1))
          }
          j += 1
        }
        gx(i) = sx; gy(i) = sy
        i += 1
      }
      i = 0
      while (i < n) {
        // adaptive gains keep the step bounded (gain up when the
        // gradient flips sign, decay when it persists — van der
        // Maaten's reference schedule; without it the exaggerated
        // attraction phase diverges on small n)
        gains(i)(0) = math.max(0.01,
          if (gx(i) * dy(i)(0) > 0) gains(i)(0) * 0.8 else gains(i)(0) + 0.2)
        gains(i)(1) = math.max(0.01,
          if (gy(i) * dy(i)(1) > 0) gains(i)(1) * 0.8 else gains(i)(1) + 0.2)
        dy(i)(0) = momentum * dy(i)(0) - 200.0 * gains(i)(0) * gx(i)
        dy(i)(1) = momentum * dy(i)(1) - 200.0 * gains(i)(1) * gy(i)
        y(i)(0) += dy(i)(0); y(i)(1) += dy(i)(1)
        i += 1
      }
      // re-center: the gradient is translation-invariant, so the
      // layout would otherwise drift
      var mx = 0.0; var my = 0.0
      i = 0
      while (i < n) { mx += y(i)(0); my += y(i)(1); i += 1 }
      mx /= n; my /= n
      i = 0
      while (i < n) { y(i)(0) -= mx; y(i)(1) -= my; i += 1 }
      it += 1
    }

    val idField = df.schema(idCol)
    val outSchema = new StructType()
      .add(idField.name, idField.dataType, idField.nullable)
      .add("x", DoubleType).add("y", DoubleType)
    val out = (0 until n).map(k => Row(ids(k), y(k)(0), y(k)(1)))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), outSchema)
  }
}
