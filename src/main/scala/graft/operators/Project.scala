package graft.operators

import org.apache.spark.ml.feature.{PCA, StandardScaler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

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
  /** Shared driver-side collect + guards for the two driver-local
   *  layout methods (tsne/umap): deterministic row order, hard maxRows
   *  refusal (a count, not a truncation), n >= 4, uniform dimension. */
  private def collectMatrix(df: DataFrame, embCol: String, idCol: String,
      maxRows: Int, op: String): (Array[Any], Array[Array[Double]]) = {
    // orderBy before collect: the row→seeded-init pairing must not
    // depend on partition arrival order
    val rows = df.where(col(embCol).isNotNull)
      .select(col(idCol), col(embCol)).orderBy(col(idCol)).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$op collects the embedding matrix to the driver (like the reference's " +
        s"umap) and refuses inputs over maxRows=$maxRows — sample first, or use " +
        "Project.pca for corpus-scale projection")
    val ids = rows.map(_.get(0))
    val xs = rows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(rows.length >= 4, s"$op needs at least 4 embedded rows, got ${rows.length}")
    // refuse mixed dimensions instead of silently truncating to the
    // common prefix — the library-wide guardrail convention
    val dim0 = xs.head.length
    val badDim = xs.indexWhere(_.length != dim0)
    require(badDim < 0,
      s"$op embeddings must share one dimension: row ${ids(badDim)} has " +
        s"${xs(badDim).length}, expected $dim0")
    (ids, xs)
  }

  private def layoutFrame(df: DataFrame, idCol: String,
      ids: Array[Any], y: Array[Array[Double]]): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = new StructType()
      .add(idField.name, idField.dataType, idField.nullable)
      .add("x", DoubleType).add("y", DoubleType)
    val out = ids.indices.map(k => Row(ids(k), y(k)(0), y(k)(1)))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(out, 1), outSchema)
  }

  /** Exact euclidean kNN over a driver-collected matrix: per-row
   *  distance pass + bounded insertion select (O(n·k) memory — no full
   *  n×n matrix). Ties resolve to the ASCENDING row index —
   *  deterministic. Returns (indices, distances), each n×k. */
  private def knnArrays(xs: Array[Array[Double]], k: Int): (Array[Array[Int]], Array[Array[Double]]) = {
    val n = xs.length
    val dim0 = xs.head.length
    val knnIdx = Array.ofDim[Int](n, k)
    val knnDist = Array.ofDim[Double](n, k)
    var i = 0
    while (i < n) {
      val idx = knnIdx(i); val dst = knnDist(i)
      java.util.Arrays.fill(dst, Double.PositiveInfinity)
      java.util.Arrays.fill(idx, -1)
      val a = xs(i)
      var j = 0
      while (j < n) {
        if (j != i) {
          var s = 0.0; var t = 0
          val b = xs(j)
          while (t < dim0) { val d = a(t) - b(t); s += d * d; t += 1 }
          val d = math.sqrt(s)
          if (d < dst(k - 1)) {
            // insertion keeps ties resolved by ascending j — deterministic
            var p = k - 1
            while (p > 0 && dst(p - 1) > d) { dst(p) = dst(p - 1); idx(p) = idx(p - 1); p -= 1 }
            dst(p) = d; idx(p) = j
          }
        }
        j += 1
      }
      i += 1
    }
    (knnIdx, knnDist)
  }

  /**
   * The exact-kNN stage of [[umap]] exposed as a DataFrame —
   * (idCol, rank, neighbor_id, dist), rank 1-based, euclidean, ties
   * broken by ascending neighbor id. Exists so the graph-construction
   * half of UMAP (the half where a silent bug — wrong metric, tie
   * nondeterminism, an off-by-one in the insertion select — would
   * corrupt every downstream coordinate) can be pinned vec-for-vec
   * against an ANSI-SQL self-join oracle, the same anchoring pattern
   * as `ann_ivf_exact`. Same driver locality and hard `maxRows`
   * refusal as [[umap]] itself.
   */
  def knnExact(df: DataFrame, embCol: String, idCol: String, k: Int,
      maxRows: Int = 5000): DataFrame = {
    require(k >= 1, s"knnExact needs k >= 1, got $k")
    val (ids, xs) = collectMatrix(df, embCol, idCol, maxRows, "knnExact")
    val n = ids.length
    val kk = math.min(k, n - 1)
    val (knnIdx, knnDist) = knnArrays(xs, kk)
    val idField = df.schema(idCol)
    val outSchema = new StructType()
      .add(idField.name, idField.dataType, idField.nullable)
      .add("rank", LongType)
      .add("neighbor_id", idField.dataType, idField.nullable)
      .add("dist", DoubleType)
    val out = for { i <- 0 until n; r <- 0 until kk }
      yield Row(ids(i), (r + 1).toLong, ids(knnIdx(i)(r)), knnDist(i)(r))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(out, 1), outSchema)
  }

  def tsne(df: DataFrame, embCol: String, idCol: String,
      perplexity: Double = 30.0, iterations: Int = 300, seed: Long = 42L,
      maxRows: Int = 5000): DataFrame = {
    val (ids, xs) = collectMatrix(df, embCol, idCol, maxRows, "tsne")
    val n = ids.length
    val dim0 = xs.head.length
    // n >= 4 (enforced in collectMatrix) keeps the clamped perplexity
    // >= 1 (entropy target >= 0); below that the beta search has no
    // attainable target, every P underflows, and the output would be
    // silent NaNs
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

    layoutFrame(df, idCol, ids, y)
  }

  /**
   * Fit the low-dimensional similarity curve 1/(1 + a·x^(2b)) to the
   * target membership psi(x) = 1 for x <= minDist, exp(-(x-minDist)/
   * spread) beyond — UMAP's `find_ab_params`. Instead of an iterative
   * curve_fit, linearize: 1/(1+a·x^(2b)) = y  ⇔  log(1/y − 1) =
   * log a + 2b·log x, and solve the least-squares line in log space
   * over 300 samples of x ∈ (0, 3·spread] — deterministic, no RNG, no
   * convergence tolerance.
   *
   * The fit is deliberately TAIL-ONLY: plateau samples (y = 1 for
   * x <= minDist) have no log-space image (log(1/y − 1) is undefined
   * at y = 1) and are excluded by the (1e-9, 1−1e-9) band, so the line
   * is fit to the exponential decay only — unlike umap-learn's
   * linear-space curve_fit over the full target. Clamping plateau
   * samples to just under 1 would inject ly ≈ −14 leverage points and
   * bias the line far MORE than omitting them. For the (0.1, 1.0)
   * defaults this lands at (1.6530, 0.9368) — within 5% of
   * umap-learn's (1.577, 0.895); ProjectSpec pins that exact
   * neighborhood.
   */
  private[graft] def fitAB(minDist: Double, spread: Double): (Double, Double) = {
    val m = 300
    var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0; var cnt = 0
    var i = 1
    while (i <= m) {
      val x = 3.0 * spread * i / m
      val y = if (x <= minDist) 1.0 else math.exp(-(x - minDist) / spread)
      // log(1/y - 1) is defined only strictly inside (0, 1)
      if (y > 1e-9 && y < 1.0 - 1e-9) {
        val lx = math.log(x); val ly = math.log(1.0 / y - 1.0)
        sx += lx; sy += ly; sxx += lx * lx; sxy += lx * ly; cnt += 1
      }
      i += 1
    }
    require(cnt > 1, s"degenerate (minDist=$minDist, spread=$spread): no curve samples")
    val slope = (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx)
    val intercept = (sy - slope * sx) / cnt
    (math.exp(intercept), slope / 2.0)
  }

  /**
   * Deterministic UMAP (McInnes, Healy & Melville 2018) to 2-D — the
   * reference's DEFAULT viz method (R/visualization.R:41-46 calls
   * `umap::umap(embeddings, n_neighbors)` under `set.seed(42)`).
   *
   * The published algorithm with its three nondeterminism sources
   * pinned:
   *  - exact kNN (O(n²·d) partial-select) instead of NN-descent;
   *  - seeded uniform[-10,10] init (umap-learn's random init) instead
   *    of spectral;
   *  - SEQUENTIAL edge-sampling SGD with a single seeded RNG for
   *    negative samples instead of hogwild-parallel threads (parallel
   *    SGD is where uwot/umap-learn run-to-run jitter comes from;
   *    serializing changes only the update interleaving).
   * Everything else follows umap-learn: smooth-kNN sigma by binary
   * search to log2(k) with rho = nearest-neighbor distance, fuzzy
   * union symmetrization w + wᵀ − w∘wᵀ, epochs_per_sample = wMax/w
   * scheduling, negative_sample_rate 5, gradient clip ±4, linearly
   * decaying learning rate.
   *
   * DRIVER-side with the same hard `maxRows` refusal contract as
   * [[tsne]] — the same locality as the reference's own uwot call
   * (which also collects the matrix into R memory). Returns
   * (idCol, x, y); NULL embeddings dropped (R/visualization.R:28-29).
   */
  def umap(df: DataFrame, embCol: String, idCol: String,
      nNeighbors: Int = 15, minDist: Double = 0.1, spread: Double = 1.0,
      nEpochs: Int = 300, negativeSampleRate: Int = 5, seed: Long = 42L,
      maxRows: Int = 5000): DataFrame = {
    require(nNeighbors >= 2, s"umap needs nNeighbors >= 2, got $nNeighbors")
    require(nEpochs >= 1 && negativeSampleRate >= 1,
      "umap needs nEpochs >= 1 and negativeSampleRate >= 1")
    val (ids, xs) = collectMatrix(df, embCol, idCol, maxRows, "umap")
    val n = ids.length
    val k = math.min(nNeighbors, n - 1)

    val (knnIdx, knnDist) = knnArrays(xs, k)
    var i = 0

    // ---- smooth-kNN calibration: rho_i = nearest non-zero distance,
    // sigma_i solves sum_j exp(-(max(0, d_ij - rho_i))/sigma) = log2(k)
    val target = math.log(k) / math.log(2.0)
    val rho = new Array[Double](n)
    val sigma = new Array[Double](n)
    i = 0
    while (i < n) {
      val dst = knnDist(i)
      var r = 0.0
      var j = 0
      while (j < k && r == 0.0) { if (dst(j) > 0.0) r = dst(j); j += 1 }
      rho(i) = r
      var lo = 0.0; var hi = Double.PositiveInfinity; var mid = 1.0
      var iter = 0
      while (iter < 64) {
        var psum = 0.0
        j = 0
        while (j < k) { psum += math.exp(-math.max(0.0, dst(j) - r) / mid); j += 1 }
        if (psum > target) { hi = mid; mid = (lo + hi) / 2 }
        else { lo = mid; mid = if (hi.isPosInfinity) mid * 2 else (lo + hi) / 2 }
        iter += 1
      }
      sigma(i) = math.max(mid, 1e-12)
      i += 1
    }

    // ---- directed memberships, then fuzzy-union symmetrization
    // w_sym = w + wᵀ − w∘wᵀ over the sparse union; store i<j once
    val directed = new java.util.HashMap[Long, Double]()
    i = 0
    while (i < n) {
      var j = 0
      while (j < k) {
        val w = math.exp(-math.max(0.0, knnDist(i)(j) - rho(i)) / sigma(i))
        directed.put(i.toLong * n + knnIdx(i)(j), w)
        j += 1
      }
      i += 1
    }
    val pairKeys = new java.util.TreeSet[Long]() // sorted ⇒ deterministic edge order
    directed.forEach { (key, _) =>
      val a = (key / n).toInt; val b = (key % n).toInt
      pairKeys.add(math.min(a, b).toLong * n + math.max(a, b)): Unit
    }
    val nPairs = pairKeys.size()
    val headArr = new Array[Int](nPairs)
    val tailArr = new Array[Int](nPairs)
    val wArr = new Array[Double](nPairs)
    var e = 0
    var wMax = 0.0
    val keyIt = pairKeys.iterator()
    while (keyIt.hasNext) {
      val key = keyIt.next()
      val a = (key / n).toInt; val b = (key % n).toInt
      val wab = Option(directed.get(a.toLong * n + b)).map(_.doubleValue).getOrElse(0.0)
      val wba = Option(directed.get(b.toLong * n + a)).map(_.doubleValue).getOrElse(0.0)
      val w = wab + wba - wab * wba
      headArr(e) = a; tailArr(e) = b; wArr(e) = w
      if (w > wMax) wMax = w
      e += 1
    }
    require(wMax > 0, "UMAP fuzzy graph is empty — degenerate input")

    // ---- epoch scheduling (umap-learn's make_epochs_per_sample):
    // edge e fires every wMax/w(e) epochs; edges rarer than one firing
    // per run never fire and are dropped up front
    val live = (0 until nPairs).filter(wArr(_) >= wMax / nEpochs).toArray
    val eps = live.map(wMax / wArr(_))
    val nextSample = eps.clone()
    val epsNeg = eps.map(_ / negativeSampleRate)
    // umap-learn initializes epoch_of_next_negative_sample to
    // epochs_per_negative_sample (optimize_layout's setup), NOT 0 — a
    // zero init would hand every edge one extra batch of negative
    // samples at its first firing
    val nextNeg = epsNeg.clone()

    val (aCoef, bCoef) = fitAB(minDist, spread)
    val rnd = new java.util.Random(seed)
    val y = Array.fill(n, 2)(rnd.nextDouble() * 20.0 - 10.0)

    def clip(x: Double): Double = math.max(-4.0, math.min(4.0, x))

    var epoch = 0
    while (epoch < nEpochs) {
      val alpha = 1.0 - epoch.toDouble / nEpochs
      var ei = 0
      while (ei < live.length) {
        if (nextSample(ei) <= epoch.toDouble + 1.0) {
          val h = headArr(live(ei)); val t = tailArr(live(ei))
          val yh = y(h); val yt = y(t)
          val dx = yh(0) - yt(0); val dyy = yh(1) - yt(1)
          val d2 = dx * dx + dyy * dyy
          if (d2 > 0.0) {
            // attractive: ∇ of log(1/(1+a·d^2b)) — both endpoints move
            val gc = -2.0 * aCoef * bCoef * math.pow(d2, bCoef - 1.0) /
              (aCoef * math.pow(d2, bCoef) + 1.0)
            val gx = clip(gc * dx) * alpha; val gy = clip(gc * dyy) * alpha
            yh(0) += gx; yh(1) += gy
            yt(0) -= gx; yt(1) -= gy
          }
          nextSample(ei) += eps(ei)
          // negative samples accrued since the last firing; head-only
          val nNeg = ((epoch.toDouble + 1.0 - nextNeg(ei)) / epsNeg(ei)).toInt
          var p = 0
          while (p < nNeg) {
            val kn = rnd.nextInt(n)
            if (kn != h) {
              val yk = y(kn)
              val rx = yh(0) - yk(0); val ry = yh(1) - yk(1)
              val rd2 = rx * rx + ry * ry
              // repulsive: pushes the head away; at rd2 = 0 umap-learn
              // applies the clip ceiling (+4) to escape the collision
              if (rd2 > 0.0) {
                val gc = 2.0 * bCoef /
                  ((0.001 + rd2) * (aCoef * math.pow(rd2, bCoef) + 1.0))
                yh(0) += clip(gc * rx) * alpha
                yh(1) += clip(gc * ry) * alpha
              } else {
                // exactly-coincident points escape along a FIXED (+x,+y)
                // diagonal at the clip ceiling — deliberate: umap-learn's
                // escape direction is whatever its thread-local RNG says,
                // ours is pinned for run-to-run determinism. Exact
                // coincidence is measure-zero under the seeded random
                // init, so the shared direction never synchronizes a
                // visible artifact. Do NOT "fix" this into randomness.
                yh(0) += 4.0 * alpha; yh(1) += 4.0 * alpha
              }
            }
            p += 1
          }
          nextNeg(ei) += nNeg * epsNeg(ei)
        }
        ei += 1
      }
      epoch += 1
    }

    layoutFrame(df, idCol, ids, y)
  }
}
