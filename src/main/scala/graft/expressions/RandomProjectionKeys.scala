package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Bucketed random-projection LSH keys for COSINE similarity, as one
 * codegen'd expression: the input vector is L2-normalized (cosine
 * geometry — `cos(a,b) ≥ t  ⇔  ‖â−b̂‖ ≤ √(2−2t)` on unit vectors), then
 * per table `projsPerTable` projections onto deterministic random unit
 * directions are each quantized to `floor(dot/bucketLength + 1/2)` and
 * the quantized tuple is folded into one 64-bit key (AND within a
 * table, OR across tables — the standard p-stable LSH amplification).
 * Candidate pairs are rows sharing a (table, key) cell.
 *
 * Native replacement for `spark.ml.feature.BucketedRandomProjectionLSH
 * .fit → approxSimilarityJoin` (at `projsPerTable = 1`, the identical
 * hashing scheme — floor-quantized projections onto random unit
 * vectors, OR over tables): no ml-Vector UDT (de)serialization per
 * row, no fit stage, and the projection loop stays inside whole-stage
 * codegen. Same family as [[MinHashSig]].
 *
 * Why compound keys matter at high dimension: a unit projection of a
 * unit vector concentrates as N(0, 1/√d) — at d = 64 nearly the whole
 * corpus lands within ±0.25, so single-projection buckets at any
 * useful `bucketLength` barely split it and the candidate set
 * approaches all pairs (ml's scheme has no counter to this). ANDing
 * `p` quantized projections shrinks buckets multiplicatively (the
 * per-table collision probability drops to ~q^p) while extra tables
 * restore recall — the knob d-dimensional data actually needs.
 *
 * The `+ 1/2` centers bucket 0 on the origin, so every unit-vector
 * projection (|dot| ≤ 1) lands in bucket 0 once `bucketLength ≥ 4` —
 * the operator then degenerates to the exact all-pairs join, which is
 * the oracle anchor for the approximate path (`ann_cosine_lsh_exact`
 * shares `neardup_embedding`'s DuckDB oracle the way `ann_ivf_exact`
 * anchors IVF at nprobe = nlist).
 *
 * Determinism: directions are `java.util.Random(splitmix64(seed ⊕
 * dim·φ64))` Gaussian draws (both the LCG and `nextGaussian` are
 * exactly specified by the JDK), normalized to unit length; plane `i`
 * consumes draws `[i·dim, (i+1)·dim)`, so its content depends only on
 * (seed, dim, i). A zero input vector has no direction — every key is
 * the sentinel `Long.MinValue + table`, so zero vectors bucket only
 * with each other (an astronomically unlikely mixed-key collision
 * with a real vector is discarded by the exact re-score: cosine = 0
 * by engine convention never passes a threshold > 0).
 */
case class RandomProjectionKeys(child: Expression, numTables: Int = 6,
    bucketLength: Double = 0.5, seed: Int = 42, projsPerTable: Int = 1)
    extends UnaryExpression {

  require(numTables > 0 && numTables <= 256,
    s"numTables must be in [1, 256], got $numTables")
  require(bucketLength > 0 && !bucketLength.isNaN && !bucketLength.isInfinite,
    s"bucketLength must be a positive finite double, got $bucketLength")
  require(projsPerTable > 0 && projsPerTable <= 32,
    s"projsPerTable must be in [1, 32], got $projsPerTable")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "random_projection_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"random_projection_keys requires array<float> or array<double>, " +
        s"got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    RandomProjectionKeys.keys(v.asInstanceOf[ArrayData], isFloat,
      numTables, bucketLength, seed, projsPerTable)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RandomProjectionKeys.keys(" +
        s"$c, $isFloat, $numTables, $bucketLength, $seed, $projsPerTable);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RandomProjectionKeys {

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // projection planes are row-invariant — computing them per row would
  // waste numTables·dim Gaussian draws per vector. Flat row-major
  // [table][dim] for cache-friendly dot loops; plane t's draws occupy
  // [t·dim, (t+1)·dim) so its content is independent of numTables.
  // The cache lives for the executor JVM's lifetime, so it is bounded:
  // once user-supplied (seed, dim) configs exceed the cap, ONE arbitrary
  // entry is evicted per insert (not a full clear — a workload
  // alternating across >cap configs would otherwise regenerate every
  // plane set on every alternation). The size check races benignly with
  // concurrent inserts: the cap can be transiently exceeded by at most
  // the thread count, and plane sets are deterministic and cheap to
  // regenerate, so eviction can never change results.
  private[graft] val MaxCachedPlaneSets = 64
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private[graft] def planeCacheSize: Int = planeCache.size

  private def planes(seed: Int, numTables: Int, dim: Int): Array[Double] = {
    val key = (seed, numTables, dim)
    val hit = planeCache.get(key)
    if (hit != null) return hit
    while (planeCache.size >= MaxCachedPlaneSets) {
      val it = planeCache.keySet().iterator()
      if (it.hasNext) planeCache.remove(it.next()) else ()
    }
    planeCache.computeIfAbsent(key, { case (s, t, d) =>
      val rng = new java.util.Random(mix64(s.toLong ^ d.toLong * 0x9e3779b97f4a7c15L))
      val m = new Array[Double](t * d)
      var i = 0
      while (i < m.length) { m(i) = rng.nextGaussian(); i += 1 }
      // unit-normalize each plane (matches ml's random UNIT vectors —
      // keeps bucketLength scale-comparable across dims)
      var p = 0
      while (p < t) {
        var n2 = 0.0; var j = 0
        while (j < d) { val x = m(p * d + j); n2 += x * x; j += 1 }
        val inv = if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
        j = 0
        while (j < d) { m(p * d + j) *= inv; j += 1 }
        p += 1
      }
      m
    })
  }

  /** The kernel, callable from generated Java (static forwarder). */
  def keys(a: ArrayData, isFloat: Boolean, numTables: Int,
      bucketLength: Double, seed: Int, projsPerTable: Int): ArrayData = {
    val d = a.numElements()
    val out = new Array[Long](numTables)
    // input norm for the cosine-geometry normalization
    var n2 = 0.0
    var i = 0
    while (i < d) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      n2 += x * x
      i += 1
    }
    if (d == 0 || n2 == 0.0) {
      var t = 0
      while (t < numTables) { out(t) = Long.MinValue + t; t += 1 }
      return new GenericArrayData(out)
    }
    val invNorm = 1.0 / math.sqrt(n2)
    val m = planes(seed, numTables * projsPerTable, d)
    var t = 0
    while (t < numTables) {
      // fold the table's quantized projections into one key: mix64 is a
      // bijection, so at projsPerTable = 1 join semantics are identical
      // to raw floor keys; beyond 1 the fold ANDs the projections
      // (collide ⇔ every quantized value matches, modulo a 2^-64 mix
      // collision the exact re-score absorbs)
      var key = 0L
      var p = 0
      while (p < projsPerTable) {
        var dot = 0.0
        var j = 0
        val base = (t * projsPerTable + p) * d
        while (j < d) {
          val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
          dot += x * m(base + j)
          j += 1
        }
        key = mix64(key ^ math.floor(dot * invNorm / bucketLength + 0.5).toLong)
        p += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }
}
