package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Coarse-quantizer assignment against a FROZEN centroid table — the
 * kernel of incremental IVF maintenance ([[graft.operators.IvfIndex]]
 * `addBatch`): each vector goes to the cell whose centroid minimizes
 * squared Euclidean distance, ties to the LOWEST cell id (the same
 * strict-`<` convention as Spark ML's k-means `findClosest`, so
 * assignment here reproduces `KMeansModel.transform` — spec'd equal on
 * the fixture).
 *
 * Map-side only: the flattened centroid array (nlist × dim floats,
 * e.g. 64 KB at nlist=256/d=64) rides the expression via
 * `ctx.addReferenceObj` into generated code — appending a batch to a
 * billion-row index shuffles nothing and scans only the batch.
 */
case class NearestCell(child: Expression, centroids: Array[Float], dim: Int)
    extends UnaryExpression {

  require(dim > 0 && centroids.length % dim == 0,
    s"flattened centroids (${centroids.length}) must be a multiple of dim ($dim)")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cell"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NearestCell.assign(v.asInstanceOf[ArrayData], centroids, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.NearestCell.assign($c, $cents, $dim);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The `nprobe` nearest cells per vector — [[NearestCell]]'s
  * multi-assignment sibling (the SemDeDup boundary-recall knob and the
  * batch analog of IVF search's nprobe): cells ordered by ascending
  * squared Euclidean distance, ties to the lower cell id, so
  * `nprobe = 1` returns exactly `[NearestCell.assign(v)]`. Same
  * map-side shape — the centroid table rides the generated code. */
case class NearestCells(child: Expression, centroids: Array[Float], dim: Int,
    nprobe: Int) extends UnaryExpression {

  require(dim > 0 && centroids.length % dim == 0,
    s"flattened centroids (${centroids.length}) must be a multiple of dim ($dim)")
  require(nprobe >= 1 && nprobe <= centroids.length / dim,
    s"nprobe must be in [1, nlist = ${centroids.length / dim}], got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NearestCell.assignTop(v.asInstanceOf[ArrayData], centroids, dim, nprobe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.NearestCell.assignTop($c, $cents, $dim, $nprobe);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCell {

  /** argmin_c ‖v − centroid_c‖² in double accumulation; strict `<` ⇒
    * the lowest cell id wins exact ties. Callable from generated Java. */
  def assign(v: ArrayData, centroids: Array[Float], dim: Int): Int = {
    val nlist = centroids.length / dim
    val n = math.min(v.numElements(), dim)
    var best = Double.PositiveInfinity
    var bestCell = 0
    var c = 0
    while (c < nlist) {
      val off = c * dim
      var s = 0.0
      var j = 0
      while (j < n) {
        val d = v.getFloat(j).toDouble - centroids(off + j)
        s += d * d
        j += 1
      }
      // a short vector scores remaining centroid dims as distance-to-0,
      // mirroring a zero-padded vector (fixed-dim corpora never hit it)
      while (j < dim) { val d = centroids(off + j).toDouble; s += d * d; j += 1 }
      if (s < best) { best = s; bestCell = c }
      c += 1
    }
    bestCell
  }

  /** The `nprobe` nearest cells, ascending distance, ties to the lower
    * cell id — [[NearestCells]]' kernel, callable from generated Java.
    * Insertion into two nprobe-sized scratch arrays: O(nlist · nprobe)
    * with nprobe small (1-4), no allocation beyond the result. Strict
    * `<` on (distance, then arrival order) keeps `nprobe = 1`
    * bit-identical to [[assign]]. */
  def assignTop(v: ArrayData, centroids: Array[Float], dim: Int,
      nprobe: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nlist = centroids.length / dim
    val n = math.min(v.numElements(), dim)
    val k = math.min(nprobe, nlist)
    val dists = new Array[Double](k)
    val cells = new Array[Int](k)
    java.util.Arrays.fill(dists, Double.PositiveInfinity)
    var c = 0
    while (c < nlist) {
      val off = c * dim
      var s = 0.0
      var j = 0
      while (j < n) {
        val d = v.getFloat(j).toDouble - centroids(off + j)
        s += d * d
        j += 1
      }
      while (j < dim) { val d = centroids(off + j).toDouble; s += d * d; j += 1 }
      // strict < against the current worst: an equal-distance later
      // cell never displaces an earlier one (the lowest-id tie rule,
      // since cells scan in ascending id)
      if (s < dists(k - 1)) {
        var p = k - 1
        while (p > 0 && s < dists(p - 1)) {
          dists(p) = dists(p - 1); cells(p) = cells(p - 1); p -= 1
        }
        dists(p) = s; cells(p) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(cells)
  }
}
