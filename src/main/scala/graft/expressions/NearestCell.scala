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
}
