package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Dense orthogonal-rotation kernel for OPQ ([[graft.operators.OpqIndex]]):
 * out[i] = Σ_j R[i·dim + j] · in[j], the d×d matrix riding the generated
 * code via `addReferenceObj` (the [[NearestCell]] convention — at d = 64
 * the matrix is 16 KB; a billion-row encode shuffles nothing and scans
 * only the batch). Accumulation per output element is sequential in j,
 * in double, cast to float once — deterministic across partitionings and
 * bit-reproducible, which is what lets the identity-rotation degenerate
 * equal the un-rotated PQ path value for value.
 *
 * Wrong-length inputs THROW with the vector's actual length
 * (refuse-don't-guess: a stray wrong-dim row silently zero-padded would
 * encode to garbage codes that still search without complaint).
 */
case class RotateVector(child: Expression, rotation: Array[Float], dim: Int)
    extends UnaryExpression {

  require(dim > 0 && rotation.length == dim * dim,
    s"rotation must be a flat $dim×$dim matrix, got ${rotation.length} floats")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rotate_vector"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rotate_vector requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    RotateVector.rotate(v.asInstanceOf[ArrayData], rotation, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rot = ctx.addReferenceObj("opqRotation", rotation, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RotateVector.rotate($c, $rot, $dim);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RotateVector {
  def rotate(a: ArrayData, rot: Array[Float], dim: Int): GenericArrayData = {
    val n = a.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"rotate_vector: input vector has $n elements, rotation is $dim×$dim — " +
        "mixed-dim rows must be filtered or re-embedded before encode")
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var s = 0.0
      var j = 0
      val base = i * dim
      while (j < dim) { s += rot(base + j).toDouble * a.getFloat(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}
