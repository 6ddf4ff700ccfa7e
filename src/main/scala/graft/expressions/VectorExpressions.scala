package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Codegen'd binary expressions over dense float/double vectors stored as
 * Spark `ArrayType` columns. These are the single hottest path of the
 * engine (O(n·d) per query — reference scoring loop at
 * /root/reference/R/core.R:267-292); a native Catalyst `Expression` with
 * `doGenCode` keeps scoring inside whole-stage codegen, with no per-row
 * boxing or lambda dispatch that the `aggregate(zip_with(...))` HOF
 * formulation would pay.
 *
 * Semantics (shared by all):
 *  - elements are widened to double; accumulation is sequential in array
 *    order (index 0..n-1) so results are deterministic and reproducible
 *    against the DuckDB oracle;
 *  - a NULL vector on either side yields NULL (null-intolerant), matching
 *    the "unembedded row" notion — callers layer `coalesce(sim, 0.0)` to
 *    reproduce the reference's NULL-scores-0 rule (R/core.R:287-292);
 *  - length mismatch scores over the common prefix (fixtures are
 *    fixed-dim; nothing in the reference enforces dims either,
 *    R/core.R:75-78);
 *  - cosine of a zero vector is defined as 0.0, not NaN — the R
 *    reference produces NaN (0/0 at R/core.R:270) which then poisons
 *    sort/filter; we guard (SURVEY §2.4 item 2) and mirror the same
 *    guard in oracle SQL.
 */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> or array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @inline protected final def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Java source for "read element i of `arr` as double". */
  protected final def getter(e: Expression, arr: String, i: String): String =
    if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  @inline protected final def elem(e: Expression, a: ArrayData, i: Int): Double =
    if (isFloat(e)) a.getFloat(i).toDouble else a.getDouble(i)
}

/** dot(a, b) = Σ aᵢ·bᵢ  (reference method "dot", R/core.R:276-278). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += elem(left, a, i) * elem(right, b, i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (${getter(left, a, i)}) * (${getter(right, b, i)});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖), 0.0 when either norm is 0 (R/core.R:268-271 + SURVEY §2.4.2 guard). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = elem(left, a, i); val y = elem(right, b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(left, a, i)};
         |  double $y = ${getter(right, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_distance(a, b) = √Σ(aᵢ-bᵢ)²  (reference "euclidean" distance core, R/core.R:272-274). */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = elem(left, a, i) - elem(right, b, i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (${getter(left, a, i)}) - (${getter(right, b, i)});
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ‖a‖₂ of a single vector. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_norm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_norm requires array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = $get; $s += $x * $x; }
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * L2-normalize a vector, preserving the input element type. The HF
 * embedders normalize every output at the source
 * (/root/reference/R/embedders.R:56,85,123,133,184,230,267,309); this is
 * the engine-side verb for the same invariant. Zero vectors pass through
 * unchanged (dividing by 0 would make NaNs).
 */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize requires array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    if (norm == 0.0) a.copy()
    else if (isFloat) {
      val out = new Array[Float](n); i = 0
      while (i < n) { out(i) = (a.getFloat(i) / norm).toFloat; i += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Double](n); i = 0
      while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
      new GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val x = ctx.freshName("x"); val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val (jt, getEl, mk) =
        if (isFloat)
          ("float", (k: String) => s"$a.getFloat($k)",
            s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);")
        else
          ("double", (k: String) => s"$a.getDouble($k)",
            s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = ${getEl(i)}; $s += $x * $x; }
         |double $norm = java.lang.Math.sqrt($s);
         |if ($norm == 0.0) {
         |  ${ev.value} = $a.copy();
         |} else {
         |  $jt[] $out = new $jt[$n];
         |  for (int $j = 0; $j < $n; $j++) { $out[$j] = ($jt) (${getEl(j)} / $norm); }
         |  $mk
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SQL registration so the verbs are usable from `spark.sql` text too. */
object VectorExpressions {
  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_distance", es => L2Distance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("euclidean_similarity", es =>
      Divide(Literal(1.0), Add(Literal(1.0), L2Distance(es(0), es(1)))), "built-in")
    reg.createOrReplaceTempFunction("vector_norm", es => VectorNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es.head), "built-in")
    // hashing_embed(text, dim[, seed]) / simhash64(text[, shingleSize])
    reg.createOrReplaceTempFunction("hashing_embed", es =>
      HashingEmbed(es.head, intArg(es(1)),
        if (es.length > 2) intArg(es(2)) else 42), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es =>
      SimHash64(es.head, if (es.length > 1) intArg(es(1)) else 1), "built-in")
  }
}
