package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Product-quantization codec kernels (Jégou et al. 2011, "Product
 * Quantization for Nearest Neighbor Search"): the embedding is split
 * into `m` contiguous subvectors, each assigned to its nearest
 * codeword in a per-subspace codebook. A 64-dim float32 vector
 * (256 B) becomes the CLASSIC m-byte PQ code — a `binary` value of
 * `m` bytes when every codebook fits 256 ids, 2m bytes (big-endian)
 * above — plus one stored norm: m·codeBytes + 8 B per row in memory
 * and through a shuffle (~16× at d=64/m=8/k≤256), the tier past
 * `quantize_int8`'s 4×.
 *
 * [[PqEncode]] emits `(codes binary, norm double)` in ONE pass
 * (assignment + norm share the element scan). [[PqAdcDot]] is the
 * asymmetric-distance trick: the query's dot product against every
 * codeword is precomputed ONCE driver-side (m×k doubles), so scoring
 * a row is `m` byte reads and table adds — no per-dimension float
 * math, no decompression, and the expression stays in whole-stage
 * codegen.
 *
 * Codebooks/tables ride the expression as flattened primitive arrays
 * (`ctx.addReferenceObj`), so the generated code indexes straight into
 * them. Assignment ties break to the LOWEST codeword index —
 * deterministic for a deterministically-ordered codebook.
 */
case class PqEncode(child: Expression, m: Int, sub: Int,
    codebooks: Array[Float], offsets: Array[Int], codeBytes: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("norm", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    PqCodec.encode(v.asInstanceOf[ArrayData], m, sub, codebooks, offsets, codeBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    val off = ctx.addReferenceObj("pqOffsets", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqCodec.encode($c, $m, $sub, $cb, $off, $codeBytes);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Σ_j table(j, code_j) over the row's m-byte code — the ADC dot
  * product of the driver-side query against the RECONSTRUCTED vector. */
case class PqAdcDot(child: Expression, m: Int,
    table: Array[Double], offsets: Array[Int], codeBytes: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_dot"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dot requires binary codes, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Double.valueOf(
      PqCodec.adcDot(v.asInstanceOf[Array[Byte]], m, table, offsets, codeBytes))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("pqTable", table, "double[]")
    val off = ctx.addReferenceObj("pqOffsets", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqCodec.adcDot($c, $m, $t, $off, $codeBytes);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Σ_j ⟨q_j, codeword_j(code_j)⟩ for a PER-ROW query vector — the
  * batch-search form of [[PqAdcDot]]: with a TABLE of queries there is
  * no single driver-side dot table to share, so each (query, code)
  * pair scores by indexing the codebooks directly. Same FLOPs as a
  * full-vector dot (m·sub = d multiplies) — the batch win is BYTES,
  * not FLOPs: candidates carry m-byte codes through the cell join and
  * shuffle instead of 4d-byte vectors. */
case class PqQueryDot(left: Expression, right: Expression, m: Int, sub: Int,
    codebooks: Array[Float], offsets: Array[Int], codeBytes: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_query_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_query_dot requires (binary codes, array<float> query), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def nullSafeEval(codes: Any, q: Any): Any =
    java.lang.Double.valueOf(PqCodec.queryDot(
      codes.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData],
      m, sub, codebooks, offsets, codeBytes))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    val off = ctx.addReferenceObj("pqOffsets", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.expressions.PqCodec.queryDot($c, $q, $m, $sub, $cb, $off, $codeBytes);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqCodec {

  /** The [[PqQueryDot]] kernel, callable from generated Java. */
  def queryDot(codes: Array[Byte], q: ArrayData, m: Int, sub: Int,
      codebooks: Array[Float], offsets: Array[Int], codeBytes: Int): Double = {
    if (codes.length != m * codeBytes)
      throw new IllegalArgumentException(
        s"pq_query_dot: code value has ${codes.length} bytes, model expects ${m * codeBytes} " +
          "— was this frame encoded with a different model?")
    if (q.numElements() != m * sub)
      throw new IllegalArgumentException(
        s"pq_query_dot: query has ${q.numElements()} elements, model expects ${m * sub}")
    var s = 0.0
    var j = 0
    while (j < m) {
      val c =
        if (codeBytes == 1) codes(j) & 0xFF
        else ((codes(2 * j) & 0xFF) << 8) | (codes(2 * j + 1) & 0xFF)
      val kj = (if (j + 1 < m) offsets(j + 1) else codebooks.length / sub) - offsets(j)
      if (c >= kj)
        throw new IllegalArgumentException(
          s"pq_query_dot: code $c out of range [0, $kj) in subspace $j " +
            "— codes and codebooks are from different models")
      val cw = (offsets(j) + c) * sub
      val base = j * sub
      var i = 0
      while (i < sub) {
        s += q.getFloat(base + i).toDouble * codebooks(cw + i)
        i += 1
      }
      j += 1
    }
    s
  }
  /** One pass: per-subspace nearest-codeword assignment (L2, ties to
    * the lowest index) + the full-vector norm, packed into
    * m·codeBytes bytes (big-endian when codeBytes = 2). `offsets(j)`
    * is the flat index of subspace j's first codeword; codewords are
    * `sub` floats each, laid out consecutively. */
  def encode(arr: ArrayData, m: Int, sub: Int,
      codebooks: Array[Float], offsets: Array[Int], codeBytes: Int): InternalRow = {
    if (arr.numElements() != m * sub)
      throw new IllegalArgumentException(
        s"pq_encode: embedding has ${arr.numElements()} elements, model expects " +
          s"${m * sub} — a ragged row would otherwise read out of bounds into garbage codes")
    val codes = new Array[Byte](m * codeBytes)
    var normSq = 0.0
    var j = 0
    while (j < m) {
      val base = j * sub
      val kj = (if (j + 1 < m) offsets(j + 1) else codebooks.length / sub) - offsets(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < kj) {
        val cw = (offsets(j) + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val diff = arr.getFloat(base + i).toDouble - codebooks(cw + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      if (codeBytes == 1) codes(j) = best.toByte
      else {
        codes(2 * j) = (best >>> 8).toByte
        codes(2 * j + 1) = best.toByte
      }
      var i = 0
      while (i < sub) {
        val v = arr.getFloat(base + i).toDouble
        normSq += v * v
        i += 1
      }
      j += 1
    }
    InternalRow(codes, math.sqrt(normSq))
  }

  def adcDot(codes: Array[Byte], m: Int,
      table: Array[Double], offsets: Array[Int], codeBytes: Int): Double = {
    if (codes.length != m * codeBytes)
      throw new IllegalArgumentException(
        s"pq_adc_dot: code value has ${codes.length} bytes, model expects ${m * codeBytes} " +
          "— was this frame encoded with a different model?")
    var s = 0.0
    var j = 0
    while (j < m) {
      val c =
        if (codeBytes == 1) codes(j) & 0xFF
        else ((codes(2 * j) & 0xFF) << 8) | (codes(2 * j + 1) & 0xFF)
      val kj = (if (j + 1 < m) offsets(j + 1) else table.length) - offsets(j)
      if (c >= kj)
        throw new IllegalArgumentException(
          s"pq_adc_dot: code $c out of range [0, $kj) in subspace $j " +
            "— codes and codebooks are from different models")
      s += table(offsets(j) + c)
      j += 1
    }
    s
  }
}
