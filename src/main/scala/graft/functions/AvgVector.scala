package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable partial state: element-wise sums + row count. */
case class VecSumBuf(var sums: Array[Double], var n: Long)

/**
 * Element-wise mean of a vector column — the one genuinely custom
 * aggregate this engine needs (SURVEY §2.3 A): centroids for cluster
 * summaries and semantic-dedup group representatives. The reference
 * only ever materializes centroids inside `stats::kmeans`
 * (/root/reference/R/core.R:356-360); here it's a first-class verb.
 *
 * A typed `Aggregator` gets Spark's partial aggregation for free: each
 * partition reduces to one (sums, n) buffer (map-side combine), and
 * only d doubles + a long cross the shuffle per partition — at 1000
 * executors that is KB, not the corpus. NULL vectors are skipped (they
 * are "not yet embedded", SURVEY §1.1); an all-NULL group yields NULL.
 * Accumulation is in double regardless of input width.
 */
object AvgVector extends Aggregator[Seq[Float], VecSumBuf, Seq[Double]] {
  override def zero: VecSumBuf = VecSumBuf(Array.emptyDoubleArray, 0L)

  private def requireSameDim(expected: Int, got: Int): Unit =
    if (expected != got) throw new IllegalArgumentException(
      s"avg_vector: mixed embedding dimensions in one group ($expected vs $got) — " +
        "a truncated average would be silently wrong; re-embed or split the group")

  override def reduce(b: VecSumBuf, a: Seq[Float]): VecSumBuf = {
    if (a == null) b
    else {
      if (b.n == 0L) b.sums = new Array[Double](a.length)
      else requireSameDim(b.sums.length, a.length)
      var i = 0
      while (i < b.sums.length) { b.sums(i) += a(i); i += 1 }
      b.n += 1
      b
    }
  }

  override def merge(x: VecSumBuf, y: VecSumBuf): VecSumBuf = {
    if (y.n == 0L) x
    else if (x.n == 0L) y
    else {
      requireSameDim(x.sums.length, y.sums.length)
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
  }

  override def finish(b: VecSumBuf): Seq[Double] =
    if (b.n == 0L) null else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecSumBuf] = ExpressionEncoder[VecSumBuf]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** Untyped column form: `df.groupBy(...).agg(avg_vector($"embedding"))`. */
  lazy val column: Column => Column = {
    val fn = udaf(AvgVector, ExpressionEncoder[Seq[Float]]())
    (c: Column) => fn(c)
  }
}
