package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate: similarity + the candidate's id. */
case class Scored(score: Double, id: Long)

/**
 * Bounded top-k aggregate: keeps the k best (score desc, id asc)
 * candidates per group. This is SURVEY §4.2's "top-k-per-group without
 * full window sort": a ranking window (`row_number`) shuffles and sorts
 * EVERY scored row per group, while this aggregator's map-side partial
 * reduces each partition to ≤ k candidates per group before the
 * exchange — at n_corpus ≫ k the shuffle shrinks from O(n_corpus) rows
 * to O(k · n_partitions), which is the difference between a k-NN join
 * that scales and one that doesn't.
 *
 * Buffer is a sorted Vector capped at k (insertion O(k), fine for
 * search-sized k); results are emitted best-first, ready to explode.
 */
class TopKScored(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  /** Primitive == first so ±0.0 ties break by id; Double.compare for
    * the rest so NaN sorts GREATEST — the same total order Spark's desc
    * window ordering uses, keeping this aggregate result-identical to
    * the row_number formulation even if a NaN score slips through. */
  private def cmpScore(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  private def better(a: Scored, b: Scored): Boolean = {
    val c = cmpScore(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def insert(buf: Seq[Scored], s: Scored): Seq[Scored] =
    if (buf.length >= k && !better(s, buf.last)) buf
    else {
      val at = buf.indexWhere(e => better(s, e)) match {
        case -1 => buf.length
        case i  => i
      }
      val grown = (buf.take(at) :+ s) ++ buf.drop(at)
      if (grown.length > k) grown.take(k) else grown
    }

  override def zero: Seq[Scored] = Vector.empty
  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (a == null) buf else insert(buf, a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    y.foldLeft(x)(insert)
  override def finish(b: Seq[Scored]): Seq[Scored] = b

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopKScored {
  /** Untyped form: `agg(top_k_scored(k)($"sim", $"id"))` → array of
    * struct<score,id>, best first. The udaf flattens the case-class
    * input encoder, so score and id are passed as separate columns. */
  def column(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKScored(k), ExpressionEncoder[Scored]())
    (score: Column, id: Column) => fn(score, id)
  }
}
