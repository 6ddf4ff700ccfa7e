package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval/range join — all right points inside a per-left-row time
 * window, by key. Spark's built-in equi-join can't express
 * `r.t BETWEEN l.t - lookback AND l.t`; the naive formulation becomes a
 * key-equi join with a residual range predicate whose worst case is the
 * full per-key cross product.
 *
 * Spark-first plan — TIME BUCKETING (the standard interval-join
 * decomposition, what Flink's interval join does with keyed state):
 * quantize time into `bucketSec` buckets; each left interval
 * `[t - lookbackSec, t]` overlaps at most `lookbackSec/bucketSec + 1`
 * buckets and emits one row per bucket; each right point lands in
 * exactly ONE bucket. Equi-join on `(key, bucket)` — a plain hash
 * shuffle Catalyst/AQE handle normally — then apply the exact range
 * predicate. Each qualifying pair meets in exactly one bucket (the
 * right point's), so no distinct pass is needed. Replication factor is
 * the bucket count per interval — pick `bucketSec ≈ lookbackSec` for
 * 2× left-side fan-out; the shuffle stays linear in input + output at
 * any scale.
 *
 * Bucket ids derive from second-floored epochs; flooring only widens
 * the candidate bucket range (conservative), the exact predicate runs
 * at full timestamp precision.
 */
object RangeJoin {

  /** Inner join: right rows with the same key whose `rightTime` lies in
    * `[leftTime - lookbackSec, leftTime]` (both ends inclusive). Output:
    * all left columns + each payload column as `range_<name>`. */
  def pointsInLookback(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      lookbackSec: Long, bucketSec: Long): DataFrame = {
    require(lookbackSec > 0, s"lookbackSec must be positive, got $lookbackSec")
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    val payload = (rightPayload :+ rightTime).distinct
    require(payload.forall(right.columns.contains),
      s"rightPayload/rightTime must exist in right: ${payload.mkString(",")}")

    // timestamp→long cast floors to whole seconds (micros DIV 1e6)
    val lSec = col(leftTime).cast("long")
    val lu = left.withColumn("__b",
      explode(sequence(
        floorDiv(lSec - lookbackSec, bucketSec),
        floorDiv(lSec, bucketSec))))
      .withColumn("__k", col(leftKey))
    val ru = right.select(
      col(rightKey).as("__k"),
      floorDiv(col(rightTime).cast("long"), bucketSec).as("__b"),
      struct(payload.map(col): _*).as("__r"))

    lu.join(ru, Seq("__k", "__b"))
      .where(col(s"__r.$rightTime") >= col(leftTime) - expr(s"INTERVAL $lookbackSec SECONDS") &&
        col(s"__r.$rightTime") <= col(leftTime))
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__r.$p").as(s"range_$p")): _*)
  }

  /** Floor division on Columns (Spark `DIV` truncates toward zero;
    * epochs here are positive so they agree, but keep it correct for
    * pre-1970 timestamps too). */
  private def floorDiv(x: org.apache.spark.sql.Column, d: Long) =
    floor(x.cast("double") / d).cast("long")
}
