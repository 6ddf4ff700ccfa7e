package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — for each left row `(key, t)`, attach the
 * single right row with the same key and the greatest right time at or
 * before `t` (backward as-of; `strict = true` excludes equal times).
 * The shape pandas calls `merge_asof`, kdb calls `aj`, and Flink calls
 * a temporal join; Spark has no built-in.
 *
 * Spark-first plan — ONE hash shuffle, no range cross join:
 * tag both sides, union, and run a single running-`last(ignoreNulls)`
 * window per key ordered by `(time, side, tieBreak)`. Right rows sort
 * before left rows at equal time (inclusive semantics) or after them
 * (strict), so the window's "latest non-null right payload so far" IS
 * the as-of match. Cost is sort-merge-like: linear scan per key
 * partition, state = one payload struct — this survives a 100× scale-up
 * wherever a plain shuffle join on `key` would. Hot keys concentrate in
 * one task (windows can't be salted without breaking the running
 * semantics); mitigate upstream by splitting the left side, not here.
 *
 * Ties among right rows at the same `(key, time)` are broken
 * deterministically: the greatest `rightTieBreak` wins (it sorts last
 * under the window order, and `last` takes the latest frame row). When
 * even `(key, time, tieBreak)` collide, the full right payload struct
 * is the final disambiguator (greatest payload wins, field-wise struct
 * order) — so the result never depends on partition order. Payload
 * types that Spark cannot order (maps) fall back to requiring the
 * tie-break to be unique per `(key, time)`; that requirement is the
 * caller's contract there.
 *
 * Unmatched left rows keep NULL payload columns (left-join semantics);
 * `tolerance` nulls out matches older than `t - tolerance` instead of
 * dropping the row — exactly pandas `merge_asof(tolerance=...)`.
 */
object AsofJoin {

  /**
   * @param rightPayload right columns to attach (each emitted as
   *                     `asof_<name>`; `rightTime` is always included)
   * @param rightTieBreak right column ordering ties at equal time
   *                      (greatest wins); must be non-null on right rows
   * @param tolerance max lookback as an interval Column
   *                  (e.g. `expr("INTERVAL 1 HOUR")`)
   */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String,
      strict: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    val payload = (rightPayload :+ rightTime).distinct
    require(payload.forall(right.columns.contains),
      s"rightPayload/rightTime must exist in right: ${payload.mkString(",")}")
    require(right.columns.contains(rightTieBreak),
      s"rightTieBreak '$rightTieBreak' must exist in right")
    val lType = left.select(struct(left.columns.map(col): _*)).schema.head.dataType
    val rType = right.select(struct(payload.map(col): _*)).schema.head.dataType
    val tbType = right.schema(rightTieBreak).dataType

    // side ordering encodes inclusivity: right rows at equal time sort
    // BEFORE left rows (0 < 1) for `<=` semantics, AFTER (2 > 1) for `<`
    val rSide = if (strict) 2 else 0
    // NULL-key/NULL-time right rows can never be an as-of match under
    // equi-join semantics — drop them BEFORE the union, or the window's
    // partitionBy would group NULL keys together and attribute
    // NULL-key left rows to NULL-key right rows (a semantic a join
    // would never produce). NULL-key/time LEFT rows keep a NULL match
    // (left-join semantics) and BYPASS the shuffle entirely: routing
    // them through the window would concentrate every such row in one
    // NULL partition — a self-inflicted hot key on data (events with
    // missing user ids) where the match is already known to be NULL.
    val rightClean = right.where(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val leftClean = left.where(col(leftKey).isNotNull && col(leftTime).isNotNull)
    val rFields = rType.asInstanceOf[org.apache.spark.sql.types.StructType].fields
    val leftBypass = left
      .where(col(leftKey).isNull || col(leftTime).isNull)
      .select(left.columns.map(col) ++
        rFields.map(f => lit(null).cast(f.dataType).as(s"asof_${f.name}")): _*)
    val lu = leftClean.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(tbType).as("__tb"),
      struct(left.columns.map(col): _*).as("__lrow"),
      lit(null).cast(rType).as("__rrow"))
    val ru = rightClean.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(rSide).as("__side"),
      col(rightTieBreak).as("__tb"),
      lit(null).cast(lType).as("__lrow"),
      struct(payload.map(col): _*).as("__rrow"))

    // Final tie disambiguator: the whole payload struct. Left rows
    // carry a NULL __rrow but never tie with right rows (the __side key
    // already separates them), so the extra key only orders right-row
    // duplicates. Structs are orderable iff every field is; for a
    // non-orderable payload (maps) the struct key is dropped and the
    // determinism contract reverts to "tieBreak unique per (key, time)".
    val rrowOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(rType)
    val orderKeys =
      Seq(col("__t").asc, col("__side").asc, col("__tb").asc) ++
        (if (rrowOrderable) Seq(col("__rrow").asc) else Nil)
    val win = Window.partitionBy("__k")
      .orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__rrow"), ignoreNulls = true).over(win)
    val matched = tolerance match {
      case Some(tol) =>
        when(matchedRaw.getField(rightTime) >= col("__t") - tol, matchedRaw)
      case None => matchedRaw
    }

    lu.unionByName(ru)
      .withColumn("__m", matched)
      .where(col("__side") === 1)
      .select(col("__lrow.*") +:
        payload.map(p => col(s"__m.$p").as(s"asof_$p")): _*)
      .unionByName(leftBypass)
  }
}
