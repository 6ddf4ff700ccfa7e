package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.operators.BloomStore

/**
 * Codegen'd membership probe against a BROADCAST [[BloomStore]] — the
 * map-side decision of every Bloom-bounded dedup tier
 * ([[graft.operators.Dedup.dedupParagraphsAcrossBloom]],
 * [[graft.operators.Dedup.duplicateSpansAcrossBloom]]). Replaces the
 * former two-long Scala UDF (the one remaining non-codegen kernel on a
 * hot path, r15 VERDICT audit note): a ScalaUDF boxes both longs and
 * the boolean per row and blocks whole-stage codegen around it; this
 * expression stays inside the generated loop and calls the store with
 * primitive longs.
 *
 * The store rides as the BROADCAST handle, not the bit array: the
 * generated class resolves `.value()` ONCE per instance (a mutable
 * state guarded by a null check — executors fetch the torrent block on
 * first touch, every later row is a field read), so a hundreds-of-MB
 * filter never serializes into the task binary. Decision semantics are
 * exactly the store's `mightContain` — no false negatives, one-sided
 * fpp — spec'd identical to direct calls in ParaBloomSpec.
 */
case class BloomMightContain(left: Expression, right: Expression,
    store: Broadcast[_ <: BloomStore]) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(h1: Any, h2: Any): Any =
    store.value.mightContain(h1.asInstanceOf[Long], h2.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBroadcast", store,
      "org.apache.spark.broadcast.Broadcast")
    val sv = ctx.addMutableState("graft.operators.BloomStore", "bloomStore")
    nullSafeCodeGen(ctx, ev, (h1, h2) =>
      s"""if ($sv == null) {
         |  $sv = (graft.operators.BloomStore) $bc.value();
         |}
         |${ev.value} = $sv.mightContain($h1, $h2);""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object BloomMightContain {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API face: `probe(store)(h1Col, h2Col)`. */
  def probe(store: Broadcast[_ <: BloomStore])(h1: Column, h2: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(h1), ColumnBridge.expression(h2), store))
}
