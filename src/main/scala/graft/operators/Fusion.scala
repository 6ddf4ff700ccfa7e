package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Reciprocal-rank fusion — the standard combiner for heterogeneous
 * retrieval tiers (vector ANN, BM25, exact keyword):
 *
 *   rrf(d) = Σ_rankings 1 / (k + rank_i(d)),   absent ⇒ contributes 0
 *
 * Rank fusion composes rankings whose raw scores live on incompatible
 * scales — the weighted-sum hybrid of the reference (R/core.R:311-313)
 * needs both scores in [0,1]; RRF needs only the order. Inputs are
 * already-limited top-N frames (id + score), so the ranking windows
 * run over list-sized data; determinism comes from ranking on the
 * ROUNDED scores with an id tie-break, the engine's oracle convention.
 */
object Fusion {

  /** Hard cap on input ranking size. RRF's global window is safe ONLY
    * because inputs are pre-limited top-N lists; beyond this the plan
    * would silently serialize a corpus through one partition, so it
    * errors loudly instead (raised per-row at execution, no extra job). */
  val MaxRankingRows = 100000

  def rrf(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
      kConst: Int = 60, outCol: String = "rrf_score",
      maxRows: Int = MaxRankingRows): DataFrame = {
    require(rankings.nonEmpty)
    require(maxRows > 0)
    val ranked = rankings.zipWithIndex.map { case (df, i) =>
      // inputs are top-N lists; a global window over <=N rows is fine —
      // and the assert_true below enforces it at execution time. The
      // guard rides on the ID column, which every consumer evaluates
      // (it is the join key and the output id), so a plan that prunes
      // the rank columns still trips the cap — an assert on __rank_i
      // alone would vanish with the pruned column.
      val w = Window.orderBy(desc(scoreCol), asc(idCol))
      val rank = row_number().over(w)
      val msg = lit(
        s"Fusion.rrf ranking #$i exceeds maxRows=$maxRows rows — RRF inputs " +
          "must be pre-limited top-N lists (an unbounded input would " +
          "serialize through the global ranking window)")
      // the guard rides BOTH output columns: a score-only consumer
      // (single ranking, no join keeping ids alive) prunes the id but
      // evaluates the rank; an id-only consumer prunes the ranks but
      // evaluates the id — either way the cap fires
      val guardedId = when(assert_true(rank <= lit(maxRows), msg).isNull, col(idCol))
      val guardedRank = when(assert_true(rank <= lit(maxRows), msg).isNull, rank)
      df.select(guardedId.as(idCol), guardedRank.as(s"__rank_$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score: Column = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(kConst) + col(s"__rank_$i")), lit(0.0)))
      .reduce(_ + _)
    joined.select(col(idCol), score.as(outCol))
  }
}
