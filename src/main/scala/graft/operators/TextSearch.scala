package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BM25 ranked keyword search — the corpus-statistics upgrade of the
 * reference's exact-match keyword score (R/core.R:301-309 counts term
 * presence; BM25 weights by inverse document frequency and saturating
 * term frequency with length normalization). Classic Robertson/Spärck
 * Jones BM25:
 *
 *   score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
 *   idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )
 *
 * Scale shape: the "fit" is two one-pass aggregations (corpus size +
 * average length, and document frequency for the handful of query
 * terms — collected as a few scalars, never the corpus); the scoring
 * pass is a single codegen'd projection over the corpus followed by the
 * usual TakeOrderedAndProject top-k. Distinct query terms are summed
 * once each.
 */
object TextSearch {

  private def toksAll(text: Column): Column =
    filter(split(lower(text), graft.expressions.ShingleHashes.WsRegex), t => length(t) > 0)

  /** (N, avgdl, df per query term) — the BM25 corpus statistics as ONE
    * aggregation job over ONE tokenized projection: count, average
    * length, and every term's document frequency are all aggregates of
    * the same scan, so splitting them across jobs (as a naive fit
    * would) pays the corpus read twice. The tokenized arrays live in
    * named columns so each row splits once, not once per aggregate. */
  def bm25Stats(docs: DataFrame, textCol: String, queryTerms: Seq[String])
      : (Long, Double, Map[String, Long]) = {
    val tokd = docs.select(toksAll(col(textCol)).as("__bm25_toks"))
      .select(col("__bm25_toks"), array_distinct(col("__bm25_toks")).as("__bm25_dtoks"))
    val aggs = count(lit(1)).as("__n") +:
      avg(size(col("__bm25_toks"))).as("__avgdl") +:
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("__bm25_dtoks"), t), 1L).otherwise(0L)).as(s"__df_$i")
      }
    val row = tokd.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    if (n == 0) return (0L, 0.0, queryTerms.map(_ -> 0L).toMap) // empty corpus: no NULL gets
    val avgdl = row.getDouble(1)
    val dfs = queryTerms.zipWithIndex.map { case (t, i) => t -> row.getLong(i + 2) }.toMap
    (n, avgdl, dfs)
  }

  /** BM25 score from a PRE-TOKENIZED column — callers put the token
    * array in a named column so the text splits once per row, not once
    * per query term (Catalyst does not CSE across array-HOF uses). */
  def bm25ScoreFromToks(toks: Column, query: String, n: Long, avgdl: Double,
      dfs: Map[String, Long], k1: Double = 1.2, b: Double = 0.75): Column = {
    val terms = graft.expressions.ShingleHashes.WsPattern.split(query.toLowerCase).filter(_.nonEmpty).distinct
    val dl = size(toks).cast("double")
    terms.map { t =>
      val df = dfs.getOrElse(t, 0L)
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val tf = size(filter(toks, x => x === t)).cast("double")
      lit(idf) * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b / avgdl) * dl))
    }.reduceOption[Column](_ + _).getOrElse(lit(0.0))
  }

  def bm25Score(text: Column, query: String, n: Long, avgdl: Double,
      dfs: Map[String, Long], k1: Double = 1.2, b: Double = 0.75): Column =
    bm25ScoreFromToks(toksAll(text), query, n, avgdl, dfs, k1, b)

  /** Top-k BM25 search over a corpus (membership by raw score, output
    * re-sorted on the rounded value — the engine's oracle convention). */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String, query: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      simCol: String = "score"): DataFrame = {
    val terms = graft.expressions.ShingleHashes.WsPattern.split(query.toLowerCase).filter(_.nonEmpty).distinct.toSeq
    val (n, avgdl, dfs) = bm25Stats(docs, textCol, terms)
    val tokCol = "__bm25_score_toks"
    if (n == 0) docs.withColumn(simCol, lit(0.0)).limit(0)
    else docs.withColumn(tokCol, toksAll(col(textCol)))
      .withColumn(simCol, bm25ScoreFromToks(col(tokCol), query, n, avgdl, dfs, k1, b))
      .drop(tokCol)
      .orderBy(desc(simCol), asc(idCol))
      .limit(k)
  }

  /** SQL string literal escape for spliced query terms. */
  private def sqlLit(s: String): String = s.replace("'", "''")

  /** DuckDB replica of [[bm25TopK]], generated from the same formula. */
  def bm25OracleSql(table: String, textCol: String, idCol: String, query: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): String = {
    val terms = graft.expressions.ShingleHashes.WsPattern.split(query.toLowerCase).filter(_.nonEmpty).distinct.toSeq
    val tk = s"list_filter(string_split_regex(lower($textCol), '${graft.expressions.ShingleHashes.WsRegex}'), t -> len(t) > 0)"
    val scoreTerms = terms.map { t0 =>
      val t = sqlLit(t0)
      val dfSub = s"(SELECT count(*) FROM $table WHERE list_contains(list_distinct($tk), '$t'))"
      val idf = s"ln((stats.n - $dfSub + 0.5) / ($dfSub + 0.5) + 1.0)"
      val tf = s"CAST(len(list_filter($tk, x -> x = '$t')) AS DOUBLE)"
      s"$idf * $tf * ${k1 + 1.0} / ($tf + $k1 * ((1.0 - $b) + ($b / stats.avgdl) * len($tk)))"
    }.mkString(" + ")
    s"""WITH stats AS (
       |  SELECT count(*) AS n, avg(len($tk)) AS avgdl FROM $table)
       |SELECT $idCol, round(raw, 6) AS score FROM (
       |  SELECT $idCol, ($scoreTerms) AS raw FROM $table, stats
       |  ORDER BY raw DESC, $idCol LIMIT $k)
       |ORDER BY score DESC, $idCol""".stripMargin
  }
}
