package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * The ANN SERVING surface every coded index tier presents (r17 VERDICT
 * #1): [[IvfPqIndex]] (IVFADC, raw or residual coding) and
 * [[OpqIvfPqIndex]] (the full FAISS `OPQ,IVF,PQ` factory stack) are
 * signature-identical on all four serving shapes, and consumers that
 * COMPOSE over an index — MMR re-ranking, refine stages, future
 * rungs — must accept EITHER, or users of the rotated stack get
 * silently degraded results by reaching into `.inner` with an
 * un-rotated query (exactly the footgun the OPQ nested-layout load
 * refusal exists to prevent, reopened through every consumer door).
 *
 * The contract every implementation keeps:
 * - the RAW-vector query contract — callers never see the internal
 *   representation (codes, residuals, rotations); any pretransform is
 *   applied INSIDE the index, driver-side for a single query vector,
 *   in-plan for a query table;
 * - `search` plans one job: pushable cell predicate over the coded
 *   corpus, one ADC table, `TakeOrderedAndProject` tail;
 * - `searchMany` is fully distributed: broadcast-scored probe cells,
 *   cell join against CODES (never raw vectors), bounded-heap top-k
 *   per query — no ranking windows, no driver id-collect;
 * - the refine forms re-rank the shortlist EXACT on raw vectors
 *   (per-query through a pushed id predicate bounded by
 *   `maxShortlist`; batch through the fully-distributed
 *   shortlist-join);
 * - exactness degenerates compose: at nprobe = nlist with a lossless
 *   codebook (and, for the OPQ stack, any orthogonal rotation) every
 *   form provably equals the exact brute-force result — the property
 *   the gate rows anchor on.
 *
 * The reference has no index at all (exact scan per query,
 * /root/reference/R/core.R:287-292, "consider FAISS" at README.md:22).
 */
trait AnnIndex extends Serializable {

  /** Vector dimensionality the index was built at. */
  def dim: Int

  /** ANN top-k for ONE query vector. */
  def search(queryVec: Array[Float], k: Int, nprobe: Int = 4,
      simCol: String = "similarity", tieBreakers: Seq[Column] = Nil): DataFrame

  /** Fully-distributed ANN top-k for a TABLE of queries. */
  def searchMany(queries: DataFrame, queryIdCol: String, queryEmbCol: String,
      corpusIdCol: String, k: Int, nprobe: Int = 4,
      simCol: String = "similarity"): DataFrame

  /** [[search]] + exact re-rank of the shortlist on raw vectors. */
  def searchRefine(raw: DataFrame, idCol: String, embCol: String,
      queryVec: Array[Float], n: Int, shortlist: Int, nprobe: Int = 4,
      simCol: String = "similarity", tieBreakers: Seq[Column] = Nil,
      maxShortlist: Int = 4096): DataFrame

  /** [[searchMany]] + fully-distributed exact re-rank. */
  def searchManyRefine(queries: DataFrame, queryIdCol: String,
      queryEmbCol: String, raw: DataFrame, corpusIdCol: String,
      corpusEmbCol: String, n: Int, shortlist: Int, nprobe: Int = 4,
      simCol: String = "similarity"): DataFrame
}

object AnnIndex {

  /** Reopen WHATEVER coded-index layout lives at `path` — sniffs the
    * sidecar and dispatches to the right loader ([[OpqIvfPqIndex]]'s
    * nested layout first: its `$path/ivfpq` subtree IS a plain IVFADC
    * layout, so probing in the other order would open a rotated stack
    * as its inner half and silently serve un-rotated queries — the
    * exact footgun the nesting exists to prevent). Refuses by name
    * when neither sidecar is readable: guessing a layout class would
    * trade a loud error for silently wrong similarity scores. */
  def open(spark: SparkSession, path: String): AnnIndex = {
    def has(sidecar: String): Boolean =
      try { IvfIndex.readSidecar(spark, path, sidecar); true }
      catch { case _: Exception => false }
    if (has("_opqivfpq.json")) OpqIvfPqIndex.load(spark, path)
    else if (has("_ivfpq.json")) IvfPqIndex.load(spark, path)
    else throw new IllegalArgumentException(
      s"$path is not a coded-index layout this engine can open (no readable " +
        "_opqivfpq.json or _ivfpq.json sidecar) — plain vector-tier IVF " +
        "layouts reopen with IvfIndex.load, which serves raw vectors and " +
        "is deliberately outside the coded AnnIndex seam")
  }
}
