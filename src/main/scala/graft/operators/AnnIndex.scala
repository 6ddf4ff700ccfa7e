package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

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
