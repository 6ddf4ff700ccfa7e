package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.expressions.RandomProjectionKeys
import graft.functions.vectors

/**
 * Collection×collection similarity — the generalization of `nearest`
 * from "one query vs a table" to "a table of queries vs a table"
 * (SURVEY §2.3 J; the reference documents the pairwise `%~%` operator
 * but never implemented it, man/grapes-twiddle-grapes.Rd:1-20 — this is
 * its real implementation).
 *
 * Scale design: the exact paths below are the correctness baseline and
 * the right plan when one side is broadcast-small (k-NN join) or the
 * self-join is band-limited. At 100 TB the LSH path prunes candidate
 * pairs first (`approxCosineSelfJoin`), trading recall for a
 * near-linear candidate count — both are exposed so callers pick per
 * workload.
 */
object SimJoin {

  /**
   * k nearest corpus rows per query row. The query side broadcasts (a
   * query batch is small by construction); scoring happens map-side on
   * corpus partitions with zero shuffle of the corpus; the per-query
   * top-k is a ranking window over (queries × corpus) — the shuffle
   * moves only n_queries·n_corpus score *rows*, never embeddings twice.
   */
  def knnJoin(
      queries: DataFrame, // must contain queryIdCol + queryEmbCol
      corpus: DataFrame,
      queryIdCol: String,
      queryEmbCol: String,
      corpusEmbCol: String,
      k: Int,
      method: String = "cosine",
      simCol: String = "similarity",
      corpusTieBreak: Seq[Column] = Nil): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn(simCol,
        coalesce(vectors.similarity(col(corpusEmbCol), col(queryEmbCol), method), lit(0.0)))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(desc(simCol) +: corpusTieBreak: _*)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * k-NN join via the bounded-heap aggregate instead of a ranking
   * window. Same result as `knnJoin` (spec'd equal), different physical
   * shape: the window sorts EVERY scored row inside each query's
   * partition, while the aggregate's map-side partial keeps ≤ k
   * candidates per (partition, query) — the exchange carries
   * O(k · n_partitions) rows per query instead of O(n_corpus). This is
   * the shape to use when the corpus is large and k is small, i.e.
   * always at 100 TB.
   */
  def knnJoinAgg(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryEmbCol: String,
      corpusIdCol: String,
      corpusEmbCol: String,
      k: Int,
      method: String = "cosine",
      simCol: String = "similarity"): DataFrame = {
    import graft.functions.TopKScored
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    // the bounded-heap buffer stores ids as long; a non-integral id
    // column would cast to NULL silently — reject it up front
    val idType = corpus.schema(corpusIdCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"knnJoinAgg buffers corpus ids as long, but '$corpusIdCol' is " +
        s"${idType.simpleString} — use knnJoin (window formulation), which " +
        "keeps arbitrary id types")
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(queryIdCol), col(corpusIdCol).cast("long").as(corpusIdCol),
        coalesce(vectors.similarity(col(corpusEmbCol), col(queryEmbCol), method), lit(0.0))
          .as(simCol))
    scored
      .groupBy(col(queryIdCol))
      .agg(TopKScored.column(k)(col(simCol), col(corpusIdCol)).as("__topk"))
      .select(col(queryIdCol), explode(col("__topk")).as("__e"))
      .select(col(queryIdCol), col("__e.id").as(corpusIdCol), col("__e.score").as(simCol))
  }

  /** All pairs (id1 < id2) with similarity ≥ threshold — exact O(n²/2)
    * self-join; the baseline for near-dup detection on a bounded set.
    * Band with a blocking key (`groupCol`) where the domain allows. */
  def thresholdSelfJoin(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      method: String = "cosine",
      groupCol: Option[String] = None,
      simCol: String = "similarity"): DataFrame = {
    val a = df.select(Seq(col(idCol).as("id1"), col(embCol).as("__emb1")) ++
      groupCol.map(c => col(c).as("__g1")): _*)
    val b = df.select(Seq(col(idCol).as("id2"), col(embCol).as("__emb2")) ++
      groupCol.map(c => col(c).as("__g2")): _*)
    val joinCond = groupCol
      .map(_ => col("id1") < col("id2") && col("__g1") === col("__g2"))
      .getOrElse(col("id1") < col("id2"))
    a.join(b, joinCond)
      .withColumn(simCol, vectors.similarity(col("__emb1"), col("__emb2"), method))
      .where(col(simCol) >= threshold)
      .select(col("id1"), col("id2"), col(simCol))
  }

  /**
   * HARD-NEGATIVE MINING for contrastive training data — the published
   * step behind every dual-encoder finetune (DPR, Sentence-BERT, E5
   * all mine "hard" negatives: the most-similar corpus rows whose
   * LABEL differs from the anchor's — random negatives are too easy to
   * teach a margin). Per anchor: the `k` highest-similarity
   * different-label rows, self excluded, ties to the lower negative
   * id. Emits (anchorId, negId, similarity).
   *
   * This exact form is the all-pairs baseline (one self cross join +
   * a per-anchor ranking window — correct and fine while one side
   * broadcasts). At corpus scale, mine from a PRUNED candidate frame
   * instead: `approxCosineSelfJoin` (banded, near-linear candidates) →
   * [[hardNegativesFromPairs]] — the same rule applied to whatever
   * candidate generator fits the corpus, and because hard negatives
   * are by definition HIGH-similarity rows, a threshold'd candidate
   * set is exactly where they live (recall loss concentrates in the
   * easy negatives nobody wanted).
   */
  def hardNegatives(df: DataFrame, idCol: String, embCol: String,
      labelCol: String, k: Int, method: String = "cosine",
      simCol: String = "similarity"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = df.select(col(idCol).as("anchor_id"), col(embCol).as("__emb1"),
      col(labelCol).as("__l1"))
    val b = df.select(col(idCol).as("neg_id"), col(embCol).as("__emb2"),
      col(labelCol).as("__l2"))
    // null labels are UNLABELED rows: they mine no negatives and serve
    // as none (a null-label "negative" may secretly share the class —
    // the one-sided-safe exclusion)
    val scored = a.join(b,
        col("anchor_id") =!= col("neg_id") &&
          col("__l1").isNotNull && col("__l2").isNotNull &&
          col("__l1") =!= col("__l2"))
      .withColumn(simCol,
        coalesce(vectors.similarity(col("__emb1"), col("__emb2"), method), lit(0.0)))
    topKPerAnchor(scored, k, simCol)
  }

  /** Per-anchor (sim desc, neg_id asc) top-k via the bounded-heap
    * aggregate — the knnJoinAgg shape: map-side partials keep ≤ k
    * candidates per (partition, anchor), so the exchange carries
    * O(k·partitions) rows per anchor instead of every scored pair
    * (measured 5.0 → 1.2 s on the 4M-pair exact row at sf0.1; the
    * heap's (score desc, id asc) total order is exactly the ranking
    * window's, spec'd equal). Requires an integral neg id (the heap
    * buffers ids as long — knnJoinAgg's contract). */
  private def topKPerAnchor(scored: DataFrame, k: Int, simCol: String): DataFrame = {
    import graft.functions.TopKScored
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = scored.schema("neg_id").dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"hard-negative mining buffers neg ids as long, but the id column is " +
        s"${idType.simpleString} — re-key to an integral id first")
    scored
      .groupBy(col("anchor_id"))
      .agg(TopKScored.column(k)(col(simCol), col("neg_id").cast("long")).as("__topk"))
      .select(col("anchor_id"), explode(col("__topk")).as("__e"))
      .select(col("anchor_id"), col("__e.id").as("neg_id"), col("__e.score").as(simCol))
  }

  /** [[hardNegatives]] over a PRE-PRUNED candidate pair frame
    * `(id1, id2, simCol)` — the scale composition (feed it
    * [[approxCosineSelfJoin]]'s output). Pairs are symmetrized (each
    * undirected pair serves both anchors), labels join from `labels`
    * (`idCol`, `labelCol`), label-mismatch and per-anchor top-k as in
    * the exact form. Candidate recall is the generator's; the rule is
    * identical (spec'd equal on an exhaustive pair frame). */
  def hardNegativesFromPairs(pairs: DataFrame, labels: DataFrame,
      idCol: String, labelCol: String, k: Int,
      simCol: String = "similarity"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // Collapse to ONE row per directed (anchor, neg) pair after
    // symmetrizing: a caller's frame that already carries both (a, b)
    // and (b, a) — or duplicate pairs — would otherwise enter the same
    // negative into the per-anchor heap twice and silently shrink the
    // effective k (r16 ADVICE). max(sim) keeps the better score should
    // a directed generator's two scores ever disagree; on the
    // undirected id1 < id2 frames approxCosineSelfJoin emits, the
    // groupBy is a no-op on values. Cost: one exchange over the
    // candidate pair frame — which the generator already made
    // near-linear, and whose map-side combine collapses the duplicates
    // before they ship.
    val sym = pairs.select(col("id1").as("anchor_id"), col("id2").as("neg_id"), col(simCol))
      .unionByName(pairs.select(col("id2").as("anchor_id"), col("id1").as("neg_id"), col(simCol)))
      .groupBy(col("anchor_id"), col("neg_id")).agg(max(col(simCol)).as(simCol))
    val lab = labels.select(col(idCol), col(labelCol)).where(col(labelCol).isNotNull)
    val scored = sym
      .join(broadcast(lab.select(col(idCol).as("anchor_id"), col(labelCol).as("__l1"))), "anchor_id")
      .join(broadcast(lab.select(col(idCol).as("neg_id"), col(labelCol).as("__l2"))), "neg_id")
      .where(col("__l1") =!= col("__l2"))
    topKPerAnchor(scored, k, simCol)
  }

  /**
   * Hard negatives mined from an ANN INDEX (r16 VERDICT #6) — the
   * OTHER production candidate generator beside the banded LSH form:
   * DPR's actual recipe retrieves each anchor's top candidates from
   * the serving index and keeps the best different-label ones. Takes
   * ANY [[AnnIndex]] (r17 VERDICT #1) — the OPQ stack mines through
   * the same door with its rotation applied inside `searchMany`. One
   * [[AnnIndex.searchMany]] pass over the coded corpus retrieves
   * `candidatesPerAnchor` rows per anchor (broadcast-probe → cell join
   * → bounded-heap — the anchors table broadcasts, which is the DPR
   * shape: anchors are a training set, small beside the corpus), then
   * the SAME mining rule as [[hardNegatives]]: self excluded, null
   * labels one-sided-safe excluded, label mismatch, per-anchor top-k
   * via the bounded-heap aggregate.
   *
   * Candidate recall is the index's (nprobe, coding quality) — and
   * self/same-label rows DO occupy heap slots before the filter, so
   * size `candidatesPerAnchor` above k by the expected same-label
   * density, exactly as DPR over-retrieves. Exactness anchor: at
   * nprobe = nlist + a lossless codebook + candidatesPerAnchor ≥ the
   * corpus, the candidates are EVERY scored row, so the result
   * provably equals [[hardNegatives]] (the `hard_negatives_index` gate
   * row shares its oracle).
   */
  def hardNegativesFromIndex(index: AnnIndex, anchors: DataFrame,
      labels: DataFrame, idCol: String, embCol: String, labelCol: String,
      k: Int, candidatesPerAnchor: Int, nprobe: Int = 4,
      simCol: String = "similarity"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(candidatesPerAnchor >= k,
      s"candidatesPerAnchor ($candidatesPerAnchor) must be >= k ($k)")
    val hits = index.searchMany(
      anchors.select(col(idCol).as("anchor_id"), col(embCol).as("__qe")),
      "anchor_id", "__qe", idCol, k = candidatesPerAnchor, nprobe = nprobe,
      simCol = simCol)
    val lab = labels.select(col(idCol), col(labelCol))
      .where(col(labelCol).isNotNull)
    val scored = hits.withColumnRenamed(idCol, "neg_id")
      .where(col("anchor_id") =!= col("neg_id"))
      .join(broadcast(lab.select(col(idCol).as("anchor_id"),
        col(labelCol).as("__l1"))), "anchor_id")
      .join(broadcast(lab.select(col(idCol).cast("long").as("neg_id"),
        col(labelCol).as("__l2"))), "neg_id")
      .where(col("__l1") =!= col("__l2"))
    topKPerAnchor(scored, k, simCol)
  }

  /**
   * LSH-pruned cosine threshold self-join — the 100 TB path. One
   * codegen'd [[graft.expressions.RandomProjectionKeys]] pass computes
   * `numHashTables` compound keys per row (each the fold of
   * `projsPerTable` floor-quantized unit projections — AND within a
   * table, OR across tables; cosine geometry: vectors are
   * unit-normalized inside the kernel); candidates are pairs sharing a
   * (table, key) cell, and the exact codegen'd cosine re-scores them,
   * so output PRECISION is exact and only recall is approximate.
   * Native replacement for the former `spark.ml
   * BucketedRandomProjectionLSH.fit → approxSimilarityJoin` chain
   * (that scheme is exactly `projsPerTable = 1`): no fit stage, no
   * ml-Vector UDT per row, the re-score joins only candidate ids
   * (semi-join pruned) instead of carrying both embeddings through
   * the LSH join — and crucially the compound-key knob, which ml
   * lacks: at d = 64 a single unit projection concentrates as
   * N(0, 1/√d), so 1-projection buckets barely split the corpus and
   * the candidate set approaches all pairs; ANDing 2-3 projections
   * shrinks buckets multiplicatively while extra tables keep recall.
   * Seed pinned.
   *
   * `bucketLength ≥ 4` provably collapses every row into one bucket
   * per table (keys are centered: |dot| ≤ 1 < bucketLength/2) — the
   * operator then EQUALS the exact threshold self-join; the
   * `ann_cosine_lsh_exact` query anchors the whole path on
   * `neardup_embedding`'s oracle that way.
   */
  def approxCosineSelfJoin(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      bucketLength: Double = 1.0,
      numHashTables: Int = 4,
      seed: Int = 42,
      simCol: String = "similarity",
      projsPerTable: Int = 1): DataFrame = {
    // threshold must be strictly positive: the zero-vector sentinel
    // buckets zero vectors only with each other, and the exact-join
    // equivalence at bucketLength ≥ 4 relies on zero-vs-real pairs
    // (cosine = 0 by engine convention) never passing the filter — at
    // threshold ≤ 0 the exact path would emit pairs the LSH path can
    // never generate.
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val rows = df.where(col(embCol).isNotNull)
    val banded = rows.select(col(idCol), col(embCol),
      posexplode(ColumnBridge.column(RandomProjectionKeys(
        ColumnBridge.expression(col(embCol)), numHashTables, bucketLength, seed,
        projsPerTable))))
      .withColumnRenamed("pos", "__table").withColumnRenamed("col", "__key")
    // Score INSIDE the banded join and dedupe only the survivors.
    // Candidate multiplicity (one pair can collide in several tables)
    // and the candidate count both stay in a single pipelined
    // hash-join → cosine → filter codegen stage with NO shuffle of
    // candidate rows; the distinct that follows sees only rows that
    // already passed the threshold — the tiny true-pair set. The
    // alternative (distinct the candidate ids first, then re-join
    // embeddings) shuffles the full candidate multiset — measured 3×
    // slower on the clustered fixture, where every within-cluster pair
    // is a candidate in ~6 of 8 tables. Re-scoring a pair once per
    // colliding table is ~d flops per extra hit inside codegen —
    // orders of magnitude cheaper than exchanging the row.
    banded.select(col(idCol).as("id1"), col(embCol).as("__e1"),
        col("__table"), col("__key"))
      .join(banded.select(col(idCol).as("id2"), col(embCol).as("__e2"),
        col("__table"), col("__key")), Seq("__table", "__key"))
      .where(col("id1") < col("id2"))
      .withColumn(simCol, vectors.cosine_similarity(col("__e1"), col("__e2")))
      .where(col(simCol) >= threshold)
      .select(col("id1"), col("id2"), col(simCol))
      .distinct()
  }
}
