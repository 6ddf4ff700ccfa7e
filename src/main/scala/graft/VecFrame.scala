package graft

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.operators.Nearest

/** One-pass diagnostics — `inspect_collection`
  * (/root/reference/R/core.R:375-404). */
case class CollectionInfo(
    nRows: Long, nEmbedded: Long, dim: Option[Int],
    embeddingCol: String, hasEmbedder: Boolean, columns: Seq[String])

/**
 * The engine's collection abstraction — the analog of a tidyvec
 * collection (a tibble tagged with `embedding_column` + `embedding_fn`
 * attrs, /root/reference/R/core.R:8-26). A `VecFrame` *wraps* a
 * DataFrame rather than subclassing it: every relational verb stays
 * available on `.df` (the reference inherits dplyr the same way,
 * R/core.R:19), and the vector verbs live here.
 *
 * All operations return new lazy plans; nothing materializes until an
 * action — so a `vec |> embed |> nearest` chain compiles to ONE Spark
 * job over one scan, exactly the shape a 100 TB corpus needs.
 */
case class VecFrame(
    df: DataFrame,
    embeddingCol: String = "embedding",
    embedder: Option[Embedder] = None) {

  private def embCol: Column = col(embeddingCol)

  /**
   * Incremental embed — `embed()` (R/core.R:127-227): compute vectors
   * only for rows whose embedding is NULL unless `force`, and do zero
   * work when nothing needs embedding (the early return at
   * R/core.R:153-155 becomes one cheap limit-1 probe).
   */
  def embed(contentCol: String, force: Boolean = false): VecFrame = {
    val e = embedder.getOrElse(throw new IllegalStateException(
      "no embedder attached — pass one to vec() or embed(embedder = ...)"))
    if (!force && df.filter(embCol.isNull).isEmpty) this
    else {
      val tmp = "__graft_new_emb"
      val computed = e.embed(df, contentCol, tmp)
      val merged =
        if (force) computed.withColumn(embeddingCol, col(tmp))
        else computed.withColumn(embeddingCol, coalesce(embCol, col(tmp)))
      copy(df = merged.drop(tmp))
    }
  }

  def embed(contentCol: String, embedder: Embedder, force: Boolean): VecFrame =
    copy(embedder = Some(embedder)).embed(contentCol, force)

  /** Flagship top-k search over a driver-side query string — embeds the
    * query with the attached embedder (R/core.R:252-260) then scores,
    * filters, ranks (R/core.R:241-328). Returns the empty result when
    * the collection has no embedded rows at all (R/core.R:282-284);
    * otherwise NULL-embedding rows score 0 and trail the ranking. */
  def nearest(
      query: String,
      n: Int = 5,
      method: String = "cosine",
      minScore: Double = 0.0,
      keywordWeight: Double = 0.0,
      keywordColumn: Option[String] = None,
      tieBreakers: Seq[Column] = Nil): VecFrame = {
    val e = embedder.getOrElse(throw new IllegalStateException(
      "nearest(query: String) needs an embedder; use nearestVec for a raw vector"))
    nearestVec(e.embedQuery(df.sparkSession, query), n, method, minScore,
      keywordWeight, keywordColumn, Some(query), tieBreakers)
  }

  /** `nearest(..., as_embedding = TRUE)` (R/core.R:252-253). */
  def nearestVec(
      queryVec: Array[Float],
      n: Int = 5,
      method: String = "cosine",
      minScore: Double = 0.0,
      keywordWeight: Double = 0.0,
      keywordColumn: Option[String] = None,
      queryText: Option[String] = None,
      tieBreakers: Seq[Column] = Nil): VecFrame = {
    if (df.filter(embCol.isNotNull).isEmpty)
      copy(df = df.withColumn("similarity", lit(0.0)).limit(0))
    else {
      val q = lit(queryVec).cast(ArrayType(FloatType))
      copy(df = Nearest.topK(df, embeddingCol, q, n, method, minScore,
        keywordWeight, keywordColumn, queryText, tieBreakers = tieBreakers))
    }
  }

  /**
   * k-means over the embedded rows — `cluster_embeddings`
   * (R/core.R:337-367): distributed Lloyd's via spark.ml with the
   * reference's seed 123 (its `nstart = 10` restarts are superseded by
   * k-means‖ init); integer assignments, NULL cluster for unembedded
   * rows (R/core.R:363-364); errors on 0 embeddings or fewer rows than
   * k (R/core.R:347-353). Exact label equality across implementations is
   * not promised — invariants are (SURVEY §2.4.9).
   */
  def clusterEmbeddings(nClusters: Int = 5, clusterCol: String = "cluster",
      seed: Long = 123): VecFrame = {
    val embedded = df.filter(embCol.isNotNull)
    val n = embedded.count()
    if (n == 0) throw new IllegalStateException("no embeddings to cluster — run embed() first")
    if (n < nClusters) throw new IllegalArgumentException(
      s"need at least $nClusters embedded rows, have $n")
    val vecCol = "__graft_vec"
    val assembled = embedded.withColumn(vecCol, array_to_vector(embCol))
    val model = new KMeans().setK(nClusters).setSeed(seed)
      .setFeaturesCol(vecCol).setPredictionCol(clusterCol).fit(assembled)
    val predicted = model.transform(assembled).drop(vecCol)
    val unembedded = df.filter(embCol.isNull).withColumn(clusterCol, lit(null).cast("int"))
    copy(df = predicted.unionByName(unembedded))
  }

  // ---- Relational passthroughs -------------------------------------
  // The reference keeps collection attributes through every dplyr verb
  // (`[.tidyvec`, R/core.R:98-116); these wrappers do the same for the
  // common verbs so `vec |> filter |> nearest` chains never lose the
  // embedding column name or the embedder. `.df` remains available for
  // anything else.

  def filter(condition: Column): VecFrame = copy(df = df.filter(condition))
  def where(condition: Column): VecFrame = filter(condition)
  def select(cols: Column*): VecFrame = copy(df = df.select(cols: _*))
  def withColumn(name: String, c: Column): VecFrame = copy(df = df.withColumn(name, c))
  def orderBy(cols: Column*): VecFrame = copy(df = df.orderBy(cols: _*))
  def limit(n: Int): VecFrame = copy(df = df.limit(n))
  def union(other: VecFrame): VecFrame = copy(df = df.unionByName(other.df))

  /** First non-NULL vector — `first_valid_embedding` (R/core.R:57-62);
    * one pushed-filter limit-1 probe, used to discover the dimension. */
  def firstValidEmbedding: Option[Array[Float]] =
    df.filter(embCol.isNotNull).select(embCol).head(1).headOption
      .map(_.getSeq[Float](0).toArray)

  /** Data half of `viz_images` (R/visualization.R:126-238): the top-n
    * rows with the columns a contact-sheet renderer needs (path,
    * similarity when present, caption columns). Rendering is
    * presentation, out of engine scope. */
  def contactSheetData(pathColumn: String, n: Int = 12,
      labelColumns: Seq[String] = Nil): DataFrame = {
    val simCols = if (df.columns.contains("similarity")) Seq("similarity") else Nil
    df.limit(n).select((pathColumn +: (simCols ++ labelColumns)).map(col): _*)
  }

  /** `inspect_collection` (R/core.R:375-404) as one aggregation pass. */
  def inspect: CollectionInfo = {
    val row = df.agg(
      count(lit(1)).as("n"),
      count(embCol).as("ne"),
      min(size(embCol)).as("dim")).head()
    CollectionInfo(row.getLong(0), row.getLong(1),
      if (row.isNullAt(2)) None else Some(row.getInt(2)),
      embeddingCol, embedder.nonEmpty, df.columns.toSeq)
  }

  /** `print.tidyvec` header + masked preview (R/core.R:65-95) — returns
    * the header string; the masked frame is `maskedPreview`. */
  def describe: String = {
    val i = inspect
    val dimTxt = i.dim.map(d => s", dim $d").getOrElse("")
    s"# A graft collection: ${i.nRows} rows, ${i.nEmbedded} embedded " +
      s"(column '${i.embeddingCol}'$dimTxt, " +
      (if (i.hasEmbedder) s"embedder: ${embedder.get.name}" else "no embedder") + ")"
  }

  /** Embeddings masked as `<embedding>` / `<NULL>` for display
    * (R/core.R:82-92). */
  def maskedPreview: DataFrame =
    df.withColumn(embeddingCol,
      when(embCol.isNull, lit("<NULL>")).otherwise(lit("<embedding>")))

  def write(path: String): Unit = sources.VecIO.write(this, path)

  /**
   * Switch the ACTIVE embedding column (SURVEY §1.1: a collection may
   * carry several vector columns — e.g. two embedders' outputs side by
   * side — with exactly one active; `embedding_column` names it,
   * R/core.R:8-26). The target is promoted like `vec()` (NULL-filled
   * when absent, untouched when present — idempotent), and the choice
   * is STAMPED into column metadata (`graft.embedding` on every vector
   * column ever activated, `graft.embedding.active` true only on the
   * current one) so it survives paths that only carry the DataFrame:
   * plain parquet write/read (Spark persists field metadata in its
   * footer schema) and any relational verb (metadata rides the schema).
   * [[VecFrame.fromStamped]] is the inverse. The attached embedder is
   * KEPT — the reference's `embedding_column` attr is independent of
   * `embedding_fn` — pass `embedder = Some(...)` to swap it too.
   */
  def withEmbeddingColumn(name: String,
      embedder: Option[Embedder] = this.embedder): VecFrame = {
    val ensured =
      if (df.columns.contains(name)) df
      else df.withColumn(name, lit(null).cast(ArrayType(FloatType)))
    copy(df = VecFrame.stampActive(ensured, name, alsoEmbedding = Set(embeddingCol)),
      embeddingCol = name, embedder = embedder)
  }
}

object VecFrame {
  /** Column-metadata keys for the multi-embedding-column stamp. */
  val MetaEmbedding = "graft.embedding"
  val MetaActive = "graft.embedding.active"

  /** Restamp: `activeName` gets (embedding=true, active=true); every
    * OTHER column previously marked as an embedding — plus the
    * `alsoEmbedding` set (the outgoing active on a switch, which may
    * never have been stamped itself) — keeps its mark with
    * active=false. A pure select, so it stays one lazy projection. */
  private[graft] def stampActive(df: DataFrame, activeName: String,
      alsoEmbedding: Set[String] = Set.empty): DataFrame = {
    import org.apache.spark.sql.types.MetadataBuilder
    val cols = df.schema.fields.map { f =>
      val wasEmb = f.metadata.contains(MetaEmbedding) &&
        f.metadata.getBoolean(MetaEmbedding)
      if (f.name == activeName || wasEmb || alsoEmbedding(f.name)) {
        val m = new MetadataBuilder().withMetadata(f.metadata)
          .putBoolean(MetaEmbedding, true)
          .putBoolean(MetaActive, f.name == activeName)
          .build()
        col(f.name).as(f.name, m)
      } else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Inverse of the [[VecFrame.withEmbeddingColumn]] stamp: rebuild a
    * collection from a bare DataFrame (e.g. read back from plain
    * parquet, no sidecar) by finding the column stamped active. Falls
    * back to `fallback` when the frame was never stamped; errors on a
    * corrupted stamp (two actives) rather than guessing. */
  def fromStamped(df: DataFrame, fallback: String = "embedding"): VecFrame = {
    val active = df.schema.fields.filter(f =>
      f.metadata.contains(MetaActive) && f.metadata.getBoolean(MetaActive))
    active match {
      case Array(one) => VecFrame(df, one.name)
      case Array() => vec(df, fallback)
      case many => throw new IllegalArgumentException(
        s"corrupted embedding stamp: ${many.length} active columns " +
          many.map(_.name).mkString("(", ", ", ")"))
    }
  }

  /** `vec()` (R/core.R:8-26): promote a frame to a collection — ensure
    * the embedding column exists (NULL-filled when absent; untouched
    * when present, so re-wrapping is idempotent, R/core.R:13-16) and
    * attach the embedder. */
  def vec(df: DataFrame, embeddingCol: String = "embedding",
      embedder: Option[Embedder] = None): VecFrame = {
    val withEmb =
      if (df.columns.contains(embeddingCol)) df
      else df.withColumn(embeddingCol, lit(null).cast(ArrayType(FloatType)))
    VecFrame(withEmb, embeddingCol, embedder)
  }
}
