package graft

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.expressions.HashingEmbed

/**
 * Content → vector, the engine analog of the reference's `embedding_fn`
 * attribute (/root/reference/R/core.R:45-50). The reference stores a
 * *closure* (capturing a loaded torch model or a fitted TF-IDF
 * vocabulary, R/embedders.R:29-31,335-366); closures don't serialize to
 * executors, so graft uses named, registry-resolvable embedders whose
 * state is either pure parameters (hashing) or an ML model with its own
 * distributed persistence (TF-IDF PipelineModel). Neural inference is
 * out of scope in this zero-egress JVM build; the trait is the seam
 * where a real model-serving embedder would plug in (batched per
 * partition, one model per executor).
 *
 * Batching: the reference chunks to batches of 32 (R/core.R:164) to
 * amortize model overhead; in Spark the partition is the batch and
 * whole-stage codegen amortizes per-row overhead — nothing to tune.
 */
trait Embedder extends Serializable {
  /** Registry key. */
  def name: String
  /** Output dimensionality (vocabulary size for TF-IDF). */
  def dim: Int
  /** Re-instantiation parameters for the sidecar. */
  def params: Map[String, String]
  /** Append `outCol: array<float>` computed from `contentCol`. */
  def embed(df: DataFrame, contentCol: String, outCol: String): DataFrame
  /** Embed one driver-side query string (the `nearest(query=...)` path,
    * R/core.R:252-260). */
  def embedQuery(spark: SparkSession, text: String): Array[Float] = {
    import spark.implicits._
    val row = embed(Seq(text).toDF("__graft_text"), "__graft_text", "__graft_emb")
      .select("__graft_emb").head()
    row.getSeq[Float](0).toArray
  }
  /** Persist model state under `dir` (no-op for parameter-only embedders). */
  def save(dir: String): Unit = ()
}

/**
 * Feature-hashing embedder over whitespace tokens — deterministic,
 * dependency-free, fixed-dim, L2-normalized (the invariants every HF
 * embedder in the reference guarantees, R/embedders.R:56..309). One
 * codegen-stage column expression: no shuffle, no model broadcast.
 */
case class HashingEmbedder(override val dim: Int = 64, seed: Int = 42) extends Embedder {
  override def name: String = "hashing"
  override def params: Map[String, String] = Map("dim" -> dim.toString, "seed" -> seed.toString)
  override def embed(df: DataFrame, contentCol: String, outCol: String): DataFrame =
    df.withColumn(outCol,
      ColumnBridge.column(HashingEmbed(ColumnBridge.expression(col(contentCol)), dim, seed)))
}

/**
 * Fixed literal-vocabulary term-count embedder: dimension i counts the
 * occurrences of `vocab(i)` among the text's whitespace tokens
 * (duplicate TEXT terms count per occurrence — plain term frequency).
 * The bag-of-words half of the reference's TF-IDF family
 * (/root/reference/R/embedders.R:335-352) with the vocabulary supplied
 * up front instead of fitted — which makes the embedding (and therefore
 * the full `(1-w)·cosine + w·keyword` hybrid score built on it,
 * R/core.R:295-313) expressible in ANSI SQL and oracle-checkable
 * end-to-end. Counts are small exact integers, so float32 storage and
 * double cosine accumulation are bit-reproducible across engines.
 * Pure codegen'd built-ins; no fit, no model broadcast, no shuffle.
 */
case class VocabCountEmbedder(vocab: Seq[String]) extends Embedder {
  require(vocab.nonEmpty && vocab.forall(_.nonEmpty), "vocab must be non-empty terms")
  // params round-trips the vocabulary as a comma-joined string
  // (EmbedderRegistry splits on ','); a term containing a comma would
  // silently split into two terms on read_vec reload — changing dim and
  // every embedding. Terms are matched against whitespace-split tokens,
  // so commas (and whitespace) in a term could never match anyway:
  // refuse loudly at construction instead of corrupting the round trip.
  require(vocab.forall(t => !t.contains(",") && !t.exists(_.isWhitespace)),
    s"vocab terms must be comma-free whitespace-free tokens (they are matched " +
      s"against whitespace-split text tokens and serialized comma-joined): " +
      vocab.filter(t => t.contains(",") || t.exists(_.isWhitespace)).mkString("'", "', '", "'") +
      ". This can also fire on read_vec/EmbedderRegistry.load of a LEGACY sidecar " +
      "persisted before this check existed — such a sidecar's comma-joined vocab was " +
      "already ambiguous on disk; re-create the embedder with compliant terms and " +
      "re-write the dataset.")
  override def name: String = "vocab_count"
  override def dim: Int = vocab.length
  override def params: Map[String, String] = Map("vocab" -> vocab.mkString(","))
  override def embed(df: DataFrame, contentCol: String, outCol: String): DataFrame = {
    // tokenize ONCE into a named column — inlining the split in all
    // |vocab| count expressions would re-split the text per term
    // (Catalyst does not CSE across array-HOF projections)
    val tokCol = "__graft_vocab_toks"
    val toks = filter(split(lower(col(contentCol)), graft.expressions.ShingleHashes.WsRegex), t => length(t) > 0)
    val counts = vocab.map(term =>
      size(filter(col(tokCol), t => t === lit(term))).cast("float"))
    df.withColumn(tokCol, toks)
      .withColumn(outCol,
        when(col(contentCol).isNull, lit(null)).otherwise(array(counts: _*)))
      .drop(tokCol)
  }
}

/**
 * Frozen-vocabulary TF-IDF, the reference's `embedder_tfidf`
 * (/root/reference/R/embedders.R:335-366): fit once on a corpus
 * (lowercase word tokens, vocabulary pruned by a min-frequency
 * threshold, IDF weights), then transform any text against the frozen
 * vocabulary. Vector dim = vocabulary size. Implemented as a fitted
 * spark.ml Pipeline (RegexTokenizer → CountVectorizer → IDF) — the
 * PipelineModel *is* the frozen closure, with distributed persistence
 * for the write_vec/read_vec round trip (R/core.R:412-442).
 *
 * Divergence note: the reference prunes by total term count
 * (`term_count_min`); CountVectorizer prunes by document frequency
 * (minDF). Same intent (drop rare terms), different counter; the
 * vignette's 5-doc corpus behaves identically.
 */
class TfIdfEmbedder private (val model: PipelineModel, val minFreq: Int) extends Embedder {
  override def name: String = "tfidf"
  override lazy val dim: Int =
    model.stages(1).asInstanceOf[CountVectorizerModel].vocabulary.length
  override def params: Map[String, String] = Map("min_freq" -> minFreq.toString)

  override def embed(df: DataFrame, contentCol: String, outCol: String): DataFrame = {
    val prepped = df.withColumn(TfIdfEmbedder.TextCol, col(contentCol))
    model.transform(prepped)
      .withColumn(outCol, vector_to_array(col(TfIdfEmbedder.TfIdfCol), "float32"))
      .drop(TfIdfEmbedder.TextCol, TfIdfEmbedder.TokensCol, TfIdfEmbedder.TfCol, TfIdfEmbedder.TfIdfCol)
  }

  /** The reference errors when no query term is in-vocabulary
    * (R/embedders.R:359-361) rather than returning a zero vector. */
  override def embedQuery(spark: SparkSession, text: String): Array[Float] = {
    val v = super.embedQuery(spark, text)
    if (v.forall(_ == 0f))
      throw new IllegalArgumentException(
        s"none of the query terms are in the TF-IDF vocabulary: '$text'")
    v
  }

  override def save(dir: String): Unit = model.write.overwrite().save(dir)
}

object TfIdfEmbedder {
  private[graft] val TextCol = "__graft_text"
  private[graft] val TokensCol = "__graft_tokens"
  private[graft] val TfCol = "__graft_tf"
  private[graft] val TfIdfCol = "__graft_tfidf"

  def fit(corpus: DataFrame, textCol: String, minFreq: Int = 2): TfIdfEmbedder = {
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(TextCol).setOutputCol(TokensCol)
        .setPattern(graft.expressions.ShingleHashes.WsRegex).setToLowercase(true),
      new CountVectorizer().setInputCol(TokensCol).setOutputCol(TfCol)
        .setMinDF(minFreq.toDouble),
      new IDF().setInputCol(TfCol).setOutputCol(TfIdfCol)))
    val prepped = corpus.withColumn(TextCol, col(textCol))
    new TfIdfEmbedder(pipeline.fit(prepped), minFreq)
  }

  def load(dir: String, minFreq: Int): TfIdfEmbedder =
    new TfIdfEmbedder(PipelineModel.load(dir), minFreq)
}

/**
 * Trainable neural-ish embedder, fully in-JVM: spark.ml Word2Vec
 * (skip-gram with negative sampling) fit on the corpus, documents
 * embedded as the average of their word vectors (the transform
 * semantics of `ml.feature.Word2VecModel`). The closest thing to the
 * reference's learned embedders (R/embedders.R:9-327) that runs with
 * zero egress; seeded for reproducibility within a Spark version,
 * L2-normalized at the source like every HF variant in the reference.
 */
class Word2VecEmbedder private (val model: PipelineModel, val vectorSize: Int)
    extends Embedder {
  override def name: String = "word2vec"
  override def dim: Int = vectorSize
  override def params: Map[String, String] = Map("vector_size" -> vectorSize.toString)

  override def embed(df: DataFrame, contentCol: String, outCol: String): DataFrame = {
    val prepped = df.withColumn(Word2VecEmbedder.TextCol, col(contentCol))
    model.transform(prepped)
      .withColumn(outCol,
        graft.functions.vectors.l2_normalize(
          vector_to_array(col(Word2VecEmbedder.VecCol), "float32")))
      .drop(Word2VecEmbedder.TextCol, Word2VecEmbedder.TokensCol, Word2VecEmbedder.VecCol)
  }

  override def save(dir: String): Unit = model.write.overwrite().save(dir)
}

object Word2VecEmbedder {
  private[graft] val TextCol = "__graft_w2v_text"
  private[graft] val TokensCol = "__graft_w2v_tokens"
  private[graft] val VecCol = "__graft_w2v_vec"

  def fit(corpus: DataFrame, textCol: String, vectorSize: Int = 32,
      minCount: Int = 2, seed: Long = 42L,
      fitPartitions: Int = 8): Word2VecEmbedder = {
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(TextCol).setOutputCol(TokensCol)
        .setPattern(graft.expressions.ShingleHashes.WsRegex).setToLowercase(true),
      new org.apache.spark.ml.feature.Word2Vec()
        .setInputCol(TokensCol).setOutputCol(VecCol)
        .setVectorSize(vectorSize).setMinCount(minCount).setSeed(seed)))
    // Pin the fit input's partitioning: hash-partition on the text and
    // sort within partitions, so the sentence→partition assignment and
    // per-partition order no longer depend on the upstream parallelism
    // or file-split geometry. Word2Vec's SGD consumes sentences in
    // partition order — with the layout pinned (and the seed fixed),
    // the learned vectors are bit-stable across thread counts and runs
    // (demonstrated at 4 vs 32 threads; norms now round at 6dp in the
    // embed_word2vec entry, tightened from the round-1 4dp slack).
    val prepped = corpus.withColumn(TextCol, col(textCol))
      .repartition(fitPartitions, col(TextCol))
      .sortWithinPartitions(col(TextCol))
    new Word2VecEmbedder(pipeline.fit(prepped), vectorSize)
  }

  def load(dir: String, vectorSize: Int): Word2VecEmbedder =
    new Word2VecEmbedder(PipelineModel.load(dir), vectorSize)
}

/** Name → embedder resolution for the read_vec path (the reference gets
  * this for free because qs serializes closures, R/core.R:421-439; we
  * re-resolve from the sidecar spec instead). */
object EmbedderRegistry {
  def load(name: String, params: Map[String, String], modelDir: String): Embedder = name match {
    case "hashing" => HashingEmbedder(
      dim = params.getOrElse("dim", "64").toInt,
      seed = params.getOrElse("seed", "42").toInt)
    case "vocab_count" => VocabCountEmbedder(
      params.getOrElse("vocab", "").split(",").toSeq.filter(_.nonEmpty))
    case "tfidf" => TfIdfEmbedder.load(modelDir, params.getOrElse("min_freq", "2").toInt)
    case "word2vec" => Word2VecEmbedder.load(modelDir,
      params.getOrElse("vector_size", "32").toInt)
    case other => throw new IllegalArgumentException(s"unknown embedder '$other'")
  }
}
