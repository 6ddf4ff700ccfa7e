package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vectors

/**
 * IVF (inverted-file) approximate-nearest-neighbor index — the
 * Spark-native scale path for similarity search (SURVEY §2.3 J / north
 * star). A coarse k-means quantizer assigns every vector to a cell; a
 * query probes only the `nprobe` cells whose centroids score highest,
 * then runs the EXACT top-k inside them. Scanned fraction ≈
 * nprobe/nlist, with exact scores on everything returned (recall is
 * approximate, precision is exact — same contract as
 * SimJoin.approxCosineSelfJoin).
 *
 * Why this shape fits Spark: the cell id is a plain integer column. An
 * indexed corpus written with `.repartition(col("cell"))` +
 * `partitionBy("cell")` parquet gets PARTITION PRUNING on the probe
 * filter — a 1000-executor query touches only nprobe/nlist of the
 * files on disk, no custom storage engine required. The centroid table
 * (nlist × dim floats) broadcasts everywhere.
 *
 * The reference has no index at all (exact scan per query,
 * /root/reference/R/core.R:287-292, "consider FAISS" at README.md:22)
 * — this is the capability its docs defer to external engines,
 * rebuilt on Spark primitives.
 */
class IvfIndex private (
    val centroidVectors: Array[Array[Float]], // index = cell id
    val indexed: DataFrame, // original columns + `cell: int`
    val embCol: String) extends Serializable {

  /** nlist × dim centroid frame: (cell: int, centroid: array<float>). */
  lazy val centroids: DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    centroidVectors.zipWithIndex.map { case (v, i) => (i, v) }
      .toSeq.toDF("cell", "centroid")
  }

  /** Cells a query vector would probe, best centroid first. Pure
    * driver-local arithmetic over the resident centroid array (≤ nlist
    * rows) — no Spark job, so single-query `search` plans exactly one
    * job: the probe-filtered scan. */
  def probeCells(queryVec: Array[Float], nprobe: Int): Array[Int] =
    IvfIndex.probe(centroidVectors, queryVec, nprobe)

  /**
   * ANN top-k: exact scoring restricted to the probed cells. The cell
   * filter is a pushable integer predicate (partition-pruning on a
   * cell-partitioned layout); the tail is the same
   * `TakeOrderedAndProject` shape as exact `nearest`.
   */
  def search(queryVec: Array[Float], k: Int, nprobe: Int = 4,
      method: String = "cosine", simCol: String = "similarity",
      tieBreakers: Seq[Column] = Nil): DataFrame = {
    val cells = probeCells(queryVec, nprobe)
    Nearest.topK(
      indexed.where(col("cell").isin(cells.toIndexedSeq.map(Int.box): _*)),
      embCol, lit(queryVec), n = k, method = method,
      simCol = simCol, tieBreakers = tieBreakers)
  }

  /**
   * Batch ANN: top-k for a whole TABLE of queries, fully distributed —
   * no per-query driver round-trip, so it scales to millions of
   * queries. Plan: broadcast-score queries × centroids → per-query
   * top-nprobe cells (bounded-heap aggregate) → explode probes → join
   * corpus ON CELL (hash join on an int key — only probed cells'
   * vectors meet each query) → exact score → per-query top-k via the
   * bounded-heap aggregate again. Shuffles carry cell ids and k-capped
   * candidate lists, never the corpus².
   */
  def searchMany(queries: DataFrame, queryIdCol: String, queryEmbCol: String,
      corpusIdCol: String, k: Int, nprobe: Int = 4,
      simCol: String = "similarity"): DataFrame = {
    import graft.functions.TopKScored
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    // same long-id buffer contract as SimJoin.knnJoinAgg — reject
    // non-integral ids up front instead of casting them to NULL
    val idType = indexed.schema(corpusIdCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"searchMany buffers corpus ids as long, but '$corpusIdCol' is ${idType.simpleString}")
    val cellScores = centroids.crossJoin(broadcast(queries))
      .select(col(queryIdCol), col("cell").cast("long").as("cell"),
        vectors.cosine_similarity(col("centroid"), col(queryEmbCol)).as("__csim"))
    val probes = cellScores
      .groupBy(col(queryIdCol))
      .agg(TopKScored.column(nprobe)(col("__csim"), col("cell")).as("__cells"))
      .select(col(queryIdCol), explode(col("__cells.id")).as("cell"))
      .select(col(queryIdCol), col("cell").cast("int").as("cell"))
    // two separate broadcasts: the (queryId, cell) probe list is narrow,
    // and each query's embedding ships ONCE — pre-joining them would
    // replicate every embedding nprobe times through the broadcast
    val candidates = indexed
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(queries), Seq(queryIdCol))
    candidates
      .select(col(queryIdCol), col(corpusIdCol).cast("long").as(corpusIdCol),
        vectors.cosine_similarity(col(embCol), col(queryEmbCol)).as(simCol))
      .groupBy(col(queryIdCol))
      .agg(TopKScored.column(k)(col(simCol), col(corpusIdCol)).as("__topk"))
      .select(col(queryIdCol), explode(col("__topk")).as("__e"))
      .select(col(queryIdCol), col("__e.id").as(corpusIdCol), col("__e.score").as(simCol))
  }

  /**
   * Incremental maintenance: assign a NEW batch of vectors to the
   * FROZEN centroids and fold it into the index — production indexes
   * take appends; refitting k-means per append would re-assign the
   * whole corpus (and change every persisted cell file). Assignment is
   * the map-side [[graft.expressions.NearestCell]] codegen expression
   * (centroids ride into generated code; nothing shuffles, only the
   * batch scans), and it reproduces the build-time `KMeansModel
   * .transform` assignment exactly (spec'd), so
   * `withCentroids(a ∪ b) == withCentroids(a).addBatch(b)` row-for-row
   * — the ⊕ `ann_ivf_incremental_exact` proof. The quantizer does NOT
   * learn from appends: monitor [[cellSizeStats]]/[[driftGuard]] and
   * re-fit when drifted data outgrows a cell.
   */
  def addBatch(newDf: DataFrame): IvfIndex =
    new IvfIndex(centroidVectors,
      indexed.unionByName(IvfIndex.assignWithCentroids(newDf, embCol, centroidVectors)),
      embCol)

  /** [[addBatch]] straight into a SAVED layout: the batch's assigned
    * rows append as new files under their `cell=` partitions — existing
    * files are never rewritten, probe-filter pruning keeps working, and
    * a reopened index serves the union (spec'd). */
  def appendToSaved(path: String, newDf: DataFrame): Unit =
    IvfIndex.assignWithCentroids(newDf, embCol, centroidVectors)
      .write.mode("append").partitionBy("cell").parquet(s"$path/data")

  /** Per-cell row counts — the drift gauge for an append-maintained
    * index (one map-combined count aggregation). */
  def cellSizeStats: DataFrame =
    indexed.groupBy("cell").agg(count(lit(1)).as("n"))

  /**
   * Refuse-don't-degrade guard for append drift: if the fullest cell
   * holds more than `maxFactor` × the average, probe cost is no longer
   * ≈ nprobe/nlist of the corpus (a zipf-drifted append concentrates
   * the scan in hot cells — measured in ScaleProbe) and the quantizer
   * should be re-fit. Throws with the offending cells; returns the
   * max/avg factor when healthy. Cells with NO rows count toward the
   * average (an empty cell is exactly what drift looks like).
   */
  def driftGuard(maxFactor: Double = 8.0): Double = {
    require(maxFactor > 1.0, s"maxFactor must exceed 1, got $maxFactor")
    val Array(total, maxN) = cellSizeStats
      .agg(sum(col("n")), max(col("n"))).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val avg = total.toDouble / centroidVectors.length
    val factor = if (avg == 0) 0.0 else maxN / avg
    if (factor > maxFactor) {
      val hot = cellSizeStats.where(col("n") > avg * maxFactor)
        .orderBy(desc("n")).limit(5).collect()
        .map(r => s"cell ${r.getInt(0)}: ${r.getLong(1)} rows").mkString("; ")
      throw new IllegalStateException(
        f"IVF cell imbalance $factor%.1f× exceeds $maxFactor%.1f× the " +
          f"average ($avg%.0f rows/cell) — appended data has drifted from " +
          s"the frozen quantizer; re-fit (IvfIndex.build) or split hot cells [$hot]")
    }
    factor
  }

  /** Persist the corpus cell-partitioned so probe filters prune files. */
  def writePartitioned(path: String): Unit =
    indexed.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Persist the whole index: cell-partitioned data + centroid table +
    * sidecar. A loaded index reads the partitioned layout, so `search`
    * probes prune FILES, not just rows. */
  def save(path: String): Unit = {
    writePartitioned(s"$path/data")
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "_ivf.json"),
      s"""{"embedding_column": "$embCol", "nlist": ${centroidVectors.length}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

object IvfIndex {

  /** Cells a query vector would probe, best centroid first — the
    * coarse-quantizer half shared with the IVFADC composition
    * ([[IvfPqIndex]]). Pure driver-local arithmetic over the resident
    * centroid array (≤ nlist rows), no Spark job. */
  private[operators] def probe(centroidVectors: Array[Array[Float]],
      queryVec: Array[Float], nprobe: Int): Array[Int] = {
    // Mirror Spark's `desc` total order exactly (NaN greatest, -0.0 and
    // +0.0 equal): a plain sortBy(-s) would sort NaN last and order a
    // ±0.0 pair by negation sign instead of the asc-cell tie-break.
    val order = new Ordering[(Double, Int)] {
      def compare(a: (Double, Int), b: (Double, Int)): Int = {
        val c = if (a._1 == b._1) 0 else java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else Integer.compare(a._2, b._2)
      }
    }
    centroidVectors.zipWithIndex
      .map { case (c, i) => (cosineLocal(c, queryVec), i) }
      .sorted(order)
      .take(nprobe).map(_._2)
  }

  /** Double-accumulated cosine, zero-norm → 0 — the same contract as
    * `vectors.cosine_similarity`, evaluated driver-side. */
  private[operators] def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0) 0.0 else dot / d
  }

  /** An index over `df` with a FROZEN, externally-supplied quantizer —
    * the incremental-maintenance entry point ([[IvfIndex.addBatch]]):
    * assignment is a pure function of (vector, centroids), so building
    * from any partition of the corpus and appending the rest yields
    * the identical index. */
  def withCentroids(df: DataFrame, embCol: String,
      centroidVectors: Array[Array[Float]]): IvfIndex =
    new IvfIndex(centroidVectors,
      assignWithCentroids(df, embCol, centroidVectors), embCol)

  /** Map-side frozen-centroid assignment: original columns + `cell`.
    * NULL vectors are excluded, as in [[build]]. */
  private[operators] def assignWithCentroids(df: DataFrame, embCol: String,
      centroidVectors: Array[Array[Float]]): DataFrame = {
    require(centroidVectors.nonEmpty, "centroid table is empty")
    val dim = centroidVectors.head.length
    require(centroidVectors.forall(_.length == dim),
      "ragged centroid table: all centroids must share one dimension")
    val flat = new Array[Float](centroidVectors.length * dim)
    var c = 0
    while (c < centroidVectors.length) {
      System.arraycopy(centroidVectors(c), 0, flat, c * dim, dim)
      c += 1
    }
    import org.apache.spark.sql.graftbridge.ColumnBridge
    df.where(col(embCol).isNotNull)
      .withColumn("cell", ColumnBridge.column(graft.expressions.NearestCell(
        ColumnBridge.expression(col(embCol)), flat, dim)))
  }

  /** Fit the coarse quantizer (seed pinned) and assign every non-NULL
    * vector to its cell. */
  def build(df: DataFrame, embCol: String, nlist: Int = 16,
      seed: Long = 123L): IvfIndex = {
    val vecCol = "__ivf_vec"
    val assembled = df.where(col(embCol).isNotNull)
      .withColumn(vecCol, array_to_vector(col(embCol)))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol(vecCol).setPredictionCol("cell").fit(assembled)
    new IvfIndex(model.clusterCenters.map(_.toArray.map(_.toFloat)),
      model.transform(assembled).drop(vecCol), embCol)
  }

  /** Reopen a saved index. The data scan comes from the cell-partitioned
    * layout, so subsequent probe filters prune at the file level. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_ivf.json")), java.nio.charset.StandardCharsets.UTF_8)
    val embCol = """"embedding_column"\s*:\s*"([^"]*)"""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("embedding")
    // by-name read: a rewritten centroids file with reordered columns
    // must fail by name, not silently misread by ordinal
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cell", "centroid").orderBy("cell").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("centroid").toArray)
    new IvfIndex(cents, spark.read.parquet(s"$path/data"), embCol)
  }
}
