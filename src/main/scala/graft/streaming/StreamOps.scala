package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Embedder

/**
 * Structured Streaming surface (SURVEY §2.3 S). The reference has no
 * streaming at all — these are the streaming re-expressions of its
 * batch verbs, built so the SAME transformation runs on a static or a
 * streaming DataFrame (Spark's unified Dataset API): embed-on-arrival,
 * watermarked windowed aggregation, and micro-batch top-k against a
 * static collection via foreachBatch.
 *
 * Scale shape: the embed stage is narrow (no shuffle); the windowed
 * aggregation shuffles only (window, key) partials; watermarks bound
 * state so a 100 TB/day stream doesn't accumulate unbounded windows.
 */
object StreamOps {

  /** Open the events fixture dir as a stream (schema from one batch
    * footer read — streaming sources require an explicit schema). The
    * fixture's nanosecond timestamps get the same long→µs rebuild as
    * the batch path (graft.Tables.normalizeNanoTs). */
  def readEventsStream(spark: SparkSession, path: String,
      globFilter: Option[String] = None): DataFrame = {
    graft.Tables.ensureNanosAsLong(spark) // events-scoped, like the batch path
    // pathGlobFilter lets the stream target one file inside a shared
    // fixture dir (file-stream sources want a directory to monitor)
    val schema = globFilter.foldLeft(spark.read)((r, g) => r.option("pathGlobFilter", g))
      .parquet(path).schema
    val stream = globFilter.foldLeft(spark.readStream.schema(schema))(
      (r, g) => r.option("pathGlobFilter", g)).parquet(path)
    graft.Tables.normalizeNanoTs(stream)
  }

  /** Open one parquet fixture file as a micro-batch stream (schema
    * from a batch footer read, like [[readEventsStream]] but with no
    * events-specific timestamp rebuild) — the generic source for
    * driving a batch-equivalent operator as a real `StreamingQuery`
    * over a bounded fixture. */
  def readParquetStream(spark: SparkSession, dir: String, file: String): DataFrame = {
    // schema memoized per (dir, glob) — the graft.Tables footer-read
    // rationale and the same fixture-immutability caveat
    val schema = streamSchemaCache.computeIfAbsent(s"$dir#$file",
      _ => spark.read.option("pathGlobFilter", file).parquet(dir).schema)
    spark.readStream.schema(schema).option("pathGlobFilter", file).parquet(dir)
  }

  private val streamSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Execute a streaming aggregation to completion against a bounded
    * file source and return the final sink contents: start a real
    * `StreamingQuery` into a memory sink, drain every available
    * micro-batch, stop. This is the batch-equivalence bridge — the same
    * `hourlyTypeStats` plan run as an actual stream produces the exact
    * rows of the batch run, so a streaming execution can share a batch
    * oracle. (Memory sink is driver-resident: correct for bounded
    * fixture drains and tests; production streams write a real sink.) */
  def runToCompletion(aggregated: DataFrame, queryName: String): DataFrame = {
    val spark = aggregated.sparkSession
    val q = aggregated.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }

  /** Tumbling-window counts/sums per event type with a watermark for
    * state cleanup. Works identically on static and streaming frames
    * (modulo the watermark being a no-op in batch). */
  def hourlyTypeStats(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      valueCol: String = "value",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay) else events
    withWm
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("hour"), col(typeCol), col("n"), col("total"))
  }

  /** Sessionize: split each user's event sequence at inactivity gaps —
    * the batch gaps-and-islands formulation (lag + running sum), chosen
    * over `session_window` for engine-portable determinism (the same
    * window algebra runs in the DuckDB oracle). Gap comparison is in
    * integer microseconds on both engines. */
  def sessionize(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      valueCol: String = "value",
      gap: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMicros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapMicros.months == 0,
      s"sessionize gap '$gap' uses months, which have no fixed microsecond " +
        "length — use days/hours/minutes")
    val micros = gapMicros.microseconds + gapMicros.days * 86400000000L
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val isNew = when(
      unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w) > micros, 1)
      .otherwise(when(lag(col(tsCol), 1).over(w).isNull, 1).otherwise(0))
    events
      .withColumn("__new", isNew)
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(col(tsCol)).as("session_start"), count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
  }

  /** Embed-on-arrival: the batch `embed` stage applied to a stream —
    * narrow, stateless, embedder resolved on executors (same contract
    * as graft.Embedder). */
  def embedStream(events: DataFrame, contentCol: String, embedder: Embedder,
      outCol: String = "embedding"): DataFrame =
    embedder.embed(events, contentCol, outCol)

  /** Per-user running aggregate carried in custom state. */
  case class UserRunning(userId: Long, nEvents: Long, totalValue: Double)

  /**
   * Custom stateful streaming via `flatMapGroupsWithState`: a running
   * per-user (count, sum) that emits an updated row per user per
   * micro-batch — the template for any accumulator the built-in
   * windowed aggregates can't express (per-key models, decaying
   * counters, anomaly state machines). State lives in the state store
   * per key; a processing-time timeout would bound it for churning key
   * spaces.
   */
  def runningUserStats(events: DataFrame, userCol: String = "user_id",
      valueCol: String = "value"): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(userCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.nEvents; var total = prev.totalValue
          rows.foreach { case (_, v) => n += 1; total += v }
          val updated = UserRunning(userId, n, total)
          state.update(updated)
          Iterator(updated)
      }
  }

  /** Streaming exact dedup: drop duplicate IDS as they arrive, with a
    * watermark bounding the dedup state (ids older than the delay are
    * forgotten — the only way dedup state survives an unbounded
    * stream). `dropDuplicatesWithinWatermark` keys on the ids ALONE: a
    * redelivered event whose timestamp was refreshed in transit still
    * dedups (an id+ts composite key would wave it through). */
  def dedupStream(events: DataFrame, idCols: Seq[String], tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Micro-batch top-k against a STATIC collection (SURVEY §2.3 S):
    * each arriving batch of embedded queries runs the bounded-heap k-NN
    * join against the indexed corpus; `sink` receives (results,
    * batchId). The corpus broadcast is reused across batches. */
  def nearestPerBatch(
      queries: DataFrame, // streaming, with queryIdCol + queryEmbCol
      corpus: DataFrame, // static
      queryIdCol: String, queryEmbCol: String,
      corpusIdCol: String, corpusEmbCol: String,
      k: Int)(sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.SimJoin.knnJoinAgg(
        batch, corpus, queryIdCol, queryEmbCol, corpusIdCol, corpusEmbCol, k), batchId)
    }.start()

  /** Streaming hard-negative mining (§2.3 S × J): ANCHORS arrive as
    * micro-batches (the training-set-ingest shape — new labeled
    * examples mine their contrastive negatives on arrival), each batch
    * mined against the STATIC corpus index + label table via
    * [[graft.operators.SimJoin.hardNegativesFromIndex]]. Per-anchor
    * decisions are independent of other anchors, so the drained output
    * equals the batch operator restricted to the arrived anchors — the
    * [[nearestPerBatch]] per-batch == batch argument; the frozen index
    * is reused across batches (never refit mid-stream). */
  def hardNegativesPerBatch(
      anchors: DataFrame, // streaming, with idCol + embCol
      index: graft.operators.AnnIndex, // static, frozen
      labels: DataFrame, // static (idCol, labelCol) for the corpus
      idCol: String, embCol: String, labelCol: String,
      k: Int, candidatesPerAnchor: Int, nprobe: Int = 4)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    anchors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.SimJoin.hardNegativesFromIndex(index, batch,
        labels, idCol, embCol, labelCol, k, candidatesPerAnchor, nprobe), batchId)
    }.start()

  /** Streaming batch MMR from the coded index (§2.3 S × J, round 18):
    * QUERIES arrive as micro-batches (the RAG/serving-ingest shape —
    * each arriving request set gets its diversified top-n), each batch
    * served against the STATIC frozen index + raw table via
    * [[graft.operators.Nearest.mmrTopKManyFromIndex]]. Per-QUERY
    * selections are independent of other queries, so the drained
    * output equals the batch operator restricted to the arrived
    * queries — the [[hardNegativesPerBatch]] per-batch == batch
    * argument; the frozen index (any [[graft.operators.AnnIndex]],
    * so the OPQ stack serves through the same door) is reused across
    * batches, never refit mid-stream. */
  def mmrManyFromIndexPerBatch(
      queries: DataFrame, // streaming, with queryIdCol + queryEmbCol
      index: graft.operators.AnnIndex, // static, frozen
      raw: DataFrame, // static (corpusIdCol, corpusEmbCol)
      queryIdCol: String, queryEmbCol: String,
      corpusIdCol: String, corpusEmbCol: String,
      n: Int, lambda: Double, shortlist: Int, nprobe: Int = 4)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.Nearest.mmrTopKManyFromIndex(index, batch, raw,
        queryIdCol, queryEmbCol, corpusIdCol, corpusEmbCol, n, lambda,
        shortlist, nprobe), batchId)
    }.start()

  /** Streaming ANN-INDEX INGEST (§2.3 S × J, r18 VERDICT #1 — the one
    * operator family whose streaming half was missing): DOCUMENTS
    * arrive as micro-batches and land in the SAVED serving layout at
    * `path`, each batch through the full maintenance loop —
    * [[graft.operators.OpqIvfPqIndex.codecGuard]] staleness bands
    * (quiet / warn via `warnSink` / refuse-and-fail-the-stream) →
    * rotation-verified `appendToSaved` → a `layoutStats`-thresholded
    * `compactSaved` cadence (every micro-batch writes new files under
    * each cell; the threshold keeps a long-lived streaming layout from
    * accreting small files). The `index` holds the FROZEN artifacts
    * (rotation, quantizer, codebooks — never refit mid-stream;
    * codecGuard is what detects them going stale). Batch markers +
    * staged files under `$path/_ingest` make checkpoint replays
    * EXACTLY-ONCE, crash windows included (round 20's
    * stage-then-promote protocol) — see
    * [[graft.operators.OpqIvfPqIndex.ingestBatch]] for the exact
    * contract and the no-external-compaction rule while the stream is
    * live.
    *
    * Batch-equivalence argument (the [[nearestPerBatch]] convention):
    * appends are order-insensitive unions into cell partitions, so a
    * drained N-batch stream leaves the layout `appendToSaved` would
    * after the same N batches — spec'd two-batch == two-append, and
    * the `ann_opq_ivfpq_stream_ingest` gate row serves the drained
    * layout against the brute-force oracle. */
  def annIngestPerBatch(docs: DataFrame, // streaming, with embCol
      index: graft.operators.OpqIvfPqIndex, // frozen artifacts
      path: String, embCol: String,
      baselineSelfSim: Option[Double] = None,
      warnSink: String => Unit = _ => (),
      compactFilesPerCell: Int = 64,
      targetFileBytes: Long = 128L << 20): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      index.ingestBatch(path, batch, embCol, batchId, baselineSelfSim,
        warnSink, compactFilesPerCell, targetFileBytes): Unit
    }.start()

  /** [[annIngestPerBatch]] for the PLAIN coded tier (round 19 —
    * every tier with an `appendToSaved` now has a streaming driver):
    * the same marker/guard/append/compact loop via
    * [[graft.operators.IvfPqIndex.ingestBatch]]. `baselineSelfSim` is
    * REQUIRED (this tier persists no build-time baseline — measure
    * with `codecSelfSimilarity` on the build corpus). */
  def ivfPqIngestPerBatch(docs: DataFrame, // streaming, with embCol
      index: graft.operators.IvfPqIndex, // frozen artifacts
      path: String, embCol: String, baselineSelfSim: Double,
      warnSink: String => Unit = _ => (),
      compactFilesPerCell: Int = 64,
      targetFileBytes: Long = 128L << 20): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      index.ingestBatch(path, batch, embCol, batchId, baselineSelfSim,
        warnSink, compactFilesPerCell, targetFileBytes): Unit
    }.start()

  /** [[annIngestPerBatch]] for the VECTOR tier: marker/append/compact
    * with NO codec guard — raw vectors cannot go stale; drift degrades
    * probe cost, not correctness, and is monitored layout-level
    * (see [[graft.operators.IvfIndex.ingestBatch]]'s rationale).
    *
    * DRIFT REPAIR IN THE LOOP (r19 VERDICT #4): pass
    * `repairMaxRows = Some(cap)` and, after each appended batch, the
    * fullest cell's row count is checked against the cap; when it
    * overflows, [[graft.operators.IvfIndex.repairSaved]] runs INSIDE
    * the serial foreachBatch slot — the only place it is safe, since
    * the documented no-external-maintenance window means no concurrent
    * writer can race the hot-cell rewrite — and the loop continues
    * with the REOPENED, widened index, so the next batch's assignment
    * matches the repaired quantizer. A zipf-drifted stream thus
    * self-heals instead of accumulating the hot-cell scan tax until an
    * operator runs the batch repair by hand (ScaleProbe `ivfskew`
    * measures exactly that tax). The check is BATCH-proportional: a
    * resident per-cell occupancy map (nlist-bounded, the centroid
    * array's own bound) initializes from ONE layout count at stream
    * start and then accretes each appended batch's
    * [[graft.operators.IvfIndex.batchCellCounts]] — re-counting the
    * layout happens only AFTER a repair renumbers cells, which the cap
    * makes rare by construction. Two honest costs, stated: (1) the
    * batch assigns twice (once to stage, once to gauge) — batch-scale
    * both times, the price of keeping ingestBatch's signature clean;
    * (2) repairSaved's delete-then-append window is not crash-atomic
    * (its scaladoc), so a JVM crash mid-repair needs the layout
    * restored from a snapshot — same contract as running the repair by
    * hand, now stated where the cadence runs it.
    *
    * RESTART SAFETY: on checkpoint recovery the closure would hold the
    * PRE-repair index (stale, narrower quantizer) while the layout
    * carries the widened one — appending with stale centroids would
    * silently file rows into non-nearest cells. When repair is
    * enabled, each batch first compares the layout sidecar's nlist to
    * the held index and reloads on mismatch — the stream always
    * assigns with the quantizer the layout actually serves. */
  def ivfIngestPerBatch(docs: DataFrame, // streaming, with the index's embCol
      index: graft.operators.IvfIndex, // frozen centroids
      path: String,
      compactFilesPerCell: Int = 64,
      targetFileBytes: Long = 128L << 20,
      repairMaxRows: Option[Long] = None,
      repairSeed: Long = 123L): org.apache.spark.sql.streaming.StreamingQuery = {
    repairMaxRows.foreach(cap => require(cap >= 1L,
      s"repairMaxRows must be >= 1, got $cap"))
    var cur = index // serial foreachBatch slot — single-threaded by contract
    // resident occupancy map (nlist-bounded): null until the first
    // appended batch pays the ONE layout-scale count; thereafter each
    // batch adds its own batch-scale histogram, and only a repair
    // (which renumbers cells) re-reads the layout
    var cellCounts: Map[Int, Long] = null
    def layoutCounts(spark: org.apache.spark.sql.SparkSession): Map[Int, Long] =
      spark.read.parquet(s"$path/data")
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      if (repairMaxRows.isDefined) {
        // re-sync after a restart that lost an earlier repair's handle
        val savedNlist = """"nlist"\s*:\s*(\d+)""".r
          .findFirstMatchIn(
            graft.operators.IvfIndex.readSidecar(spark, path, "_ivf.json"))
          .map(_.group(1).toInt)
        if (savedNlist.exists(_ != cur.centroidVectors.length))
          cur = graft.operators.IvfIndex.load(spark, path)
      }
      val appended = cur.ingestBatch(path, batch, batchId,
        compactFilesPerCell, targetFileBytes)
      // the cap check also runs on a REPLAYED first batch (appended =
      // false, rows already in the layout count): after a repair
      // refusal fails the stream, the restart replays the offending
      // batch as a marker no-op, and skipping the check would leave the
      // layout serving the very scan tax the cap was set to refuse
      // (r20 ADVICE)
      if (appended || cellCounts == null) repairMaxRows.foreach { cap =>
        if (cellCounts == null) cellCounts = layoutCounts(spark)
        else cellCounts = cur.batchCellCounts(batch).foldLeft(cellCounts) {
          case (m, (c, n)) => m.updated(c, m.getOrElse(c, 0L) + n)
        }
        // one split pass per round (repairSaved is single-pass by
        // design — it rewrites ONLY hot cells); iterate bounded until
        // the cap holds, refusing on no progress (the capCells
        // contract: a cell of near-identical vectors cannot be
        // geometry-split — failing the stream loudly beats silently
        // accreting the hot-cell scan tax the cap was set to prevent)
        var worst = if (cellCounts.isEmpty) 0L else cellCounts.values.max
        var rounds = 0
        while (worst > cap && rounds < 4) {
          cur = graft.operators.IvfIndex.repairSaved(spark, path, cap,
            repairSeed + batchId * 16 + rounds)
          cellCounts = layoutCounts(spark) // cells renumbered — re-read
          val next = if (cellCounts.isEmpty) 0L else cellCounts.values.max
          if (next >= worst) throw new IllegalStateException(
            s"streaming drift repair made no progress (fullest cell $worst" +
              s" -> $next rows against cap $cap): the hot cell's vectors " +
              "are too similar for a geometry split — dedup them or raise " +
              "repairMaxRows")
          worst = next; rounds += 1
        }
        if (worst > cap) throw new IllegalStateException(
          s"streaming drift repair: fullest cell still $worst rows after " +
            s"$rounds rounds (cap $cap) — raise repairMaxRows or dedup the " +
            "hot cell")
      }
    }.start()
  }

  /** Streaming eval-set decontamination (SURVEY §2.3 S × D): each
    * arriving micro-batch of documents is decontaminated against a
    * STATIC benchmark set — the ingest-time form of the leak-hygiene
    * step, so contaminated docs never land in the corpus at all
    * instead of being swept later. Structured Streaming has no
    * stream-static left-ANTI join, so this rides the same
    * foreachBatch seam as [[nearestPerBatch]]; since the eval side is
    * static and the decision is per-document, the per-batch result
    * equals the batch operator restricted to the batch's rows —
    * stream output == batch output once drained (spec'd). The eval
    * gram broadcast is planner-built per batch from the same static
    * frame. */
  def decontaminatePerBatch(
      docs: DataFrame, // streaming
      evalDf: DataFrame, // static
      textCol: String, idCol: String, n: Int = 13)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.Dedup.decontaminate(batch, evalDf, textCol, idCol, n), batchId)
    }.start()

  /** Streaming model-based quality scoring — each arriving micro-batch
    * scored against a FROZEN [[graft.operators.Classifier]] model (the
    * deployment shape: the model is fit offline on the reference
    * corpus, ingest scores comparably forever; a per-batch refit would
    * change the scorer under the stream). foreachBatch because the
    * decision is per document against static weights, so per-batch ==
    * batch restricted to the batch's rows — the decontaminate
    * argument. The weights frame is model-sized: pass
    * `broadcastWeights = true` when the vocab is bounded and each
    * micro-batch avoids the token-key shuffle entirely. */
  def scoreClassifierPerBatch(
      docs: DataFrame, // streaming
      model: graft.operators.Classifier.LinearQualityClassifier,
      textCol: String, idCol: String,
      broadcastWeights: Boolean = false)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.Classifier.scoreAgainst(batch, model, textCol, idCol,
        broadcastWeights = broadcastWeights), batchId)
    }.start()

  /** Streaming DSIR importance scoring — each arriving micro-batch
    * scored against a FROZEN [[graft.operators.TextAnalysis.DsirModel]]
    * (the deployment shape: fit once on (target, raw-sample), score
    * the ingest forever; a per-batch refit would change the importance
    * scale under the stream). foreachBatch because the score is per
    * document against the static B-bounded ratios broadcast —
    * per-batch == batch restricted to the batch's rows. */
  def dsirScorePerBatch(
      docs: DataFrame, // streaming
      model: graft.operators.TextAnalysis.DsirModel,
      textCol: String, idCol: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.TextAnalysis.dsirScoreAgainst(batch, model,
        textCol, idCol), batchId)
    }.start()

  /** Streaming SPFHP packing — each arriving micro-batch packs
    * INDEPENDENTLY (fit the batch's histogram, assign its rows), with
    * one long of carried state: the running pack-id base, so ids
    * never collide across batches. Batch boundaries are pack
    * boundaries — a later batch never back-fills an earlier batch's
    * padding (the honest streaming trade; per-batch
    * `PackStrategy.paddingTokens` quantifies what it costs vs one
    * batch-spanning fit — [[packHistPerBatchCarried]] closes it).
    * foreachBatch because the strategy is a per-corpus driver
    * artifact, not per-key streaming state. Replay-idempotent (r15
    * ADVICE): a checkpoint-replayed micro-batch (failure between sink
    * and commit) rolls the base back to its pre-batch value, so the
    * re-pack ships the SAME ids — unlike a bare running counter,
    * whose replay would shift every subsequent pack id.
    *
    * RESTART limitation (r16 ADVICE, named honestly): the base lives
    * in driver memory only, so pack ids are unique within ONE driver
    * run — a checkpoint-RESUMED query after a process restart starts
    * at base 0 and can reissue ids already shipped. The carried
    * variant closes this with caller-owned state
    * ([[packHistPerBatchCarriedFrom]]); this plain per-batch form
    * keeps the zero-state contract and documents the boundary. */
  def packHistPerBatch(
      docs: DataFrame, // streaming
      lenCol: String, idCol: String,
      maxLen: Int, maxPerPack: Int = 3)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var packBase = 0L
    var last: Option[(Long, Long)] = None // (batchId, base BEFORE it)
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      import graft.operators.TextAnalysis
      last match {
        case Some((id, before)) if id == batchId => packBase = before
        case _ => ()
      }
      last = Some((batchId, packBase))
      val st = TextAnalysis.fitPackStrategy(batch, lenCol, maxLen, maxPerPack)
      sink(TextAnalysis.packWithStrategy(batch, st, lenCol, idCol)
        .withColumn("pack_id", col("pack_id") + packBase), batchId)
      packBase += st.numPacks
    }.start()
  }

  /** [[packHistPerBatch]] with the OPEN PACKS carried across batch
    * boundaries — the padding closer: each batch's fit SEEDS from the
    * previous batch's still-open compositions
    * ([[graft.operators.TextAnalysis.fitPackStrategyFrom]]), so a
    * later batch's short documents back-fill the space an earlier
    * batch left instead of every boundary closing every pack. Carried
    * packs keep the pack ids they already shipped rows under (a
    * batch-2 row landing in a batch-1 pack carries THAT id — the
    * cross-seam share PackHistSpec pins); fresh packs take ids from
    * the running frontier. State is the open (composition, count,
    * base) groups — bounded by the fit's `maxStates` refusal, the
    * "refuse, don't grow" convention. When batches arrive with every
    * length in batch N ≥ every length in batch N+1 (the longest-first
    * order SPFHP itself processes), the drained partition equals the
    * batch operator on the concatenation — not just shifted (spec'd,
    * with the padding-accounting identity across the seam). Same
    * replay-idempotence as [[packHistPerBatch]]: a replayed batch
    * re-packs from its pre-batch carried state — and the same RESTART
    * limitation (r16 ADVICE): state lives in driver memory only, so a
    * checkpoint-resumed query after a process RESTART starts at
    * frontier 0 and can reissue pack ids already shipped. For
    * restart-safe id sequences use [[packHistPerBatchCarriedFrom]],
    * which seeds from and hands back caller-owned state. */
  def packHistPerBatchCarried(
      docs: DataFrame, // streaming
      lenCol: String, idCol: String,
      maxLen: Int, maxPerPack: Int = 3, maxStates: Int = 100000)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    packHistPerBatchCarriedFrom(docs, lenCol, idCol, maxLen, maxPerPack,
      maxStates)(sink)

  /** [[packHistPerBatchCarried]] against CALLER-OWNED state — the
    * restart path (the [[semanticDedupPerBatchBoundedFrom]] contract
    * for the packing tier, closing r16's named restart gap):
    * `initialCarried`/`initialFrontier` seed the first batch's fit
    * from what a previous driver run's `onState` callback persisted —
    * the open (composition, count, base) groups plus the id frontier,
    * plain case-class data a caller serializes however the sink's
    * checkpoint cadence demands. `onState` receives the post-batch
    * (carried, frontier, batchId) AFTER the sink; persisting it on the
    * sink's commit cadence makes a restarted query continue the exact
    * id sequence. A crash BETWEEN sink and state-save is forgiven by
    * the replay-idempotence above: the replayed batch re-packs from
    * the older state and ships the SAME ids the sink already saw —
    * only losing committed batches' state falls back to the documented
    * ids-unique-per-run boundary. */
  def packHistPerBatchCarriedFrom(
      docs: DataFrame, // streaming
      lenCol: String, idCol: String,
      maxLen: Int, maxPerPack: Int = 3, maxStates: Int = 100000,
      initialCarried: Seq[graft.operators.TextAnalysis.PackType] = Nil,
      initialFrontier: Long = 0L,
      onState: (Seq[graft.operators.TextAnalysis.PackType], Long, Long) => Unit =
        (_, _, _) => ())(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.TextAnalysis
    require(initialFrontier >= 0L,
      s"initialFrontier must be >= 0, got $initialFrontier")
    var carried: Seq[TextAnalysis.PackType] = initialCarried
    var frontier = initialFrontier
    var last: Option[(Long, Seq[TextAnalysis.PackType], Long)] = None
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      last match {
        case Some((id, c0, f0)) if id == batchId => carried = c0; frontier = f0
        case _ => ()
      }
      last = Some((batchId, carried, frontier))
      val st = TextAnalysis.fitPackStrategyFrom(batch, lenCol, maxLen,
        maxPerPack, maxStates, carried, frontier)
      sink(TextAnalysis.packWithStrategy(batch, st, lenCol, idCol), batchId)
      carried = st.openTypes
      // monotonic max, NOT st.nextPackId alone: closed packs leave the
      // strategy's types, so the surviving open groups' id frontier can
      // sit below ids already issued — a bare assignment would hand a
      // later batch's fresh packs a closed pack's id
      frontier = math.max(frontier, st.nextPackId)
      onState(carried, frontier, batchId)
    }.start()
  }

  /** Streaming BUDGETED selection (§2.3 S × T, round 17) — the token
    * budget consumed ACROSS batches: each arriving micro-batch selects
    * its own best-scoring prefix against the budget REMAINING after
    * every previous batch ([[graft.operators.TextAnalysis.selectTokenBudget]]
    * per batch), and the carried state is ONE long. Batch boundaries
    * are selection boundaries — a later batch's high scorer cannot
    * evict an earlier batch's shipped doc (the honest streaming trade,
    * the [[packHistPerBatch]] convention); when batches arrive with
    * every score in batch N ≥ every score in batch N+1 (the order
    * SPFHP-style drains honor), the drained selection EQUALS the batch
    * operator on the concatenation (spec'd). Replay-idempotent: a
    * checkpoint-replayed batch rolls `remaining` back to its pre-batch
    * value, so the re-selection ships the SAME rows. Same restart
    * boundary as the pack streams: the carried long lives in driver
    * memory — `initialRemaining`/`onState` are the caller-owned
    * restart path (the [[packHistPerBatchCarriedFrom]] contract). */
  def selectTokenBudgetPerBatch(
      docs: DataFrame, // streaming
      scoreCol: String, idCol: String, tokensCol: String,
      budget: Long, numBuckets: Int = 1024,
      maxBoundaryRows: Long = 2000000L,
      initialRemaining: Option[Long] = None,
      onState: (Long, Long) => Unit = (_, _) => ())(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.TextAnalysis
    require(budget >= 0L, s"budget must be >= 0 tokens, got $budget")
    initialRemaining.foreach(r => require(r >= 0L && r <= budget,
      s"initialRemaining $r must be in [0, budget $budget]"))
    var remaining = initialRemaining.getOrElse(budget)
    var last: Option[(Long, Long)] = None // (batchId, remaining BEFORE it)
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      last match {
        case Some((id, r0)) if id == batchId => remaining = r0
        case _ => ()
      }
      last = Some((batchId, remaining))
      // materialize once: the selection feeds both the sink and the
      // consumed-token census (the family's localCheckpoint convention)
      val sel = TextAnalysis.selectTokenBudget(batch, scoreCol, idCol,
        tokensCol, remaining, numBuckets, maxBoundaryRows)
        .localCheckpoint(true)
      sink(sel, batchId)
      val used = sel.agg(coalesce(sum(col(tokensCol).cast("long")), lit(0L)))
        .head().getLong(0)
      remaining = math.max(0L, remaining - used)
      onState(remaining, batchId)
    }.start()
  }

  /** Streaming paragraph dedup — Dolma's ingest-time paragraph filter
    * made exact and deterministic: each micro-batch is deduped against
    * the paragraphs shipped by ALL previous batches
    * ([[graft.operators.Dedup.dedupParagraphsAcross]]), then the store
    * grows by the batch's shipped paragraphs. foreachBatch because the
    * store is stream-accumulated state driving an anti-join (not a
    * supported streaming join) and the decision is per occurrence, not
    * per key. Both the batch output and the store are localCheckpoint-
    * materialized each batch — the store's lineage would otherwise
    * chain through every batch ever seen. First-arrival order replaces
    * (id, pos) order ACROSS batches, so the drained stream equals the
    * batch operator whenever batch ids arrive in order (spec'd).
    */
  def dedupParagraphsPerBatch(
      docs: DataFrame, // streaming
      textCol: String, idCol: String,
      sep: String = "\n", minLen: Int = 1,
      hashedStore: Boolean = false)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    import spark.implicits._
    // hashedStore swaps the accumulated state from paragraph STRINGS to
    // 128-bit hash pairs (Dedup.paragraphHashFrame) — the corpus-scale
    // store shape (state ∝ 16 bytes per distinct paragraph instead of
    // its text), decision-identical modulo the documented 2⁻¹²⁸ caveat
    var seen =
      if (hashedStore) Seq.empty[(Long, Long)].toDF("__h1", "__h2")
      else Seq.empty[String].toDF("__para")
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val cleaned = (if (hashedStore)
        graft.operators.Dedup
          .dedupParagraphsAcrossHashed(batch, seen, textCol, idCol, sep, minLen)
      else
        graft.operators.Dedup
          .dedupParagraphsAcross(batch, seen, textCol, idCol, sep, minLen))
        .localCheckpoint(true)
      val delta =
        if (hashedStore)
          graft.operators.Dedup.paragraphHashFrame(cleaned, textCol, sep, minLen)
        else graft.operators.Dedup.paragraphFrame(cleaned, textCol, sep, minLen)
      seen = seen.union(delta).distinct().localCheckpoint(true)
      sink(cleaned, batchId)
    }.start()
  }

  /** Streaming EXACT SUBSTRING dedup — the ingest shape of the
    * [[graft.operators.Dedup.removeDuplicateSpans]] tier (the last
    * dedup rung without one, r14 VERDICT #3): each micro-batch's
    * duplicated spans are excised against the accumulated FROZEN gram
    * store ([[graft.operators.Dedup.removeDuplicateSpansAcross]] —
    * store hit ⇒ duplicate, miss ⇒ the batch-internal winner rule),
    * then the store absorbs the RAW batch's distinct gram hashes
    * (raw, not cleaned: the corpus-wide winners live in the raw
    * token stream, and the cleaned text's reassembly seams would
    * otherwise mint grams no document ever contained). State is
    * 8 bytes per distinct corpus gram ([[graft.operators.Dedup.substringGramFrame]]).
    * First-arrival order replaces (id, pos) order ACROSS batches, so
    * the drained stream equals the batch operator whenever batch ids
    * arrive in order (spec'd — the paragraph stream's convention). */
  def dedupSubstringPerBatch(
      docs: DataFrame, // streaming
      textCol: String, idCol: String, k: Int = 13)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    import spark.implicits._
    var seen = Seq.empty[Long].toDF("__gh")
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val cleaned = graft.operators.Dedup
        .removeDuplicateSpansAcross(batch, seen, textCol, idCol, k)
        .localCheckpoint(true)
      seen = seen
        .union(graft.operators.Dedup.substringGramFrame(batch, textCol, idCol, k))
        .distinct().localCheckpoint(true)
      sink(cleaned, batchId)
    }.start()
  }

  /** [[dedupSubstringPerBatch]] on the BOUNDED-memory Bloom store —
    * the substring tier's [[dedupParagraphsPerBatchBloom]] analog
    * (the exact gram store grows 8 B per distinct corpus gram; the
    * filter is `create(expectedItems, fpp)`-sized ONCE). Same
    * per-batch protocol: saturation guard at entry, broadcast
    * snapshot probe, absorb the RAW batch's gram hashes, post-absorb
    * re-check after delivery. One-sided error, note the direction: a
    * false positive EXCISES a never-shipped span (over-delete at
    * ≤ fpp while honestly sized; a recall cost) — a true duplicate
    * never survives. */
  def dedupSubstringPerBatchBloom(
      docs: DataFrame, // streaming
      textCol: String, idCol: String, k: Int = 13,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    dedupSubstringPerBatchBloomFrom(docs, textCol, idCol, k,
      graft.operators.ParaBloom.create(expectedItems, fpp))(sink)

  /** [[dedupSubstringPerBatchBloom]] against a CALLER-OWNED store —
    * the restart path (the [[dedupParagraphsPerBatchBloomFrom]]
    * contract: reopen the persisted filter, resume, save on the
    * sink's checkpoint cadence; bits only ever accumulate, so a crash
    * between save and checkpoint over-excises at most the unsaved
    * batches' spans, never revives old ones). */
  def dedupSubstringPerBatchBloomFrom(
      docs: DataFrame, // streaming
      textCol: String, idCol: String, k: Int,
      bloom: graft.operators.BloomStore,
      warnAtFill: Double = 0.55, refuseAtFill: Double = 0.7)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.ParaBloom.saturationGuard(bloom, warnAtFill, refuseAtFill)
        .foreach(System.err.println)
      val bc = spark.sparkContext.broadcast(bloom.copyStore())
      val cleaned = graft.operators.Dedup
        .removeDuplicateSpansAcrossBloom(batch, bc, textCol, idCol, k)
        .localCheckpoint(true)
      bloom.absorb(
        graft.operators.Dedup.substringGramHashFrame(batch, textCol, idCol, k))
      bc.destroy()
      sink(cleaned, batchId)
      // post-absorb re-check AFTER delivery (r14 ADVICE ordering —
      // see dedupParagraphsPerBatchBloomFrom)
      graft.operators.ParaBloom.saturationGuard(bloom, warnAtFill, refuseAtFill)
        .foreach(System.err.println)
    }.start()
  }

  /** [[dedupParagraphsPerBatch]] on the BOUNDED-memory Bloom store —
    * the shape Dolma actually deploys (a Bloom filter accumulating
    * paragraphs across the whole ingest). Both exact stores grow
    * forever (16 B per distinct paragraph even hashed — TB-scale state
    * at 100 TB, reshuffled into every batch's anti-join); this one is
    * `create(expectedItems, fpp)`-sized ONCE (~9.6 bits/item at
    * fpp = 1%, so 10¹⁰ paragraphs ≈ 12 GB… sharded, or 10⁸/executor-
    * broadcastable at ~120 MB) and NEVER grows — feeding it past
    * `expectedItems` only degrades the false-positive rate, visibly
    * via [[graft.operators.ParaBloom.fillRatio]]. Membership is a
    * broadcast map-side probe (no store shuffle); the per-batch delta
    * is OR-merged from fixed-size per-partition partials
    * ([[graft.operators.ParaBloom.fromHashFrame]] — rows never
    * collect). Error is one-sided: a false positive drops a fresh
    * paragraph (rate ≤ fpp while honestly sized), a duplicate never
    * survives — so the drained output's surviving paragraphs ⊆ the
    * exact store's (spec'd; equality on a properly-sized filter is
    * deterministic per corpus and pinned by the gate row's shared
    * oracle). */
  def dedupParagraphsPerBatchBloom(
      docs: DataFrame, // streaming
      textCol: String, idCol: String,
      sep: String = "\n", minLen: Int = 1,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    dedupParagraphsPerBatchBloomFrom(docs, textCol, idCol, sep, minLen,
      graft.operators.ParaBloom.create(expectedItems, fpp))(sink)

  /** [[dedupParagraphsPerBatchBloom]] on the SHARDED
    * [[graft.operators.ParaBloomBank]] store — the shape past a single
    * filter's 2³¹-bit cap (tens of billions of distinct paragraphs at
    * 100 TB). Same per-batch protocol, same one-sided error; routing
    * is map-side on the probe pair's own hash, so membership stays a
    * broadcast bit-array lookup and the per-batch delta builds as
    * one-shard-sized partials. */
  def dedupParagraphsPerBatchBloomBank(
      docs: DataFrame, // streaming
      textCol: String, idCol: String,
      sep: String = "\n", minLen: Int = 1,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01, numShards: Int = 4)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    dedupParagraphsPerBatchBloomFrom(docs, textCol, idCol, sep, minLen,
      graft.operators.ParaBloomBank.create(expectedItems, fpp, numShards))(sink)

  /** [[dedupParagraphsPerBatchBloom]] against a CALLER-OWNED store —
    * the restart path: reopen the filter persisted at the last
    * checkpoint ([[graft.operators.ParaBloom.load]]), resume the
    * stream against it, and [[graft.operators.ParaBloom.save]] it on
    * whatever cadence matches the sink's checkpoint (the caller holds
    * the reference; saving mid-batch is safe — the store only ever
    * gains bits, so a crash between save and checkpoint re-drops at
    * most the unsaved batches' paragraphs, never re-admits old ones). */
  def dedupParagraphsPerBatchBloomFrom(
      docs: DataFrame, // streaming
      textCol: String, idCol: String,
      sep: String, minLen: Int,
      bloom: graft.operators.BloomStore,
      warnAtFill: Double = 0.55, refuseAtFill: Double = 0.7)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // saturation guard BEFORE any membership decision (r13 VERDICT
      // #5): a store fed past its design capacity is silently dropping
      // more fresh paragraphs than its promised fpp — warn in the soft
      // band, refuse (failing the StreamingQuery, the driftGuard
      // convention) past the hard threshold rather than keep eating
      // data against a saturated filter
      graft.operators.ParaBloom.saturationGuard(bloom, warnAtFill, refuseAtFill)
        .foreach(System.err.println)
      // snapshot-copy before broadcasting: in local mode the broadcast
      // hands tasks the SAME object, and the post-batch merge below
      // must not mutate what a straggling task could still probe
      val bc = spark.sparkContext.broadcast(bloom.copyStore())
      val cleaned = graft.operators.Dedup
        .dedupParagraphsAcrossBloom(batch, bc, textCol, idCol, sep, minLen)
        .localCheckpoint(true)
      bloom.absorb(
        graft.operators.Dedup.paragraphHashFrame(cleaned, textCol, sep, minLen))
      bc.destroy()
      sink(cleaned, batchId)
      // guard AGAIN after absorb + sink (r14 ADVICE): the entry-time
      // check alone lets the batch that pushes the store past
      // refuseAtFill commit its over-drops and fail only one batch
      // late — a single huge batch could sail far past design capacity
      // before anything notices. Re-checking here makes the
      // overfilling batch itself surface the refusal, so no further
      // batch's decisions are ever made against a saturated filter.
      // AFTER sink, not before: the batch's paragraphs are already
      // absorbed, so failing pre-delivery would lose its rows — a
      // checkpoint replay would re-drop them as duplicates.
      graft.operators.ParaBloom.saturationGuard(bloom, warnAtFill, refuseAtFill)
        .foreach(System.err.println)
    }.start()
  }

  /** Streaming SemDeDup — the ingest shape of semantic dedup driven
    * through a real StreamingQuery. NOTE the store here retains FULL
    * survivor vectors forever (d·4 bytes each, re-joined every batch)
    * — at corpus scale prefer [[semanticDedupPerBatchBounded]], which
    * caps per-cell exact state and codes the rest. Each micro-batch
    * assigns map-side
    * to the FROZEN quantizer (`centroidVectors` — fit once, like every
    * frozen artifact in the family: a per-batch refit would move the
    * cells under the stream) and survives only if it matches no
    * RETAINED row in its cell and no earlier-id row of its own batch
    * ([[graft.operators.Dedup.semanticIncrementalSurvivors]]'s greedy
    * rule — first-arrival order replaces id order ACROSS batches, the
    * paragraph stream's convention). The retained store accumulates
    * survivors WITH their cell assignment (localCheckpoint per batch),
    * so the store is never re-assigned — only each batch pays the
    * map-side assignment pass. The cross join compares the batch
    * against the store within cells only: per batch the candidate
    * work is Σ_c |batch_c|·|store_c|, never batch × store. */
  def semanticDedupPerBatch(
      docs: DataFrame, // streaming
      centroidVectors: Array[Array[Float]], // frozen quantizer
      embCol: String, idCol: String, threshold: Double)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{Dedup, IvfIndex}
    var retained: Option[DataFrame] = None // survivors + trusted `cell`
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val base = retained.getOrElse(
        IvfIndex.withCentroids(batch.limit(0), embCol, centroidVectors).indexed)
      val survivors = Dedup.semanticIncrementalSurvivors(batch,
          IvfIndex.fromAssigned(centroidVectors, base, embCol), idCol, threshold)
        .localCheckpoint(true)
      val assigned = IvfIndex.withCentroids(survivors, embCol, centroidVectors).indexed
      retained = Some(retained.map(_.unionByName(assigned)).getOrElse(assigned)
        .localCheckpoint(true))
      sink(survivors, batchId)
    }.start()
  }

  /** [[semanticDedupPerBatch]] on the BOUNDED retained store (r14
    * VERDICT #1): the full-vector store above grows d·4 bytes per
    * survivor forever and re-joins ALL of it against every batch —
    * the semantic tier's analog of the exact paragraph store the
    * Bloom bank replaced. Here each cell retains FULL vectors only
    * for its first `exactCapPerCell` survivors (arrival-then-id
    * order — deterministic); every later survivor is kept as PQ
    * codes + norm against the FROZEN `model` (fit once offline, like
    * the quantizer — m·codeBytes + 8 bytes per row, 16× under d=64
    * float vectors) and screens fresh rows by
    * [[graft.operators.Dedup.semanticBoundedSurvivors]]'s ADC path.
    * Decision contract: EXACT while every cell is under its cap or
    * the model is lossless (the two oracled gate rows); past a cap
    * with a lossy model, the documented one-sided drift — a wrongly
    * retained survivor only causes extra future drops. A cell
    * crossing its cap logs ONCE, naming the cap and the remedy (the
    * [[graft.operators.ParaBloom.saturationGuard]] convention —
    * warn-only, because the coded tier is the design, not a broken
    * contract). */
  def semanticDedupPerBatchBounded(
      docs: DataFrame, // streaming
      centroidVectors: Array[Array[Float]], // frozen quantizer
      model: graft.operators.PqModel, // frozen codec
      embCol: String, idCol: String, threshold: Double,
      exactCapPerCell: Long)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    semanticDedupPerBatchBoundedFrom(docs, centroidVectors, model, None,
      embCol, idCol, threshold, exactCapPerCell)(sink)

  /** [[semanticDedupPerBatchBounded]] against a CALLER-OWNED retained
    * store — the restart path (the [[dedupParagraphsPerBatchBloomFrom]]
    * contract for the semantic tier): `initialStore` is the
    * `(idCol, cell, embCol, __codes, __norm)` frame a previous run's
    * `onStore` callback persisted (plain parquet — write it with
    * `df.write.parquet`, reopen with `spark.read.parquet`); its `cell`
    * column is TRUSTED against the SAME frozen quantizer (the
    * [[graft.operators.IvfIndex.fromAssigned]] invariant — the caller
    * owns it). The per-cell exact census seeds from the store in one
    * opening aggregate; after that, per-batch work is identical.
    * `onStore` receives the UPDATED retained store after each batch —
    * persist it on whatever cadence matches the sink's checkpoint
    * (the store only ever GAINS rows, so a crash between save and
    * checkpoint re-screens at most the unsaved batches' survivors —
    * extra drops, never revived duplicates: the family's one-sided
    * crash story). */
  def semanticDedupPerBatchBoundedFrom(
      docs: DataFrame, // streaming
      centroidVectors: Array[Array[Float]], // frozen quantizer
      model: graft.operators.PqModel, // frozen codec
      initialStore: Option[DataFrame],
      embCol: String, idCol: String, threshold: Double,
      exactCapPerCell: Long,
      onStore: (DataFrame, Long) => Unit = (_, _) => ())(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{Dedup, IvfIndex, PqIndex}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, FloatType}
    require(exactCapPerCell >= 0L,
      s"exactCapPerCell must be >= 0, got $exactCapPerCell")
    initialStore.foreach { st =>
      val need = Set("cell", embCol, "__codes", "__norm", idCol)
      require(need.subsetOf(st.columns.toSet),
        s"initialStore needs columns $need (the semanticDedupPerBatchBounded " +
          s"layout), got ${st.columns.toSeq}")
    }
    var retained: Option[DataFrame] = initialStore
    val exactCount = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    // seed the per-cell exact census from the reopened store — ONE
    // opening aggregate (ncells rows out), never repeated per batch
    initialStore.foreach(_.where(col(embCol).isNotNull)
      .groupBy("cell").count().collect()
      .foreach(r => exactCount(r.getInt(0)) = r.getLong(1)))
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val store = retained.getOrElse(
        IvfIndex.withCentroids(batch.limit(0), embCol, centroidVectors).indexed
          .select(col(idCol), col("cell"), col(embCol),
            lit(null).cast(BinaryType).as("__codes"),
            lit(null).cast(DoubleType).as("__norm")))
      val survivors = Dedup.semanticBoundedSurvivors(batch, centroidVectors,
        store, model, embCol, idCol, threshold).localCheckpoint(true)
      // fill each cell's remaining exact slots in id order, encode the
      // overflow; `have` is the driver-held per-cell exact census
      // (ncells-bounded — never a store-wide aggregate per batch)
      val have = exactCount.toSeq.toDF("cell", "__have")
      val marked = IvfIndex.withCentroids(survivors, embCol, centroidVectors).indexed
        .select(col(idCol), col("cell"), col(embCol))
        .withColumn("__rk",
          row_number().over(Window.partitionBy("cell").orderBy(col(idCol))))
        .join(broadcast(have), Seq("cell"), "left")
        .withColumn("__exact",
          (col("__rk") + coalesce(col("__have"), lit(0L))) <= exactCapPerCell)
      val exactRows = marked.where(col("__exact"))
        .select(col(idCol), col("cell"), col(embCol),
          lit(null).cast(BinaryType).as("__codes"),
          lit(null).cast(DoubleType).as("__norm"))
      val codedRows = PqIndex.encode(
          marked.where(!col("__exact")).select(col(idCol), col("cell"), col(embCol)),
          embCol, model, "__codes", "__norm")
        .select(col(idCol), col("cell"),
          lit(null).cast(ArrayType(FloatType)).as(embCol),
          col("__codes"), col("__norm"))
      retained = Some(store.unionByName(exactRows.unionByName(codedRows))
        .localCheckpoint(true))
      // cap-crossing telemetry + census update: one ncells-bounded
      // collect over the batch's assignments, never over the store
      marked.groupBy("cell")
        .agg(count(lit(1)).as("__n"),
          sum(when(col("__exact"), 1L).otherwise(0L)).as("__ex"))
        .collect().foreach { r =>
          val c = r.getInt(0); val n = r.getLong(1); val ex = r.getLong(2)
          val before = exactCount(c)
          if (before < exactCapPerCell && before + n > exactCapPerCell)
            System.err.println(
              s"WARNING: semanticDedupPerBatchBounded cell $c crossed " +
                s"exactCapPerCell = $exactCapPerCell this batch — its further " +
                "survivors are retained as PQ codes and screened by ADC " +
                "(exact only for a lossless model; raise the cap or refit " +
                "the quantizer with more cells to keep cells under it)")
          exactCount(c) = before + ex
        }
      retained.foreach(onStore(_, batchId))
      sink(survivors, batchId)
    }.start()
  }

  /** Streaming CENTROID-SCREEN SemDeDup — the ingest shape of
    * [[graft.operators.Dedup.semanticDedupByCentroid]], and the
    * cheapest state in the whole dedup family: ONE flag per cell
    * ("this cell's ε-ball already has its keeper"), nlist bits total
    * — no vectors, no codes, no hashes. Each micro-batch assigns
    * map-side to the FROZEN quantizer, scores cosine-to-own-centroid
    * against the broadcast centroid table, and a ball member survives
    * only if its cell has no keeper yet AND it is the batch's min-id
    * ball member there (first-arrival order replaces id order ACROSS
    * batches — the family convention, so the drain equals the batch
    * operator whenever batch ids arrive in order; spec'd two-batch).
    * Non-ball and null-embedding rows always survive. */
  /** One micro-batch of the centroid-screen greedy, against the
    * carried keeper set: survivors (materialized) + the cells this
    * batch newly claimed. Shared by [[semanticDedupByCentroidPerBatch]]
    * and the [[pipelinePretrainPerBatch]] semantic stage — one body,
    * so the standalone gate row and the chain stage can never drift. */
  private def centroidScreenStep(batch: DataFrame,
      centroidVectors: Array[Array[Float]], embCol: String, idCol: String,
      eps: Double, claimed: Seq[Int]): (DataFrame, Array[Int]) = {
    import graft.operators.IvfIndex
    val spark = batch.sparkSession
    import spark.implicits._
    val cents = centroidVectors.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("cell", "__cent")
    val scoredB = IvfIndex.withCentroids(batch, embCol, centroidVectors).indexed
      .join(broadcast(cents), "cell")
      .withColumn("__ball", graft.functions.vectors.cosine_similarity(
        col(embCol), col("__cent")) >= lit(1.0) - lit(eps))
    // per-cell min id among this batch's ball members in UNCLAIMED
    // cells — nlist-bounded, broadcast back
    val newMins = scoredB.where(col("__ball") &&
        (if (claimed.isEmpty) lit(true) else !col("cell").isin(claimed: _*)))
      .groupBy("cell").agg(min(col(idCol)).as("__min"))
    val survivors = scoredB
      .join(broadcast(newMins), Seq("cell"), "left")
      .where(!col("__ball") || col(idCol) === col("__min"))
      .drop("cell", "__cent", "__ball", "__min")
      .unionByName(batch.where(col(embCol).isNull), allowMissingColumns = true)
      .select(batch.columns.map(col).toIndexedSeq: _*)
      .localCheckpoint(true)
    (survivors, newMins.select("cell").collect().map(_.getInt(0)))
  }

  def semanticDedupByCentroidPerBatch(
      docs: DataFrame, // streaming
      centroidVectors: Array[Array[Float]], // frozen quantizer
      embCol: String, idCol: String, eps: Double)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    require(eps > 0 && eps <= 1,
      s"eps must be in (0, 1] (ball = cosine >= 1 - eps), got $eps")
    // refuse-don't-wedge (r15 ADVICE — the batch operator's guard):
    // these names ride the per-batch joins; a clash would kill the
    // query with an ambiguous-reference error on the first batch
    val clash = docs.columns.toSet.intersect(
      Set("cell", "__cent", "__ball", "__min"))
    require(clash.isEmpty,
      s"semanticDedupByCentroidPerBatch reserves column name(s) " +
        s"${clash.mkString(", ")} — rename them on the input stream")
    val keeperCells = scala.collection.mutable.Set.empty[Int]
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val (survivors, newCells) = centroidScreenStep(batch, centroidVectors,
        embCol, idCol, eps, keeperCells.toSeq)
      keeperCells ++= newCells
      sink(survivors, batchId)
    }.start()
  }

  /** The INGEST-TIME pretraining pipeline — the streaming composition
    * of the batch `pipeline_pretrain` chain, every corpus-derived
    * artifact FROZEN so the stream cannot drift under itself:
    * per-batch paragraph dedup against the accumulated seen-store
    * (hashed 128-bit by default — 16 bytes of state per distinct
    * paragraph), 13-gram decontamination against the static eval set,
    * LM scoring against a frozen [[graft.operators.TextAnalysis.UnigramLm]]
    * (a per-batch refit would change the model under the stream —
    * the reason [[graft.operators.TextAnalysis.lmScoreAgainst]]
    * exists), and head/middle/tail labeling against frozen
    * [[graft.operators.TextAnalysis.bucketBoundaries]] (per-batch
    * quantiles would re-cut each batch under itself). `sink` receives
    * each batch's shippable rows (buckets in `shipLabels`) as FULL
    * document rows — the cleaned text and every other input column
    * ride along with (n_toks, lm_nll, bucket); zero-token documents
    * are absent (no surprisal to average, nothing to train on).
    *
    * ONE foreachBatch: the paragraph store is the only accumulated
    * state (localCheckpoint-materialized per batch); everything else
    * is a pure per-document decision, so the drained stream equals
    * the frozen-artifact batch pipeline over the concatenated corpus
    * whenever batch ids arrive in order (spec'd two-batch; the gate
    * row's one-file fixture makes stream == batch == the
    * `pipeline_pretrain` oracle). */
  def pipelinePretrainPerBatch(
      docs: DataFrame, // streaming
      evalDf: DataFrame, // static
      model: graft.operators.TextAnalysis.UnigramLm, // frozen
      boundaries: DataFrame, // frozen (group, __b) from bucketBoundaries
      textCol: String, idCol: String, groupCol: String,
      sep: String = "\n", minLen: Int = 1, n: Int = 13,
      labels: Seq[String] = Seq("head", "middle", "tail"),
      shipLabels: Seq[String] = Seq("head", "middle"),
      quantizeDp: Int = 6,
      hashedStore: Boolean = true,
      // the BOUNDED store (round 14): when set, the dedup stage runs
      // against this caller-owned ParaBloom/ParaBloomBank instead of
      // the accumulated exact store — the only deployable shape at
      // 100 TB (the exact hashed store is ~16 B/paragraph FOREVER and
      // re-shuffles into every batch); the saturation guard runs per
      // batch, and `hashedStore` is ignored. Same save/restart
      // protocol as dedupParagraphsPerBatchBloomFrom.
      bloomStore: Option[graft.operators.BloomStore] = None,
      // the EXACT SUBSTRING stage (round 15): when set, each batch's
      // paragraph-deduped text is excised against the accumulated
      // frozen gram store before decontamination (the Lee et al.
      // placement the batch `pipeline_pretrain_substr` row pins);
      // the store absorbs the STAGE INPUT's grams (the
      // paragraph-deduped text — the corpus the batch operator's
      // winner rule ranges over), 8 bytes per distinct gram.
      substringK: Option[Int] = None,
      // the BOUNDED gram store (round 15): when set (requires
      // substringK), the substring stage runs against this
      // caller-owned ParaBloom/ParaBloomBank instead of the
      // accumulated exact gram frame — the exact store grows 8 B per
      // distinct corpus gram FOREVER and re-shuffles into every
      // batch's semi-join; the filter is sized once and probes
      // map-side off a broadcast. Same per-batch protocol as
      // `bloomStore`: saturation guard at entry, broadcast snapshot
      // probe, absorb the stage input's gram hashes, post-absorb
      // re-check after delivery. One-sided at ≤ fpp toward
      // over-EXCISE (a never-shipped span lost — a recall cost); a
      // truly duplicated span can never survive.
      substringBloom: Option[graft.operators.BloomStore] = None,
      // the SEMANTIC tier (round 16): when set, each batch's
      // dedup survivors pass the centroid-screen SemDeDup between the
      // exact-dedup stages and decontamination — the Dolma/DCLM chain
      // placement. The docs stream carries text, not vectors, so the
      // stage joins a STATIC embedding side table per batch (left
      // join: docs without a vector are un-screenable and survive,
      // the null-embedding rule); the only carried state is one
      // keeper flag per cell (nlist bits — the cheapest store in the
      // family), so the drain equals the batch chain whenever batch
      // ids arrive in order (the family convention; spec'd two-batch).
      semdedup: Option[SemdedupCentroidStage] = None)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{Dedup, TextAnalysis}
    val spark = docs.sparkSession
    import spark.implicits._
    var seenGrams = Seq.empty[Long].toDF("__gh")
    val semKeepers = scala.collection.mutable.Set.empty[Int]
    semdedup.foreach { stage =>
      val clash = docs.columns.toSet.intersect(
        Set(stage.embCol, "cell", "__cent", "__ball", "__min"))
      require(clash.isEmpty,
        s"pipelinePretrainPerBatch's semdedup stage reserves column name(s) " +
          s"${clash.mkString(", ")} — rename them on the input stream")
    }
    // the scoring join carries the FULL document row through to the
    // sink, so the scorer's output names must be free on the input
    // (refuse-don't-wedge: a collision would kill the query with an
    // ambiguous-reference error on the first batch, after it started)
    val clash = docs.columns.toSet.intersect(Set("n_toks", "lm_nll", "bucket"))
    require(clash.isEmpty,
      s"pipelinePretrainPerBatch reserves output column(s) ${clash.mkString(", ")} — " +
        "rename them on the input stream (e.g. a prior scoring pass's columns)")
    require(substringBloom.isEmpty || substringK.nonEmpty,
      "substringBloom without substringK — the bounded gram store only exists " +
        "inside the substring stage; pass substringK to enable it")
    var seen =
      if (hashedStore) Seq.empty[(Long, Long)].toDF("__h1", "__h2")
      else Seq.empty[String].toDF("__para")
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val cleaned = bloomStore match {
        case Some(store) =>
          graft.operators.ParaBloom.saturationGuard(store)
            .foreach(System.err.println)
          val bc = spark.sparkContext.broadcast(store.copyStore())
          val out = Dedup
            .dedupParagraphsAcrossBloom(batch, bc, textCol, idCol, sep, minLen)
            .localCheckpoint(true)
          store.absorb(Dedup.paragraphHashFrame(out, textCol, sep, minLen))
          bc.destroy()
          // post-absorb re-check runs at batch exit, after sink (r14
          // ADVICE — see below): the overfilling batch surfaces the
          // refusal itself, but only after the chain delivers its
          // already-absorbed rows
          out
        case None =>
          val out = (if (hashedStore)
            Dedup.dedupParagraphsAcrossHashed(batch, seen, textCol, idCol, sep, minLen)
          else Dedup.dedupParagraphsAcross(batch, seen, textCol, idCol, sep, minLen))
            .localCheckpoint(true)
          val delta =
            if (hashedStore) Dedup.paragraphHashFrame(out, textCol, sep, minLen)
            else Dedup.paragraphFrame(out, textCol, sep, minLen)
          seen = seen.union(delta).distinct().localCheckpoint(true)
          out
      }
      // optional EXACT SUBSTRING stage (round 15) between paragraph
      // dedup and decon — duplicated spans vs the accumulated gram
      // store excise, the store grows by the stage input's grams
      // (bounded Bloom shape when substringBloom is set)
      val excised = (substringK, substringBloom) match {
        case (Some(k), Some(store)) =>
          graft.operators.ParaBloom.saturationGuard(store)
            .foreach(System.err.println)
          val bc = spark.sparkContext.broadcast(store.copyStore())
          val sx = Dedup
            .removeDuplicateSpansAcrossBloom(cleaned, bc, textCol, idCol, k)
            .localCheckpoint(true)
          store.absorb(Dedup.substringGramHashFrame(cleaned, textCol, idCol, k))
          bc.destroy()
          sx
        case (Some(k), None) =>
          val sx = Dedup
            .removeDuplicateSpansAcross(cleaned, seenGrams, textCol, idCol, k)
            .localCheckpoint(true)
          seenGrams = seenGrams
            .union(Dedup.substringGramFrame(cleaned, textCol, idCol, k))
            .distinct().localCheckpoint(true)
          sx
        case _ => cleaned
      }
      // optional SEMANTIC stage (round 16) between the exact dedup
      // tiers and decon — centroid-screen over the static embedding
      // side table, keeper-cell state carried across batches
      val semScreened = semdedup match {
        case Some(stage) =>
          val withEmb = excised.join(
            stage.emb.select(col(stage.embIdCol).as(idCol), col(stage.embCol)),
            Seq(idCol), "left")
          val (survivors, newCells) = centroidScreenStep(withEmb,
            stage.centroidVectors, stage.embCol, idCol, stage.eps,
            semKeepers.toSeq)
          semKeepers ++= newCells
          survivors.drop(stage.embCol)
        case None => excised
      }
      // materialized: decon feeds BOTH the scoring explode and the
      // payload join below — un-cut it would run the gram explode +
      // anti-join twice per batch
      val decon = Dedup.decontaminate(semScreened, evalDf, textCol, idCol, n)
        .localCheckpoint(true)
      // join the FULL decon frame back: the sink ships documents, so
      // the cleaned text (and every other payload column) must ride
      // along, not just (id, group). Zero-token docs are absent — they
      // have no surprisal to average (lmScoreAgainst's contract) and
      // nothing to pretrain on.
      val scored = TextAnalysis.lmScoreAgainst(decon, model, textCol, idCol)
        .join(decon, idCol)
      val bucketed = TextAnalysis.applyBuckets(scored, boundaries,
        "lm_nll", groupCol, labels, quantizeDp = quantizeDp)
      sink(bucketed.where(col("bucket").isin(shipLabels: _*)), batchId)
      bloomStore.foreach(store =>
        graft.operators.ParaBloom.saturationGuard(store)
          .foreach(System.err.println))
      substringBloom.foreach(store =>
        graft.operators.ParaBloom.saturationGuard(store)
          .foreach(System.err.println))
    }.start()
  }

  /** Config for [[pipelinePretrainPerBatch]]'s semantic-dedup stage:
    * a STATIC embedding side table keyed by `embIdCol` (the docs
    * stream carries text, not vectors), the frozen coarse quantizer,
    * and the ball radius (ball = cosine-to-own-centroid ≥ 1 − eps). */
  case class SemdedupCentroidStage(
      emb: DataFrame, embIdCol: String, embCol: String,
      centroidVectors: Array[Array[Float]], eps: Double) {
    require(eps > 0 && eps <= 1,
      s"eps must be in (0, 1] (ball = cosine >= 1 - eps), got $eps")
  }

  /** Streaming token-budget shard packing — the ingest-time form of
    * [[graft.operators.TextAnalysis.packShards]]: each micro-batch
    * continues the shard sequence from the carried token offset
    * ([[graft.operators.TextAnalysis.packShardsFrom]]), so a stream
    * writes the SAME continuous shard layout a batch run would,
    * batch boundaries landing mid-shard rather than opening one. The
    * only carried state is ONE long (the running token total) — the
    * cheapest `Across` state in the family. Cross-batch order is
    * arrival-then-`orderCol`; the drain equals the batch operator on
    * the concatenation whenever batches arrive in key order (spec'd).
    */
  def packShardsPerBatch(
      docs: DataFrame, // streaming
      tokenCol: String, orderCol: String, budgetTokens: Long,
      nBuckets: Int = 256, outCol: String = "shard")(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var offset = 0L
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val (packed, end) = graft.operators.TextAnalysis.packShardsFrom(
        batch, tokenCol, orderCol, budgetTokens, offset, nBuckets, outCol)
      offset = end
      sink(packed, batchId)
    }.start()
  }

  /** Streaming point-in-time enrichment: each micro-batch of left rows
    * is as-of joined against a STATIC right side (a dimension snapshot
    * — the stream-static temporal join). Since the right side is fixed,
    * the per-batch result equals the batch as-of join restricted to the
    * batch's rows, so stream output == batch output once drained
    * (spec'd). A stream-STREAM as-of would need state-store bookkeeping
    * of the right history per key — out of scope; snapshot enrichment
    * is the common production shape (orders enriched with the latest
    * account state, events with the latest config push).
    */
  def asofEnrichPerBatch(
      left: DataFrame, // streaming
      right: DataFrame, // static
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], rightTieBreak: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    left.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.AsofJoin.backward(
        batch, right, leftKey, rightKey, leftTime, rightTime,
        rightPayload, rightTieBreak), batchId)
    }.start()
}
