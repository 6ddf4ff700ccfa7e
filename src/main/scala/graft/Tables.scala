package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture access — one parquet per table under the scale-factor dir
  * (see /root/repo/TESTDATA.md). Reads stay lazy; Catalyst pushes
  * filters/projections into the parquet scan. */
object Tables {
  /** Memoized fixture schemas (r21 optimization, guide §6): a bare
    * `spark.read.parquet(path)` infers the schema with a driver-side
    * footer read on EVERY DataFrame construction — ~200 queries × 4
    * bench passes × 1-3 tables each re-reads the same immutable
    * footers hundreds of times per run. Supplying the schema skips
    * inference entirely; the DATA is still read from parquet on every
    * action (this caches metadata, never rows). Keyed by path under
    * the same fixture-dirs-are-immutable caveat as SparkEntry's index
    * memos: rewriting a parquet at a cached path with a DIFFERENT
    * schema within one JVM would serve the stale schema — callers
    * with mutable paths should use `spark.read.parquet` directly.
    * (The events nanos flag is set before the first events read, so
    * the cached schema is the nanosAsLong form both times.) */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Bound the stale-schema blast radius (r21 ADVICE): the cache is
    * keyed by path alone, so a long-lived JVM (or a test suite reusing
    * paths) that rewrites a parquet with a DIFFERENT schema would be
    * served the stale one. Callers that rewrite a fixture path call
    * this first; production mutable-path callers keep using
    * `spark.read.parquet` directly. */
  def clearSchemaCache(): Unit = schemaCache.clear()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark refuses;
    // read it as a nanos long and rebuild the timestamp ourselves. The
    // conf flip is scoped to the one table that needs it, so reading any
    // OTHER table never mutates session state. (No set-then-restore: the
    // conf is consulted again at scan execution, after this returns.)
    if (name == "events") ensureNanosAsLong(spark)
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val df = spark.read.schema(schema).parquet(path)
    normalizeNanoTs(df)
  }

  /** Required before any nanos-timestamp parquet read (events). */
  def ensureNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** The single adaptation point for fixture-timestamp drift. Two
    * writer variants are normalized to an instant-typed TIMESTAMP:
    *
    *  - ns-long (parquet TIMESTAMP(NANOS) read under `nanosAsLong`) →
    *    timestamp(µs). Integer division (`DIV`): a double-typed
    *    `/ 1000` would pass 2024-epoch nanos (~1.7e18 > 2^53) through
    *    a lossy double and corrupt low-order microseconds.
    *  - TIMESTAMP_NTZ (parquet timestamp[us], `isAdjustedToUTC=false`)
    *    — the fixture's wall-times are UTC instants, so reinterpret
    *    the NTZ wall-clock as UTC explicitly: shift it to the session
    *    zone's wall-clock for the same instant, then cast. Correct
    *    under any session timezone — a bare `cast(ts as timestamp)`
    *    would silently reinterpret the wall-time in whatever zone a
    *    non-UTC launcher happened to run with. (One residual edge: a
    *    DST-observing session zone has one ambiguous wall-hour per
    *    year where the final cast may pick the other offset; every
    *    shipped launcher pins UTC, where no ambiguity exists.)
    */
  def normalizeNanoTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    if (!df.columns.contains(tsCol)) df
    else df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol DIV 1000")))
      case TimestampNTZType =>
        val sessionTz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        // UTC fast path: when the session zone IS UTC (every shipped
        // launcher), the bare cast already reinterprets the NTZ
        // wall-clock as UTC — identical semantics, zero per-row zone
        // arithmetic on the hot events scan (r12's events_hourly
        // regression traced to the unconditional convert_timezone).
        val isUtc =
          try java.time.ZoneId.of(sessionTz).normalized() == java.time.ZoneOffset.UTC
          catch { case _: Throwable => false }
        if (isUtc) df.withColumn(tsCol, col(tsCol).cast(TimestampType))
        else df.withColumn(
          tsCol,
          convert_timezone(lit("UTC"), lit(sessionTz), col(tsCol)).cast(TimestampType))
      case _ => df
    }
}
