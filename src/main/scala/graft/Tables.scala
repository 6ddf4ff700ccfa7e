package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture access — one parquet per table under the scale-factor dir
  * (see /root/repo/TESTDATA.md). Reads stay lazy; Catalyst pushes
  * filters/projections into the parquet scan. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark refuses;
    // read it as a nanos long and rebuild the timestamp ourselves. The
    // conf flip is scoped to the one table that needs it, so reading any
    // OTHER table never mutates session state. (No set-then-restore: the
    // conf is consulted again at scan execution, after this returns.)
    if (name == "events") ensureNanosAsLong(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    normalizeNanoTs(df)
  }

  /** Required before any nanos-timestamp parquet read (events). */
  def ensureNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** ns-long → timestamp(µs). Integer division (`DIV`): a double-typed
    * `/ 1000` would pass 2024-epoch nanos (~1.7e18 > 2^53) through a
    * lossy double and corrupt low-order microseconds. */
  def normalizeNanoTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    if (df.columns.contains(tsCol) && df.schema(tsCol).dataType == LongType)
      df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol DIV 1000")))
    else df
}
