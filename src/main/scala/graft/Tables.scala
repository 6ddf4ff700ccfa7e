package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture access — one parquet per table under the scale-factor dir
  * (see /root/repo/TESTDATA.md). Reads stay lazy; Catalyst pushes
  * filters/projections into the parquet scan. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
