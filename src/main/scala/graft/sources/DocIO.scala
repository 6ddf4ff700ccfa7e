package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Document-corpus interchange I/O — JSON Lines, the format the
 * published pretraining pipelines actually ship (Dolma distributes
 * `.jsonl.gz` shards; CommonCrawl derivatives, FineWeb and friends
 * interchange the same way). Parquet (`graft.Tables`, [[VecIO]])
 * stays the PERFORMANCE format — columnar pruning, pushdown,
 * file-level statistics; JSONL is the interchange seam where corpora
 * enter and leave the engine, so the contract here is losslessness
 * and refusal, not speed.
 *
 * Scale shape: both directions are plain distributed scans/sinks —
 * one task per file split on read (gzip members are not splittable:
 * one task per `.gz` shard, which is exactly Dolma's sharding
 * assumption — many ~1 GB shards, parallelism from shard count, so
 * pick `partitionBy`/`repartition` at WRITE time to control shard
 * fan-out), no driver-side data motion anywhere.
 *
 * Reads are schema-ENFORCED and FAILFAST by default: Spark's
 * PERMISSIVE JSON mode silently nulls every column of a corrupt line,
 * which at corpus scale turns a bad shard into millions of
 * empty-text "documents" that dedup, quality filters, and token
 * budgets all then act on — refuse-don't-degrade is the repo
 * convention (`permissive = true` opts into salvage reads, corrupt
 * lines surfacing under `_corrupt_record`).
 */
object DocIO {

  /** Write `df` as JSON Lines. `compression` e.g. `Some("gzip")` for
    * the `.jsonl.gz` shard convention; `partitionBy` for the
    * directory-per-source layout. Text containing newlines, quotes, or
    * any unicode round-trips losslessly (JSON string escaping — spec'd
    * against the adversarial corpus). */
  def writeJsonl(df: DataFrame, path: String,
      compression: Option[String] = None,
      partitionBy: Seq[String] = Nil): Unit = {
    val w0 = df.write.mode("overwrite")
    val w1 = compression.foldLeft(w0)((w, c) => w.option("compression", c))
    val w2 = if (partitionBy.nonEmpty) w1.partitionBy(partitionBy: _*) else w1
    w2.json(path)
  }

  /** Read JSON Lines under an EXPLICIT schema (never inference: an
    * inferred schema is a function of whichever shard subset was
    * sampled — two reads of a growing corpus disagree). FAILFAST by
    * default; see the object doc for why PERMISSIVE is opt-in. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      permissive: Boolean = false): DataFrame = {
    require(!(permissive && schema.fieldNames.contains("_corrupt_record")),
      "schema already has a _corrupt_record column — the permissive read adds " +
        "its own; rename yours or read FAILFAST")
    val mode = if (permissive) "PERMISSIVE" else "FAILFAST"
    val r = spark.read.schema(
        if (permissive) schema.add("_corrupt_record", "string") else schema)
      .option("mode", mode)
    r.json(path)
  }

  /** The same source as a STREAM — the Dolma ingest shape (shards
    * land in a directory, the pipeline consumes them as micro-
    * batches). Explicit schema for the same reason as [[readJsonl]];
    * file-stream sources discover new shards per trigger. */
  def readJsonlStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)
}
