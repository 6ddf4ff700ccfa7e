package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns (SURVEY §2.3 / north star): media travels as an
 * opaque `binary` column + a typed metadata struct, the schema that
 * scales — payload bytes stay columnar in parquet, metadata prunes
 * without touching them. The reference's modality model is a file-path
 * probe on the driver (`file.exists`,
 * /root/reference/R/embedders.R:45,112) — a non-starter on executors;
 * an explicit `kind` discriminator replaces it.
 *
 * DECODE IS STUBBED: this container has no image/audio libraries, so
 * `decodeStub` fabricates deterministic pseudo-features from the raw
 * bytes. Everything AROUND the stub is the real contract a production
 * decoder drops into: partition-wise iteration (one decoder init per
 * partition, the reference's model-per-executor pattern), fixed-dim
 * float features, nullable-safe, schema declared up front.
 */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Pack a text column as UTF-8 media bytes — the fixture stand-in for
    * real image/audio payloads. */
  def packTextAsMedia(df: DataFrame, textCol: String, outCol: String = "media"): DataFrame =
    df.withColumn(outCol, encode(col(textCol), "UTF-8"))

  /** Typed metadata from the payload alone (no decode). */
  def withMeta(df: DataFrame, binCol: String, kind: String = "text",
      outCol: String = "meta"): DataFrame =
    df.withColumn(outCol,
      struct(lit(kind).as("kind"), length(col(binCol)).cast("long").as("n_bytes")))

  /**
   * Partition-wise feature extraction over binary media. The
   * `mapPartitions` shape is the real thing — per-partition decoder
   * lifecycle, iterator-in/iterator-out batching; only the inner
   * `decodeStub` is fake. A real deployment replaces `decodeStub` with
   * the model call and nothing else changes.
   */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 16,
      outCol: String = "features"): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    df.mapPartitions { rows =>
      // decoder init would happen HERE, once per partition
      rows.map { row =>
        val bytes = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
        val feats = decodeStub(bytes, dim)
        Row.fromSeq(row.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /** STUB decoder: deterministic bytes → pseudo-features (byte n-gram
    * hashing, L2-normalized). Stands in for image decode / resize /
    * frame-sample + model forward pass. */
  private[graft] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0f)
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      val h = scala.util.hashing.MurmurHash3.bytesHash(
        Array(bytes(i), bytes(math.min(i + 1, bytes.length - 1))), 42)
      out(java.lang.Math.floorMod(h, dim)) += (if (((h >>> 31) & 1) == 0) 1f else -1f)
      i += 1
    }
    var s = 0.0; i = 0
    while (i < dim) { s += out(i).toDouble * out(i); i += 1 }
    val norm = math.sqrt(s)
    if (norm > 0) { i = 0; while (i < dim) { out(i) = (out(i) / norm).toFloat; i += 1 } }
    out
  }
}
