package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
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
 * The image path is REAL: `decodeImage` runs the JDK's `javax.imageio`
 * PNG/JPEG codec on the executor, inside a `mapPartitions` seam that
 * initialises the decoder once per partition (the reference's
 * model-per-executor pattern, /root/reference/R/embedders.R:251-326).
 * Feature extraction (`imageFeatures`) computes a grid-luminance +
 * RGB-histogram descriptor from the decoded pixels — a deterministic
 * stand-in for a neural forward pass with the same shape contract
 * (fixed-dim float vector, L2-normalised).
 *
 * For non-image payloads (text packed as bytes, unknown blobs) the
 * byte-level feature hasher `byteHashFeatures` is the explicit
 * fallback; it never pretends to decode.
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

  // ---------------------------------------------------------------------
  // Real image path (javax.imageio)
  // ---------------------------------------------------------------------

  /** Decode image bytes with the JDK codec. None for null/empty/corrupt
    * payloads — callers surface that as NULL columns, never a crash. */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] = {
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
  }

  /**
   * Deterministic synthetic PNG: two horizontal bands whose dimensions
   * and colors derive from `id` by modular arithmetic an SQL oracle can
   * reproduce. Encoded through the real ImageIO PNG writer, so the
   * decode side exercises the genuine codec (PNG is lossless for RGB —
   * decoded pixels equal these formulas exactly).
   *
   *   width  = 8 + id % 9          (8..16)
   *   height = 8 + id % 7          (8..14)
   *   top band: rows [0, h/2) of color  ((id*37+11)%256, (id*59+23)%256, (id*83+5)%256)
   *   bottom:   rows [h/2, h) of color ((id*101+7)%256, (id*131+17)%256, (id*151+29)%256)
   */
  def synthPng(id: Long): Array[Byte] = {
    val w = (8 + java.lang.Math.floorMod(id, 9L)).toInt
    val h = (8 + java.lang.Math.floorMod(id, 7L)).toInt
    val top = h / 2
    def ch(mul: Long, add: Long): Int = java.lang.Math.floorMod(id * mul + add, 256L).toInt
    val c1 = (ch(37, 11) << 16) | (ch(59, 23) << 8) | ch(83, 5)
    val c2 = (ch(101, 7) << 16) | (ch(131, 17) << 8) | ch(151, 29)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val c = if (y < top) c1 else c2
      var x = 0
      while (x < w) { img.setRGB(x, y, c); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a deterministic PNG payload per row — the distributed
    * image fixture (generation happens on executors, not the driver). */
  def withSynthPng(df: DataFrame, idCol: String, outCol: String = "media"): DataFrame = {
    val idx = df.schema.fieldIndex(idCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = true)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false) // codec init: once per partition, no temp files
      rows.map { row =>
        val png = if (row.isNullAt(idx)) null else synthPng(row.getLong(idx))
        Row.fromSeq(row.toSeq :+ png)
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------------
  // Text↔image bridge (caption pairing)
  // ---------------------------------------------------------------------

  /**
   * Deterministic caption paired with `synthPng(id)` — the text half of
   * the text→image search demo. The words describe the image's actual
   * content (top-band brightness, dominant channel, width class), so a
   * TEXT query against caption embeddings retrieves IMAGE rows whose
   * decoded pixels match the words — the capability the reference's
   * multimodal search leads with (vignettes/getting-started.Rmd:214-218,
   * text and images queried in one space via CLIP-style encoders).
   *
   * JOINT-SPACE SEAM CONTRACT: text→image search needs query text and
   * image content embedded by the SAME space. In production both sides
   * are one neural joint encoder (text tower for the query, image tower
   * for pixels) plugged in behind `graft.Embedder`. In this zero-egress
   * build the image side is caption-mediated — each image's embedding is
   * the text embedding of its deterministic caption — which keeps every
   * downstream stage (shared embedder, cosine ranking, decode-on-
   * retrieve) identical to the neural deployment; only the
   * pixels→vector hop is replaced by the caption pairing. Pure codegen
   * built-ins; MultimodalImageSpec proves caption words match the
   * DECODED pixels, not just the id arithmetic.
   */
  def synthCaption(id: Column): Column = {
    val w = lit(8) + pmod(id, lit(9))
    val r1 = pmod(id * 37 + 11, lit(256))
    val g1 = pmod(id * 59 + 23, lit(256))
    val b1 = pmod(id * 83 + 5, lit(256))
    val brightWord = when(r1 + g1 + b1 >= 384, "bright").otherwise("dark")
    val colorWord = when(r1 >= g1 && r1 >= b1, "red")
      .when(g1 >= b1, "green").otherwise("blue")
    val sizeWord = when(w >= 12, "wide").otherwise("narrow")
    concat_ws(" ", lit("a"), brightWord, colorWord, sizeWord, lit("image"))
  }

  /** The caption vocabulary for `synthCaption` text→image search — the
    * literal vocab a `VocabCountEmbedder` shares between query text and
    * captions (one space, SQL-reproducible). */
  val CaptionVocab: Seq[String] =
    Seq("bright", "dark", "red", "green", "blue", "wide", "narrow", "image")

  /** Per-image stats from DECODED pixels: dimensions + per-channel
    * means. NULLs for undecodable payloads. Pixel sums are exact
    * integers, so the double means are bit-identical across engines. */
  def imageStats(df: DataFrame, binCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val outSchema = df.schema
      .add("width", IntegerType).add("height", IntegerType)
      .add("mean_r", DoubleType).add("mean_g", DoubleType).add("mean_b", DoubleType)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { row =>
        val bytes = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
        decodeImage(bytes) match {
          case Some(img) =>
            val w = img.getWidth; val h = img.getHeight
            // one bulk getRGB per image (not per pixel): same sRGB
            // conversion, one JNI/bounds-checked call instead of w·h
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              i += 1
            }
            val n = (w.toLong * h).toDouble
            // Seq[Any] keeps w/h as Int — a plain Seq(w, h, sr/n, …)
            // silently widens them to Double and breaks the encoder
            Row.fromSeq(row.toSeq ++ Seq[Any](w, h, sr / n, sg / n, sb / n))
          case None =>
            Row.fromSeq(row.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Grid-luminance + RGB-histogram descriptor from decoded pixels:
    * `grid`×`grid` mean-luma cells (Rec. 601 luma, kept in exact
    * rational form (299·R + 587·G + 114·B)/255000) followed by
    * 3×`bins` channel histograms (pixel-count normalised), then
    * L2-normalised. Dim = grid² + 3·bins. Resolution-invariant by
    * construction (cell means, normalised counts) — the property a
    * real embedding would share.
    *
    * Accumulation is EXACT-INTEGER (luma numerators and histogram
    * counts), with one correctly-rounded double division per output
    * dim — so the descriptor of an analytically-known image (e.g. the
    * two-band `synthPng` fixture) is bit-reproducible from closed-form
    * arithmetic in any engine, which is what lets `searchByImage` be
    * oracle-checked end-to-end (same trick as `imageStats`). Integer
    * adds are also cheaper than fp adds in the w·h hot loop. */
  def imageFeatures(img: BufferedImage, grid: Int = 4, bins: Int = 8): Array[Float] = {
    require(grid > 0 && bins > 0, s"grid and bins must be positive, got grid=$grid bins=$bins")
    val w = img.getWidth; val h = img.getHeight
    val cells = grid * grid
    val dim = cells + 3 * bins
    val lumAcc = new Array[Long](cells)   // Σ (299R + 587G + 114B), exact
    val cellCount = new Array[Long](cells)
    val hist = new Array[Long](3 * bins)
    // one bulk getRGB per image — identical sRGB values to per-pixel
    // calls, without w·h crossings of the ColorModel dispatch
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var y = 0
    while (y < h) {
      val gy = math.min(grid - 1, y * grid / h)
      val rowOff = y * w
      var x = 0
      while (x < w) {
        val gx = math.min(grid - 1, x * grid / w)
        val p = px(rowOff + x)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        val cell = gy * grid + gx
        lumAcc(cell) += 299L * r + 587L * g + 114L * b
        cellCount(cell) += 1
        hist(r * bins / 256) += 1
        hist(bins + g * bins / 256) += 1
        hist(2 * bins + b * bins / 256) += 1
        x += 1
      }
      y += 1
    }
    val nPix = (w.toLong * h).toDouble
    val acc = new Array[Double](dim)
    var i = 0
    while (i < cells) {
      if (cellCount(i) > 0) acc(i) = lumAcc(i).toDouble / (cellCount(i) * 255000.0)
      i += 1
    }
    while (i < dim) { acc(i) = hist(i - cells).toDouble / nPix; i += 1 }
    var s = 0.0; i = 0
    while (i < dim) { s += acc(i) * acc(i); i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Float](dim)
    if (norm > 0) { i = 0; while (i < dim) { out(i) = (acc(i) / norm).toFloat; i += 1 } }
    out
  }

  /**
   * Partition-wise feature extraction over binary IMAGE media — the
   * real decode path. Decoder (ImageIO codec registry) initialised once
   * per partition; iterator-in/iterator-out batching; undecodable
   * payloads yield NULL features. A neural deployment swaps
   * `imageFeatures` for the model forward pass and nothing else
   * changes.
   */
  def extractImageFeatures(df: DataFrame, binCol: String, grid: Int = 4,
      bins: Int = 8, outCol: String = "features"): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false),
      nullable = true)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false) // decoder init: once per partition
      rows.map { row =>
        val bytes = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
        val feats = decodeImage(bytes).map(imageFeatures(_, grid, bins)).orNull
        Row.fromSeq(row.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Image-as-query similarity search — the reference's vignette queries
   * an image collection with ANOTHER IMAGE, not text
   * (/root/reference/vignettes/getting-started.Rmd:218: `nearest(images,
   * system.file("images", "dog-on-beach.jpeg", ...))`). The query
   * payload is decoded ONCE on the driver (one image — never a
   * distributed job), its feature vector becomes a broadcast literal,
   * and ranking is the same zero-shuffle scan → codegen cosine →
   * `TakeOrderedAndProject` plan as every other `nearest` path. The
   * corpus side ranks over a PRECOMPUTED feature column
   * (`extractImageFeatures`) — at 100 TB you extract features once at
   * ingest and run every image query against the column, never
   * re-decoding the corpus.
   *
   * `grid`/`bins` must match the values the corpus features were
   * extracted with: a per-row dimension guard rides the feature column
   * and throws on the first mismatched row (CosineSimilarity would
   * otherwise silently score over the common prefix of mismatched
   * lengths and return garbage rankings). NULL features pass through —
   * they score 0, the engine's unembedded-row rule.
   */
  def searchByImage(
      df: DataFrame,
      featCol: String,
      queryImage: Array[Byte],
      k: Int = 5,
      grid: Int = 4,
      bins: Int = 8,
      minScore: Double = 0.0,
      simCol: String = "similarity",
      tieBreakers: Seq[Column] = Nil): DataFrame = {
    val img = decodeImage(queryImage).getOrElse(throw new IllegalArgumentException(
      s"query image payload (${if (queryImage == null) 0 else queryImage.length} bytes) " +
        "could not be decoded by the registered codecs"))
    val qv = imageFeatures(img, grid, bins)
    val guarded = when(col(featCol).isNull || size(col(featCol)) === lit(qv.length),
        col(featCol))
      .otherwise(raise_error(concat(
        lit(s"searchByImage: feature column '$featCol' has dim "),
        size(col(featCol)).cast("string"),
        lit(s" but the query descriptor has dim ${qv.length} — " +
          s"grid/bins ($grid/$bins) must match the extraction config"))))
    val guardCol = "__graft_feat_guard"
    Nearest.topK(df.withColumn(guardCol, guarded), guardCol,
        lit(qv).cast("array<float>"), n = k,
        minScore = minScore, simCol = simCol, tieBreakers = tieBreakers)
      .drop(guardCol)
  }

  // ---------------------------------------------------------------------
  // Resize (real codec path) and frame sampling (codec seam)
  // ---------------------------------------------------------------------

  /** Bilinear resize through Graphics2D — the real JDK raster path. */
  def resizeImage(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /**
   * Bilinear resize with FULLY SPECIFIED arithmetic — the
   * bit-reproducible alternative to [[resizeImage]]'s Graphics2D path
   * (whose interpolation is the platform renderer's business and may
   * differ across JDK builds). A 100 TB training pipeline that resizes
   * at ingest wants the same bytes from every executor, JVM, and
   * backfill run; this kernel promises exactly:
   *
   *   half-pixel source mapping  s = (d + 0.5)·src/dst − 0.5,
   *   clamp-to-edge, 4-tap separable lerp evaluated as
   *   a = (1−fy)·c00 + fy·c01;  b = (1−fy)·c10 + fy·c11;
   *   c = (1−fx)·a + fx·b;  out = ⌊c + 0.5⌋
   *
   * in IEEE-754 double, in THAT order — so any engine replaying the
   * same expressions (the DuckDB oracle does, for the closed-form
   * synthPng fixture) reproduces every output pixel bit-for-bit.
   */
  def resizeImageDeterministic(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val sw = img.getWidth; val sh = img.getHeight
    val px = img.getRGB(0, 0, sw, sh, null, 0, sw)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = (y + 0.5) * sh / h - 0.5
      val syc = math.max(0.0, math.min(sy, sh - 1.0))
      val y0 = math.floor(syc).toInt
      val y1 = math.min(y0 + 1, sh - 1)
      val fy = syc - y0
      var x = 0
      while (x < w) {
        val sx = (x + 0.5) * sw / w - 0.5
        val sxc = math.max(0.0, math.min(sx, sw - 1.0))
        val x0 = math.floor(sxc).toInt
        val x1 = math.min(x0 + 1, sw - 1)
        val fx = sxc - x0
        var rgb = 0
        var shift = 16
        while (shift >= 0) {
          val c00 = (px(y0 * sw + x0) >> shift) & 0xff
          val c01 = (px(y1 * sw + x0) >> shift) & 0xff
          val c10 = (px(y0 * sw + x1) >> shift) & 0xff
          val c11 = (px(y1 * sw + x1) >> shift) & 0xff
          val a = (1.0 - fy) * c00 + fy * c01
          val b = (1.0 - fy) * c10 + fy * c11
          val c = (1.0 - fx) * a + fx * b
          rgb |= math.floor(c + 0.5).toInt << shift
          shift -= 8
        }
        out.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode → resize → re-encode PNG per row (NULL for undecodable
    * payloads) — the standard normalize-resolution stage before a
    * vision model. Same per-partition codec-init seam as the other
    * image stages. */
  def resizeImages(df: DataFrame, binCol: String, w: Int, h: Int,
      outCol: String = "resized"): DataFrame =
    resizeWith(df, binCol, w, h, outCol)(resizeImage)

  /** [[resizeImages]] through the bit-reproducible
    * [[resizeImageDeterministic]] kernel instead of Graphics2D. */
  def resizeImagesDeterministic(df: DataFrame, binCol: String, w: Int, h: Int,
      outCol: String = "resized"): DataFrame =
    resizeWith(df, binCol, w, h, outCol)(resizeImageDeterministic)

  private def resizeWith(df: DataFrame, binCol: String, w: Int, h: Int,
      outCol: String)(kernel: (BufferedImage, Int, Int) => BufferedImage): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = true)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { row =>
        val bytes = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
        val resized = decodeImage(bytes).map { img =>
          val bos = new ByteArrayOutputStream()
          ImageIO.write(kernel(img, w, h), "png", bos)
          bos.toByteArray
        }.orNull
        Row.fromSeq(row.toSeq :+ resized)
      }
    }(Encoders.row(outSchema))
  }

  /** (payload, frameIdx, nFrames) → frame bytes. */
  type FrameExtractor = (Array[Byte], Int, Int) => Array[Byte]

  /** DETERMINISTIC FAKE frame extractor — the stand-in behind the video
    * seam (this container ships no video codec): treats the payload as
    * `nFrames` contiguous byte slices. A real deployment swaps in a
    * codec-backed extractor (initialised per partition, like ImageIO)
    * and nothing else in `sampleFrames` changes. Explicitly NOT a
    * decode; pure integer arithmetic, so an SQL oracle reproduces it. */
  val SliceFrameExtractor: FrameExtractor = (bytes, i, n) => {
    val start = (i.toLong * bytes.length / n).toInt
    val end = ((i + 1).toLong * bytes.length / n).toInt
    java.util.Arrays.copyOfRange(bytes, start, end)
  }

  /** Uniform deterministic frame schedule: k indices spread over
    * [0, nFrames), endpoints included, duplicates collapsed (short
    * clips yield fewer than k). */
  def sampleFrameIndices(nFrames: Int, k: Int): Seq[Int] = {
    require(nFrames > 0 && k > 0, s"need nFrames>0 and k>0, got $nFrames, $k")
    if (k == 1) Seq(0)
    else (0 until k).map(j => ((j.toLong * (nFrames - 1)) / (k - 1)).toInt).distinct
  }

  /** Sample k frames per media row: one output row per (row, frame_idx)
    * with the extracted frame bytes. Index selection and plumbing are
    * real; the default extractor is the documented fake above. */
  def sampleFrames(df: DataFrame, binCol: String, nFramesCol: String, k: Int,
      extractor: FrameExtractor = SliceFrameExtractor,
      idxCol: String = "frame_idx", outCol: String = "frame"): DataFrame = {
    val bi = df.schema.fieldIndex(binCol)
    val ni = df.schema.fieldIndex(nFramesCol)
    val outSchema = df.schema.add(idxCol, IntegerType, nullable = false)
      .add(outCol, BinaryType, nullable = true)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        require(!row.isNullAt(ni),
          s"sampleFrames: NULL $nFramesCol — frame counts must be known up front")
        val n = row.getInt(ni)
        // NULL payload → NULL frames at the scheduled indices (the
        // module's missing-data convention: NULL, never empty bytes —
        // an empty frame would hash as real identical content)
        val bytes = if (row.isNullAt(bi)) null else row.getAs[Array[Byte]](bi)
        sampleFrameIndices(n, k).iterator.map { i =>
          val frame: Any = if (bytes == null) null else extractor(bytes, i, n)
          Row.fromSeq(row.toSeq ++ Seq[Any](i, frame))
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------------
  // Non-image fallback (byte-level feature hashing)
  // ---------------------------------------------------------------------

  /**
   * Partition-wise feature extraction over OPAQUE bytes (text packed as
   * media, unknown blobs): byte-bigram feature hashing. Same seam as
   * `extractImageFeatures`; explicitly NOT a decode — use it when no
   * codec applies.
   */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 16,
      outCol: String = "features"): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = if (row.isNullAt(idx)) null else row.getAs[Array[Byte]](idx)
        val feats = byteHashFeatures(bytes, dim)
        Row.fromSeq(row.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic byte-bigram hashing into `dim` buckets with ±1
    * signs, L2-normalised — a feature hasher for payloads that have no
    * decoder, not a decode. */
  private[graft] def byteHashFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
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
