package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real javax.imageio decode path: pixel-exact stats, codec round-trips,
  * corrupt-payload safety, feature invariants. */
class MultimodalImageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val c = (r << 16) | (g << 8) | b
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
    img
  }

  test("decodeImage: hand-built 2x3 PNG decodes to exact pixels") {
    val img = new BufferedImage(2, 3, BufferedImage.TYPE_INT_RGB)
    // column 0 red-ish, column 1 blue-ish, distinct per row
    val px = Array(
      (10, 20, 30), (200, 100, 50),
      (0, 255, 0), (255, 0, 255),
      (1, 2, 3), (4, 5, 6))
    var i = 0
    for (y <- 0 until 3; x <- 0 until 2) {
      val (r, g, b) = px(i); img.setRGB(x, y, (r << 16) | (g << 8) | b); i += 1
    }
    val decoded = Multimodal.decodeImage(png(img)).get
    assert(decoded.getWidth == 2 && decoded.getHeight == 3)
    i = 0
    for (y <- 0 until 3; x <- 0 until 2) {
      val p = decoded.getRGB(x, y)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == px(i), s"pixel ($x,$y)")
      i += 1
    }
  }

  test("decodeImage: null, empty, and corrupt payloads yield None, never throw") {
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImage("not a png at all".getBytes("UTF-8")).isEmpty)
    // valid PNG magic followed by garbage
    val truncated = png(solid(4, 4, 1, 2, 3)).take(20)
    assert(Multimodal.decodeImage(truncated).isEmpty)
  }

  test("synthPng(5): decoded dims and band colors match the documented formulas") {
    val img = Multimodal.decodeImage(Multimodal.synthPng(5L)).get
    assert(img.getWidth == 13 && img.getHeight == 13) // 8+5%9, 8+5%7
    val topPx = img.getRGB(0, 0)
    assert((((topPx >> 16) & 0xff), ((topPx >> 8) & 0xff), (topPx & 0xff)) == ((196, 62, 164)))
    val botPx = img.getRGB(12, 12) // rows >= 13/2=6 are band 2
    assert((((botPx >> 16) & 0xff), ((botPx >> 8) & 0xff), (botPx & 0xff)) == ((0, 160, 16)))
    val boundary = img.getRGB(0, 6)
    assert((boundary & 0xff) == 16, "row h/2 belongs to the bottom band")
  }

  test("imageStats: decoded means are exact; undecodable rows go NULL") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("media", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, png(solid(4, 2, 100, 150, 200))),
      Row(2L, "garbage".getBytes("UTF-8")),
      Row(3L, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = Multimodal.imageStats(df, "media").orderBy("id").collect()
    assert(out(0).getInt(2) == 4 && out(0).getInt(3) == 2)
    assert(out(0).getDouble(4) == 100.0 && out(0).getDouble(5) == 150.0 &&
      out(0).getDouble(6) == 200.0)
    assert(out(1).isNullAt(2) && out(1).isNullAt(4))
    assert(out(2).isNullAt(2) && out(2).isNullAt(4))
  }

  test("imageStats and imageFeatures stay exact on large images (bulk pixel read path)") {
    // 512x384 two-band image — 786k pixels through the bulk getRGB path;
    // integer sums stay exact, so means are closed-form
    val w = 512; val h = 384; val top = h / 2
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (y < top) (200 << 16) | (60 << 8) | 10 else (20 << 16) | (180 << 8) | 250)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("media", BinaryType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, png(img))), 1), schema)
    val stats = Multimodal.imageStats(df, "media").head()
    assert(stats.getInt(2) == w && stats.getInt(3) == h)
    assert(stats.getDouble(4) == (200.0 * top + 20.0 * (h - top)) / h)
    assert(stats.getDouble(5) == (60.0 * top + 180.0 * (h - top)) / h)
    assert(stats.getDouble(6) == (10.0 * top + 250.0 * (h - top)) / h)
    val feats = Multimodal.imageFeatures(img)
    assert(feats.length == 40)
    assert(math.abs(math.sqrt(feats.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
  }

  test("imageFeatures: unit norm, dim = grid^2 + 3*bins, distinct colors differ") {
    val red = Multimodal.imageFeatures(solid(8, 8, 255, 0, 0))
    val blue = Multimodal.imageFeatures(solid(8, 8, 0, 0, 255))
    assert(red.length == 16 + 24 && blue.length == 40)
    def norm(v: Array[Float]): Double = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm(red) - 1.0) < 1e-5)
    assert(math.abs(norm(blue) - 1.0) < 1e-5)
    assert(!red.sameElements(blue))
  }

  test("imageFeatures: resolution-invariant for uniform content") {
    val small = Multimodal.imageFeatures(solid(8, 8, 40, 80, 120))
    val big = Multimodal.imageFeatures(solid(32, 32, 40, 80, 120))
    small.zip(big).foreach { case (a, b) => assert(math.abs(a - b) < 1e-5) }
  }

  test("synthCaption words match the DECODED pixels, not just the id arithmetic") {
    import spark.implicits._
    val ids = (0L until 80L).toDF("doc_id")
    val caps = ids.withColumn("caption",
      Multimodal.synthCaption(col("doc_id"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 80L).foreach { id =>
      val img = Multimodal.decodeImage(Multimodal.synthPng(id)).get
      // derive the caption words from the pixels alone: the top band is
      // uniform, so pixel (0,0) carries (r1,g1,b1); width from the codec
      val p = img.getRGB(0, 0)
      val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      val bright = if (r + g + b >= 384) "bright" else "dark"
      val color = if (r >= g && r >= b) "red" else if (g >= b) "green" else "blue"
      val size = if (img.getWidth >= 12) "wide" else "narrow"
      assert(caps(id) == s"a $bright $color $size image",
        s"caption for doc $id does not describe its decoded image")
    }
  }

  test("multimodal_text_search: every retrieved image's decoded pixels match the query words") {
    val out = SparkEntry.queries("multimodal_text_search")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    // the reported similarity must be reproducible from the DECODED
    // pixels alone: re-derive the caption words from the image, rescore
    // against the query counts, compare to the ranked output
    out.foreach { row =>
      val img = Multimodal.decodeImage(Multimodal.synthPng(row.getLong(0))).get
      val p = img.getRGB(0, 0)
      val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      val hits = Seq(r + g + b >= 384, // "bright"
        r >= g && r >= b, // "red"
        img.getWidth >= 12) // "wide"
        .count(identity)
      // caption always carries 4 vocab words (brightness, color, size,
      // "image") each once -> ||cap|| = 2; query = 3 distinct words
      val expected = hits / (2.0 * math.sqrt(3.0))
      assert(math.abs(row.getDouble(1) - expected) < 1e-6,
        s"doc ${row.getLong(0)}: ranked score ${row.getDouble(1)} is not " +
          s"reproducible from its decoded pixels (expected ~$expected)")
      assert(row.getInt(2) == img.getWidth && row.getInt(3) == img.getHeight)
    }
  }

  test("resizeImages: solid color survives bilinear resize exactly; dims contract; nulls stay null") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("media", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, png(solid(16, 12, 77, 140, 201))),
      Row(2L, "not an image".getBytes("UTF-8")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = Multimodal.imageStats(
      Multimodal.resizeImages(df, "media", w = 4, h = 3).drop("media"), "resized")
      .orderBy("id").collect()
    // columns: (id, resized, width, height, mean_r, mean_g, mean_b);
    // uniform content: every interpolated pixel equals the source color
    assert(out(0).getInt(2) == 4 && out(0).getInt(3) == 3)
    assert(out(0).getDouble(4) == 77.0 && out(0).getDouble(5) == 140.0 &&
      out(0).getDouble(6) == 201.0)
    assert(out(1).isNullAt(2), "undecodable payload must resize to NULL stats")
  }

  test("resizeImageDeterministic: hand-computed lerp, solid invariance, spec'd arithmetic") {
    // 1x2 vertical gradient (rows 100, 200) -> 1x4: sy for output rows
    // 0..3 = (j+0.5)*2/4-0.5 = -0.25, 0.25, 0.75, 1.25; clamped to
    // [0, 1]: 0, 0.25, 0.75, 1 -> values 100, 125, 175, 200 by the
    // documented half-pixel/clamp/round contract (hand-computed)
    val grad = new BufferedImage(1, 2, BufferedImage.TYPE_INT_RGB)
    grad.setRGB(0, 0, (100 << 16) | (100 << 8) | 100)
    grad.setRGB(0, 1, (200 << 16) | (200 << 8) | 200)
    val up = Multimodal.resizeImageDeterministic(grad, 1, 4)
    val got = (0 until 4).map(y => (up.getRGB(0, y) >> 16) & 0xff)
    assert(got == Seq(100, 125, 175, 200), s"hand-computed lerp mismatch: $got")
    // solid color: every interpolated pixel is a convex combination of
    // one value -> survives any resize exactly
    val out = Multimodal.imageStats(
      Multimodal.resizeImagesDeterministic(
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(Row(1L, png(solid(16, 12, 77, 140, 201)))), 1),
          StructType(Seq(StructField("id", LongType),
            StructField("media", BinaryType, nullable = true)))),
        "media", w = 4, h = 3).drop("media"), "resized").collect().head
    assert(out.getInt(2) == 4 && out.getInt(3) == 3)
    assert(out.getDouble(4) == 77.0 && out.getDouble(5) == 140.0 &&
      out.getDouble(6) == 201.0)
    // determinism: byte-identical output across calls (the property
    // Graphics2D does not promise across platforms)
    val a = Multimodal.resizeImageDeterministic(
      Multimodal.decodeImage(Multimodal.synthPng(7L)).get, 6, 5)
    val b = Multimodal.resizeImageDeterministic(
      Multimodal.decodeImage(Multimodal.synthPng(7L)).get, 6, 5)
    val pa = a.getRGB(0, 0, 6, 5, null, 0, 6)
    val pb = b.getRGB(0, 0, 6, 5, null, 0, 6)
    assert(pa.sameElements(pb))
  }

  test("sampleFrames: uniform schedule, duplicate collapse, exact byte slices") {
    assert(Multimodal.sampleFrameIndices(6, 3) == Seq(0, 2, 5))
    assert(Multimodal.sampleFrameIndices(2, 3) == Seq(0, 1)) // duplicates collapse
    assert(Multimodal.sampleFrameIndices(1, 3) == Seq(0))
    assert(Multimodal.sampleFrameIndices(10, 1) == Seq(0))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("media", BinaryType),
      StructField("n_frames", IntegerType)))
    val payload = (0 until 10).map(_.toByte).toArray
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, payload, 5)), 1), schema)
    val frames = Multimodal.sampleFrames(df, "media", "n_frames", k = 3)
      .orderBy("frame_idx").collect()
    // n=5 over 10 bytes -> frames of 2 bytes at indices 0, 2, 4
    assert(frames.map(_.getInt(3)).toSeq == Seq(0, 2, 4))
    assert(frames.map(_.getAs[Array[Byte]](4).toSeq).toSeq ==
      Seq(Seq[Byte](0, 1), Seq[Byte](4, 5), Seq[Byte](8, 9)))
    // NULL payload: scheduled rows with NULL frames (missing data must
    // not hash as identical empty content); NULL n_frames: loud error
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, null, 4)), 1), schema)
    val nullFrames = Multimodal.sampleFrames(withNull, "media", "n_frames", k = 3)
      .collect()
    assert(nullFrames.length == 3 && nullFrames.forall(_.isNullAt(4)))
    val nSchema = StructType(Seq(
      StructField("id", LongType), StructField("media", BinaryType),
      StructField("n_frames", IntegerType, nullable = true)))
    val badN = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(3L, payload, null)), 1), nSchema)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFrames(badN, "media", "n_frames", k = 3).collect()
    }
    assert(e.getMessage != null)
  }

  test("extractImageFeatures over synth PNGs: deterministic, null-safe, 40-dim") {
    import spark.implicits._
    val ids = (0L until 50L).toDF("doc_id").repartition(4)
    val withPng = Multimodal.withSynthPng(ids, "doc_id")
    val run1 = Multimodal.extractImageFeatures(withPng, "media")
      .select("doc_id", "features").orderBy("doc_id").collect()
    val run2 = Multimodal.extractImageFeatures(withPng.repartition(7), "media")
      .select("doc_id", "features").orderBy("doc_id").collect()
    assert(run1.length == 50)
    run1.zip(run2).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      val fa = a.getSeq[Float](1); val fb = b.getSeq[Float](1)
      assert(fa.length == 40 && fa == fb, s"doc ${a.getLong(0)} features drifted")
    }
  }

  test("extractImageFeatures (distributed) is BIT-equal to driver imageFeatures at the oracle config") {
    import spark.implicits._
    // grid=2/bins=4 is the config multimodal_image_query's SQL oracle
    // reproduces closed-form — pin the distributed path to the driver
    // function bit-for-bit so the oracle anchors the whole decode path
    val ids = (0L until 30L).toDF("doc_id").repartition(4)
    val dist = Multimodal.extractImageFeatures(
        Multimodal.withSynthPng(ids, "doc_id"), "media", grid = 2, bins = 4)
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for (id <- 0L until 30L) {
      val local = Multimodal.imageFeatures(
        Multimodal.decodeImage(Multimodal.synthPng(id)).get, grid = 2, bins = 4)
      assert(dist(id).sameElements(local), s"doc $id distributed vs driver features differ")
    }
  }

  test("searchByImage: a rescaled near-duplicate of the query image ranks first") {
    import spark.implicits._
    // synthPng colors cycle mod 256, so a query id sharing a residue
    // with a corpus id (and the same top/h band fraction) has an
    // IDENTICAL resolution-invariant descriptor — a genuine corpus
    // near-duplicate that would legitimately tie the planted twin.
    // 10100 ≡ 116 (mod 256) keeps the colors disjoint from ids 0..49.
    val qid = 10100L
    val qBytes = Multimodal.synthPng(qid)
    // 2x nearest-neighbor upscale of the query image: identical band
    // colors, identical band fractions — the resolution-invariant
    // descriptor scores it ~1.0, the way a re-encoded/resized copy of a
    // photo should outrank unrelated images
    val orig = Multimodal.decodeImage(qBytes).get
    val twin = new BufferedImage(orig.getWidth * 2, orig.getHeight * 2,
      BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until twin.getHeight; x <- 0 until twin.getWidth)
      twin.setRGB(x, y, orig.getRGB(x / 2, y / 2))
    val corpus = (0L until 50L).map(id => (id, Multimodal.synthPng(id))) :+
      (999L, png(twin))
    val feats = Multimodal.extractImageFeatures(
      corpus.toDF("doc_id", "media"), "media").drop("media")
    val top = Multimodal.searchByImage(feats, "features", qBytes, k = 3,
      tieBreakers = Seq(asc("doc_id"))).collect()
    assert(top(0).getLong(0) == 999L, s"near-duplicate did not rank first: ${top.toSeq}")
    val s0 = top(0).getAs[Double]("similarity")
    val s1 = top(1).getAs[Double]("similarity")
    assert(s0 > 0.999, s"near-duplicate similarity unexpectedly low: $s0")
    assert(s0 > s1, "near-duplicate must strictly outrank the best unrelated image")
  }

  test("searchByImage throws on a grid/bins mismatch with the corpus feature column") {
    import spark.implicits._
    val corpus = (0L until 5L).map(id => (id, Multimodal.synthPng(id))).toDF("doc_id", "media")
    val feats = Multimodal.extractImageFeatures(corpus, "media").drop("media") // 40-dim
    val e = intercept[Exception] {
      // 16-dim query descriptor vs 40-dim column: CosineSimilarity
      // would silently score the common prefix — the guard must throw
      Multimodal.searchByImage(feats, "features", Multimodal.synthPng(7L),
        k = 3, grid = 2, bins = 4).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(e).contains("dim"), s"unexpected error: ${messages(e)}")
  }

  test("searchByImage refuses an undecodable query payload") {
    import spark.implicits._
    val feats = Seq((1L, Array(1f, 0f))).toDF("doc_id", "features")
    val e = intercept[IllegalArgumentException] {
      Multimodal.searchByImage(feats, "features", Array[Byte](1, 2, 3), k = 1)
    }
    assert(e.getMessage.contains("could not be decoded"))
  }
}
