package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY §2.4 fine-print list is the test plan. */
class VecFrameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def books = Seq(
    ("book1", "Dune", 2019.0, "desert planet spice politics"),
    ("book2", "Neuromancer", 2020.0, "hacker matrix artificial intelligence"),
    ("book3", "Foundation", 2021.0, "empire psychohistory mathematics politics"),
    ("book4", "Hyperion", 2022.0, "pilgrims stories time tombs"),
    ("book5", "Snow Crash", 2018.0, "virtual reality linguistics pizza")
  ).toDF("id", "title", "year", "description")

  test("vec() creates a NULL embedding column when absent; idempotent when present (2.4.8)") {
    val vf = VecFrame.vec(books)
    assert(vf.df.columns.contains("embedding"))
    assert(vf.df.filter(col("embedding").isNull).count() == 5)
    // re-wrapping keeps existing values untouched
    val embedded = vf.copy(embedder = Some(HashingEmbedder(8))).embed("description")
    val rewrapped = VecFrame.vec(embedded.df)
    assert(rewrapped.df.filter(col("embedding").isNull).count() == 0)
  }

  test("embed() is incremental by default and recomputes under force (2.4.6)") {
    val vf = VecFrame.vec(books, embedder = Some(HashingEmbedder(8)))
    // pre-embed one row with a sentinel vector
    val sentinel = typedlit(Array.fill(8)(9f))
    val preset = vf.copy(df = vf.df.withColumn("embedding",
      when(col("id") === "book1", sentinel).otherwise(col("embedding"))))
    val incremental = preset.embed("description")
    val kept = incremental.df.filter(col("id") === "book1").head().getSeq[Float](4)
    assert(kept == Seq.fill(8)(9f), "incremental embed must not touch non-NULL rows")
    val forced = preset.embed("description", force = true)
    val replaced = forced.df.filter(col("id") === "book1").head().getSeq[Float](4)
    assert(replaced != Seq.fill(8)(9f), "force=true must recompute")
  }

  test("embed() without embedder fails clearly") {
    intercept[IllegalStateException] { VecFrame.vec(books).embed("description") }
  }

  test("nearest on a collection with zero embedded rows returns empty (2.4.1 guard)") {
    val vf = VecFrame.vec(books)
    assert(vf.nearestVec(Array.fill(8)(1f), n = 3).df.count() == 0)
  }

  test("NULL-embedding rows score exactly 0 and trail the ranking (2.4.1)") {
    val vf = VecFrame.vec(books, embedder = Some(HashingEmbedder(8))).embed("description")
    // null out one row post-embed
    val partial = vf.copy(df = vf.df.withColumn("embedding",
      when(col("id") === "book5", lit(null).cast("array<float>")).otherwise(col("embedding"))))
    val q = partial.embedder.get.embedQuery(spark, "desert planet spice politics")
    val out = partial.nearestVec(q, n = 5, tieBreakers = Seq(asc("id"))).df
      .select("id", "similarity").collect()
    // default min_score = 0 also drops NEGATIVE-cosine rows, exactly as
    // the reference's `similarity >= min_score` filter does (R/core.R:319)
    assert(out.length >= 3 && out.length <= 5)
    val book5 = out.find(_.getString(0) == "book5").get
    assert(book5.getDouble(1) == 0.0)
    assert(out.last.getString(0) == "book5", "NULL row must sort to the tail")
    // and min_score > 0 excludes it
    val filtered = partial.nearestVec(q, n = 5, minScore = 1e-9).df.collect()
    assert(!filtered.exists(_.getAs[String]("id") == "book5"))
  }

  test("self-query ranks the matching row first") {
    val vf = VecFrame.vec(books, embedder = Some(HashingEmbedder(16))).embed("description")
    val top = vf.nearest("desert planet spice politics", n = 1).df.head()
    assert(top.getAs[String]("id") == "book1")
    assert(math.abs(top.getAs[Double]("similarity") - 1.0) < 1e-6)
  }

  test("hybrid keyword score counts duplicate query terms per occurrence (2.4.4)") {
    import graft.operators.Nearest
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha delta")).toDF("id", "text")
    // query 'alpha alpha beta': row1 has alpha+beta -> (1+1+1)/3? NO -
    // alpha counted per query occurrence: hits = [alpha yes, alpha yes, beta yes] = 3/3
    // row2: alpha yes, alpha yes, beta no = 2/3. Duplicate TEXT terms count once.
    val scored = Nearest.topK(df, embCol = "text",
      queryVec = lit(null).cast("array<float>"), n = 10,
      keywordWeight = 1.0, keywordColumn = Some("text"),
      queryText = Some("alpha alpha beta"), tieBreakers = Seq(asc("id")))
    val m = scored.select("id", "similarity").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 1.0)
    assert(math.abs(m(2L) - 2.0 / 3.0) < 1e-12)
  }

  test("keyword score: NULL text scores 0; query casing is normalized (2.4.4)") {
    import graft.operators.Nearest
    val df = Seq((1L, "Alpha Beta"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val scored = Nearest.topK(df, "text", lit(null).cast("array<float>"), n = 10,
      keywordWeight = 1.0, keywordColumn = Some("text"), queryText = Some("ALPHA"),
      tieBreakers = Seq(asc("id")))
    val m = scored.select("id", "similarity").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 1.0 && m(2L) == 0.0)
  }

  test("nearest(k) results are a prefix of nearest(k+1) under the tie-break (2.4.3)") {
    val vf = VecFrame.vec(books, embedder = Some(HashingEmbedder(16))).embed("description")
    val q = vf.embedder.get.embedQuery(spark, "politics empire")
    val top3 = vf.nearestVec(q, n = 3, tieBreakers = Seq(asc("id"))).df.select("id").collect().map(_.getString(0))
    val top4 = vf.nearestVec(q, n = 4, tieBreakers = Seq(asc("id"))).df.select("id").collect().map(_.getString(0))
    assert(top4.take(3).sameElements(top3))
  }

  test("inspect and describe report counts and dim") {
    val vf = VecFrame.vec(books, embedder = Some(HashingEmbedder(8)))
    val partial = vf.copy(df = vf.df.withColumn("embedding",
      when(col("id") === "book1", typedlit(Array.fill(8)(1f))).otherwise(col("embedding"))))
    val info = partial.inspect
    assert(info.nRows == 5 && info.nEmbedded == 1 && info.dim.contains(8) && info.hasEmbedder)
    assert(partial.describe.contains("5 rows"))
    val masked = partial.maskedPreview.select("embedding").collect().map(_.getString(0)).sorted
    assert(masked.count(_ == "<NULL>") == 4 && masked.count(_ == "<embedding>") == 1)
  }

  test("clusterEmbeddings: k clusters over embedded rows, NULL cluster for unembedded (2.4.9)") {
    val vf = VecFrame.vec(books, embedder = Some(HashingEmbedder(16))).embed("description")
    val partial = vf.copy(df = vf.df.withColumn("embedding",
      when(col("id") === "book4", lit(null).cast("array<float>")).otherwise(col("embedding"))))
    val clustered = partial.clusterEmbeddings(nClusters = 2)
    val rows = clustered.df.select("id", "cluster").collect()
    assert(rows.length == 5)
    val b4 = rows.find(_.getString(0) == "book4").get
    assert(b4.isNullAt(1), "unembedded row must get NULL cluster")
    val labels = rows.filterNot(_.isNullAt(1)).map(_.getInt(1)).toSet
    assert(labels.subsetOf(Set(0, 1)) && labels.size == 2)
  }

  test("clusterEmbeddings errors on zero embeddings and on k > n (R/core.R:347-353)") {
    intercept[IllegalStateException] { VecFrame.vec(books).clusterEmbeddings(2) }
    val vf = VecFrame.vec(books, embedder = Some(HashingEmbedder(8))).embed("description")
    intercept[IllegalArgumentException] { vf.clusterEmbeddings(nClusters = 9) }
  }

  test("withEmbeddingColumn: switch activates, promotes when absent, keeps the embedder (§1.1)") {
    val vf = VecFrame.vec(books, embedder = Some(HashingEmbedder(8))).embed("description")
    // switch to a column that does not exist yet → NULL-promoted, like vec()
    val sw = vf.withEmbeddingColumn("embedding_b")
    assert(sw.embeddingCol == "embedding_b")
    assert(sw.df.filter(col("embedding_b").isNull).count() == 5)
    assert(sw.embedder.nonEmpty, "embedding_column switch must not drop embedding_fn")
    // first column's data is untouched, and ops now target the new one
    assert(sw.df.filter(col("embedding").isNull).count() == 0)
    val embeddedB = sw.copy(embedder = Some(HashingEmbedder(4))).embed("title")
    assert(embeddedB.firstValidEmbedding.get.length == 4)
    assert(VecFrame.vec(embeddedB.df).firstValidEmbedding.get.length == 8,
      "original active column must still hold the 8-dim vectors")
    // switching back is idempotent on data
    val back = embeddedB.withEmbeddingColumn("embedding")
    assert(back.firstValidEmbedding.get.length == 8)
  }

  test("withEmbeddingColumn: metadata stamp survives verbs and plain parquet; fromStamped inverts (§1.1)") {
    val vf = VecFrame.vec(books, embedder = Some(HashingEmbedder(8))).embed("description")
      .withEmbeddingColumn("embedding_b")
    def activeOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.schema.fields.filter(f => f.metadata.contains(VecFrame.MetaActive) &&
        f.metadata.getBoolean(VecFrame.MetaActive)).map(_.name).toSeq
    assert(activeOf(vf.df) == Seq("embedding_b"))
    // the previous active keeps its embedding mark, loses active
    val prev = vf.df.schema("embedding").metadata
    assert(prev.getBoolean(VecFrame.MetaEmbedding) && !prev.getBoolean(VecFrame.MetaActive))
    // metadata rides the schema through relational verbs
    assert(activeOf(vf.filter(col("year") > 2019.0).df) == Seq("embedding_b"))
    // and through PLAIN parquet (no sidecar): Spark persists field
    // metadata in its footer schema — fromStamped restores the choice
    val dir = java.nio.file.Files.createTempDirectory("graft_stamp").toString
    vf.df.write.mode("overwrite").parquet(s"$dir/data")
    val restored = VecFrame.fromStamped(spark.read.parquet(s"$dir/data"))
    assert(restored.embeddingCol == "embedding_b")
    // an unstamped frame falls back to the default promotion
    assert(VecFrame.fromStamped(books).embeddingCol == "embedding")
    // switching back flips the stamp, never duplicates it
    assert(activeOf(vf.withEmbeddingColumn("embedding").df) == Seq("embedding"))
  }
}
