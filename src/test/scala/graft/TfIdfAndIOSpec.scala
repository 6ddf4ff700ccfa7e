package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VecIO

/** Vignette golden path (getting-started.Rmd:57-125) + persistence. */
class TfIdfAndIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def books = Seq(
    ("book1", "space opera galactic empire spice desert desert"),
    ("book2", "cyberpunk hacker matrix network network"),
    ("book3", "galactic empire mathematics empire psychohistory"),
    ("book4", "pilgrims time tombs stories network"),
    ("book5", "virtual reality hacker pizza network")
  ).toDF("id", "description")

  test("tfidf: dim equals pruned vocabulary size; vectors reflect the frozen vocab") {
    val emb = TfIdfEmbedder.fit(books, "description", minFreq = 2)
    // terms in >= 2 docs: galactic, empire, hacker, network
    assert(emb.dim == 4)
    val vf = VecFrame.vec(books, embedder = Some(emb)).embed("description")
    assert(vf.inspect.nEmbedded == 5)
    // a doc with no in-vocab terms embeds to the zero vector
    val zero = emb.embedQuery _ // query path errors instead (next test)
    val v1 = vf.df.filter(col("id") === "book1").head().getSeq[Float](2)
    assert(v1.exists(_ != 0f))
  }

  test("tfidf query transform errors on fully out-of-vocabulary queries (2.4.10)") {
    val emb = TfIdfEmbedder.fit(books, "description", minFreq = 2)
    intercept[IllegalArgumentException] { emb.embedQuery(spark, "zzz qqq") }
    // in-vocab query works and finds the hacker books
    val vf = VecFrame.vec(books, embedder = Some(emb)).embed("description")
    val top = vf.nearest("hacker network", n = 2, tieBreakers = Seq(asc("id"))).df
      .select("id").collect().map(_.getString(0)).toSet
    assert(top == Set("book2", "book5"))
  }

  test("write/read round trip preserves data, embedding column name, and embedder (hashing)") {
    val dir = Files.createTempDirectory("graft_io").toString
    val vf = VecFrame.vec(books, embeddingCol = "emb",
      embedder = Some(HashingEmbedder(dim = 8, seed = 7))).embed("description")
    VecIO.write(vf, s"$dir/coll")
    val back = VecIO.read(spark, s"$dir/coll")
    assert(back.embeddingCol == "emb")
    assert(back.embedder.exists { case HashingEmbedder(8, 7) => true; case _ => false })
    assert(back.df.count() == 5)
    assert(back.inspect.nEmbedded == 5)
  }

  test("write/read round trip restores a vocab_count embedder (vocabulary order survives)") {
    val dir = Files.createTempDirectory("graft_io_vc").toString
    val vocab = Seq("network", "hacker", "dystopia")
    val vf = VecFrame.vec(books,
      embedder = Some(VocabCountEmbedder(vocab))).embed("description")
    VecIO.write(vf, s"$dir/coll")
    val back = VecIO.read(spark, s"$dir/coll")
    val restored = back.embedder.get.asInstanceOf[VocabCountEmbedder]
    assert(restored.vocab == vocab, "vocab must restore in order — dims are positional")
    assert(restored.embedQuery(spark, "hacker network hacker").toSeq ==
      Seq(1f, 2f, 0f))
  }

  test("write/read round trip restores a fitted tfidf model (frozen vocabulary survives)") {
    val dir = Files.createTempDirectory("graft_io").toString
    val emb = TfIdfEmbedder.fit(books, "description", minFreq = 2)
    val vf = VecFrame.vec(books, embedder = Some(emb)).embed("description")
    VecIO.write(vf, s"$dir/coll")
    val back = VecIO.read(spark, s"$dir/coll")
    val restored = back.embedder.get.asInstanceOf[TfIdfEmbedder]
    assert(restored.dim == emb.dim)
    assert(restored.embedQuery(spark, "hacker").toSeq == emb.embedQuery(spark, "hacker").toSeq)
  }

  test("word2vec embedder: fixed dim, unit norm, semantic neighbors, persistence round trip") {
    val dir = Files.createTempDirectory("graft_w2v").toString
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
    val emb = Word2VecEmbedder.fit(corpus, "text", vectorSize = 16)
    assert(emb.dim == 16)
    val vf = VecFrame.vec(corpus, embedder = Some(emb)).embed("text")
    assert(vf.inspect.dim.contains(16))
    val norms = vf.df.select(graft.functions.vectors.vector_norm(col("embedding")).as("n"))
      .where(col("n") > 0).count()
    assert(norms > 400, "nearly all docs should embed to unit-norm vectors")
    // query path + persistence
    val q = emb.embedQuery(spark, "batch scan vector")
    assert(q.length == 16)
    VecIO.write(vf, s"$dir/coll")
    val back = VecIO.read(spark, s"$dir/coll")
    val restored = back.embedder.get
    assert(restored.name == "word2vec" && restored.dim == 16)
    assert(restored.embedQuery(spark, "batch scan vector").toSeq == q.toSeq)
  }

  test("read of a non-collection path fails the sidecar check (R/core.R:437-439)") {
    val dir = Files.createTempDirectory("graft_io").toString
    intercept[IllegalArgumentException] { VecIO.read(spark, dir) }
  }
}
