package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference ships no tests; its executable spec is the vignette
 * (/root/reference/vignettes/getting-started.Rmd) run under R CMD
 * check. This suite transliterates that golden path end-to-end on the
 * Spark engine: build a books collection, fit TF-IDF on it, embed,
 * search, compose with relational verbs before AND after search,
 * hybrid search, cluster, persist, reload, search again.
 */
class VignetteGoldenPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("the full vignette flow runs on one collection") {
    // vignette:57-76 — the books tibble
    val books = Seq(
      ("book1", "The Martian", "Weir", 2014.0,
        "astronaut stranded on mars survival science potatoes"),
      ("book2", "Project Hail Mary", "Weir", 2021.0,
        "astronaut alien first contact science space survival"),
      ("book3", "Dune", "Herbert", 1965.0,
        "desert planet spice politics empire prophecy"),
      ("book4", "Foundation", "Asimov", 1951.0,
        "empire mathematics psychohistory politics decline"),
      ("book5", "The Hobbit", "Tolkien", 1937.0,
        "dragon treasure journey mountain adventure")
    ).toDF("id", "title", "author", "year", "description")

    // vignette:80-101 — fit TF-IDF on the corpus, vec + embed
    val embedder = TfIdfEmbedder.fit(books, "description", minFreq = 2)
    val vf = VecFrame.vec(books, embedder = Some(embedder)).embed("description")
    assert(vf.inspect.nEmbedded == 5)

    // vignette:109-125 — top-3 nearest with similarity inspection
    val top3 = vf.nearest("astronaut science survival", n = 3,
      tieBreakers = Seq(asc("id"))).df
    val ids3 = top3.select("id").collect().map(_.getString(0)).toSet
    assert(ids3.contains("book1") && ids3.contains("book2"),
      s"the two astronaut books must rank in the top 3, got $ids3")
    assert(top3.select("similarity").collect().forall(_.getDouble(0) >= 0))

    // vignette:131-147 — relational composition before and after search
    val modern = vf.filter(col("year") >= 2000)
      .nearest("astronaut science survival", n = 5, tieBreakers = Seq(asc("id")))
    assert(modern.df.select("id").collect().map(_.getString(0)).toSet
      .subsetOf(Set("book1", "book2")))
    val postFiltered = vf.nearest("empire politics", n = 5,
      tieBreakers = Seq(asc("id")))
      .filter(col("similarity") > 0.1).select(col("title"), col("similarity"))
    assert(postFiltered.df.count() >= 1)

    // vignette:165-170 — hybrid search
    val hybrid = vf.nearest("empire politics", n = 5, keywordWeight = 0.5,
      keywordColumn = Some("description"), tieBreakers = Seq(asc("id"))).df
    val hybridTop = hybrid.select("id").head().getString(0)
    assert(Set("book3", "book4").contains(hybridTop))

    // vignette:178-183 — clustering + group-by summary
    val clustered = vf.clusterEmbeddings(nClusters = 2)
    val themes = clustered.df.filter(col("cluster").isNotNull)
      .groupBy(col("cluster")).agg(first(col("title")).as("theme"), count(lit(1)).as("n"))
    assert(themes.count() == 2)

    // persistence round trip, then search against the reloaded collection
    val dir = java.nio.file.Files.createTempDirectory("graft_vignette").toString
    vf.write(s"$dir/books")
    val reloaded = sources.VecIO.read(spark, s"$dir/books")
    val again = reloaded.nearest("astronaut science survival", n = 3,
      tieBreakers = Seq(asc("id"))).df.select("id").collect().map(_.getString(0)).toSet
    assert(again == ids3, "reloaded collection must answer identically")
  }
}
