package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{Embedder, EmbedderRegistry, VecFrame}

/**
 * Collection persistence — `write_vec` / `read_vec`
 * (/root/reference/R/core.R:412-442). The reference serializes the whole
 * object (data + attrs + embedder closure) as one driver-side qs blob —
 * no partial read, no pushdown, no append. Here the data is a parquet
 * directory (distributed scan/sink, predicate pushdown, schema
 * evolution) and the attrs travel in a `_graft.json` sidecar; embedder
 * model state (e.g. a fitted TF-IDF vocabulary) persists next to it via
 * spark.ml persistence. `read_vec`'s class check (R/core.R:437-439)
 * becomes the sidecar-presence check.
 */
object VecIO {
  private val Sidecar = "_graft.json"

  // Spark bundles Jackson; a real JSON writer/parser means embedder
  // params containing quotes/newlines round-trip instead of corrupting
  // the sidecar, and a params key literally named "name" can't be
  // misread as the embedder name (the old regex parse could do both)
  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def write(vf: VecFrame, path: String): Unit = {
    vf.df.write.mode("overwrite").parquet(s"$path/data")
    vf.embedder.foreach(_.save(s"$path/embedder"))
    val root = mapper.createObjectNode()
    root.put("embedding_column", vf.embeddingCol)
    vf.embedder.foreach { e =>
      val en = root.putObject("embedder")
      en.put("name", e.name)
      val pn = en.putObject("params")
      e.params.foreach { case (k, v) => pn.put(k, v) }
    }
    Files.createDirectories(Paths.get(path))
    Files.write(Paths.get(path, Sidecar),
      mapper.writeValueAsString(root).getBytes(StandardCharsets.UTF_8))
  }

  def read(spark: SparkSession, path: String): VecFrame = {
    val sidecarPath = Paths.get(path, Sidecar)
    if (!Files.exists(sidecarPath))
      throw new IllegalArgumentException(s"$path is not a graft collection (missing $Sidecar)")
    val root = mapper.readTree(Files.readAllBytes(sidecarPath))
    val embCol = Option(root.get("embedding_column")).map(_.asText).getOrElse("embedding")
    val embedder: Option[Embedder] = Option(root.get("embedder")).map { en =>
      val n = Option(en.get("name")).map(_.asText).getOrElse(
        throw new IllegalArgumentException(s"$Sidecar embedder entry lacks a name"))
      val params = Option(en.get("params")).map { pn =>
        val it = pn.fieldNames()
        Iterator.continually(if (it.hasNext) Some(it.next()) else None)
          .takeWhile(_.isDefined).flatten
          .map(k => k -> pn.get(k).asText).toMap
      }.getOrElse(Map.empty[String, String])
      EmbedderRegistry.load(n, params, s"$path/embedder")
    }
    VecFrame(spark.read.parquet(s"$path/data"), embCol, embedder)
  }
}
