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

  def write(vf: VecFrame, path: String): Unit = {
    vf.df.write.mode("overwrite").parquet(s"$path/data")
    vf.embedder.foreach(_.save(s"$path/embedder"))
    val embJson = vf.embedder.map { e =>
      val params = e.params.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
      s""", "embedder": {"name": "${e.name}", "params": $params}"""
    }.getOrElse("")
    val json = s"""{"embedding_column": "${vf.embeddingCol}"$embJson}"""
    Files.createDirectories(Paths.get(path))
    Files.write(Paths.get(path, Sidecar), json.getBytes(StandardCharsets.UTF_8))
  }

  def read(spark: SparkSession, path: String): VecFrame = {
    val sidecarPath = Paths.get(path, Sidecar)
    if (!Files.exists(sidecarPath))
      throw new IllegalArgumentException(s"$path is not a graft collection (missing $Sidecar)")
    val json = new String(Files.readAllBytes(sidecarPath), StandardCharsets.UTF_8)
    // sidecar is engine-written with known shape; a minimal parse keeps
    // the zero-dependency build (no JSON library beyond what Spark ships)
    def field(name: String): Option[String] = {
      val m = s""""$name"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(json)
      m.map(_.group(1))
    }
    val embCol = field("embedding_column").getOrElse("embedding")
    val embedder: Option[Embedder] = field("name").map { n =>
      val params = s""""params"\\s*:\\s*\\{([^}]*)\\}""".r.findFirstMatchIn(json)
        .map(_.group(1)).getOrElse("")
        .split(",").filter(_.contains(":")).map { kv =>
          val Array(k, v) = kv.split(":").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          k -> v
        }.toMap
      EmbedderRegistry.load(n, params, s"$path/embedder")
    }
    VecFrame(spark.read.parquet(s"$path/data"), embCol, embedder)
  }
}
