package graft.operators

import org.apache.spark.ml.feature.{PCA, StandardScaler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * 2-D projection of the embedding space — the engine half of
 * `viz_embeddings` (/root/reference/R/visualization.R:17-113): drop
 * NULL rows (:28-29), standardize (the reference's `prcomp(scale. =
 * TRUE)`, :58-61), project to the top components, append `x`, `y`
 * (:66-67). Rendering is presentation, not dataflow — out of engine
 * scope, as is UMAP/t-SNE (driver-side O(n²)-ish algorithms with no
 * distributed formulation in spark.ml; `method = pca` is the supported
 * projection, per SURVEY §2 #15).
 *
 * Scale shape: StandardScaler and PCA both reduce via treeAggregate —
 * one pass for moments, one d×d Gramian solved on the driver (fine for
 * d up to a few thousand); the projection itself is a narrow map.
 */
object Project {

  def pca(df: DataFrame, embCol: String, k: Int = 2): DataFrame = {
    val vecCol = "__graft_vec"; val scaledCol = "__graft_scaled"; val pcaCol = "__graft_pca"
    val embedded = df.where(col(embCol).isNotNull)
    val assembled = embedded.withColumn(vecCol, array_to_vector(col(embCol)))
    val scaler = new StandardScaler().setInputCol(vecCol).setOutputCol(scaledCol)
      .setWithMean(true).setWithStd(true)
    val scaled = scaler.fit(assembled).transform(assembled)
    val pcaModel = new PCA().setK(k).setInputCol(scaledCol).setOutputCol(pcaCol).fit(scaled)
    val coords = vector_to_array(col(pcaCol))
    pcaModel.transform(scaled)
      .withColumn("x", coords.getItem(0))
      .withColumn("y", coords.getItem(1))
      .drop(vecCol, scaledCol, pcaCol)
  }
}
