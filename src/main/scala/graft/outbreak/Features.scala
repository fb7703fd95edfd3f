package graft.outbreak

import org.apache.spark.ml.feature.{PCA, StandardScaler}
import org.apache.spark.sql.DataFrame

/** ML feature-space transforms of the reference's EP3 batch path (SURVEY
  * §2.11 M2/M3; reference notebook SparkBatchProcessKmeanPCA.ipynb cells
  * 7-8, re-derived): z-score standardization then PCA(k) projection.
  *
  * Both fits collect only tiny model state to the driver (per-feature
  * stats; a d×k basis); transform is a narrow map — no extra shuffle.
  */
object Features {

  /** StandardScaler (withMean + withStd, matching the notebook). Returns
    * the transformed frame with `outputCol` replacing `featuresCol`. */
  def standardize(assembled: DataFrame, featuresCol: String = "features",
      outputCol: String = "scaled"): DataFrame =
    new StandardScaler()
      .setWithMean(true).setWithStd(true)
      .setInputCol(featuresCol).setOutputCol(outputCol)
      .fit(assembled)
      .transform(assembled)

  /** PCA projection to `k` components (notebook uses k=4). */
  def pca(scaled: DataFrame, k: Int = 4, inputCol: String = "scaled",
      outputCol: String = "pca"): DataFrame =
    new PCA().setK(k).setInputCol(inputCol).setOutputCol(outputCol)
      .fit(scaled)
      .transform(scaled)
}
