package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib models over the embeddings table (array<float> → Vector via
  * the ml.functions bridge — the multimodal-column ↔ MLlib seam from
  * SURVEY.md §2.12).
  *
  * Both are seeded; exact outputs still depend on input partitioning,
  * so they are test-verified (cluster structure, ANN recall) rather
  * than DuckDB-oracled.
  */
object EmbeddingModels {

  /** embeddings with an ml Vector column `vec`. */
  def vectors(embeddings: DataFrame): DataFrame =
    embeddings.withColumn("vec",
      array_to_vector(col("embedding").cast("array<double>")))

  /** Seeded k-means cluster assignment per vector. */
  def kmeansAssign(embeddings: DataFrame, k: Int = 10,
      seed: Long = 42L): DataFrame = {
    val v = vectors(embeddings)
    new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("vec").setPredictionCol("cluster")
      .fit(v).transform(v)
      .select(col("vec_id"), col("label"), col("cluster"))
  }

  /** Euclidean BucketedRandomProjectionLSH approximate self-join:
    * pairs within `distance` of each other. */
  def brpNearPairs(embeddings: DataFrame, distance: Double,
      seed: Long = 42L): DataFrame = {
    val v = vectors(embeddings)
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("vec").setOutputCol("hashes")
      .setBucketLength(0.5).setNumHashTables(6).setSeed(seed)
    val model = lsh.fit(v)
    model.approxSimilarityJoin(v, v, distance, "euclidean")
      .filter(col("datasetA.vec_id") < col("datasetB.vec_id"))
      .select(col("datasetA.vec_id").as("ia"),
        col("datasetB.vec_id").as("ib"),
        round(col("euclidean"), 4).as("euclidean"))
  }
}
