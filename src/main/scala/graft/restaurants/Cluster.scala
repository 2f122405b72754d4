package graft.restaurants

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, PCA, PCAModel, StandardScaler, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** W3 restaurant clustering (category_model.ipynb cells 0-1) re-expressed
  * as one Spark ML pipeline over a single DataFrame — the reference's
  * pandas index-realignment dance (`.loc[df.index]`,
  * category_model.ipynb:46) disappears because features and metadata
  * never leave the row (SURVEY §7.4 risk 5).
  *
  * Stage mapping (SURVEY §2.9):
  *  - MultiLabelBinarizer (~380 binary cols)  → CountVectorizer(binary)
  *    into ONE sparse vector column — at 100 TB a wide one-hot matrix as
  *    separate columns breaks codegen and bloats every shuffle; a
  *    sparse VectorUDT column keeps rows compact.
  *  - StandardScaler(withMean=true)           → identical (densifies —
  *    acceptable because PCA input is dense anyway)
  *  - PCA(n_components=0.95)                  → [[pcaByVariance]]: Spark
  *    PCA takes integer k only, so fit once wide, pick the smallest k
  *    with cumulative explainedVariance ≥ 0.95, refit at k (§7.4 risk 2)
  *  - KMeans(7, random_state=30)              → KMeans.setK(7).setSeed(30)
  *    (k-means‖ init vs sklearn k-means++ — same structure, not
  *    identical assignments; tests assert structure, §7.4 risk 7)
  *
  * "Restaurants" on the driver's testdata are the `part` table: the two
  * p_name words + p_type (lowercased) act as the category list
  * (untrimmed, like the reference's `' Burritos'`-style raw splits —
  * §7.4 risk 3), p_size/p_retailprice as the numeric features.
  */
object Cluster {

  /** part → (restaurant_id, name, categories: array<string>, size, price). */
  def restaurants(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey").as("restaurant_id"),
      col("p_name").as("name"),
      array_union(
        split(lower(col("p_name")), " "),
        array(lower(col("p_type")))).as("categories"),
      col("p_size").cast("double").as("size"),
      col("p_retailprice").as("price"))

  /** Smallest k whose cumulative explained variance ≥ the target:
    * fit once at maxK, scan, refit at k (sklearn PCA(0.95) parity). */
  def pcaByVariance(df: DataFrame, inputCol: String, outputCol: String,
                    variance: Double, maxK: Int): (PCAModel, Int) = {
    val wide = new PCA().setInputCol(inputCol).setOutputCol(outputCol)
      .setK(maxK).fit(df)
    val cum = wide.explainedVariance.toArray.scanLeft(0.0)(_ + _).tail
    val k = cum.indexWhere(_ >= variance) match {
      case -1 => maxK
      case i => i + 1
    }
    (new PCA().setInputCol(inputCol).setOutputCol(outputCol).setK(k).fit(df), k)
  }

  final case class Fitted(
      model: PipelineModel,
      pca: PCAModel,
      pcaK: Int,
      vocabulary: Array[String],
      clustered: DataFrame)

  /** Full W3 pipeline: CountVectorizer(binary) → VectorAssembler →
    * StandardScaler(withMean) → PCA(0.95) → KMeans(7, seed 30). */
  def fit(s: SparkSession, dir: String, k: Int = 7, variance: Double = 0.95,
          maxPcaK: Int = 16, minDF: Double = 1.0): Fitted = {
    val df = restaurants(s, dir).na.drop(Seq("categories", "size", "price"))
    val cv = new CountVectorizer()
      .setInputCol("categories").setOutputCol("catVec")
      .setBinary(true).setMinDF(minDF)
    val assembler = new VectorAssembler()
      .setInputCols(Array("catVec", "size", "price")).setOutputCol("assembled")
    val scaler = new StandardScaler()
      .setInputCol("assembled").setOutputCol("scaled")
      .setWithMean(true).setWithStd(true)
    val prep = new Pipeline().setStages(Array(cv, assembler, scaler)).fit(df)
    val prepped = prep.transform(df)
    val (pca, pcaK) = pcaByVariance(prepped, "scaled", "pcaFeatures", variance, maxPcaK)
    val projected = pca.transform(prepped)
    val kmeans = new KMeans()
      .setK(k).setSeed(30).setFeaturesCol("pcaFeatures").setPredictionCol("cluster")
    val km = kmeans.fit(projected)
    val vocab = prep.stages.head.asInstanceOf[CountVectorizerModel].vocabulary
    Fitted(prep, pca, pcaK, vocab, km.transform(projected))
  }
}
