package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.restaurants.{Cluster, Recommend}

/** W3 clustering structure tests (SURVEY §7.4 risk 7: assert cluster
  * STRUCTURE — sizes, variance coverage, profile shape, determinism —
  * never exact assignments, which differ from sklearn's k-means++). */
class ClusterSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val fitted = Cluster.fit(spark, Sf0001)

  test("every restaurant lands in exactly one of k=7 clusters") {
    val total = Cluster.restaurants(spark, Sf0001).count()
    val byCluster = fitted.clustered.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byCluster.keySet.subsetOf((0 until 7).toSet))
    assert(byCluster.values.sum == total)
    assert(byCluster.size >= 2, s"degenerate clustering: $byCluster")
  }

  test("PCA-by-variance picks the smallest k covering 95% variance") {
    val prepped = fitted.model.transform(
      Cluster.restaurants(spark, Sf0001).na.drop(Seq("categories", "size", "price")))
    val (pca, k) = Cluster.pcaByVariance(prepped, "scaled", "p2", 0.95, 16)
    assert(k == fitted.pcaK)
    assert(pca.explainedVariance.toArray.sum >= 0.95 || k == 16)
    if (k > 1) {
      // k-1 components must NOT reach the target (minimality)
      val (smaller, _) = Cluster.pcaByVariance(prepped, "scaled", "p3", 0.0, k - 1)
      assert(smaller.explainedVariance.toArray.sum < 0.95)
    }
  }

  test("CountVectorizer vocabulary covers the category domain") {
    assert(fitted.vocabulary.nonEmpty)
    assert(fitted.vocabulary.distinct.length == fitted.vocabulary.length)
    // categories came from lowercased names/types
    assert(fitted.vocabulary.forall(c => c == c.toLowerCase))
  }

  test("clustering is deterministic for the fixed seed") {
    val again = Cluster.fit(spark, Sf0001)
    val a = fitted.clustered.select("restaurant_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = again.clustered.select("restaurant_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("cluster profile yields <=7 ranked categories per cluster") {
    val prof = Recommend.clusterProfile(fitted).collect()
    prof.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to rows.length))
      assert(rows.length <= 7)
      val means = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(means.sliding(2).forall { case Array(x, y) => x >= y; case _ => true })
    }
  }

  test("Summarizer.mean on the category vector matches the unpivoted profile means") {
    import org.apache.spark.ml.stat.Summarizer
    import spark.implicits._
    // vector-native grouped mean (SURVEY §2.4 row 22's ~380-col form)
    val vecMeans = fitted.clustered
      .groupBy($"cluster")
      .agg(Summarizer.mean($"catVec").as("meanVec"))
      .collect().map(r => r.getInt(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1)).toMap
    val profile = Recommend.clusterProfile(fitted).collect()
    val vocabIdx = fitted.vocabulary.zipWithIndex.toMap
    profile.foreach { r =>
      val (cluster, cat, mean) = (r.getInt(0), r.getString(2), r.getDouble(3))
      assert(math.abs(vecMeans(cluster)(vocabIdx(cat)) - mean) < 1e-12,
        s"cluster $cluster category $cat")
    }
  }

  test("recommender returns n matching rows ordered by cluster rank") {
    val rec = Recommend.recommend(fitted, Seq("red", "ECONOMY"), 20).collect()
    assert(rec.length == 20)
    assert(rec.forall(_.getInt(4) > 0)) // every row matches >=1 category
    val ranks = rec.map(_.getInt(3))
    assert(ranks.sliding(2).forall { case Array(x, y) => x <= y; case _ => true })
  }
}
