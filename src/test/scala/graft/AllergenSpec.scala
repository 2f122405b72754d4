package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature.{HashingTF, IDF, StringIndexer}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.allergen.{Labels, Train}

/** W1 ML pipeline tests (SURVEY.md §5.3): golden metrics on
  * deterministic separable fixtures; exact assertions only for
  * deterministic stages (IDF value from known doc frequencies,
  * StringIndexer frequency order); save/load round-trip parity
  * (MLP.ipynb:550). */
class AllergenSpec extends AnyFunSuite {
  import TestSpark._

  /** Deterministic separable fixture: 200 docs; even ids repeat "hash"
    * 3× (label 1), odd ids contain it at most once (label 0). Filler
    * tokens vary by id so TF-IDF vectors are not constant. */
  private lazy val fixture = {
    import spark.implicits._
    val fillers = Vector("scan", "merge", "table", "row", "group", "sort", "query", "batch")
    (0 until 200).map { i =>
      val base = Vector.tabulate(6)(k => fillers((i + k) % fillers.size))
      val toks = if (i % 2 == 0) Vector("hash", "hash", "hash") ++ base
                 else if (i % 4 == 1) Vector("hash") ++ base
                 else base
      (i.toLong, toks)
    }.toDF("doc_id", "tokens")
      .withColumn("label", Train.trainBinaryLabel(col("tokens")))
      .withColumn("category", Train.trainMulticlassLabel(col("tokens")))
      .withColumn("is_hash", when(col("label") === 1.0, 1.0).otherwise(0.0))
  }

  test("fixture labels are the intended 50/50 split") {
    val counts = fixture.groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(counts(1.0) == 100 && counts(0.0) == 100, counts)
  }

  test("binary MLP reaches >=0.9 accuracy on the separable fixture") {
    val (_, (acc, f1, auc)) = Train.binaryMLP(fixture, numFeatures = 64, maxIter = 50)
    assert(acc >= 0.9, s"acc=$acc")
    assert(f1 >= 0.9, s"f1=$f1")
    assert(auc >= 0.9, s"auc=$auc")
  }

  test("class-weighted LR reaches >=0.9 accuracy and its weights are majority/count") {
    val (_, (acc, _, auc)) = Train.binaryWeightedLR(fixture, numFeatures = 64)
    assert(acc >= 0.9, s"acc=$acc")
    assert(auc >= 0.9, s"auc=$auc")
  }

  test("undersampled RF balances classes exactly and learns the fixture") {
    val balanced = Train.undersample(fixture)
    val counts = balanced.groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(counts(0.0) == counts(1.0), counts)
    val (_, (acc, _, _)) = Train.binaryRF(fixture, numFeatures = 64, numTrees = 20)
    assert(acc >= 0.85, s"acc=$acc")
  }

  test("undersample is deterministic for a fixed seed") {
    val a = Train.undersample(fixture).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Train.undersample(fixture).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("IDF value matches ln((m+1)/(df+1)) for known document frequencies") {
    import spark.implicits._
    // 3 docs; "rare" appears in exactly 1 → idf = ln(4/2); "common" in
    // all 3 → idf = ln(4/4) = 0.
    val docs = Seq(
      (0L, Seq("rare", "common")),
      (1L, Seq("common")),
      (2L, Seq("common"))).toDF("id", "tokens")
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("rawFeatures")
      .setNumFeatures(8192) // large enough that the two fixture tokens don't collide
    val tfed = tf.transform(docs)
    val idfModel = new IDF().setInputCol("rawFeatures").setOutputCol("features").fit(tfed)
    val rareBucket = tf.indexOf("rare")
    val commonBucket = tf.indexOf("common")
    assert(rareBucket != commonBucket, "fixture tokens must not collide")
    val v0 = idfModel.transform(tfed).filter($"id" === 0L)
      .select("features").head.getAs[SparseVector](0)
    assert(math.abs(v0(rareBucket) - math.log(4.0 / 2.0)) < 1e-12, v0)
    assert(v0(commonBucket) == 0.0, v0)
  }

  test("HashingTF is deterministic and respects numFeatures") {
    import spark.implicits._
    val docs = Seq((0L, Seq("hash", "join", "hash"))).toDF("id", "tokens")
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("rawFeatures")
      .setNumFeatures(64)
    val v1 = tf.transform(docs).select("rawFeatures").head.getAs[SparseVector](0)
    val v2 = tf.transform(docs).select("rawFeatures").head.getAs[SparseVector](0)
    assert(v1 == v2)
    assert(v1.size == 64)
    assert(v1(tf.indexOf("hash")) == 2.0) // term frequency, not presence
    assert(v1(tf.indexOf("join")) == 1.0)
  }

  test("StringIndexer orders labels by descending frequency (untied fixture)") {
    import spark.implicits._
    val df = (Seq.fill(3)("alpha") ++ Seq.fill(2)("beta") ++ Seq("gamma"))
      .toDF("category")
    val m = new StringIndexer().setInputCol("category").setOutputCol("idx").fit(df)
    assert(m.labelsArray.head.toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("multiclass bigram pipeline trains and beats chance on the fixture") {
    val (model, acc, f1) = Train.multiclassMLP(fixture, filtered = false,
      numFeatures = 64, maxIter = 50)
    // 2 classes in the fixture (hash / none); chance ~0.5
    assert(acc >= 0.7, s"acc=$acc f1=$f1")
    assert(model.stages.length == 7) // remover, ngram, tf, idf, indexer, mlp, toLabel
  }

  test("PipelineModel save/load round-trip transforms identically (MLP.ipynb:550)") {
    val (model, _) = Train.binaryMLP(fixture, numFeatures = 64, maxIter = 10)
    val path = "target/test-pipeline-model"
    model.write.overwrite().save(path)
    val loaded = PipelineModel.load(path)
    val before = model.transform(fixture)
      .select("doc_id", "prediction").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val after = loaded.transform(fixture)
      .select("doc_id", "prediction").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(before == after)
  }

  test("multilabel CV picks a grid point and reports a sane AUC") {
    val res = Train.multilabelCV(fixture, Seq("hash"),
      numFeaturesGrid = Seq(32, 64), minDocFreqGrid = Seq(0), folds = 3, maxIter = 15)
    assert(res.length == 1)
    val (cat, auc, nf) = res.head
    assert(cat == "hash")
    assert(auc >= 0.8 && auc <= 1.0, s"auc=$auc")
    assert(Seq(32, 64).contains(nf))
  }

  test("RegexTokenizer matches regexp_extract_all tokenization (model.py:71 config)") {
    import spark.implicits._
    val df = Seq((0L, "Mix the Flour-Water12 dough")).toDF("id", "text")
    val tok = new org.apache.spark.ml.feature.RegexTokenizer()
      .setInputCol("text").setOutputCol("words")
      .setPattern("[a-z]+").setGaps(false).setToLowercase(true)
    val viaStage = tok.transform(df).select("words").head.getSeq[String](0)
    val viaExpr = df.selectExpr("regexp_extract_all(lower(text), '[a-z]+', 0) AS w")
      .head.getSeq[String](0)
    assert(viaStage == viaExpr)
    assert(viaStage == Seq("mix", "the", "flour", "water", "dough"))
  }

  test("training curve exposes a non-increasing best loss (metrics-log parity)") {
    val rows = SparkEntry.queries("q59_training_curve")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length > 5)
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong).toSeq)
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 <= a._3; case _ => true })
    assert(rows.last._3 < rows.head._2, "optimization must improve on the initial loss")
  }

  test("classificationReport matches mllib MulticlassMetrics exactly") {
    import spark.implicits._
    // deterministic (label, prediction) fixture with both error kinds
    val pred = Seq(
      (1.0, 1.0), (1.0, 1.0), (1.0, 0.0),          // class 1: tp=2 fn=1
      (0.0, 0.0), (0.0, 0.0), (0.0, 0.0), (0.0, 1.0) // class 0: tp=3 fp(1)=1
    ).toDF("label", "prediction")
    val report = Train.classificationReport(pred).collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val mm = new org.apache.spark.mllib.evaluation.MulticlassMetrics(
      pred.rdd.map(r => (r.getDouble(1), r.getDouble(0))))
    Seq(0.0, 1.0).foreach { c =>
      val (p, rcl, f1, support) = report(c)
      assert(math.abs(p - mm.precision(c)) < 1e-12, s"precision($c)")
      assert(math.abs(rcl - mm.recall(c)) < 1e-12, s"recall($c)")
      assert(math.abs(f1 - mm.fMeasure(c, 1.0)) < 1e-12, s"f1($c)")
      assert(support == pred.filter($"label" === c).count(), s"support($c)")
    }
  }

  test("label queries agree with direct derivation on sf0.001") {
    val viaQuery = SparkEntry.queries("q35_label_multiclass")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Labels.labeled(spark, Sf0001)
      .groupBy("category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaQuery == direct)
  }
}
