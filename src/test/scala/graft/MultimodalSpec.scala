package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Multimodal plumbing tests: payload opacity, metadata schema, the
  * partition-batched extractor's shape/determinism, and the fake-decode
  * contract. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media schema: binary payload + typed metadata struct") {
    val df = Multimodal.media(spark, Sf0001)
    val schema = df.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "source"))
  }

  test("fakeDecode is a normalized 16-bucket histogram") {
    val h = Multimodal.fakeDecode("hello world".getBytes("UTF-8"))
    assert(h.length == 16)
    assert(math.abs(h.sum - 1.0) < 1e-12)
    assert(h.forall(v => v >= 0.0 && v <= 1.0))
    assert(Multimodal.fakeDecode("hello world".getBytes("UTF-8")).toSeq == h.toSeq)
  }

  test("extractor emits one feature row per document with byte-accurate lengths") {
    val feats = Multimodal.extractFeatures(spark, Sf0001).collect()
    val docs = Tables.documents(spark, Sf0001)
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(feats.length == docs.size)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1).toLong == docs(id), s"doc $id byte length")
      assert(r.getSeq[Double](2).length == 16)
    }
  }


  test("fakeResize keeps exactly the stride-indexed bytes in order") {
    val p = (0 until 23).map(_.toByte).toArray
    val out = graft.ops.Multimodal.fakeResize(p, 4)
    assert(out.toSeq == Seq[Byte](0, 4, 8, 12, 16, 20))
  }

  test("fakeFrameSample handles ragged final frames and sub-frame payloads") {
    val p = (0 until 130).map(_.toByte).toArray // 3 frames: 64+64+2
    val (n, sampled) = graft.ops.Multimodal.fakeFrameSample(p, 64, 4)
    assert(n == 3 && sampled.length == 1 && sampled.head.length == 64)
    val tiny = graft.ops.Multimodal.fakeFrameSample(Array[Byte](7), 64, 4)
    assert(tiny._1 == 1 && tiny._2.head.toSeq == Seq[Byte](7))
  }

  test("extractor output is deterministic across runs") {
    def run() = SparkEntry.queries("q56_media_features")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(run() == run())
  }
}
