package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.Md5Long64

/** The custom expression must be bit-identical to the composed built-in
  * form it replaces — that equivalence is what keeps the DuckDB oracle
  * (`CAST('0x'||substr(md5(s),1,15) AS BIGINT)`) valid for every
  * operator that hashes through it. */
class Md5Long64Spec extends AnyFunSuite {
  import TestSpark._

  test("matches conv(substring(md5(s),1,15),16,10) on the documents corpus") {
    val diff = Tables.documents(spark, Sf0001)
      .select(
        call_function("graft_md5long64", col("text")).as("native"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(diff == 0)
  }

  test("matches on edge-case literals (empty, unicode, long)") {
    Seq("", "a", "héllo wörld", "你好", "x" * 10000).foreach { s =>
      val viaSpark = spark.sql(
        s"SELECT graft_md5long64('${s.replace("'", "''")}')").head.getLong(0)
      assert(viaSpark == Md5Long64.hash(UTF8String.fromString(s)), s"input=$s")
      assert(viaSpark >= 0, "60-bit prefix is always non-negative")
    }
  }

  test("resolves by name in SQL text via the session extension") {
    val r = spark.sql("SELECT graft_md5long64('tok')").head.getLong(0)
    // same literal the Hashes scaladoc derivation uses: md5('tok') prefix
    assert(r == java.lang.Long.parseLong(
      graft.ops.Hashes.md5Hex("tok").substring(0, 15), 16))
  }

  test("works inside higher-order transform lambdas (the dedup hot path)") {
    import spark.implicits._
    val out = Seq(Seq("a", "b", "c")).toDF("xs")
      .select(transform(col("xs"), x => call_function("graft_md5long64", x)).as("hs"))
      .head.getSeq[Long](0)
    assert(out == Seq("a", "b", "c").map(s =>
      Md5Long64.hash(UTF8String.fromString(s))))
  }
}
