package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge training: the exact hand-derivable merge sequence on a
  * fixture, and corpus-level invariants (chosen-pair counts are
  * non-increasing; the table is a pure function of the corpus). */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  test("learns the hand-computed merge sequence, ties broken lexicographically") {
    import spark.implicits._
    // word types: aab x3, ab x2. Round 1 pair counts: (a,a)=3,
    // (a,b)=5, (b,</w>)=5 -> tie at 5, lexicographic left wins: (a,b).
    // Round 2: (ab,</w>)=5. Round 3: (a,ab</w>)=3. Then every word is a
    // single symbol -> training exhausts at 3 merges even though 10
    // were requested.
    val docs = Seq((1L, "aab aab aab ab ab")).toDF("doc_id", "text")
    val merges = Graft.bpeMerges(docs, n = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "a", "b", 5L),
      (2, "ab", "</w>", 5L),
      (3, "a", "ab</w>", 3L)))
    intercept[IllegalArgumentException](Graft.bpeMerges(docs, 0))
  }

  test("a TAB-bearing corpus token fails loud, never silently diverges the oracle") {
    import spark.implicits._
    // a tab survives a split on ' ' — without the guard it would ride
    // into the oracle's tab-separated fold state and corrupt the parse
    // silently; the contract is raise_error on the engine side (the
    // oracle's wt0 CTE raises the mirrored error())
    val docs = Seq((1L, "good tok\twith-tab good")).toDF("doc_id", "text")
    val e = intercept[Exception](Graft.bpeMerges(docs, n = 2).collect())
    assert(e.getMessage != null && e.getMessage.contains("TAB"))
    // tab-free corpora are untouched by the guard
    assert(Graft.bpeMerges(Seq((1L, "ab ab")).toDF("doc_id", "text"), n = 1)
      .count() >= 1)
  }

  test("batched trainer equals the sequential table on an interacting multi-word fixture") {
    import spark.implicits._
    // word types: abx ×6, aby ×5, cd ×7. Round-1 pair counts:
    // (a,b)=11, (c,d)=7, (d,</w>)=7, (b,x)=6, (x,</w>)=6, (b,y)=5,
    // (y,</w>)=5. Rank prefix: (a,b,11) accepted; (c,d,7) disjoint ->
    // accepted; (d,</w>,7) shares d -> STOP. Batch {(a,b),(c,d)} is
    // exactly what sequential training learns in steps 1-2 (the pair
    // (ab,x)=6 that merging (a,b) creates stays below (c,d)=7, as the
    // prefix rule's (b,x)=6 < 7 bound guarantees). Later rounds chain
    // through </w> and degrade to one merge each — also sequential.
    val text = (Seq.fill(6)("abx") ++ Seq.fill(5)("aby") ++
      Seq.fill(7)("cd")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    def table(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val seqTable = table(Graft.bpeMerges(docs, n = 6))
    val batTable = table(Graft.bpeMergesBatched(docs, n = 6, maxBatch = 4))
    assert(batTable == seqTable, s"batched $batTable != sequential $seqTable")
    assert(seqTable.take(2).map(t => (t._2, t._3)) == Seq(("a", "b"), ("c", "d")))
    // maxBatch = 1 IS the sequential trainer — on the real corpus
    val corpus = Tables.documents(spark, Sf0001)
    assert(table(Graft.bpeMergesBatched(corpus, n = 6, maxBatch = 1)) ==
      table(Graft.bpeMerges(corpus, n = 6)))
    intercept[IllegalArgumentException](Graft.bpeMergesBatched(docs, 6, 0))
  }

  test("merge application is left-to-right non-overlapping") {
    import spark.implicits._
    // "aaaa": round-1 top pair is (a,a)=3 per word (overlapping), but
    // application must merge non-overlapping -> [aa, aa, </w>], never
    // [aa, a, a...] double-consumption
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = Graft.bpeMerges(docs, n = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // (a,a) appears 3 times per word BEFORE merging (adjacent slots),
    // 2 word tokens -> count 6; after merging: [aa, aa, </w>] gives
    // (aa,aa)=2 and (aa,</w>)=2 -> tie on right: "</w>" < "aa" ('<' is
    // 0x3C), so (aa,</w>) wins the lexicographic tie-break
    assert(merges(0) == ((1, "a", "a", 6L)))
    assert(merges(1) == ((2, "aa", "</w>", 2L)))
  }

  test("bpeEncode applies merges exactly: hand-derived token counts") {
    import spark.implicits._
    // tower: t o w e r </w> --(e,r)-> t o w er </w> --(er,</w>)->
    //   t o w er</w> --(o,w)-> t ow er</w> = 3 tokens
    // ten:   t e n </w> --(n,</w>)-> t e n</w> = 3 tokens
    // hash:  h a s h </w> --(h,</w>)-> h a s h</w> = 4 tokens
    val docs = Seq((1L, "tower ten hash")).toDF("doc_id", "text")
    val out = Graft.bpeEncode(docs, ops.Bpe.ShippedMerges).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 3L)                  // n_words
    assert(r.getLong(3) == 12L)                 // n_chars: 5 + 3 + 4
    // tower: t|ow|er</w> = 3, ten: t|e|n</w> = 3, hash: h|a|s|h</w> = 4
    assert(r.getLong(2) == 10L)                 // n_tokens
    assert(r.getLong(4) == 12L * 1000000L / 10L) // exact integer ratio
  }

  test("bpeEncode: overlapping runs merge left-to-right; zero-word docs emit zeros") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, " ")).toDF("doc_id", "text")
    // merge (a,a): aaaa -> aa aa </w> = 3 tokens (never aa a a or a aa a)
    val out = Graft.bpeEncode(docs, Seq("a" -> "a"))
      .orderBy(col("doc_id")).collect()
    assert(out(0).getLong(2) == 3L)
    assert(out(1).getLong(1) == 0L && out(1).getLong(2) == 0L)
    assert(out(1).isNullAt(4)) // no tokens -> ratio null, not a crash
    intercept[IllegalArgumentException](Graft.bpeEncode(docs, Seq.empty))
    intercept[IllegalArgumentException](Graft.bpeEncode(docs, Seq("a b" -> "c")))
  }

  test("native graft_bpe_counts is bit-equivalent to the chained HOF fold") {
    import spark.implicits._
    // adversarial shapes: overlapping runs, chained merges into </w>,
    // multi-space gaps, empty-ish docs, single chars
    // 6: non-BMP — the surrogate-pair emoji and CJK must each count as
    // ONE char/symbol in all three implementations (code-point
    // semantics; a UTF-16 iteration would see two lone surrogates)
    val docs = Seq(
      (1L, "tower ten hash aaaa"),
      (2L, "erer  rere e r"),
      (3L, " "),
      (4L, "a"),
      (5L, "stowow atat erh"),
      (6L, "café 😀x 你好ter 😀😀")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    val native = rows(ops.Bpe.bpeEncodeOf(docs, ops.Bpe.ShippedMerges))
    val hof = rows(ops.Bpe.bpeEncodeHof(docs, ops.Bpe.ShippedMerges))
    assert(native == hof)
    // and on a real corpus slice — the equivalence must hold on data
    // that exercises every merge in the shipped table
    val corpus = Tables.documents(spark, Sf0001).limit(50)
    assert(rows(ops.Bpe.bpeEncodeOf(corpus, ops.Bpe.ShippedMerges)) ==
      rows(ops.Bpe.bpeEncodeHof(corpus, ops.Bpe.ShippedMerges)))
  }

  test("lengthBuckets: hand-derived buckets, padding, and exact micro utilization") {
    import spark.implicits._
    val enc = Seq(
      (1L, 10L), (2L, 16L),   // both land in bucket 16: padding 6 + 0
      (3L, 17L),              // bucket 32: padding 15
      (4L, 3000L)             // oversize -> bucket 0, null utilization
    ).toDF("doc_id", "n_tokens")
    val out = Graft.lengthBuckets(enc).orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, 3000L, 0L, -1L),
      (16L, 2L, 26L, 6L, 26L * 1000000L / 32L),
      (32L, 1L, 17L, 15L, 17L * 1000000L / 32L)))
  }

  test("shardManifest fills contiguous shards; straddlers belong to their start shard") {
    import spark.implicits._
    // target 100: doc 1 (60) -> shard 0 (cum 0); doc 2 (60) -> shard 0
    // (cum 60, straddles into 120); doc 3 (30) -> shard 1 (cum 120);
    // doc 4 (200) -> shard 1 (cum 150); doc 5 (10) -> shard 3 (cum 350)
    val enc = Seq((1L, 60L), (2L, 60L), (3L, 30L), (4L, 200L), (5L, 10L))
      .toDF("doc_id", "n_tokens")
    val out = Graft.shardManifest(enc, 100L).orderBy(col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 120L, 1L, 2L),
      (1L, 2L, 230L, 3L, 4L),
      (3L, 1L, 10L, 5L, 5L)))
    intercept[IllegalArgumentException](Graft.shardManifest(enc, 0L))
  }

  test("tokenBudget: hand-derived sqrt-temperature allocation and epoch factors") {
    import spark.implicits._
    // sources: a = 900 tokens, b = 100 -> w_a = 30000, w_b = 10000,
    // tw = 40000, budget tb = 1000. share_a = 750000 micro, share_b =
    // 250000. target_a = 750, target_b = 250. epochs: a = 833 milli
    // (downsampled), b = 2500 milli (repeats 2.5x).
    val bySource = Seq(("a", 900L), ("b", 100L))
      .flatMap { case (s, t) => Seq((s, t / 2), (s, t - t / 2)) } // 2 docs each
      .toDF("source", "n_tokens")
    val out = Graft.tokenBudget(bySource).orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("a", 2L, 900L, 30000L, 750000L, 750L, 833L),
      ("b", 2L, 100L, 10000L, 250000L, 250L, 2500L)))
    // allocation never exceeds the budget (floor division throughout)
    assert(out.map(_._6).sum <= 1000L)
  }

  test("writeTokenShards: directory partitions match the manifest exactly") {
    import spark.implicits._
    val enc = Seq((1L, 60L, "a"), (2L, 60L, "b"), (3L, 30L, "c"),
      (4L, 200L, "d"), (5L, 10L, "e")).toDF("doc_id", "n_tokens", "text")
    val path = java.nio.file.Files.createTempDirectory("shards").toString
    Graft.writeTokenShards(enc, 100L, path)
    // shard= directories exist exactly for the manifest's shard ids
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).map(_.stripPrefix("shard=").toLong)
      .toSet
    assert(dirs == Set(0L, 1L, 3L))
    // read-back per-shard token sums equal the manifest's
    val back = spark.read.parquet(path)
      .groupBy(col("shard")).agg(
        org.apache.spark.sql.functions.sum(col("n_tokens")).as("t"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getAs[Number]("shard").longValue(), r.getLong(1), r.getLong(2)))
      .toSet
    val manifest = Graft.shardManifest(enc.select(col("doc_id"), col("n_tokens")), 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSet
    assert(back == manifest)
    // payload columns survive the write
    assert(spark.read.parquet(path).columns.toSet ==
      Set("doc_id", "n_tokens", "text", "shard"))
  }

  test("tokenizerFertility: exact micro ratios per group, nulls on empty groups") {
    import spark.implicits._
    val enc = Seq(
      ("en", 10L, 25L, 40L), ("en", 10L, 15L, 40L),  // 20 words, 40 toks, 80 chars
      ("zh", 5L, 20L, 10L),                           // fertility 4.0
      ("xx", 0L, 0L, 0L)                              // degenerate group
    ).toDF("g", "n_words", "n_tokens", "n_chars")
    val out = Graft.tokenizerFertility(enc).orderBy(col("g"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6)))
    assert(out.toSeq == Seq(
      ("en", 2000000L, 2000000L),  // 40/20 toks/word, 80/40 chars/tok
      ("xx", -1L, -1L),
      ("zh", 4000000L, 500000L)))
  }

  test("ShippedMerges IS the q191 artifact: training on sf0.01 reproduces it") {
    val trained = ops.Bpe.trainMerges(Tables.documents(spark, Sf001), 10)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(trained.toSeq == ops.Bpe.ShippedMerges,
      "ShippedMerges drifted from the sf0.01 training output — re-freeze")
  }

  test("q191 on the corpus: counts non-increasing, rerun identical") {
    val m1 = SparkEntry.queries("q191_bpe_merges")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m1.length == 10)
    assert(m1.map(_._1).toSeq == (1 to 10))
    // merging never raises the achievable top pair count
    val counts = m1.map(_._4)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"counts not non-increasing: ${counts.mkString(",")}")
    val m2 = SparkEntry.queries("q191_bpe_merges")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m1.toSeq == m2.toSeq)
  }
}
