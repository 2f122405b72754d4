package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts of the round-6 pipeline operators (q98-q107) —
  * assertions the hash gate can't express: rule batteries must actually
  * discriminate, quantization must reconstruct within its error bound,
  * the upsert must keep exactly the newest version per key. */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q98 cube emits all four granularities and they agree with the base aggregate") {
    val rows = SparkEntry.queries("q98_cube")(spark, Sf001).collect()
    val byGid = rows.groupBy(_.getLong(2))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val total = byGid(3L).head.getLong(3)
    // every partial granularity must re-sum to the grand total
    for (g <- Seq(0L, 1L, 2L))
      assert(byGid(g).map(_.getLong(3)).sum == total, s"gid=$g counts don't sum to total")
    assert(byGid(3L).size == 1)
  }

  test("q99 quality rules discriminate: both outcomes of every rule occur") {
    val df = SparkEntry.queries("q99_quality_rules")(spark, Sf001)
    for (r <- Seq("r_len", "r_wlen", "r_stop", "r_rep", "r_div", "keep")) {
      val vals = df.select(col(r)).distinct().collect().map(_.getBoolean(0)).toSet
      // r_wlen may be vacuously true on the synthetic vocabulary; all
      // structural rules and the combined keep must split the corpus
      if (r != "r_wlen") assert(vals == Set(true, false), s"rule $r does not discriminate")
    }
    // keep == conjunction of the published rule columns, row by row
    val bad = df.filter(col("keep") =!=
      (col("r_len") && col("r_wlen") && col("r_stop") && col("r_rep") && col("r_div"))).count()
    assert(bad == 0)
  }

  test("q100 scrub leaves no digits behind and counts every redaction") {
    val df = SparkEntry.queries("q100_pii_scrub")(spark, Sf001)
    assert(df.filter(col("props_clean").rlike("[0-9]")).count() == 0)
    assert(df.filter(col("contact_clean") =!= "<EMAIL>").count() == 0)
    assert(df.filter(col("n_redacted") < 1).count() == 0) // props always carries an id
  }

  test("q101 flags exactly the docs sharing shingle mass with the eval split") {
    val rep = SparkEntry.queries("q101_decontaminate")(spark, Sf001)
    // eval docs themselves are excluded from the report
    assert(rep.filter(col("doc_id") % 20 === 0).count() == 0)
    val flagged = rep.filter(col("contaminated")).collect()
    assert(flagged.nonEmpty, "fixture plants near-dups of eval docs; some must flag")
    assert(flagged.forall(r => r.getLong(2) * 10 >= r.getLong(1)), "flag implies frac >= 0.1")
    // n_hit never exceeds the doc's own shingle count
    assert(rep.filter(col("n_hit") > col("n_shingles")).count() == 0)
  }

  test("q102 int8 codes reconstruct every coordinate within scale/254") {
    val emb = Tables.embeddings(spark, Sf001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rep = SparkEntry.queries("q102_quantize_emb")(spark, Sf001).collect()
    assert(rep.length == emb.size)
    rep.foreach { r =>
      val (id, nDims, scale, sumCode, nSat) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))
      val v = emb(id).map(_.toDouble)
      assert(nDims == v.length)
      assert(scale == v.map(math.abs).max)
      val codes =
        if (scale == 0) v.map(_ => 0L)
        else v.map(x => math.floor(x / scale * 127.0 + 0.5).toLong)
      assert(sumCode == codes.sum)
      assert(nSat == codes.count(c => math.abs(c) == 127))
      if (scale != 0)
        assert(nSat >= 1, "for a nonzero vector the max-|x| coordinate saturates")
      // round-trip error bound of symmetric int8: half a quantization step
      if (scale != 0)
        v.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x - c * scale / 127.0) <= scale / 254.0 + 1e-12)
        }
    }
  }

  test("q104 intervals tile each key's history: no overlap, one open current row") {
    val df = SparkEntry.queries("q104_scd2_history")(spark, Sf001)
    val (iK, iT, iFrom, iTo, iCur) = (df.schema.fieldIndex("user_id"),
      df.schema.fieldIndex("event_type"), df.schema.fieldIndex("effective_from"),
      df.schema.fieldIndex("effective_to"), df.schema.fieldIndex("is_current"))
    val rows = df.collect()
      .map(r => ((r.getLong(iK), r.getString(iT)), r.getLong(iFrom),
        if (r.isNullAt(iTo)) None else Some(r.getLong(iTo)), r.getBoolean(iCur)))
    rows.groupBy(_._1).foreach { case (k, g) =>
      val sorted = g.sortBy(_._2)
      // exactly the last row is open/current; every other closes at the next open
      assert(sorted.count(_._3.isEmpty) == 1 && sorted.last._3.isEmpty, s"key $k")
      assert(sorted.count(_._4) == 1)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2), s"gap/overlap in $k")
        case _ =>
      }
    }
  }

  test("q105 funnel stages are time-ordered and the stage number matches") {
    val rows = SparkEntry.queries("q105_funnel")(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tView = r.getLong(1)
      val tClick = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val tPurch = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val stage = r.getInt(4)
      tClick.foreach(tc => assert(tc > tView))
      tPurch.foreach { tp => assert(tClick.isDefined && tp > tClick.get) }
      assert(stage == 1 + tClick.size + tPurch.size)
    }
    assert(rows.forall(r => r.getInt(4) >= 1 && r.getInt(4) <= 3))
    // the 24h conversion window must produce real drop-off AND real
    // completions on the fixture
    val stages = rows.map(_.getInt(4)).toSet
    assert(stages.contains(3) && (stages.contains(1) || stages.contains(2)))
  }

  test("q106 cohorts start at full retention and never exceed cohort size") {
    val rows = SparkEntry.queries("q106_cohort_retention")(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, g) =>
      val day0 = g.find(_._2 == 0L)
      assert(day0.isDefined, s"cohort $cohort misses its own first-activity day")
      assert(day0.get._5 == 1.0, "every cohort member is active on day 0")
      g.foreach { case (_, off, active, size, rate) =>
        assert(off >= 0 && active <= size && rate == active.toDouble / size)
      }
    }
    // retention must actually decay somewhere on the fixture
    assert(rows.exists(_._5 < 1.0))
  }

  test("q107 flags exactly the driver-side exact-moment outliers") {
    val vals = Tables.events(spark, Sf001)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = vals.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val n = g.length
      // exact 2-dp sums via scaled longs, then the same double formula
      val s = g.map(v => math.round(v._3 * 100)).sum / 100.0
      val sq = g.map(v => math.round(v._3 * 100) * math.round(v._3 * 100)).sum / 10000.0
      val mean = s / n
      val std = math.sqrt((sq - s * s / n) / (n - 1))
      g.filter(v => math.abs((v._3 - mean) / std) > 2.0).map(_._1).toSeq
    }.toSet
    val got = SparkEntry.queries("q107_outliers")(spark, Sf001).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q103 keeps exactly the newest version per (user, type) and covers every key") {
    val ev = Tables.events(spark, Sf001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(r => (r._1, r._2)).map { case (k, g) =>
      k -> g.maxBy(r => (r._3, r._4))._4 // newest (t, event_id) wins
    }
    val got = SparkEntry.queries("q103_merge_upsert")(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(got == expected)
    // both generations must survive somewhere (the merge is not a no-op)
    val srcs = SparkEntry.queries("q103_merge_upsert")(spark, Sf001)
      .select(col("src")).distinct().collect().map(_.getString(0)).toSet
    assert(srcs == Set("base", "upd"))
  }

  test("q109 boilerplate share counts recurring segments across and within docs") {
    import spark.implicits._
    def seg(tag: String): String = (0 until 8).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, seg("a") + " " + seg("b")),            // a shared with doc 2
      (2L, seg("a") + " " + seg("c")),
      (3L, seg("d") + " " + seg("d")),            // within-doc recurrence
      (4L, seg("e") + " t0 t1 t2"),               // 3-word tail dropped
      (5L, "w0 w1 w2")                            // < 8 words: no segments
    ).toDF("doc_id", "text")
    val got = ops.Dedup.boilerplateShare(docs, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 0.5)), 2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 2L, 1.0)), 4L -> ((1L, 0L, 0.0))))
  }

  test("q110 k-anonymity generalizes sub-k cells and re-flags at the merged grain") {
    import spark.implicits._
    val rows = (Seq.fill(6)((1, "A")) ++ Seq.fill(2)((1, "B")) ++ Seq.fill(2)((1, "C")) ++
      Seq.fill(3)((2, "A")) ++ Seq.fill(3)((2, "B")) ++ Seq.fill(5)((3, "A")))
      .toDF("nat", "seg")
    val got = ops.Quality.kAnonymity(rows, 5).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      (1, "A") -> ((6L, true)),  // big cell kept as-is
      (1, "*") -> ((4L, false)), // 2+2 merged, still sub-k: needs suppression
      (2, "*") -> ((6L, true)),  // 3+3 merged crosses k
      (3, "A") -> ((5L, true))))
  }

  test("q111 histogram buckets exactly: max lands in the top bucket, constants in 0") {
    import spark.implicits._
    val df = (0 until 16).map(i => (i.toDouble, 7.0)).toDF("a", "b")
    val got = ops.Profile.histogram(df, Seq("a", "b"), 16).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    // a: one value per bucket; v = max goes to bucket 15, not a phantom 16
    for (i <- 0 until 16) assert(got(("a", i))._3 == 1L)
    assert(got(("a", 0))._1 == 0.0 && got(("a", 15))._2 == 15.0)
    // b: degenerate hi == lo range collapses to bucket 0 with lo == hi bounds
    assert(got(("b", 0)) == ((7.0, 7.0, 16L)))
    assert(got.keys.count(_._1 == "b") == 1)
  }

  test("q112 merged partial-aggregate state equals the one-shot aggregate") {
    val merged = SparkEntry.queries("q112_view_merge")(spark, Sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val oneShot = Tables.orders(spark, Sf001)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .collect()
      .map { r =>
        val s = r.getDecimal(2).doubleValue()
        r.getLong(0) -> ((r.getLong(1), s, s / r.getLong(1)))
      }.toMap
    assert(merged == oneShot)
  }

  test("q113 overlap report matches a driver-side brute force over raw events") {
    val ev = Tables.events(spark, Sf0001)
      .select(unix_micros(col("ts")).as("t"), col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val day = (t: Long) => t / 86400000000L
    val iv = ev.groupBy(e => (e._2, day(e._1)))
      .map { case (k, g) => (k._1, k._2, g.map(_._1).min, g.map(_._1).max) }
    val inc = ev.filter(_._3 == "error").groupBy(e => day(e._1))
      .map { case (d, g) => d -> ((g.map(_._1).min, g.map(_._1).max)) }
    val expected = iv.toSeq
      .flatMap { case (_, d, s, e) =>
        inc.get(d).filter { case (is, ie) => s <= ie && is <= e }
          .map(w => d -> (math.min(e, w._2) - math.max(s, w._1)))
      }
      .groupBy(_._1).map { case (d, g) => d -> ((g.size.toLong, g.map(_._2).sum)) }
    val got = SparkEntry.queries("q113_interval_overlap")(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q114 mode matches brute force with the ascending-type tie-break") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val counts = g.groupBy(_._2).map { case (t, r) => (t, r.size.toLong) }
      // most frequent; ties resolved by event_type ascending
      u -> counts.toSeq.minBy { case (t, n) => (-n, t) }
    }
    val got = SparkEntry.queries("q114_mode_per_group")(spark, Sf001)
    val gotSmall = SparkEntry.queries("q114_mode_per_group")(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(gotSmall == expected)
    assert(got.count() > 0)
  }

  test("q115 transition rows partition the adjacent pairs; probabilities row-normalize") {
    val rows = SparkEntry.queries("q115_transitions")(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val nEvents = Tables.events(spark, Sf001).count()
    val nUsers = Tables.events(spark, Sf001).select(col("user_id")).distinct().count()
    // every event except each user's last contributes exactly one pair
    assert(rows.map(_._3).sum == nEvents - nUsers)
    for ((_, g) <- rows.groupBy(_._1)) {
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-12)
      // p must be the exact count ratio, not a reassociated sum
      val tot = g.map(_._3).sum.toDouble
      g.foreach(r => assert(r._4 == r._3.toDouble / tot))
    }
  }

  test("q111 fixture histogram covers every row of both melted columns") {
    val rows = SparkEntry.queries("q111_histogram")(spark, Sf001).collect()
    val total = Tables.lineitem(spark, Sf001).count()
    for (c <- Seq("l_extendedprice", "l_quantity"))
      assert(rows.filter(_.getString(0) == c).map(_.getLong(4)).sum == total)
  }

  test("q116 membership is exactly the all-integer acceptance rule") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"wsamp:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 10000
    }
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.filter { case (id, nc) => bucket(id) < math.min(10000L, 25 * nc) }
      .map(_._1).toSet
    val got = SparkEntry.queries("q116_weighted_sample")(spark, Sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    // the ramp must actually discriminate: some docs in, some out
    assert(got.nonEmpty && got.size < docs.length)
  }

  test("q117 normalizes each group onto [0,1] with both endpoints attained") {
    val rows = SparkEntry.queries("q117_minmax_scale")(spark, Sf001).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    for ((_, g) <- rows.groupBy(_._1)) {
      assert(g.minBy(_._2)._3 == 0.0 && g.maxBy(_._2)._3 == 1.0)
    }
  }

  test("q118 listagg emits the sorted distinct segment list per nation") {
    val expected = Tables.customer(spark, Sf001)
      .select(col("c_nationkey"), col("c_mktsegment")).collect()
      .map(r => (r.getInt(0), r.getString(1)))
      .groupBy(_._1).map { case (k, g) =>
        val segs = g.map(_._2).distinct.sorted
        k -> ((segs.mkString(","), segs.length.toLong))
      }
    val got = SparkEntry.queries("q118_listagg")(spark, Sf001).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("q120 returns exactly the docs containing every query term") {
    val expected = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text")).collect()
      .filter { r =>
        val words = r.getString(1).split(" ").toSet
        Seq("hash", "join", "scan").forall(words.contains)
      }.map(_.getLong(0)).toSet
    val got = SparkEntry.queries("q120_bool_search")(spark, Sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q121 scores are the exact quantized-idf sums, ranked descending") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSet))
    val terms = Seq("hash", "join", "scan")
    val n = docs.length.toLong
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val scores = docs
      .map { case (id, ws) => id -> terms.filter(ws.contains).map(t => n / df(t)).sum }
      .filter(_._2 > 0)
    val expectedTop = scores.sortBy { case (id, s) => (-s, id) }.take(50).toSeq
    val got = SparkEntry.queries("q121_ranked_search")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expectedTop)
  }

  test("q122 clamps into the cut band, flags exactly the out-of-band rows") {
    val rows = SparkEntry.queries("q122_winsorize")(spark, Sf001).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    // unclipped rows pass through untouched; clipped rows moved to a bound
    assert(rows.forall { case (v, w, c) => if (c) v != w else v == w })
    // p05/p95 clamping flags roughly 10% of rows
    val frac = rows.count(_._3).toDouble / rows.length
    assert(frac > 0.05 && frac < 0.15, s"clipped fraction $frac")
  }

  test("q124 shares sum to 1 within every region") {
    val rows = SparkEntry.queries("q124_share_of_parent")(spark, Sf001).collect()
      .map(r => (r.getInt(0), r.getDouble(3)))
    for ((_, g) <- rows.groupBy(_._1))
      assert(math.abs(g.map(_._2).sum - 1.0) < 1e-12)
    assert(rows.map(_._1).distinct.length > 1)
  }

  test("q125 RFM features match a driver-side recompute") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val corpusMax = ev.map(_._2).max
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      u -> ((corpusMax - g.map(_._2).max, g.size.toLong,
        g.map(v => BigDecimal(v._3).setScale(2)).sum.toDouble,
        g.map(_._2 / 86400000000L).distinct.size.toLong))
    }
    val got = SparkEntry.queries("q125_rfm_features")(spark, Sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  test("q126 lands bad records in the audit group without touching good rows") {
    val rows = SparkEntry.queries("q126_corrupt_scan")(spark, Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("__corrupt") == ((2L, 0L)))
    val truth = Tables.documents(spark, Sf0001)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows - "__corrupt" == truth)
  }

  test("q127 groups nulls together and null-safe-joins them to themselves") {
    val rows = SparkEntry.queries("q127_null_semantics")(spark, Sf001).collect()
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getBoolean(4), "NULL group must match itself under <=>")
    assert(rows.forall(_.getBoolean(4)))
    // COUNT(col) skips the planted nulls, COUNT(*) does not
    assert(rows.forall(r => r.getLong(2) < r.getLong(1)))
  }

  test("q119 equals the exact-moment correlation computed driver-side") {
    val vals = Tables.lineitem(spark, Sf001)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = vals.groupBy(_._1).map { case (f, g) =>
      val n = g.length.toDouble
      def cents(d: Double): BigDecimal = BigDecimal(d).setScale(2)
      val sx = g.map(v => cents(v._2)).sum.toDouble
      val sy = g.map(v => cents(v._3)).sum.toDouble
      val sxx = g.map(v => cents(v._2) * cents(v._2)).sum.toDouble
      val syy = g.map(v => cents(v._3) * cents(v._3)).sum.toDouble
      val sxy = g.map(v => cents(v._2) * cents(v._3)).sum.toDouble
      f -> (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val got = SparkEntry.queries("q119_grouped_corr")(spark, Sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // driver-side replication reassociates the double ops → tolerance
    for ((f, e) <- expected) assert(math.abs(got(f) - e) < 1e-9, s"flag $f")
    assert(got.values.forall(v => v > -1.0 && v < 1.0))
  }
}
