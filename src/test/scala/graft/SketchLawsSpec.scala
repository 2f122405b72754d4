package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the custom Aggregator kernels, checked on
  * randomized inputs straight at the JVM level (no Spark session — the
  * Aggregator contract is zero/reduce/merge/finish, and Spark only ever
  * composes those, so laws proven here hold under ANY partitioning and
  * merge tree the engine produces). Fixed fixtures in CmsSpec/HllSpec/
  * MisraGriesSpec pin specific values; these pin the ALGEBRA:
  * split-merge equivalence, idempotence, order-invariance, and the
  * one-sided error guarantees, each over hundreds of random multisets. */
class SketchLawsSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, trials: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), p)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  private val hashes: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, (1L << 60) - 1)) // md5long64 domain

  // random 3-way split point pair for split-merge laws
  private def splits(n: Int): Gen[(Int, Int)] = for {
    a <- Gen.chooseNum(0, n)
    b <- Gen.chooseNum(a, n)
  } yield (a, b)

  test("CMS: split-merge == sequential (exact state algebra), est >= true count, never under") {
    val w = 64
    def state(xs: Seq[Long]): Array[Long] = {
      val agg = new functions.CountMin(w)
      xs.foldLeft(agg.zero)(agg.reduce)
    }
    def est(st: Array[Long], x: Long): Long =
      (0 until functions.CountMin.Depth)
        .map(i => st(i * w + functions.CountMin.position(x, i, w))).min
    check("cms-laws", Prop.forAll(hashes) { xs =>
      Prop.forAll(splits(xs.length)) { case (a, b) =>
        val agg = new functions.CountMin(w)
        val (p1, rest) = xs.splitAt(a); val (p2, p3) = rest.splitAt(b - a)
        val merged = agg.merge(agg.merge(state(p1), state(p2)), state(p3))
        val seqState = state(xs)
        val counts = xs.groupBy(identity).view.mapValues(_.size.toLong)
        (merged.toSeq == seqState.toSeq) :| "split-merge != sequential" &&
          counts.forall { case (x, c) => est(seqState, x) >= c } :| "underestimate"
      }
    })
  }

  test("HLL: duplicate-idempotent, order-invariant, merge == union pass (exact bytes)") {
    def state(xs: Seq[Long]): Array[Byte] = {
      val agg = new functions.HllDistinct
      xs.foldLeft(agg.zero)(agg.reduce)
    }
    check("hll-laws", Prop.forAll(hashes, hashes) { (xs, ys) =>
      val agg = new functions.HllDistinct
      val dupTwice = state(xs ++ xs)
      val shuffled = state(xs.reverse)
      val merged = agg.merge(state(xs), state(ys))
      (dupTwice.toSeq == state(xs).toSeq) :| "duplicates moved registers" &&
        (shuffled.toSeq == state(xs).toSeq) :| "order moved registers" &&
        (merged.toSeq == state(xs ++ ys).toSeq) :| "merge != one union pass"
    })
    // linear-counting regime: small DISTINCT sets count near-exactly
    // (a register collision — λ ≈ C(16,2)/4096 per trial — shifts the
    // estimate by ~1, hence the ±2 envelope, never a systematic bias)
    check("hll-small-near-exact", Prop.forAll(
      Gen.listOf(Gen.chooseNum(0L, (1L << 60) - 1)).map(_.distinct.take(16))) { xs =>
      val agg = new functions.HllDistinct
      val e = agg.finish(state(xs))
      (math.abs(e - xs.length.toLong) <= 2L) :| s"small-N estimate $e for N=${xs.length}"
    })
  }

  test("Misra-Gries: every term above N/(width+1) survives any split-merge tree") {
    val width = 8
    val terms: Gen[List[String]] =
      Gen.listOf(Gen.oneOf((0 until 40).map(i => s"t$i")))
    def state(xs: Seq[String]): Map[String, Long] = {
      val agg = new functions.MisraGries(width)
      xs.foldLeft(agg.zero)(agg.reduce)
    }
    check("mg-guarantee", Prop.forAll(terms) { xs =>
      Prop.forAll(splits(xs.length)) { case (a, b) =>
        val agg = new functions.MisraGries(width)
        val (p1, rest) = xs.splitAt(a); val (p2, p3) = rest.splitAt(b - a)
        val merged = agg.merge(agg.merge(state(p1), state(p2)), state(p3))
        val n = xs.length.toLong
        val mustSurvive = xs.groupBy(identity).collect {
          case (t, g) if g.size.toLong * (width + 1) > n => t
        }
        mustSurvive.forall(merged.contains) :|
          s"lost a guaranteed heavy hitter among $mustSurvive"
      }
    })
  }

  // ---- streaming-replay laws (round 11) ---------------------------------
  // The streaming paths (hourlyDistinctUsers / hourlyUserSketch) evolve one
  // state-store buffer per open window across TRIGGERS: each micro-batch's
  // shuffle partials merge into a batch state, which merges into the
  // standing state — a left-deep, time-ordered merge chain the batch specs'
  // single 3-way split never exercises. Decompositions are seeded-random
  // (reproducible per trial): ordered micro-batches, rows shuffled within a
  // batch (a repartitioned replay), each batch split into shuffled partials.

  private def randSplit[T](xs: List[T], rnd: scala.util.Random,
                           maxParts: Int): List[List[T]] = {
    val k = 1 + rnd.nextInt(maxParts)
    val cuts = List.fill(k - 1)(rnd.nextInt(xs.length + 1)).sorted
    ((0 :: cuts) zip (cuts :+ xs.length)).map { case (a, b) => xs.slice(a, b) }
  }

  test("HLL streaming replay: any micro-batch schedule + repartitioned batches == one batch pass (exact bytes)") {
    def state(xs: Seq[Long]): Array[Byte] = {
      val agg = new functions.HllDistinct
      xs.foldLeft(agg.zero)(agg.reduce)
    }
    check("hll-stream-replay", Prop.forAll(hashes, Gen.long) { (xs, seed) =>
      val agg = new functions.HllDistinct
      val rnd = new scala.util.Random(seed)
      var st = agg.zero
      randSplit(xs, rnd, 5).foreach { batch =>
        val partials = randSplit(rnd.shuffle(batch), rnd, 4).map(state)
        val batchState = partials.foldLeft(agg.zero)(agg.merge)
        st = agg.merge(st, batchState)
      }
      (st.toSeq == state(xs).toSeq) :|
        "streaming-shaped fold produced different sketch bytes than one batch pass"
    })
  }

  test("Misra-Gries streaming replay: candidates after any micro-batch fold contain every true heavy hitter") {
    val width = 8
    val terms: Gen[List[String]] =
      Gen.listOf(Gen.oneOf((0 until 40).map(i => s"t$i")))
    def state(xs: Seq[String]): Map[String, Long] = {
      val agg = new functions.MisraGries(width)
      xs.foldLeft(agg.zero)(agg.reduce)
    }
    check("mg-stream-replay", Prop.forAll(terms, Gen.long) { (xs, seed) =>
      val agg = new functions.MisraGries(width)
      val rnd = new scala.util.Random(seed)
      var st = agg.zero
      randSplit(xs, rnd, 5).foreach { batch =>
        val partials = randSplit(rnd.shuffle(batch), rnd, 4).map(state)
        val batchState = partials.foldLeft(agg.zero)(agg.merge)
        st = agg.merge(st, batchState)
      }
      val n = xs.length.toLong
      val mustSurvive = xs.groupBy(identity).collect {
        case (t, g) if g.size.toLong * (width + 1) > n => t
      }
      mustSurvive.forall(st.contains) :|
        s"streaming-shaped fold lost a guaranteed heavy hitter among $mustSurvive"
    })
  }

  test("KthSmallest: finish == the k-th order statistic under any split-merge tree") {
    val k = 5
    val pairs: Gen[List[(Long, Long)]] = Gen.listOf(for {
      v <- Gen.chooseNum(-1000L, 1000L)
      id <- Gen.chooseNum(0L, 1L << 40)
    } yield (v, id))
    def state(xs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val agg = new functions.KthSmallest(k)
      xs.foldLeft(agg.zero)(agg.reduce)
    }
    check("kth-order-stat", Prop.forAll(pairs) { xs =>
      Prop.forAll(splits(xs.length)) { case (a, b) =>
        (xs.length >= k) ==> {
          val agg = new functions.KthSmallest(k)
          val (p1, rest) = xs.splitAt(a); val (p2, p3) = rest.splitAt(b - a)
          val merged = agg.merge(agg.merge(state(p1), state(p2)), state(p3))
          (agg.finish(merged) == xs.sorted.apply(k - 1)) :| "not the k-th order statistic"
        }
      }
    })
  }
}
