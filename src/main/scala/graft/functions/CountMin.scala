package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch as a typed [[Aggregator]] — the fourth
  * member of the custom-aggregation family (MisraGries: heavy-hitter
  * SET; KthSmallest: rank threshold; HllDistinct: distinct counts;
  * this: POINT-frequency estimates for arbitrary keys). [Cormode &
  * Muthukrishnan 2005.]
  *
  * State: [[CountMin.Depth]] = 4 rows × `width` long counters
  * (4·width·8 bytes per group, constant). Updates add 1 at one
  * position per row; merges add counter arrays element-wise — both
  * exactly associative/commutative over longs, so the final state is a
  * pure function of the input multiset: any partitioning, any merge
  * order, the identical bytes (unlike MisraGries, whose intermediate
  * WEIGHTS are partition-dependent).
  *
  * Guarantee: est(x) ≥ true(x) always (counters only over-count), and
  * per row the overshoot is ≤ N/width in expectation; the min over 4
  * rows makes est(x) ≤ true(x) + e·N/width with probability ≥ 1 − e⁻⁴
  * per probe. Each row xors a distinct 60-bit seed into the key BEFORE
  * the mod-p reduction, so two distinct keys congruent mod p do NOT
  * collide in every row at once (without the seed the shared reduction
  * would correlate all 4 rows at ~2⁻³¹ per key pair); the row hashes
  * are md5-seeded members of one universal family, not independent
  * draws, so the e⁻⁴ bound is the standard heuristic reading.
  *
  * Why next to MisraGries: MG + exact recount answers "what are the
  * top k?" exactly, but cannot answer "how often does THIS key occur?"
  * for a key outside its width — CMS answers any point probe from the
  * same one linear pass, and the stored state supports the
  * q193/refreshDistinctSketch maintenance discipline (element-wise sum
  * IS the refresh merge; deletions even subtract exactly, unlike HLL).
  *
  * Hashing: row i's position is the [[graft.ops.Hashes]] md5-derived
  * universal hash (((h xor s_i) mod p)·a_i + b_i mod p) mod width with
  * p = 2³¹ − 1, s_i a 60-bit per-row seed, and a_i, b_i < 2²⁸ (no
  * intermediate overflow: (2³¹)(2²⁸) < 2⁶³) — evaluable identically in
  * JVM code (the aggregator) and as Column arithmetic (the probe side,
  * [[CountMin.positionCol]]), so probes read exactly the cells updates
  * wrote. Every mod is floorMod/pmod in BOTH twins: the intended input
  * is the non-negative 60-bit `graft_md5long64` hash, but a caller
  * feeding `udaf(width)` an arbitrary long column gets well-defined,
  * twin-identical cells instead of a JVM ArrayIndexOutOfBounds on one
  * side and a null `element_at` on the other.
  */
final class CountMin(width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]]
    with Serializable {
  require(width >= 16 && width <= (1 << 22),
    s"CountMin width must be in [16, 2^22], got $width")

  import CountMin.{Depth, position}

  override def zero: Array[Long] = new Array[Long](Depth * width)

  override def reduce(b: Array[Long], hash: Long): Array[Long] = {
    var i = 0
    while (i < Depth) { b(i * width + position(hash, i, width)) += 1L; i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {
  /** Fixed row count: 4 rows bound the per-probe overshoot miss
    * probability at e⁻⁴ ≈ 1.8% (a format, not a knob — stored states
    * must merge cell-compatibly across runs, the HLL-register
    * rationale). */
  val Depth = 4

  private[graft] val P = (1L << 31) - 1

  /** md5-derived universal-hash constants, a_i odd and both < 2²⁸ —
    * small enough that ((h xor s) mod p)·a_i never overflows a long. */
  private[graft] val A: Array[Long] = Array.tabulate(Depth)(i =>
    java.lang.Long.parseLong(graft.ops.Hashes.md5Hex(s"graft-cms-a$i").substring(0, 7), 16) | 1L)
  private[graft] val B: Array[Long] = Array.tabulate(Depth)(i =>
    java.lang.Long.parseLong(graft.ops.Hashes.md5Hex(s"graft-cms-b$i").substring(0, 7), 16))

  /** Per-row 60-bit xor seeds: decorrelate the rows BEFORE the shared
    * mod-p reduction (see the class doc's collision note). */
  private[graft] val S: Array[Long] = Array.tabulate(Depth)(i =>
    java.lang.Long.parseLong(graft.ops.Hashes.md5Hex(s"graft-cms-s$i").substring(0, 15), 16))

  /** JVM-side cell position of `hash` in row `row` — MUST stay the twin
    * of [[positionCol]]. floorMod throughout: negative inputs (misuse —
    * the contract is the non-negative md5 hash) still land in-range and
    * twin-identical rather than crashing the aggregator. */
  private[graft] def position(hash: Long, row: Int, width: Int): Int =
    Math.floorMod(
      Math.floorMod(Math.floorMod(hash ^ S(row), P) * A(row) + B(row), P),
      width.toLong).toInt

  /** Column-side twin of [[position]]: the 0-based cell position within
    * row `row` (pmod mirrors the JVM side's floorMod on any input). */
  def positionCol(hash: Column, row: Int, width: Int): Column =
    pmod(pmod(pmod(hash.bitwiseXOR(lit(S(row))), lit(P)) * lit(A(row)) + lit(B(row)),
      lit(P)), lit(width.toLong))

  /** 1-based flat index into the stored array<long> state for
    * `element_at`. */
  def cellCol(hash: Column, row: Int, width: Int): Column =
    (lit(row * width) + positionCol(hash, row, width) + 1).cast("int")

  /** Point estimate from a stored state column: min over the Depth
    * rows' cells. */
  def estimateCol(state: Column, hash: Column, width: Int): Column =
    (0 until Depth).map(i => element_at(state, cellCol(hash, i, width)))
      .reduce(least(_, _))

  /** Untyped-column form: `udaf(width)(hashCol)` where hashCol is a
    * `graft_md5long64` 60-bit hash of the counted value. */
  def udaf(width: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CountMin(width), Encoders.scalaLong)
}
