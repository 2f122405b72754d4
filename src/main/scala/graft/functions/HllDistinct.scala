package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed [[Aggregator]] (Flajolet
  * et al. 2007, with the small-range linear-counting correction of
  * HLL++) — the third member of the custom-aggregation family next to
  * [[MisraGries]] (heavy hitters) and [[KthSmallest]] (top-k threshold).
  *
  * Why not COUNT(DISTINCT): exact distinct shuffles every distinct value
  * — counting distinct shingles/users/tokens per group on a 100 TB
  * corpus moves the whole key space. This sketch carries m = 4096 byte
  * registers (4 KB, constant) per group, merges by register-wise max
  * (commutative + associative ⇒ partial aggregation and any merge order
  * give the identical sketch), and answers within ~1.6% (1.04/√m).
  *
  * Input is a 60-bit non-negative hash (the engine's `graft_md5long64`
  * output): bits [0,p) pick the register, the rank is the position of
  * the lowest set bit in the remaining 48 — so the sketch, and hence the
  * estimate, is a pure function of the input SET. No randomness, no
  * partition dependence: the same corpus gives the same count on 1
  * thread or 1000 executors. The ln/pow in `finish` run once per GROUP
  * on identical register states — JVM-deterministic (no cross-engine
  * contract: sketches are declared no-oracle).
  */
final class HllDistinct
    extends Aggregator[Long, Array[Byte], Long]
    with Serializable {

  import HllDistinct.{M, estimate, mergeInto, observe}

  override def zero: Array[Byte] = new Array[Byte](M)
  override def reduce(b: Array[Byte], hash: Long): Array[Byte] = observe(b, hash)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeInto(a, b)
  override def finish(b: Array[Byte]): Long = estimate(b)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** The sketch itself as the aggregate value: (group → 4 KB register
  * array). The STORED form of [[HllDistinct]] — persist per-partition
  * sketches (a materialized-view/state table), then union them later
  * with [[HllUnion]] without rescanning base data; any union of
  * sketches estimates IDENTICALLY to a direct pass over the union of
  * the raw inputs (register-max is associative/commutative/idempotent). */
final class HllSketch
    extends Aggregator[Long, Array[Byte], Array[Byte]]
    with Serializable {
  import HllDistinct.{M, mergeInto, observe}
  override def zero: Array[Byte] = new Array[Byte](M)
  override def reduce(b: Array[Byte], hash: Long): Array[Byte] = observe(b, hash)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeInto(a, b)
  override def finish(b: Array[Byte]): Array[Byte] = b
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union stored sketches back into a SKETCH (state in, state out) —
  * the aggregate [[graft.ops.HeavyHitters.refreshDistinctSketch]] runs
  * at state grain: standing + delta sketches per group collapse to the
  * refreshed register state. Same loud wrong-size rejection as
  * [[HllUnion]]. */
final class HllUnionSketch
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]]
    with Serializable {
  import HllDistinct.{M, mergeInto}
  override def zero: Array[Byte] = new Array[Byte](M)
  override def reduce(b: Array[Byte], sk: Array[Byte]): Array[Byte] = {
    require(sk.length == M, s"not a graft HLL sketch: ${sk.length} registers, want $M")
    mergeInto(b, sk)
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeInto(a, b)
  override def finish(b: Array[Byte]): Array[Byte] = b
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union stored sketches back into one estimate: the refresh side of
  * the sketch-state pattern. Rejects wrong-sized blobs loudly. */
final class HllUnion
    extends Aggregator[Array[Byte], Array[Byte], Long]
    with Serializable {
  import HllDistinct.{M, estimate, mergeInto}
  override def zero: Array[Byte] = new Array[Byte](M)
  override def reduce(b: Array[Byte], sk: Array[Byte]): Array[Byte] = {
    require(sk.length == M, s"not a graft HLL sketch: ${sk.length} registers, want $M")
    mergeInto(b, sk)
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeInto(a, b)
  override def finish(b: Array[Byte]): Long = estimate(b)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HllDistinct {
  /** Register-count exponent / register count: 4096 registers ⇒ ~1.6%
    * standard error at 4 KB per group. */
  val P = 12
  val M: Int = 1 << P

  private[functions] def observe(b: Array[Byte], hash: Long): Array[Byte] = {
    val idx = (hash & (M - 1)).toInt
    val rest = hash >>> P // 48 significant bits remain of the 60-bit hash
    // rank = 1-based position of the lowest set bit, 49 if none
    val rank = if (rest == 0L) (61 - P) else java.lang.Long.numberOfTrailingZeros(rest) + 1
    if (rank > b(idx)) b(idx) = rank.toByte
    b
  }

  private[functions] def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  private[functions] def estimate(b: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.scalb(1.0, -b(i)) // 2^-register, exact
      if (b(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M) // standard bias constant, m >= 128
    val raw = alpha * M * M / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) // linear counting
      else raw
    math.rint(est).toLong
  }

  /** Untyped-column form: `udaf(hashCol)` where hashCol is a
    * `graft_md5long64` 60-bit hash of the counted value. */
  val udaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllDistinct, Encoders.scalaLong)

  /** Sketch-producing form (group → binary registers). */
  val sketchUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllSketch, Encoders.scalaLong)

  /** Sketch-union form (binary registers → estimate). */
  val unionUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllUnion, Encoders.BINARY)

  /** Sketch-union form keeping the STATE (binary registers → binary
    * registers) — the refresh aggregate. */
  val unionSketchUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllUnionSketch, Encoders.BINARY)
}
