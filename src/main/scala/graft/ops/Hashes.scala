package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing primitives.
  *
  * Everything in the dedup / similarity / fingerprint operators must
  * produce BIT-IDENTICAL values in Spark and in the DuckDB oracle, so all
  * pseudo-randomness is derived from md5 — the one hash both engines
  * implement identically (lowercase hex of the RFC 1321 digest). A
  * 15-hex-char (60-bit) prefix parses into a non-negative signed 64-bit
  * integer on both sides: Spark `conv(hex,16,10)` ↔ DuckDB
  * `CAST('0x'||hex AS BIGINT)`.
  *
  * At the 100 TB design point these expressions are all codegen-friendly
  * scalar/higher-order built-ins evaluated row-local (no shuffle, no UDF,
  * no driver state) — hashing cost scales linearly and embarrassingly
  * parallel with the scan.
  */
object Hashes {

  /** md5-derived 60-bit non-negative hash of a string column — the
    * custom codegen'd [[graft.expressions.Md5Long64]] (registered via
    * [[graft.GraftExtensions]]); semantically identical to
    * `conv(substring(md5(c),1,15),16,10)::long` but one fused native
    * call (Md5Long64Spec asserts the equivalence). */
  def hexLong(c: Column): Column =
    call_function("graft_md5long64", c)

  /** Driver-side md5 hex (same digest the engines compute) for deriving
    * constant hyperplanes / seeds at plan-build time. */
  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Deterministic pseudo-random value in [-1, 1] for (tag, index) —
    * reproducible in SQL as
    * `(CAST('0x'||substr(md5(tag||':'||i),1,15) AS BIGINT) % 2001 - 1000)/1000.0`. */
  def pseudoUniform(tag: String, i: Int): Double =
    (java.lang.Long.parseLong(md5Hex(s"$tag:$i").substring(0, 15), 16) % 2001 - 1000) / 1000.0
}
