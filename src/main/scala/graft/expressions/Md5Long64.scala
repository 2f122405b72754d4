package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 prefix hash: semantically identical to
  * `conv(substring(md5(s), 1, 15), 16, 10) :: long` but fused into ONE
  * expression with whole-stage codegen — no hex-string materialization,
  * no base-conversion parse, and (unlike the composed form) no
  * interpreted-HOF penalty when used inside transform() lambdas, which
  * is exactly where the dedup/similarity operators call it per shingle.
  *
  * The 15-hex-char prefix is the top 60 bits of the digest: the first 8
  * bytes read big-endian, shifted right by 4 — always non-negative, so
  * downstream modular arithmetic ((a·h+b) mod p) stays branch-free.
  * Cross-engine contract: equals DuckDB's
  * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)` bit for bit
  * (Md5Long64Spec asserts equivalence against the composed Spark form).
  */
case class Md5Long64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5long64 requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5long64"

  override def nullSafeEval(input: Any): Any =
    Md5Long64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Long64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long64 =
    copy(child = newChild)
}

object Md5Long64 {
  // MessageDigest is not thread-safe; one per task thread.
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Static entry shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 8 digest bytes big-endian, top 60 bits (== 15 hex chars)
    val top =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    top >>> 4
  }
}
