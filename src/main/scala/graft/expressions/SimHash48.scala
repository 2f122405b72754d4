package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 48-bit SimHash: `graft_simhash48(hs)` folds an array of 60-bit
  * shingle hashes into one fingerprint — bit b is set iff
  * `Σ_h (bit b of h ? +1 : -1) > 0`. Semantically identical to the
  * composed higher-order form
  * `aggregate(sequence(0,47), 0L, (acc,b) -> acc + CASE WHEN aggregate(hs, 0,
  *   (a,h) -> a + CASE WHEN shiftright(h,b)%2=1 THEN 1 ELSE -1 END) > 0
  *   THEN CAST(pow(2,b) AS BIGINT) ELSE 0L END)`
  * but in ONE pass over hs with an int[48] counter register — the HOF
  * form pays 48·|hs| interpreted lambda frames per row, which made q70
  * the most expensive query in the bench (3.7 s at sf0.1) before this.
  * At 100 TB the fingerprint runs per scanned document; this inner loop
  * is the job.
  *
  * Null semantics match the composed form: null input → null; null
  * elements are skipped (they contribute to no bit's vote); an empty or
  * all-null array yields 0 (every vote sum is 0, not > 0) — exactly what
  * the HOF evaluates to.
  */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash48 requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash48"

  override def nullSafeEval(input: Any): Any =
    SimHash48.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash48.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(hs: ArrayData): Long = {
    val votes = new Array[Int](48)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 48) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 48) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }
}
