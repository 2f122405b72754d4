package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: `graft_minhash(hs, a, b, p)` computes, in ONE
  * pass over the shingle-hash array, the k-element signature
  * `sig[j] = min_i ((a[j] * (hs[i] % p) + b[j]) % p)` — semantically
  * identical to the composed higher-order form
  * `transform(sequence(0,k-1), j -> array_min(transform(hs, h -> (a[j]*(h%p)+b[j])%p)))`
  * but without materializing k intermediate arrays per row or paying
  * k·|hs| interpreted lambda frames. This is the map-side inner loop of
  * MinHash-LSH dedup: at 100 TB every scanned document runs it, so the
  * interpreted form is the whole job's bottleneck (measured at sf0.1 it
  * dominates q26's runtime).
  *
  * Arithmetic contract (mirrors the DuckDB oracle in [[graft.ops.Dedup]]):
  * all values are int64; a[j] < p, hs%p < p with p = 2^31-1, so every
  * product stays < 2^62 — exact, branch-free, overflow-free.
  *
  * Null semantics match the composed form: any null input → null; null
  * elements of hs are skipped (array_min ignores nulls); an empty or
  * all-null hs yields an array of k nulls (array_min of empty = null).
  */
case class MinHashSig(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) && arr(third.dataType) &&
        fourth.dataType == LongType && second.foldable && third.foldable && fourth.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_minhash requires (array<bigint> hashes, foldable array<bigint> a, " +
        "foldable array<bigint> b, foldable bigint p), got " +
        Seq(first, second, third, fourth)
          .map(e => s"${e.dataType.catalogString}${if (e.foldable) "" else " (non-foldable)"}")
          .mkString(", "))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(hs: Any, a: Any, b: Any, p: Any): Any =
    MinHashSig.compute(hs.asInstanceOf[ArrayData], a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (hs, a, b, p) =>
      s"graft.expressions.MinHashSig.compute($hs, $a, $b, $p)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): MinHashSig =
    copy(first = f, second = s, third = t, fourth = q)
}

object MinHashSig {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(hs: ArrayData, a: ArrayData, b: ArrayData, p: Long): ArrayData = {
    val k = a.numElements()
    require(b.numElements() == k,
      s"graft_minhash: coefficient arrays differ in length (a=$k, " +
        s"b=${b.numElements()}) — reading past the shorter would be undefined")
    val n = hs.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val hm = hs.getLong(i) % p
        var j = 0
        while (j < k) {
          val v = (a.getLong(j) * hm + b.getLong(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
