package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token accounting: `graft_bpe_counts(text, merges)` returns
  * `[n_words, n_tokens, n_chars]` for one document in ONE compiled pass —
  * semantically identical to the chained higher-order fold in
  * [[graft.ops.Bpe.bpeEncodeHof]] (per word: chars + `</w>` symbols, then
  * each merge applied left-to-right non-overlapping in table order), but
  * without the interpreted-lambda tax: Spark higher-order functions are
  * CodegenFallback, so the 10-deep nested `aggregate` chain evaluates as
  * boxed closure frames per symbol — measured ~15 s for the sf0.1 corpus
  * vs well under a second compiled (the MinHashSig situation again: the
  * map-side inner loop every scanned document runs at 100 TB must be
  * compiled code, not an interpreted expression tree).
  *
  * `merges` is a foldable ARRAY<STRING> of tab-separated "left\tright"
  * pairs in table order (tab cannot appear in symbols — enforced by the
  * caller's require). Null text → null; words are the length ≥ 1
  * space-separated chunks, n_chars = Σ word lengths (whitespace
  * excluded), n_tokens counts post-merge symbols including each word's
  * end marker. BpeSpec asserts bit-equivalence against the HOF fold on
  * fixtures and corpus samples.
  */
case class BpeCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
        right.dataType.isInstanceOf[ArrayType] &&
        right.dataType.asInstanceOf[ArrayType].elementType == StringType &&
        right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bpe_counts requires (string text, foldable array<string> merges), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}" +
        (if (right.foldable) "" else " (non-foldable)"))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_counts"

  override def nullSafeEval(text: Any, merges: Any): Any =
    BpeCounts.compute(text.asInstanceOf[UTF8String], merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.expressions.BpeCounts.compute($t, $m)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeCounts =
    copy(left = l, right = r)
}

object BpeCounts {

  /** End-of-word marker — must equal [[graft.ops.Bpe]]'s. */
  private val Eow = "</w>"

  /** Per-thread memo of the last parsed merges literal. The merges
    * child is required foldable, so every row of a task evaluates to
    * the SAME ArrayData instance (a Literal reference) — an identity
    * check makes the tab-split parse once-per-task instead of
    * per-row (the kernel exists to remove per-row interpretation
    * cost; re-parsing up to 256 merge strings per row was exactly
    * that cost sneaking back in). */
  private val lastMerges =
    new ThreadLocal[(ArrayData, Array[String], Array[String])]

  private def parsedMerges(merges: ArrayData): (Array[String], Array[String]) = {
    val memo = lastMerges.get()
    if (memo != null && (memo._1 eq merges)) return (memo._2, memo._3)
    val nm = merges.numElements()
    val ls = new Array[String](nm)
    val rs = new Array[String](nm)
    var m = 0
    while (m < nm) {
      val pair = merges.getUTF8String(m).toString
      val tab = pair.indexOf('\t')
      require(tab >= 0, s"graft_bpe_counts: merge '$pair' is not tab-separated")
      ls(m) = pair.substring(0, tab)
      rs(m) = pair.substring(tab + 1)
      m += 1
    }
    lastMerges.set((merges, ls, rs))
    (ls, rs)
  }

  /** Static entry shared by interpreted eval and generated code.
    * Iteration is by Unicode CODE POINT, not UTF-16 unit — symbols,
    * word lengths and n_chars must agree with the HOF twin (Spark
    * `split(w, '')` / `length(w)`) and the DuckDB oracle, both of
    * which are code-point semantics; a supplementary-plane char is
    * ONE symbol, never a lone-surrogate pair. */
  def compute(text: UTF8String, merges: ArrayData): ArrayData = {
    val (ls, rs) = parsedMerges(merges)
    val nm = ls.length
    var m = 0
    var nWords = 0L
    var nTokens = 0L
    var nChars = 0L
    val s = text.toString
    var start = 0
    val n = s.length
    while (start <= n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) {
        val wlen = s.codePointCount(start, end)
        nWords += 1
        nChars += wlen
        // symbols: one per code point + the end-of-word marker
        var syms = new Array[String](wlen + 1)
        var i = 0
        var pos = start
        while (pos < end) {
          val cc = Character.charCount(s.codePointAt(pos))
          syms(i) = s.substring(pos, pos + cc)
          pos += cc
          i += 1
        }
        syms(wlen) = Eow
        var len = syms.length
        m = 0
        while (m < nm && len >= 2) {
          // one merge, left-to-right non-overlapping, in place
          val l = ls(m); val r = rs(m)
          var out = 0
          var i2 = 0
          while (i2 < len) {
            if (i2 + 1 < len && syms(i2) == l && syms(i2 + 1) == r) {
              syms(out) = l + r; i2 += 2
            } else {
              syms(out) = syms(i2); i2 += 1
            }
            out += 1
          }
          len = out
          m += 1
        }
        nTokens += len
      }
      start = end + 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(nWords, nTokens, nChars))
  }
}
