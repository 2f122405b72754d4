package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{BpeCounts, DotF64, Md5Long64, MinHashSig, SimHash48}

/** Engine extension point (SparkSessionExtensions): registers graft's
  * custom Catalyst expressions so they resolve by name in SQL text and
  * via call_function — the sanctioned path for native codegen'd
  * functions (preferred over UDFs, which are optimizer-opaque and
  * codegen-breaking). Installed by [[Sessions.local]]; any external
  * session opts in with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_md5long64"),
      new ExpressionInfo(classOf[Md5Long64].getName, "graft_md5long64"),
      (children: Seq[Expression]) => Md5Long64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_f64"),
      new ExpressionInfo(classOf[DotF64].getName, "graft_dot_f64"),
      (children: Seq[Expression]) => DotF64(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash48"),
      new ExpressionInfo(classOf[SimHash48].getName, "graft_simhash48"),
      (children: Seq[Expression]) => SimHash48(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) =>
        MinHashSig(children.head, children(1), children(2), children(3))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_counts"),
      new ExpressionInfo(classOf[BpeCounts].getName, "graft_bpe_counts"),
      (children: Seq[Expression]) => BpeCounts(children.head, children(1))))
  }
}
