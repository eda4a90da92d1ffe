package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CrossHash, Hash32Array, Hash64Array, MinHashDoc, MinHashSig, PqCodes, SetIntersect, SetJaccard, SimHash32, SimHash64, SumFixedN, VecDot}
import graft.ops.DedupOps

/** Session-extension entry point for the engine's custom Catalyst
  * surface. Enable with:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or programmatically `.withExtensions(new GraftExtensions)`.
  * (Library code paths also self-register via `VecDot.register` so
  * plain sessions work; this class is the spark-submit-friendly
  * front door.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        MinHashSig(children.head, DedupOps.A, DedupOps.B, CrossHash.P)))
    ext.injectFunction((
      FunctionIdentifier("hash32_array"),
      new ExpressionInfo(classOf[Hash32Array].getName, "hash32_array"),
      (children: Seq[Expression]) => Hash32Array(children.head)))
    ext.injectFunction((
      FunctionIdentifier("hash64_array"),
      new ExpressionInfo(classOf[Hash64Array].getName, "hash64_array"),
      (children: Seq[Expression]) => Hash64Array(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => SimHash32(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_doc"),
      new ExpressionInfo(classOf[MinHashDoc].getName, "minhash_doc"),
      (children: Seq[Expression]) =>
        MinHashDoc(children.head, DedupOps.A, DedupOps.B, CrossHash.P)))
    ext.injectFunction((
      FunctionIdentifier("set_jaccard"),
      new ExpressionInfo(classOf[SetJaccard].getName, "set_jaccard"),
      (children: Seq[Expression]) => SetJaccard(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_codes"),
      new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
      (children: Seq[Expression]) => PqCodes(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("set_intersect"),
      new ExpressionInfo(classOf[SetIntersect].getName, "set_intersect"),
      (children: Seq[Expression]) => SetIntersect(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("sum_fixed6"),
      new ExpressionInfo(classOf[SumFixedN].getName, "sum_fixed6"),
      (children: Seq[Expression]) => SumFixedN(children.head, 6)))
    ext.injectFunction((
      FunctionIdentifier("sum_fixed12"),
      new ExpressionInfo(classOf[SumFixedN].getName, "sum_fixed12"),
      (children: Seq[Expression]) => SumFixedN(children.head, 12)))
  }
}
