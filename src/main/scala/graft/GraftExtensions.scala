package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductF32, MinHashSig, SimHash32}

/** Session extensions for the engine's native functions (the public
  * registration path — set `spark.sql.extensions=graft.GraftExtensions`
  * on the session builder; Verify/Bench/Pipeline/tests all do).
  *
  * Currently:
  *   - `dot_f32(ARRAY<FLOAT>, ARRAY<FLOAT>) -> DOUBLE`, the codegen'd
  *     sequential dot product used by the similarity queries;
  *   - `minhash_sig(ARRAY<STRING>) -> ARRAY<STRING>`, the 12-value
  *     MinHash signature kernel;
  *   - `simhash32(ARRAY<STRING>) -> BIGINT`, the 32-bit bit-majority
  *     SimHash fingerprint.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"dot_f32 expects 2 arguments, got ${args.length}")
        DotProductF32(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"minhash_sig expects 1 argument, got ${args.length}")
        MinHashSig(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"simhash32 expects 1 argument, got ${args.length}")
        SimHash32(args.head)
      }))
  }
}
