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
  *     SimHash fingerprint;
  *   - `bloom_agg(BIGINT, BIGINT, BIGINT) -> BINARY` /
  *     `bloom_might_contain(BINARY, BIGINT) -> BOOLEAN`, public names
  *     for Spark's own bloom-filter aggregate + probe (they live in the
  *     INTERNAL function registry, reachable only from the runtime-
  *     filter rewrite, not from user SQL) — the building blocks of the
  *     contamination bloom pre-pass. No new sketch code: the engine
  *     reuses `org.apache.spark.util.sketch.BloomFilter` exactly as
  *     `InjectRuntimeFilter` does.
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
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"bloom_agg expects (value, estimatedItems, numBits), got ${args.length}")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"bloom_might_contain expects (bloom, value), got ${args.length}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))
      }))
  }
}
