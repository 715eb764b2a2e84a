package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `ARRAY<FLOAT>` columns, accumulating in
  * double STRICTLY left-to-right — the same IEEE op order as the SQL
  * fold `aggregate(sequence(1,n), 0D, (acc,i) -> acc + a[i]*b[i])` and
  * as DuckDB's `list_reduce`, so results stay bit-identical to the
  * oracle formulation (queries/Similarity.scala) while running as one
  * tight codegen'd loop over the array data instead of n element_at
  * expression nodes.
  *
  * Custom-Catalyst tier (c) of the builder brief: used only because a
  * built-in formulation (HOF fold or unrolled sum) cannot express "loop
  * over ArrayData in generated code" — the HOF interprets a lambda per
  * element and the unrolled sum is O(n) expression nodes. NULL if either
  * side is NULL; mismatched lengths fold over the shorter prefix.
  * Registered as SQL function `dot_f32` via [[graft.GraftExtensions]].
  */
case class DotProductF32(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_f32 requires two ARRAY<FLOAT> arguments, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += xa.getFloat(i).toDouble * xb.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
