package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path
  * (SURVEY.md §7.3: a codegen'd `Expression` beats the interpreted
  * higher-order-function pipeline by ~10× on the O(n²) scoring stages).
  *
  * Semantics deliberately match the HOF/oracle formulation bit-for-bit:
  * a strict left-to-right fold `((0 + x0·y0) + x1·y1) + …`, the same
  * association order as DuckDB's `list_dot_product` over DOUBLE[] — so
  * queries using this expression stay hash-checkable against the oracle.
  *
  * Fixture embeddings contain no null elements; element nulls read as 0.0
  * via ArrayData.getDouble (documented engine restriction — declared-schema
  * vectors are non-null by contract, §1.3).
  */
object VectorExpressions {

  /** dot(a, b) over ArrayType(DoubleType), whole-stage-codegen'd. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0d
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: dot product of two double-array columns. */
  def dotd(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
