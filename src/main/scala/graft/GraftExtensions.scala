package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
import org.apache.spark.sql.catalyst.expressions.ConcatWs

import graft.functions.TextExpressions.NfcNormalize
import graft.functions.VectorExpressions.{DotProduct, HexPack16, SignPack32}

/** SparkSessionExtensions entry point — the engine's custom Catalyst surface
  * (SURVEY.md §7.3), wired the idiomatic way: sessions built with
  * `spark.sql.extensions=graft.GraftExtensions` get the native functions in
  * SQL as well as through the Column API.
  *
  * Besides the vector hot-path function, this registers the MySQL-dialect
  * spelling the reference's clients use (SURVEY.md §7.2 P6): `group_concat`
  * — the one §2B scalar/aggregate name Spark lacks (Spark already ships
  * `ifnull`, `nvl`, `instr`, `if` natively). `group_concat(x)` here is the
  * deterministic ordered variant: elements sorted ascending, comma-joined
  * (MySQL's `GROUP_CONCAT(x ORDER BY x)` default-separator form — pinned to
  * the ordered flavor so results stay oracle-checkable). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hexpack16"),
      new ExpressionInfo(classOf[HexPack16].getName, "graft_hexpack16"),
      (children: Seq[Expression]) => HexPack16(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_signpack32"),
      new ExpressionInfo(classOf[SignPack32].getName, "graft_signpack32"),
      (children: Seq[Expression]) => SignPack32(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("group_concat"),
      new ExpressionInfo(classOf[ConcatWs].getName, "group_concat"),
      (children: Seq[Expression]) =>
        ConcatWs(Seq(Literal(","),
          SortArray(CollectList(children.head).toAggregateExpression(),
            Literal(true))))))
  }
}
