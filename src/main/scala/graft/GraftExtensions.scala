package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.VectorExpressions.DotProduct

/** SparkSessionExtensions entry point — the engine's custom Catalyst surface
  * (SURVEY.md §7.3), wired the idiomatic way: sessions built with
  * `spark.sql.extensions=graft.GraftExtensions` get the native functions in
  * SQL (`SELECT graft_dot(a, b)`) as well as through the Column API
  * (graft.functions.VectorExpressions.dotd). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
  }
}
