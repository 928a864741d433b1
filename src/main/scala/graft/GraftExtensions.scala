package graft

import graft.functions.FloatDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native expressions
  * into the SQL function registry, so SQL users get the same codegen'd
  * operators as the DataFrame API
  * (`SELECT float_dot(a.embedding, b.embedding) ...`).
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions) or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"float_dot requires exactly 2 arguments, got ${exprs.length}")
        FloatDot(exprs(0), exprs(1))
      }))
  }
}
