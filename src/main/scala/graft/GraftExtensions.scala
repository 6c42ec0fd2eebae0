package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayDotProduct, AsciiRollingHash}
import graft.llm.TextAnalysis

/** Session extensions registering graft's native Catalyst expressions so
  * they are callable from SQL and `functions.call_function`. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, null, "graft_dot",
        "graft_dot(a, b) - codegen'd dot product of two double arrays", ""),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_dot requires exactly 2 arguments, got ${children.size}")
        ArrayDotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[AsciiRollingHash].getName, null, "graft_fingerprint",
        "graft_fingerprint(text) - codegen'd rolling hash of the ASCII projection", ""),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_fingerprint requires exactly 1 argument, got ${children.size}")
        AsciiRollingHash(children(0), TextAnalysis.FpMod)
      }))
  }
}
