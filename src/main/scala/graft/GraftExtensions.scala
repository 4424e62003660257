package graft

import graft.expressions.{CdcCuts, DotProductF}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("... graft_dot(a, b) ...")`
  * works alongside the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` on the
  * session builder (the standard extension-library hook — no Spark fork,
  * no reflection).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes two arguments")
        DotProductF(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_cuts"),
      new ExpressionInfo(classOf[CdcCuts].getName, "graft_cdc_cuts"),
      (children: Seq[Expression]) => {
        require(children.length == 5,
          "graft_cdc_cuts(s, window, divisor, base, prime) takes five arguments")
        def intArg(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_cdc_cuts: $name must be an INT literal, got $other")
        }
        def longArg(e: Expression, name: String): Long = e match {
          case Literal(v: Int, _)  => v.toLong
          case Literal(v: Long, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_cdc_cuts: $name must be an integer literal, got $other")
        }
        CdcCuts(children.head,
          intArg(children(1), "window"), intArg(children(2), "divisor"),
          longArg(children(3), "base"), longArg(children(4), "prime"))
      }))
  }
}
