package graft

import graft.expressions.DotProductF
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
  }
}
