package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen dot product over two `ARRAY<FLOAT>` columns — the
  * perf-tier implementation of F8 (SURVEY.md §2.2: cosine over
  * L2-normalized vectors ≡ dot product; §7.3 upgrade path).
  *
  * Semantics are IDENTICAL to VectorFunctions.dotProduct (the
  * higher-order-function form): each float is widened to double before
  * multiplying, products accumulate left-to-right from 0.0 — so swapping
  * one for the other cannot change any oracle-checked result bit.
  *
  * Why it's faster: the HOF form (`aggregate(zip_with(...))`) allocates
  * an intermediate array and evaluates two lambda bodies per element
  * through the interpreted HigherOrderFunction path; this expression
  * compiles to a tight `for` loop over `ArrayData.getFloat` inside
  * whole-stage codegen — no allocation, no virtual calls in the loop.
  *
  * Nulls: null array → null result (BinaryExpression default). Null
  * ELEMENTS are not expected (embeddings are dense); behavior on them is
  * undefined-but-deterministic (treated as stored value), whereas the HOF
  * form would return null — don't feed sparse arrays.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // null on length mismatch (even for non-null inputs), so isNull must be
  // a real variable in codegen
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  /** Length mismatch → NULL, matching the HOF form exactly: `zip_with`
    * pads the shorter array with nulls, and the `aggregate` sum of a null
    * product is null. A partial dot product over min(n) elements would be
    * a plausible-but-wrong similarity on corrupt/mis-dimensioned input —
    * fail detectably instead. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}
