package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking cut positions in ONE O(L·w) pass — the
  * codegen replacement for the higher-order-function formulation that
  * made q115 the bench's worst query (38.7 s at sf0.1).
  *
  * Semantics (identical to the SQL/HOF form and to the DuckDB oracle
  * mirror, `OracleSql.cdcHash`): with 1-based CODEPOINT positions, a
  * cut falls at every i ∈ [window, numChars] where
  *
  *   H(i) = (Σ_{j<window} code(s[i−j]) · baseʲ mod p) mod p
  *
  * satisfies H(i) % divisor == 0. Terms sum un-modded — max
  * |Σ| ≈ w·0x10FFFF·p < 2⁶³ for the shipped (w=8, p=1000003), exact in
  * Int64 with no association sensitivity, hence bit-identical across
  * engines (the same portability argument as the HOF version carried).
  *
  * Why this exists: the HOF form evaluated
  * `ascii(substr(s, i−j, 1))` for w offsets at EVERY position inside
  * `filter(sequence(w, len), …)`, and each `substr(i, 1)` on a
  * UTF8String is an O(i) codepoint scan — O(L²·w) per document. This
  * expression walks the string's codepoints once, keeps the trailing
  * window in a ring buffer, and emits cut positions as it goes —
  * O(L·w) with w a small constant, inside whole-stage codegen via a
  * single static call (the [[DotProductF]] precedent).
  *
  * Nulls: null string → null (UnaryExpression default). Empty or
  * sub-window strings → empty array (no position reaches `window`).
  */
case class CdcCuts(
    child: Expression,
    window: Int,
    divisor: Int,
    base: Long,
    prime: Long)
  extends UnaryExpression {

  require(window >= 1, "window must be >= 1")
  require(divisor >= 1, "divisor must be >= 1")
  require(prime >= 1, "prime must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_cuts expects a STRING input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_cdc_cuts"

  override protected def nullSafeEval(input: Any): Any =
    CdcCuts.compute(input.asInstanceOf[UTF8String], window, divisor, base, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CdcCuts$$.MODULE$$.compute(" +
        s"$c, $window, $divisor, ${base}L, ${prime}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  /** The one-pass kernel (also the codegen call target). Iterates the
    * string by CODEPOINT (UTF8String positions are codepoint positions,
    * matching `substr`/`ord` in both Spark and DuckDB), maintaining the
    * trailing `window` codes in a ring buffer. */
  def compute(s: UTF8String, window: Int, divisor: Int,
              base: Long, prime: Long): ArrayData = {
    val str = s.toString
    val pow = new Array[Long](window)
    pow(0) = 1L
    var j = 1
    while (j < window) { pow(j) = pow(j - 1) * base % prime; j += 1 }

    val ring = new Array[Long](window)
    val cuts = new java.util.ArrayList[Integer]()
    var pos = 0 // 1-based codepoint position of the char just read
    var ci = 0  // UTF-16 char index into str
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      ci += Character.charCount(cp)
      ring(pos % window) = cp.toLong
      pos += 1
      if (pos >= window) {
        var h = 0L
        var k = 0
        while (k < window) {
          // codepoint at position pos - k (1-based) lives at ring slot
          // (pos - 1 - k) % window; pos - 1 - k >= 0 because pos >= window
          h += ring((pos - 1 - k) % window) * pow(k)
          k += 1
        }
        if (h % prime % divisor == 0) cuts.add(pos)
      }
    }
    val out = new Array[Int](cuts.size())
    var i = 0
    while (i < out.length) { out(i) = cuts.get(i); i += 1 }
    new GenericArrayData(out)
  }
}
