package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic rounding.
  *
  * Spark's `round()` goes through BigDecimal(HALF_UP) on the exact binary
  * expansion; DuckDB's goes through C library rounding — on half-boundary
  * values (exact binary fractions like 3/64 are common in ratio columns)
  * the two disagree in the last decimal. `floor(x * 10^d + 0.5) / 10^d`
  * uses only IEEE-754 ops (multiply, add, floor, divide), each correctly
  * rounded and bit-identical in every engine, so rounding a bit-identical
  * Double yields a bit-identical result everywhere.
  */
object PortableMath {

  /** Round to `digits` decimals, bit-reproducibly across engines. */
  def rnd(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits) // exact Double for digits <= 15
    floor(c * p + 0.5) / p
  }

  /** The DuckDB-SQL mirror of [[rnd]]. */
  def sqlRnd(inner: String, digits: Int): String = {
    val p = math.pow(10, digits).toLong
    s"floor(($inner) * $p.0 + 0.5) / $p.0"
  }

  /** FLOOR division of a long column by a positive literal, matching
    * DuckDB's `//`. Spark's `div` truncates toward zero, so the two
    * disagree on negative dividends (pre-epoch timestamps in the
    * hour/week grain columns: -1 div 3600 = 0 but -1 // 3600 = -1).
    * `x - pmod(x, m)` is the largest multiple of m that is ≤ x, and
    * integral-dividing an exact multiple is the same under both
    * conventions — integer-exact at any magnitude (no double
    * round-trip; `Column./` would detour through DOUBLE). */
  def floorDiv(c: Column, m: Long): Column = {
    require(m > 0, s"floorDiv needs a positive divisor, got $m")
    import org.apache.spark.sql.graftbridge.Bridge
    val multiple = (c - pmod(c, lit(m))).cast("long")
    Bridge.column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      Bridge.expression(multiple), Bridge.expression(lit(m))))
  }
}
