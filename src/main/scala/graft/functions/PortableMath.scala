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
}
