package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by the query inventory. */
object Num {

  /** Parity-safe rounding: floor(x·10ⁿ + 0.5)/10ⁿ.
    *
    * Spark's `round()` routes doubles through `BigDecimal.valueOf`
    * (shortest-decimal string, HALF_UP), so an exact half like 4.725
    * rounds to 4.73 — while engines that round the raw binary double
    * (DuckDB, C) see 4.72499999999999964 and produce 4.72. This formula
    * is pure IEEE arithmetic, so any engine computing it over the same
    * input double yields the bit-identical result; the SQL oracles use
    * the same expression (`floor(x * 100 + 0.5) / 100`).
    */
  def roundp(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * p + 0.5) / p
  }
}
