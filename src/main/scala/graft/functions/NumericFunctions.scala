package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric edge-formatting helpers.
  *
  * `duckRound` exists because Spark's `round(x, n)` and DuckDB's differ on
  * doubles whose decimal tail sits just under a half boundary: DuckDB
  * computes `std::round(x * 10^n) / 10^n` in double arithmetic (the multiply
  * can round a ...4999 tail up onto an exact .5), while Spark rounds the
  * exact decimal expansion of the double (BigDecimal HALF_UP). Example:
  * x = 0.8687499999999999 → DuckDB 0.8688, Spark 0.8687.
  *
  * For differential testing against a DuckDB oracle we reproduce DuckDB's
  * algorithm with Spark built-ins: `x * 10^n` (same double multiply), then
  * `round(_, 0)` (exact-half away from zero — identical to `std::round` for
  * every double), then divide. All codegen'd; used only at output edges, so
  * plans are unaffected.
  */
object NumericFunctions {
  def duckRound(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    round(c * lit(p), 0) / lit(p)
  }
}
