package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine parity rounding (SURVEY.md §6).
  *
  * Spark's `round(double, n)` rounds the value's shortest decimal
  * string HALF_UP; DuckDB rounds the binary value. On data full of
  * small rationals the two disagree whenever the true value lands on
  * a 10^-(n+1)·5 boundary. Expressing the rounding explicitly as
  * `floor(x·10^n + 0.5)/10^n` — the same IEEE ops in both engines —
  * makes results bit-identical by construction (and canonicalizes
  * -0.0 to +0.0 as a bonus). The DuckDB oracle must use the same
  * literal expression (see `Par.sql`).
  */
object Par {
  def round(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * p + 0.5) / p
  }

  def round4(c: Column): Column = round(c, 4)
  def round3(c: Column): Column = round(c, 3)

  /** The oracle-side spelling of the same expression. */
  def sql(expr: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"floor(($expr) * $p.0 + 0.5) / $p.0"
  }
}
