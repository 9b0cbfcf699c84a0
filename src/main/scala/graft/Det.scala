package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers (SURVEY.md §7.3).
  *
  * Rule 1: every floating-point aggregate/derived value in an oracle-compared
  * output is wrapped in `round(x, 4)` — raw double sums differ across engines
  * in the last ulps; round(4) was verified to match DuckDB 1.0.0 on every
  * parity probe.
  *
  * Rule 5: every oracle-compared output ends with a total ORDER BY that
  * includes a unique tiebreaker (or all output columns), so row order is a
  * pure function of row content on both engines.
  */
object Det {
  /** Cross-engine-stable rounding for doubles. */
  def r4(c: Column): Column = round(c, 4)
}
