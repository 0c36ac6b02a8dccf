package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric determinism helpers.
  *
  * A distributed `sum(double)` is accumulation-order dependent, so Spark
  * (parallel partitions) and DuckDB (single-threaded or vectorized) can
  * differ in the last ulps — enough to fail a hash compare. The fix: each
  * row's value is cast to DECIMAL(30,6) (a deterministic rounding of a
  * bit-identical double), summed exactly in decimal, and only the final
  * result is cast back to double. Per-row double arithmetic (products,
  * ratios) is bit-identical across engines (IEEE 754), so only the
  * *aggregation* step needs the decimal detour.
  *
  * The DuckDB oracle mirror is `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS
  * DOUBLE)` — see [[dsumSql]].
  */
object Num {
  /** Order-independent exact sum of a double column, returned as double.
    *
    * MAGNITUDE PRECONDITION (the q34 lesson): each summand quantizes to
    * the 10⁻⁶ grid, so a summand whose magnitude sits BELOW 10⁻⁶
    * contributes zero — IDENTICALLY in both engines, so the hash gate
    * cannot see it. Per-term quantization error is ≤ 5·10⁻⁷ and
    * deterministic, which is fine when typical terms are O(1); it is
    * catastrophic when ALL terms are tiny (PageRank's ~1/(N·outdeg)
    * contributions lost 35% of probability mass at 16k nodes). Use this
    * detour only where the typical summand is ≥ 10⁻⁶ — every call site
    * documents its bound — and the DECIMAL(38,18) grid
    * ([[graft.operators.Graph.pageRank]]) for small-magnitude mass
    * sums. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")

  /** Deterministic mean: exact decimal sum divided by non-null count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB SQL fragment equivalent to [[dsum]] — [[dsum]]'s magnitude
    * precondition applies verbatim (the mirrors share the grid, which is
    * exactly why a below-grid summand is invisible to the hash gate). */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE)"

  /** DuckDB SQL fragment equivalent to [[davg]]. */
  def davgSql(expr: String): String =
    s"${dsumSql(expr)} / COUNT($expr)"
}
