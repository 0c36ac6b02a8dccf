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
  /** Order-independent exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")

  /** Deterministic mean: exact decimal sum divided by non-null count. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB SQL fragment equivalent to [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE)"

  /** DuckDB SQL fragment equivalent to [[davg]]. */
  def davgSql(expr: String): String =
    s"${dsumSql(expr)} / COUNT($expr)"
}
