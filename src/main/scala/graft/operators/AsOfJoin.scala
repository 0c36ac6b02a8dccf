package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * the same key whose timestamp is ≤ the left timestamp — the standard
  * time-series enrichment operator Spark lacks natively.
  *
  * Implemented by composition (SURVEY §7.4 preference (a)): tag both
  * sides, union, and take `last(payload, ignoreNulls)` over a
  * (key-partitioned, time-ordered) window with right rows sorted before
  * left rows at equal timestamps (inclusive match). One shuffle on the
  * key, one sort — the same cost as a sort-merge join, with none of the
  * range-condition blowup a naive `l.ts >= r.ts` join would produce
  * (that one is O(|L|·|R|) per key).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (must be unique per (key, time) —
    *                   pre-dedupe if not, or matches are ambiguous)
    * @param key        equi-join key column name (both sides)
    * @param time       event-time column name (both sides)
    * @param payload    right-side columns to attach (renamed with prefix)
    * @param prefix     prefix for attached columns, default "asof_"
    * @param strict     false (default): a right row AT the left row's
    *                   exact timestamp is visible (the ASOF `>=`
    *                   convention — kdb+ `aj`, DuckDB's default).
    *                   true: only STRICTLY earlier right rows match
    *                   (`>`), the lookback leakage-sensitive feature
    *                   pipelines need — a feature computed "as of" a
    *                   label event must not see data stamped at the
    *                   label's own instant. Same plan either way; only
    *                   the same-timestamp sort order of the two sides
    *                   flips.
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String],
      prefix: String = "asof_",
      strict: Boolean = false): DataFrame = {
    // inclusive: right rows sort BEFORE left at equal time (visible);
    // strict: after (not yet carried when the left row is scored)
    val rightTag = if (strict) 2 else 0
    val leftCols = left.columns
    val l = left
      .withColumn("_side", lit(1))
      .select(leftCols.map(col) :+ col("_side") :+
        lit(null).cast("struct<" + payload.map(p =>
          s"$p:${right.schema(p).dataType.sql}").mkString(",") + ">").as("_pay"): _*)
    val r = right
      .select(col(key), col(time), struct(payload.map(col): _*).as("_pay"))
      .withColumn("_side", lit(rightTag))
    // align schemas: right contributes only key/time/payload
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(l.columns.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rAligned)
      .withColumn("_match", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"_match.$p").as(s"$prefix$p")): _*)
  }
}
