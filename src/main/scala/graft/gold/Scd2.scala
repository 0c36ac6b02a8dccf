package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: attribute history with effective
  * ranges. The reference regenerates dims from scratch daily and loses
  * history (`starschema.py:75-96`); SCD2 keeps one row per (key,
  * attribute-version) with [effective_from, effective_to) validity and a
  * current flag.
  */
object Scd2 {

  /** Applies a day's snapshot to an SCD2 dimension.
    *
    * @param dim      current SCD2 table (key, attrs..., effective_from,
    *                 effective_to (null = open), is_current)
    * @param snapshot today's attribute snapshot (key, attrs...)
    * @param key      natural key column
    * @param attrs    tracked attribute columns
    * @param asOf     load date (effective_from of new versions)
    */
  def apply(dim: DataFrame, snapshot: DataFrame, key: String, attrs: Seq[String],
      asOf: String): DataFrame = {
    val attrHash: DataFrame => DataFrame =
      df => df.withColumn("_ah", xxhash64(attrs.map(col): _*))
    val cur = attrHash(dim.filter(col("is_current")))
    val snap = attrHash(snapshot.select((key +: attrs).map(col): _*))

    // unchanged current rows: key present with same attribute hash
    val unchanged = cur.join(snap.select(col(key), col("_ah")), Seq(key, "_ah"), "left_semi")
    // current rows to close: key missing from snapshot, or attrs changed
    val closed = cur.join(snap.select(col(key), col("_ah")), Seq(key, "_ah"), "left_anti")
      .withColumn("effective_to", lit(asOf))
      .withColumn("is_current", lit(false))
    // new versions: snapshot rows with no matching current (key+hash)
    val opened = snap.join(cur.select(col(key), col("_ah")), Seq(key, "_ah"), "left_anti")
      .withColumn("effective_from", lit(asOf))
      .withColumn("effective_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))

    val history = dim.filter(!col("is_current"))
    Seq(attrHash(history), unchanged, closed, opened)
      .map(_.select((Seq(key) ++ attrs ++ Seq("effective_from", "effective_to", "is_current")).map(col): _*))
      .reduce(_ unionByName _)
  }

  /** Empty SCD2 frame initialized from a first snapshot. */
  def init(snapshot: DataFrame, key: String, attrs: Seq[String], asOf: String): DataFrame =
    snapshot.select((key +: attrs).map(col): _*)
      .withColumn("effective_from", lit(asOf))
      .withColumn("effective_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))
}
