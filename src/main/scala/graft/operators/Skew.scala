package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (large) side into `factor`
  * sub-keys and replicate the small side across all salts, so one hot key
  * spreads over `factor` reducers instead of stalling a single task.
  *
  * AQE's skew-join handles sort-merge skew adaptively at runtime; this
  * explicit form is for when the skew is known ahead (power-law keys at
  * 100 TB) or the join is not SMJ. Salt is hash-derived from the row's
  * own columns — deterministic, no rand(). */
object Skew {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int,
      saltSource: String): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(factor.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
