package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions
import graft.functions.TextFunctions.tokens

/** Exact heavy hitters through a bounded sketch — the frequent-items
  * counterpart of q23's HLL distinct counts in the approximate-aggregate
  * family, but with EXACT output: the sketch only proposes, an exact
  * pass disposes (the LSH-then-verify discipline applied to frequency).
  */
object Frequency {

  /** Tokens with frequency share strictly above `1/(k+1)`, with exact
    * counts. Two corpus passes:
    *
    *  1. one aggregation computing the total token count AND a k-counter
    *     Misra-Gries candidate summary ([[graft.functions.MGSketch]] —
    *     map-side partials, only k-entry summaries cross the shuffle).
    *     The PODS'12 mergeable-summaries bound guarantees every true
    *     heavy hitter is among the ≤ k candidates regardless of
    *     partitioning;
    *  2. one exact count of the candidate tokens only (a broadcast-able
    *     `isin` over ≤ k strings reaches the scan as a pushed filter),
    *     thresholded by the EXACT rule `freq · (k+1) > n` in integer
    *     arithmetic.
    *
    * The candidate set may vary with merge order (it is a superset
    * guarantee); the verified output cannot — it equals the plain
    * `GROUP BY` answer at any partitioning, which is what the oracle
    * replays. At 100 TB the win is pass 2's filter: the full token
    * frequency table (domain-sized) is never materialized or shuffled —
    * only k counters and the ≤ k survivors move.
    *
    * Output: (token, freq, share), share = freq/n, (freq desc, token)
    * order. */
  def heavyHitters(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    GraftExpressions.register(docs.sparkSession)
    val toks = docs.select(explode(tokens(col(textCol))).as("token"))
    val row = toks
      .agg(count(lit(1)).as("n"), expr(s"graft_mg_sketch(token, $k)").as("cand"))
      .head()
    val n = row.getLong(0)
    val cand = row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    toks
      .filter(col("token").isin(cand: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") * (k + 1) > n)
      .withColumn("share", col("freq").cast("double") / lit(n.toDouble))
      .orderBy(col("freq").desc, col("token"))
  }
}
