package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: points ⋈ intervals on
  * `start <= pt < end`, bucketized so it never degenerates into the
  * O(|points|·|intervals|) nested loop Spark plans for a bare range
  * predicate.
  *
  * Mechanics: time is cut into fixed buckets; each interval explodes to
  * the buckets it covers, each point maps to one bucket, and the join is
  * a plain equi-join on bucket followed by the exact range filter. Cost
  * is O(points + intervals·span/bucketWidth + true matches) with an
  * ordinary shuffle — pick bucketWidth ≈ median interval length.
  */
object RangeJoin {

  /** @param points     frame with a timestamp column `ptCol`
    * @param intervals  frame with `startCol`/`endCol` timestamps
    *                   (half-open [start, end))
    * @param bucketUs   bucket width in microseconds
    */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    // cast handles TIMESTAMP_NTZ parquet columns (unix_micros only takes
    // TIMESTAMP; with a UTC session the cast is value-preserving)
    def bucketOf(c: String) = expr(s"unix_micros(cast($c as timestamp)) div $bucketUs")
    val pts = points.withColumn("_bucket", bucketOf(ptCol))
    val ivs = intervals
      // malformed end<start intervals would make sequence() count DOWN
      // and emit |span| bogus bucket rows; they can never match, drop them
      .filter(col(endCol) >= col(startCol))
      .withColumn("_bucket",
        explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    pts.join(ivs, Seq("_bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bucket")
  }
}
