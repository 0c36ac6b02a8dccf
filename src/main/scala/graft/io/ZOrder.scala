package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the `OPTIMIZE ZORDER BY` of
  * Delta/Iceberg on plain parquet (Morton 1966; the multi-dimensional
  * clustering every lakehouse uses so that a box predicate on EITHER
  * clustered column prunes most files). A single-column sort gives
  * perfect min/max pruning on that column and none on any other;
  * interleaving the quantized bits of two columns makes every curve
  * bucket a small RECTANGLE in (x, y) space, so per-bucket min/max
  * statistics prune box queries on both dimensions at once — the only
  * thing a writer must do is cluster rows by the z-value before
  * writing, which is one range-ish repartition.
  *
  * Everything here is exact integer arithmetic (quantization by
  * integer multiply + `div` — NOT `/`, whose fractional result stops
  * being exact past 2^53 exactly at deployment-scale key domains —
  * and bit interleave by shift/mask), so layouts and the pruning
  * verdicts derived from their statistics replay bit-identically in
  * the SQL oracle.
  */
object ZOrder {

  /** Quantizes a non-negative integer column to `bits` bits:
    * `q = (x * 2^bits) div (maxVal + 1)` in exact integer arithmetic —
    * monotone, domain-independent, q < 2^bits for any x ≤ maxVal.
    * Column references by NAME (the expression goes through `expr` for
    * SQL `div`, Spark's only exact integer division). */
  def quantize(x: String, maxVal: String, bits: Int): Column =
    expr(s"(($x * ${1L << bits}L) div ($maxVal + 1L))")

  /** Interleaves the low `bits` bits of two quantized columns into the
    * 2·bits-bit Morton code: x owns the even bit positions, y the odd
    * ones. Pure shift/mask composition — whole-stage-codegen'd, no UDF. */
  def interleave(qx: Column, qy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val xb = shiftleft(shiftrightunsigned(qx, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftrightunsigned(qy, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)

  /** The DuckDB mirror of [[quantize]] (`//` is integer division). */
  def quantizeSql(x: String, maxVal: String, bits: Int): String =
    s"((($x) * ${1L << bits}) // (($maxVal) + 1))"

  /** The DuckDB mirror of [[interleave]]. DuckDB's `&`/`|`/shifts bind
    * loosely — every term is fully parenthesized. */
  def interleaveSql(qx: String, qy: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((((($qx) >> $i) & 1) << ${2 * i}) | (((($qy) >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Z-order layout statistics: quantizes `(xCol, yCol)` to `bits` bits
    * each, buckets rows by the top `log2Buckets` bits of the Morton
    * code (what a writer would use as the file/partition key), and
    * returns per-bucket row counts and min/max column statistics — the
    * footer stats a scan planner consults — plus each bucket's verdict
    * against the box query `[xLo, xHi] × [yLo, yHi]` (given as
    * per-mille fractions of each domain, kept integer throughout):
    * `box_overlap` is true iff the bucket's min/max rectangle
    * intersects the box, i.e. the bucket CANNOT be skipped.
    *
    * Scale shape: two scans (column maxima, then one hash aggregation
    * on the bucket key — partial map-side, 2^log2Buckets groups); the
    * stats table is fixed-size. The measured skip fraction is the
    * operator's point: on z-ordered buckets a centered ~10%×10% box
    * touches O(√buckets) of them, where a single-column sort layout
    * leaves every bucket overlapping on the other dimension. */
  def layoutStats(df: DataFrame, xCol: String, yCol: String, bits: Int,
      log2Buckets: Int, xLoPm: Int, xHiPm: Int, yLoPm: Int,
      yHiPm: Int): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits must sit in [1,20], got $bits")
    require(log2Buckets >= 1 && log2Buckets <= 2 * bits,
      s"log2Buckets must sit in [1, 2*bits], got $log2Buckets")
    require(0 <= xLoPm && xLoPm <= xHiPm && xHiPm <= 1000 &&
      0 <= yLoPm && yLoPm <= yHiPm && yHiPm <= 1000,
      "box bounds are per-mille fractions with lo <= hi")
    val mxRow = df.agg(max(col(xCol)), max(col(yCol))).head()
    require(!mxRow.isNullAt(0), "layoutStats needs a non-empty input")
    val (mx, my) = (mxRow.getLong(0), mxRow.getLong(1))
    // the quantizer multiplies by 2^bits and the bounds by 1000 BEFORE
    // dividing — guard the headroom or the exact-integer path itself
    // silently wraps at exactly the key scales it exists for
    val headroom = math.min(Long.MaxValue >> bits, Long.MaxValue / 1000 - 1)
    require(mx >= 0 && my >= 0 && mx <= headroom && my <= headroom,
      s"key domain [$mx, $my] overflows the ${bits}-bit quantizer's Long headroom $headroom")
    def bound(pm: Int, m: Long): Column = lit((m + 1L) * pm / 1000L)
    val z = interleave(
      quantize(xCol, mx.toString, bits), quantize(yCol, my.toString, bits), bits)
    df
      .withColumn("bucket", shiftrightunsigned(z, 2 * bits - log2Buckets))
      .withColumn("_xlo", bound(xLoPm, mx))
      .withColumn("_xhi", bound(xHiPm, mx))
      .withColumn("_ylo", bound(yLoPm, my))
      .withColumn("_yhi", bound(yHiPm, my))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"),
        (min(col(xCol)) <= max(col("_xhi")) && max(col(xCol)) >= max(col("_xlo")) &&
          min(col(yCol)) <= max(col("_yhi")) && max(col(yCol)) >= max(col("_ylo")))
          .as("box_overlap"))
      .orderBy(col("bucket"))
  }
}
