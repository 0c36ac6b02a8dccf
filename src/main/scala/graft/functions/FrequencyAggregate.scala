package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra-Gries frequency summary with the MERGEABLE reduction of
  * Agarwal, Cormode, Huang, Phillips, Wei & Yi ("Mergeable Summaries",
  * PODS 2012): at most `k` counters; overflow subtracts the (k+1)-st
  * largest count from every counter and drops the non-positive ones.
  * Every subtraction event of `d` consumes ≥ d·(k+1) of the stream's
  * total weight, so any key's count is under-estimated by at most
  * n/(k+1) — which is the containment guarantee the heavy-hitter
  * operator relies on: an item with true frequency > n/(k+1) can never
  * reach zero, hence ALWAYS survives in the summary, under ANY partition
  * and merge order.
  *
  * Public (not nested in the aggregate) so serialized buffers reference a
  * stable class. */
final class MGSummary(val k: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long](k * 2)

  def add(key: String, w: Long): Unit = {
    val cur = counts.get(key)
    counts.put(key, java.lang.Long.valueOf(if (cur == null) w else cur.longValue() + w))
    if (counts.size() > k) reduceToK()
  }

  def mergeFrom(other: MGSummary): Unit = {
    // pointwise add first (≤ 2k entries), one reduction after — the
    // PODS'12 merge; reducing per-entry would discard more weight
    other.counts.forEach { (key, v) =>
      val cur = counts.get(key)
      counts.put(key, java.lang.Long.valueOf(if (cur == null) v.longValue() else cur.longValue() + v.longValue()))
    }
    if (counts.size() > k) reduceToK()
  }

  /** Subtracts the (k+1)-st largest count from everything, removes the
    * non-positive counters. Exactly ≤ k entries can exceed the (k+1)-st
    * largest value, so the result fits the bound. */
  private def reduceToK(): Unit = {
    val vals = new Array[Long](counts.size())
    var i = 0
    val it = counts.values().iterator()
    while (it.hasNext) { vals(i) = it.next().longValue(); i += 1 }
    java.util.Arrays.sort(vals)
    val d = vals(vals.length - 1 - k) // (k+1)-st largest
    val eit = counts.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      val nv = e.getValue.longValue() - d
      if (nv <= 0) eit.remove() else e.setValue(java.lang.Long.valueOf(nv))
    }
  }

  /** Entries sorted (count desc, key asc) — a deterministic rendering of
    * this summary's state. The SET is what the guarantee speaks to; the
    * residual counts are lower bounds that depend on merge order. */
  def sortedEntries(): Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size())
    var i = 0
    counts.forEach { (key, v) => arr(i) = (key, v.longValue()); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr
  }
}

/** `graft_mg_sketch(token, k)` — per-group Misra-Gries heavy-hitter
  * CANDIDATE summary as `array<struct<token string, lower_bound
  * bigint>>` (count desc, token asc). Runs inside ObjectHashAggregate
  * with map-side partials: each partition keeps ≤ k counters, only
  * k-entry summaries cross the shuffle, merges are the PODS'12
  * reduction. The output is a candidate SUPERSET of the true
  * heavy-hitter set at threshold n/(k+1) — callers verify candidates
  * exactly (see [[graft.operators.Frequency.heavyHitters]]); the
  * lower-bound counts are diagnostics, not gated values. */
case class MGSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {
  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "graft_mg_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("lower_bound", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    child.eval(input) match {
      case null =>
      // .toString copies out of Spark's reused row buffer — mandatory
      case s: UTF8String => buf.add(s.toString, 1L)
      case other => throw new IllegalArgumentException(
        s"graft_mg_sketch input must be a string, got ${other.getClass.getName}")
    }
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MGSummary): Any = {
    val entries = buf.sortedEntries()
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MGSummary): Array[Byte] = {
    val entries = buf.sortedEntries()
    val payload = entries.map { case (t, c) => (t.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(8 + payload.map(_._1.length + 12).sum)
    bb.putInt(buf.k); bb.putInt(entries.length)
    payload.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val s = new MGSummary(kk)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val raw = new Array[Byte](len); bb.get(raw)
      s.counts.put(new String(raw, StandardCharsets.UTF_8),
        java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MGSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MGSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MGSketch =
    copy(child = newChildren(0))
}
