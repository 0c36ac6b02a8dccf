package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a fixed-capacity binary min-heap ordered by
  * (score asc, id desc), so the root is always the WORST kept element and
  * a better candidate replaces it in O(log k). Total order matches the
  * ranking `row_number() OVER (ORDER BY score DESC, id ASC)` would
  * produce, so results are deterministic and bit-identical to the window
  * form — but no task ever materializes more than k elements per group.
  *
  * Public (not nested in the aggregate) so serialized buffers reference a
  * stable class; plain primitive arrays, no boxing.
  */
final class TopKHeap(val k: Int) {
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)
  var size: Int = 0

  /** true if (s1,i1) ranks strictly worse than (s2,i2): lower score, or
    * same score and larger id. The comparison must match Spark's sort
    * order exactly (SQLOrderingUtil.compareDoubles): primitive equality
    * first so -0.0 TIES 0.0 and the id tiebreak applies, then
    * Double.compare so NaN is a totally-ordered greatest — raw `<` alone
    * would return false both ways against NaN and corrupt the heap. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      // push: append and sift up toward the worst-at-root invariant
      var i = size
      scores(i) = score; ids(i) = id; size += 1
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p
        } else i = 0
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      // replace the worst and sift down
      scores(0) = score; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Indices of kept elements sorted best-first (score desc, id asc). */
  def sortedIndices(): Array[Int] = {
    val idx = Array.range(0, size)
    // boxing-free enough at k ≤ a few hundred; ordering mirrors `worse`
    scala.util.Sorting.stableSort[Int](idx,
      (a: Int, b: Int) => worse(scores(b), ids(b), scores(a), ids(a)))
    idx
  }
}

/** Bounded per-group top-k aggregate: `graft_topk(id, score, k)` returns
  * an `array<struct<neighbor_id bigint, cos_sim double>>` of the k
  * highest-scored (score desc, id asc) inputs of the group.
  *
  * This is the scale-correct replacement for ranking with
  * `row_number().over(Window.partitionBy(group))`. Spark 4's
  * `InferWindowGroupLimit` narrows the gap for the window form — a
  * Partial WindowGroupLimit before the exchange bounds the shuffled
  * volume to parts·k per group (verified on this build), so "shuffles
  * every candidate" is no longer true of it — but the window path
  * still fully SORTS each map partition's candidates before the
  * group-limit (O(n log n) per partition) and re-sorts after the
  * shuffle. As a [[TypedImperativeAggregate]] this runs inside
  * ObjectHashAggregate with a partial and a final phase: sort-free
  * O(n log k) heap inserts map-side, only k-element buffers cross the
  * shuffle, final merge O(parts · k log k) per group. No task ever
  * holds more than k elements per group.
  */
case class TopK(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {
  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(id, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val idL = i match {
        case l: java.lang.Long => l.longValue()
        case n: java.lang.Integer => n.longValue()
        case other => throw new IllegalArgumentException(
          s"graft_topk id must be integral, got ${other.getClass.getName}")
      }
      val scoreD = s match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case other => throw new IllegalArgumentException(
          s"graft_topk score must be double, got ${other.getClass.getName}")
      }
      buf.insert(scoreD, idL)
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKHeap): Any = {
    val idx = buf.sortedIndices()
    new GenericArrayData(idx.map { i =>
      InternalRow(buf.ids(i), buf.scores(i))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val h = new TopKHeap(kk)
    var i = 0
    // elements were stored in heap order — re-inserting restores the invariant
    while (i < n) { val s = bb.getDouble; val d = bb.getLong; h.insert(s, d); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(id = newChildren(0), score = newChildren(1))
}
