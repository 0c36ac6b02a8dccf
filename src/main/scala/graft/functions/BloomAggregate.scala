package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter bit set (Bloom, "Space/time trade-offs in hash coding
  * with allowable errors", CACM 1970): `numBits` bits, item i sets bit
  * `fold31("bf:h:" + i) mod numBits` for each hash index h — the
  * portable fold again, so every set position is replayable in SQL.
  *
  * Like the Count-Min matrix (and unlike Misra-Gries), the state is
  * merge-order independent by algebra: merges are bitwise ORs, so the
  * final bit set is a pure function of the input SET at any
  * partitioning. Membership can false-positive, never false-negative —
  * the asymmetry decontamination wants (an over-eager filter drops a
  * benign doc; a false negative ships eval data into the training set).
  *
  * Public (not nested in the aggregate) so serialized buffers reference
  * a stable class. */
final class BloomBits(val numHashes: Int, val numBits: Int) {
  val words = new Array[Long](numBits >>> 6)

  def add(item: String): Unit = {
    var h = 0
    while (h < numHashes) {
      val pos = BloomBits.position(item, h, numBits)
      words(pos >>> 6) |= (1L << (pos & 63))
      h += 1
    }
  }

  def mergeFrom(other: BloomBits): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
}

object BloomBits {
  /** Hash-h bit position of an item — ONE definition, mirrored by the
    * oracle's foldSql over the identical salt layout. */
  def position(item: String, h: Int, numBits: Int): Int =
    (Fold31.fold(UTF8String.fromString(s"bf:$h:$item")) % numBits).toInt
}

/** `graft_bloom_sketch(item, numHashes, numBits)` — per-group Bloom bit
  * set as `array<bigint>` (64 bits per word, numBits/64 words). Runs
  * inside ObjectHashAggregate with map-side partials: the raw items
  * (13-gram strings, at decontamination's call site) NEVER shuffle —
  * each partition reduces to one numBits/8-byte mask and masks OR
  * together, which is the whole point at 100 TB: a training set's gram
  * inventory becomes a fixed-size filter any probe task can broadcast. */
case class BloomSketch(
    child: Expression,
    numHashes: Int,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBits] {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")

  override def prettyName: String = "graft_bloom_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BloomBits = new BloomBits(numHashes, numBits)

  override def update(buf: BloomBits, input: InternalRow): BloomBits = {
    child.eval(input) match {
      case null =>
      // .toString copies out of Spark's reused row buffer — mandatory
      case s: UTF8String => buf.add(s.toString)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_sketch input must be a string, got ${other.getClass.getName}")
    }
    buf
  }

  override def merge(buf: BloomBits, other: BloomBits): BloomBits = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: BloomBits): Any =
    new GenericArrayData(buf.words.map(java.lang.Long.valueOf).asInstanceOf[Array[Any]])

  override def serialize(buf: BloomBits): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.words.length)
    bb.putInt(buf.numHashes); bb.putInt(buf.numBits)
    buf.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomBits = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BloomBits(bb.getInt, bb.getInt)
    var i = 0
    while (i < b.words.length) { b.words(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren.head)
}
