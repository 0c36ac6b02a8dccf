package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog register file (Flajolet, Fusy, Gandouet & Meunier,
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm", AofA 2007): `2^p` byte registers; an item hashes through
  * a DOUBLE remix — `mx = mix("hll:" + toString(mix("hll:" + item)))`
  * with `mix(s) = (fold31(s) · 2654435761) mod (2³¹−1)` — and splits
  * into `bucket = mx mod m` and `w = mx div m` (a q = 31−p bit value);
  * the register keeps `max(rank)` with `rank = q + 1 − bitlength(w)`.
  *
  * Why two mixes: one Knuth multiply is equidistributed but
  * LOW-DISCREPANCY on consecutive keys (the three-distance theorem
  * spreads them TOO evenly — measured 135 occupied buckets for 150
  * consecutive ids at m = 256 vs the ~114 a random hash gives, which
  * inflates linear counting ~17% on id-keyed inputs). Decimal-digit
  * decomposition between the two folds is nonlinear, restoring
  * random-hash collision statistics (measured mean rel_err 6.6% over
  * consecutive-id ranges — the 1.04/√m regime) while every step stays
  * SQL-replayable.
  *
  * Like CMS and Bloom — and unlike Spark's own HLL++ sketch, whose
  * binary state is engine-specific — this register file is a pure
  * function of the input SET at any partitioning (merges are
  * element-wise MAX), and every rank derives from the portable fold,
  * so the ORACLE can rebuild all m registers and replay the estimate:
  * an approximate distinct count whose value is hash-gated, the q23
  * asymmetry closed for the engine's own sketch.
  *
  * Cardinality ceiling: the remixed hash lives in a 31-bit space
  * (`mod 2³¹−1`; `w` has only q = 31−p bits) and the estimator carries
  * no large-range correction, so estimates SATURATE as true cardinality
  * approaches ~2³¹ ≈ 2.1·10⁹ per group — beyond ~10⁸ distincts per
  * group, hash-space collisions start to silently undercount. The
  * 31-bit space is the price of SQL replayability (DuckDB integer
  * arithmetic); a deployment counting >10⁸ distincts per group should
  * pre-split groups (count shards, sum estimates) or use Spark's own
  * HLL++ (q23) where the gate can be rows-only. Callers:
  * [[graft.operators.Frequency.hllDistinct]] documents the same bound.
  *
  * Public (not nested in the aggregate) so serialized buffers reference
  * a stable class. */
final class HllRegisters(val p: Int) {
  val m: Int = 1 << p
  val q: Int = 31 - p
  val regs = new Array[Byte](m)

  def add(item: String): Unit = {
    val mx = HllRegisters.doubleMix(item)
    val bucket = (mx % m).toInt
    val w = mx / m
    val rank =
      if (w == 0L) q + 1
      else q + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rank > regs(bucket)) regs(bucket) = rank.toByte
  }

  def mergeFrom(other: HllRegisters): Unit = {
    var i = 0
    while (i < regs.length) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }
}

object HllRegisters {
  /** One Knuth remix of the portable fold — static (no per-row closure
    * allocation on the aggregation hot path). */
  private def mix(s: String): Long =
    (Fold31.fold(UTF8String.fromString(s)) * 2654435761L) % 2147483647L

  /** The full salted double remix (see class doc for why two mixes).
    * The intermediate `"hll:" + …` strings are part of the hash
    * DEFINITION (the SQL mirror concatenates the same bytes), so they
    * cannot be elided — only the closure allocation can. */
  private[functions] def doubleMix(item: String): Long =
    mix("hll:" + java.lang.Long.toString(mix("hll:" + item)))
}

/** `graft_hll_sketch(item, p)` — per-group HyperLogLog registers as
  * `array<int>` (length 2^p). ObjectHashAggregate with map-side
  * partials: each partition reduces to one 2^p-byte register file and
  * files MAX together — insertion is max-idempotent, so the aggregate
  * consumes the raw (un-distinct) stream with no shuffle of the items
  * themselves. The estimate arithmetic lives at the call site
  * ([[graft.operators.Frequency.hllDistinct]]) where its SQL mirror
  * shares the constants. */
case class HllSketch(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllRegisters] {
  require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")

  override def prettyName: String = "graft_hll_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): HllRegisters = new HllRegisters(p)

  override def update(buf: HllRegisters, input: InternalRow): HllRegisters = {
    child.eval(input) match {
      case null =>
      // .toString copies out of Spark's reused row buffer — mandatory
      case s: UTF8String => buf.add(s.toString)
      case other => throw new IllegalArgumentException(
        s"graft_hll_sketch input must be a string, got ${other.getClass.getName}")
    }
    buf
  }

  override def merge(buf: HllRegisters, other: HllRegisters): HllRegisters = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: HllRegisters): Any =
    new GenericArrayData(
      buf.regs.map(r => java.lang.Integer.valueOf(r.toInt)).asInstanceOf[Array[Any]])

  override def serialize(buf: HllRegisters): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.regs.length)
    bb.putInt(buf.p)
    bb.put(buf.regs)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HllRegisters = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new HllRegisters(bb.getInt)
    bb.get(h.regs)
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}
