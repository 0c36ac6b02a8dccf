package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Collected MMR candidate pool for one group: ids, query similarities,
  * norms, and the (double-promoted) vectors. Grows by update/merge and is
  * only ORDERED at eval time — input order never influences the result.
  * Public (not nested in the aggregate) so serialized buffers reference a
  * stable class.
  */
final class MmrCandidates {
  val ids: ArrayBuffer[Long] = ArrayBuffer.empty
  val qsims: ArrayBuffer[Double] = ArrayBuffer.empty
  val nrms: ArrayBuffer[Double] = ArrayBuffer.empty
  val vecs: ArrayBuffer[Array[Double]] = ArrayBuffer.empty
  def size: Int = ids.length
  def add(id: Long, qsim: Double, nrm: Double, vec: Array[Double]): Unit = {
    ids += id; qsims += qsim; nrms += nrm; vecs += vec
  }
}

/** Maximal Marginal Relevance selection (Carbonell & Goldstein, SIGIR
  * 1998): greedily picks k results from a bounded candidate pool, each
  * round taking the candidate maximizing
  * `lambda * sim(query, c)  -  (1 - lambda) * max_{s in selected} sim(c, s)`
  * — relevance traded against redundancy with what is already selected.
  * The diversity term is 0 for the first pick (empty selected set), so
  * rank 1 is the plain most-relevant candidate with score lambda * qsim.
  *
  * `graft_mmr(id, vec, nrm, qsim, k, lambda, maxCandidates)` over a group
  * returns `array<struct<neighbor_id, mmr_score, cos_sim>>` in pick order.
  *
  * Scale shape: the greedy loop is inherently sequential, so it belongs in
  * a bounded per-group buffer — NOT in k chained shuffles over a
  * candidate frame. Callers feed the pool from a bounded first pass (the
  * [[TopK]] heap over the corpus); this aggregate holds ≤ maxCandidates
  * rows per group (it REFUSES loudly past the cap rather than silently
  * truncating, which would make results partitioning-dependent) and runs
  * the O(pool * k * dim) greedy selection once at eval.
  *
  * Determinism: candidates are sorted (qsim desc, id asc) before
  * selection, pairwise cosines are `dot / (nrm_a * nrm_b)` with the same
  * left-to-right double accumulation as [[DotProduct]], and score ties
  * break toward the smaller id with [[java.lang.Double.compare]] totality
  * (NaN greatest) — so results are independent of partitioning and input
  * order, and an oracle replaying the unrolled greedy rounds in SQL is
  * bit-exact.
  */
case class MmrSelect(
    id: Expression,
    vec: Expression,
    nrm: Expression,
    qsim: Expression,
    k: Int,
    lambda: Double,
    maxCandidates: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MmrCandidates] {
  require(k > 0, s"k must be positive, got $k")
  require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0, 1], got $lambda")
  require(maxCandidates >= k, s"maxCandidates $maxCandidates must be >= k $k")

  override def prettyName: String = "graft_mmr"
  override def children: Seq[Expression] = Seq(id, vec, nrm, qsim)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("mmr_score", DoubleType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MmrCandidates = new MmrCandidates

  private def checkCap(n: Int): Unit =
    require(n <= maxCandidates,
      s"graft_mmr pool exceeded maxCandidates=$maxCandidates — feed it a " +
        "bounded first-pass candidate set (graft_topk), not a corpus")

  override def update(buf: MmrCandidates, input: InternalRow): MmrCandidates = {
    val i = id.eval(input); val v = vec.eval(input)
    val nr = nrm.eval(input); val qs = qsim.eval(input)
    if (i != null && v != null && nr != null && qs != null) {
      checkCap(buf.size + 1)
      buf.add(
        i.asInstanceOf[Number].longValue(),
        qs.asInstanceOf[Number].doubleValue(),
        nr.asInstanceOf[Number].doubleValue(),
        v.asInstanceOf[ArrayData].toDoubleArray())
    }
    buf
  }

  override def merge(buf: MmrCandidates, other: MmrCandidates): MmrCandidates = {
    checkCap(buf.size + other.size)
    var i = 0
    while (i < other.size) {
      buf.add(other.ids(i), other.qsims(i), other.nrms(i), other.vecs(i)); i += 1
    }
    buf
  }

  /** same-order-as-Spark double comparison: primitive equality first so
    * -0.0 ties 0.0, then Double.compare for NaN totality */
  @inline private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  override def eval(buf: MmrCandidates): Any = {
    val n = buf.size
    // pin input-order independence: (qsim desc, id asc)
    val order = Array.range(0, n)
    scala.util.Sorting.stableSort[Int](order, (a: Int, b: Int) => {
      val c = cmp(buf.qsims(a), buf.qsims(b))
      c > 0 || (c == 0 && buf.ids(a) < buf.ids(b))
    })
    val ids = order.map(buf.ids)
    val qsims = order.map(buf.qsims)
    val nrms = order.map(buf.nrms)
    val vecs = order.map(buf.vecs)

    val picks = math.min(k, n)
    val used = new Array[Boolean](n)
    // true max cosine to the selected set — NO zero floor (a pool whose
    // similarities to the picked set are all negative must keep its
    // negative max, exactly as the oracle's SQL max() does); the empty
    // set's diversity term is 0 by the r == 0 branch below, never -inf
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = new Array[Any](picks)
    val oneMinus = 1.0 - lambda
    var r = 0
    while (r < picks) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!used(i)) {
          val s = lambda * qsims(i) - oneMinus * (if (r == 0) 0.0 else maxSim(i))
          if (best < 0 || {
            val c = cmp(s, bestScore)
            c > 0 || (c == 0 && ids(i) < ids(best))
          }) { best = i; bestScore = s }
        }
        i += 1
      }
      used(best) = true
      out(r) = InternalRow(ids(best), bestScore, qsims(best))
      // fold the new pick into every remaining candidate's redundancy term
      val bv = vecs(best); val bn = nrms(best)
      i = 0
      while (i < n) {
        if (!used(i)) {
          val v = vecs(i)
          val len = math.min(v.length, bv.length)
          var acc = 0.0
          var j = 0
          while (j < len) { acc += v(j) * bv(j); j += 1 }
          val sim = acc / (nrms(i) * bn)
          if (cmp(sim, maxSim(i)) > 0) maxSim(i) = sim
        }
        i += 1
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MmrCandidates): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < buf.size) { bytes += 8 + 8 + 8 + 4 + 8 * buf.vecs(i).length; i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putLong(buf.ids(i)); bb.putDouble(buf.qsims(i)); bb.putDouble(buf.nrms(i))
      val v = buf.vecs(i)
      bb.putInt(v.length)
      var j = 0
      while (j < v.length) { bb.putDouble(v(j)); j += 1 }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MmrCandidates = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MmrCandidates
    var i = 0
    while (i < n) {
      val id = bb.getLong; val qs = bb.getDouble; val nr = bb.getDouble
      val len = bb.getInt
      val v = new Array[Double](len)
      var j = 0
      while (j < len) { v(j) = bb.getDouble; j += 1 }
      buf.add(id, qs, nr, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MmrSelect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MmrSelect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MmrSelect =
    copy(id = newChildren(0), vec = newChildren(1), nrm = newChildren(2),
      qsim = newChildren(3))
}
