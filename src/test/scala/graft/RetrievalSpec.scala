package graft

import graft.operators.Retrieval

/** Reciprocal-rank fusion (Cormack et al. SIGIR'09) on hand-checkable
  * rank lists. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def ranked(rows: (Long, Long)*) =
    rows.toSeq.toDF("doc_id", "rank")

  test("rrfFuse sums 1/(k+rank) across systems; absent docs contribute nothing") {
    val a = ranked(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val b = ranked(2L -> 1L, 4L -> 2L)
    val out = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", kRrf = 60, topK = 10)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def c(r: Long) = BigDecimal(1.0 / (60 + r))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 2 is ranked by both systems and must fuse ahead of doc 1
    // (rank 1 in one system only)
    assert(out(2L) === ((2L, c(2) + c(1))))
    assert(out(1L) === ((1L, c(1))))
    assert(out(4L) === ((1L, c(2))))
    assert(out(2L)._2 > out(1L)._2, "two mid ranks beat one top rank here")
  }

  test("rrfFuse: topK bounds output, ties break on doc id") {
    // two single-system docs at the same rank tie on rrf → doc_id order
    val a = ranked(7L -> 1L)
    val b = ranked(3L -> 1L)
    val out = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", topK = 1)
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(3L), s"smaller doc id wins the tie: ${out.toSeq}")
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty, "doc_id", "rank")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a), "doc_id", "rank", kRrf = 0)
    }
  }
}
