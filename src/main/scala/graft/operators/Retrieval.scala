package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank-fusion algebra for hybrid retrieval. */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, "Reciprocal
    * Rank Fusion outperforms Condorcet and individual Rank Learning
    * Methods", SIGIR 2009) — the standard way to combine a lexical
    * (BM25) and a vector ranking into one hybrid result without score
    * calibration:
    *
    *   `rrf(d) = Σ_systems 1 / (kRrf + rank_s(d))`
    *
    * summed over the systems that ranked `d` at all (an absent doc
    * contributes nothing — no rank imputation, per the paper). Ranks are
    * data, scores are never compared across systems, which is the whole
    * point: BM25 scores and cosine similarities live on incomparable
    * scales.
    *
    * Each input frame is one system's ranked list: (`idCol`, `rankCol`)
    * with rank 1-based. The per-doc sum goes through the DECIMAL(30,6)
    * detour so it is accumulation-order independent (systems' rows meet
    * in one shuffle; a plain double sum would be order-sensitive), and
    * the final order is the deterministic (rrf desc, id asc).
    *
    * Scale shape: a union of the (tiny) per-system top-N lists, one
    * partial+final aggregate on the doc id, and a bounded TakeOrdered —
    * the fused frame never exceeds Σ topN rows, regardless of corpus
    * size (the systems' own top-N machinery bounds what enters).
    *
    * Output: (idCol, n_systems, rrf), the `topK` best. */
  def rrfFuse(systems: Seq[DataFrame], idCol: String, rankCol: String,
      kRrf: Int = 60, topK: Int = 20): DataFrame = {
    require(systems.nonEmpty, "rrfFuse needs at least one ranked system")
    require(kRrf > 0, s"kRrf must be positive, got $kRrf")
    require(topK > 0, s"topK must be positive, got $topK")
    val contribs = systems
      .map(df => df.select(col(idCol),
        (lit(1.0) / (lit(kRrf) + col(rankCol))).as("_c")))
      .reduce(_ unionByName _)
    contribs.groupBy(col(idCol))
      // DECIMAL(30,6) detour inline (operator layer can't depend on the
      // query layer's Num; the mirror contract is Num.dsumSql — the
      // Sampling/Quality operators carry the same inlined copy)
      .agg(count(lit(1)).as("n_systems"),
        sum(col("_c").cast(DecimalType(30, 6))).cast("double").as("rrf"))
      .orderBy(desc("rrf"), col(idCol))
      .limit(topK)
  }
}
