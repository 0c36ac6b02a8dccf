package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable dataset splitting for training pipelines.
  *
  * `df.randomSplit` / `df.sample` are seed-AND-partitioning dependent: the
  * same row can land in different splits when the input repartitions, files
  * split differently, or the corpus grows — silently leaking yesterday's
  * training docs into today's eval set. Content-hash bucketing fixes the
  * assignment to the KEY alone: a document keeps its split forever, on any
  * cluster layout, in any engine that can compute the same hash.
  *
  * The hash is the portable mod-2³¹ polynomial fold (h·31 + codepoint,
  * mod 2³¹−1) — the same fingerprint the oracle-checked t10 query uses, so
  * split assignment is reproducible bit-for-bit in DuckDB/SQL for audits.
  * Evaluated by the codegen'd [[graft.functions.Fold31]] expression: one
  * pass over the UTF-8 bytes inside whole-stage codegen — a scan, no
  * shuffle, no UDF, no per-character allocation.
  */
object Sampling {

  /** Portable fingerprint of a string column: fold (h·31 + codepoint)
    * mod 2³¹−1 over its code points. Range [0, 2³¹−1). */
  def portableFingerprint(c: String): Column = {
    // expr() resolves against the session's function registry at analysis
    // time, so make sure graft_fold31 is registered on the active session
    // before the Column is used (idempotent, registry-local).
    graft.functions.GraftExpressions.register(SparkSession.active)
    expr(s"graft_fold31($c)")
  }

  /** Adds `bucket` ∈ [0, nBuckets) derived from the key column's content
    * hash. Same key → same bucket, independent of partitioning, engine,
    * or corpus growth. */
  def withHashBucket(df: DataFrame, keyCol: String, nBuckets: Int = 100): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    df.withColumn("bucket", pmod(portableFingerprint(keyCol), lit(nBuckets)))
  }

  /** Adds `bucket` + `split` columns: `cuts` maps split names to bucket
    * percentages summing to ≤ 100 (a shortfall leaves a holdout assigned
    * to the LAST split). E.g. `Seq("train" -> 80, "validation" -> 10,
    * "test" -> 10)` — buckets [0,80) train, [80,90) validation, rest test.
    * Deterministic and stable: growing the corpus never reassigns an
    * existing key's split. */
  def hashSplit(df: DataFrame, keyCol: String,
      cuts: Seq[(String, Int)] = Seq("train" -> 80, "validation" -> 10, "test" -> 10))
      : DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_._2 > 0) && cuts.map(_._2).sum <= 100,
      s"cuts must be positive and sum to <= 100: $cuts")
    val bounds = cuts.scanLeft(0) { case (acc, (_, pct)) => acc + pct }.tail
    val splitCol = cuts.zip(bounds).dropRight(1)
      .foldRight(lit(cuts.last._1): Column) { case (((name, _), bound), rest) =>
        when(col("bucket") < bound, name).otherwise(rest)
      }
    withHashBucket(df, keyCol, 100).withColumn("split", splitCol)
  }

  /** Deterministic stratified downsampling toward a target mixture: each
    * stratum keeps `rates(stratum)`% of its rows (strata absent from
    * `rates` keep 100%), chosen by content-hash bucket — the
    * mixture-weighting step of a training-data pipeline (e.g. rebalance
    * an English-heavy corpus before tokenization). Unlike `df.sample`,
    * the keep decision is a pure function of the key: re-runs, engine
    * changes, and corpus growth never flip an existing row, so
    * incremental batches compose with previously published mixes.
    * Scan-only — the decision is a per-row hash compare, no shuffle. */
  def stratifiedKeep(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Int]): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 100),
      s"rates must be percentages in 0..100: $rates")
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(100): Column) {
      case (acc, (stratum, pct)) => when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    withHashBucket(df, keyCol, 100).withColumn("kept", col("bucket") < rateCol)
  }
}
