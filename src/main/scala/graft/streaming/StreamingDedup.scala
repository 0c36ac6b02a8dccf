package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Dedup

/** Continuous form of the incremental dedup/contamination audit: every
  * micro-batch of arriving documents probes the persisted near-dup index
  * ([[graft.operators.Dedup.buildNearDupIndex]]) and appends its hits —
  * per-epoch cost scales with the batch, never the corpus (the index is
  * read only at its band/shingle join keys).
  *
  * foreachBatch, not a stream-stream join: each epoch is an independent
  * batch probe against an on-disk index — exactly the daily-audit
  * semantics, now at micro-batch latency. At-least-once like
  * [[SilverStream.appendSink]]: a replayed epoch re-appends, so
  * exactly-once consumers dedup downstream on (`_epoch`, doc_a, doc_b).
  * Intermediate caching is off ([[Dedup.nearDupsAgainstIndex]]'s
  * `cacheIntermediates=false`): the batch-side shingle explode is cheap
  * per epoch, and per-epoch persists would pile up for the stream's
  * lifetime.
  */
object StreamingDedup {

  /** Sink that writes (doc_a = indexed id, doc_b = new id, jaccard,
    * _epoch) parquet rows under `outDir` for every micro-batch of
    * `docs` (a streaming frame with doc_id/text columns). */
  def nearDupAuditSink(docs: DataFrame, indexDir: String, outDir: String,
      threshold: Double = 0.8): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, epochId: Long) =>
      // sorted=false: the append sink is order-free, so skip the probe's
      // trailing range-shuffle + sort per epoch
      Dedup.nearDupsAgainstIndex(batch, indexDir, threshold = threshold,
          cacheIntermediates = false, sorted = false)
        .withColumn("_epoch", lit(epochId))
        .write.mode("append").parquet(outDir)
    }
}
