package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous form of the t25 training-corpus manifest
  * ([[graft.queries.Text.batchManifest]]): every micro-batch of arriving
  * documents is judged by the full preprocessing gauntlet — quality score,
  * repetition filter, deterministic train/val/test split, exact-dedup
  * keep-one — and appended to a manifest table, so a daily document drop
  * extends the corpus manifest without re-reading the corpus.
  *
  * The per-row signals (quality, repetition, split, content hash) are
  * scan-computed per epoch through the SAME code path as batch t25
  * ([[graft.queries.Text.manifestSignals]]). Only `dedup_keep` needs
  * cross-epoch state: a persisted text-hash index under `hashIndexDir`
  * (the exact-dedup analog of [[graft.operators.Dedup.buildNearDupIndex]]).
  * A row keeps iff its content hash is first within the batch AND absent
  * from every PRIOR epoch's index rows — so per-epoch cost scales with the
  * batch plus one equi-join against the (hash, epoch) index, whose rows
  * are 16-byte digests, one per unique document ever seen, never the
  * documents themselves. On a cluster, bucket the index by `text_hash` so
  * the daily probe is a co-located join; at this corpus's sizes AQE
  * broadcasts it.
  *
  * At-least-once like [[StreamingDedup.nearDupAuditSink]]: a replayed
  * epoch re-appends manifest rows (dedup downstream on `_epoch`+doc_id),
  * but its FLAGS are replay-stable — the probe reads only index rows with
  * `_epoch < current`, so an epoch that crashed after writing its own
  * hashes re-decides `dedup_keep` identically on retry.
  *
  * Stream≡batch: when epochs partition the corpus in doc_id order (the
  * natural arrival order of an append-only corpus), the epoch union is
  * row-identical to [[graft.queries.Text.batchManifest]] on the same
  * documents — asserted in StreamingSpec. Under out-of-order arrival the
  * keep rule degrades to first-SEEN-wins, the standard incremental-dedup
  * semantics.
  */
object StreamingManifest {

  /** Sink appending one manifest row per arriving document (t25 columns
    * plus `_epoch`) under `outDir`, maintaining the text-hash index under
    * `hashIndexDir`. `docs` is a streaming frame with doc_id/text/lang. */
  def manifestSink(docs: DataFrame, hashIndexDir: String,
      outDir: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, epochId: Long) =>
      appendEpoch(batch, hashIndexDir, outDir, epochId)
    }

  /** One epoch: flag the batch against prior epochs' hashes, append its
    * manifest rows, then register its newly-kept hashes. */
  private[graft] def appendEpoch(batch: DataFrame, hashIndexDir: String,
      outDir: String, epochId: Long): Unit = {
    val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
    val flagged = graft.queries.Text.manifestSignals(batch)
      .withColumn("first_in_batch", row_number().over(w) === 1)
      .join(seenHashes(batch.sparkSession, hashIndexDir, epochId),
        Seq("text_hash"), "left_outer")
      .withColumn("dedup_keep", col("first_in_batch") && col("_seen").isNull)
      .persist() // two writes below; don't re-scan + re-join per write
    try {
      graft.queries.Text.manifestColumns(flagged)
        .withColumn("_epoch", lit(epochId))
        .write.mode("append").parquet(outDir)
      flagged.filter(col("dedup_keep"))
        .select(col("text_hash")).withColumn("_epoch", lit(epochId))
        .write.mode("append").parquet(hashIndexDir)
    } finally flagged.unpersist()
  }

  /** Hashes registered by epochs strictly before `epochId` (replay
    * stability — see the object doc); empty frame before the first. */
  private def seenHashes(spark: SparkSession, dir: String,
      epochId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior =
      if (fs.exists(p))
        spark.read.parquet(dir).filter(col("_epoch") < epochId)
          .select(col("text_hash")).distinct()
      else {
        import spark.implicits._
        Seq.empty[String].toDF("text_hash")
      }
    prior.withColumn("_seen", lit(true))
  }
}
