package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextOps

/** T9: streaming distribution-drift monitor — the X44 two-sample KS
  * gate run PER MICRO-BATCH against a persisted reference census: the
  * admission-side answer to "has the feed changed under me", raised
  * BEFORE drifted data contaminates the corpus (the batch counterpart
  * audits after the fact). Each batch's doc-length census is compared
  * to the reference's; the KS statistic, sizes, and an alarm verdict
  * under `barMicro` land in a batch-keyed monitor sink.
  *
  * Semantics and scale:
  *  - the reference census is a BOUNDED (value, count) relation —
  *    loading it per batch is a broadcast-sized read, and the batch
  *    census partial-aggregates the micro-batch only; nothing scans
  *    the historical corpus;
  *  - the KS core is [[TextOps.ksBetweenCensuses]] — integer
  *    numerators, one division, so the monitor emits the same number
  *    the offline X44 audit would compute for that batch;
  *  - `foreachBatch` is at-least-once: monitor rows land in
  *    batch-id-keyed partition directories with OVERWRITE (the
  *    [[CorpusAdmission]] idempotence discipline) — a replayed batch
  *    rewrites its own row and converges;
  *  - the monitor only OBSERVES (no quarantine side effect): wiring
  *    the alarm into [[UnifiedAdmission]]'s gate is deployment
  *    policy, deliberately not baked in here.
  */
object DriftMonitor {

  /** Build + persist the reference doc-length census from an accepted
    * corpus (one partial-agg'd Exchange; the census is value-domain
    * bounded).
    */
  def saveReference(docs: DataFrame, path: String): Unit =
    docs.select(size(TextOps.tokens(col("text"))).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(path)

  /** One batch vs the reference: a single row
    * (n_batch, n_ref, ks_num, ks_micro, alarm).
    */
  def batchKs(spark: SparkSession, batch: DataFrame, refPath: String,
              barMicro: Long): DataFrame = {
    val ref = spark.read.parquet(refPath)
    val bcen = batch
      .select(size(TextOps.tokens(col("text"))).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    TextOps.ksBetweenCensuses(bcen, ref)
      .select(col("n_a").as("n_batch"), col("n_b").as("n_ref"),
        col("ks_num"), col("ks_micro"),
        (col("ks_micro") >= barMicro).as("alarm"))
  }

  /** The streaming monitor query: docs stream → per-batch KS vs the
    * reference → one row per batch in `monitorDir/batch_id=<id>`.
    */
  def start(spark: SparkSession, docs: DataFrame, refPath: String,
            monitorDir: String, checkpointDir: String,
            barMicro: Long): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batchKs(spark, batch, refPath, barMicro)
            .write.mode("overwrite")
            .parquet(s"$monitorDir/batch_id=$batchId")
        }
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
}
