package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.RelationalQueries

/** T26: streaming mSPRT monitor — the stateful twin of R69's batch
  * always-valid sequential test (q_msprt), and the one experiment
  * statistic whose DEPLOYMENT SHAPE IS a streaming loop: the whole
  * point of an always-valid p-value is that the platform reads it at
  * every peek, so the natural serving form is a store that ingests
  * the event stream and answers "has any arm difference crossed the
  * bar YET" at any moment — not a batch query re-run over the full
  * history each morning.
  *
  * Architecture (the T22/T25 discipline over daily arm censuses):
  *  - each micro-batch reduces to its (event_type, day, six-integer
  *    arm census) relation ([[RelationalQueries.msprtDailyCensus]] —
  *    the SAME kernel the batch query builds) BEFORE anything crosses
  *    the batch boundary, then merges into the persisted census by
  *    plain integer sum — an exact semilattice, so the accumulated
  *    daily census is BIT-IDENTICAL to the batch census over the
  *    concatenated stream regardless of how events split across
  *    batches or how a day's events straddle batch boundaries.
  *  - [[msprt]] rolls the stored census through R69's own statistics
  *    stage ([[RelationalQueries.msprtFromDaily]] — shared code):
  *    cumulative integer windows, the guarded llr tree, the
  *    always-valid running max. Store ≡ batch q_msprt bit-for-bit
  *    UNCONDITIONALLY (spec-pinned).
  *
  * Replay convergence (at-least-once foreachBatch): integer sums are
  * not idempotent, so state rides the T15/T17/T22 discipline — each
  * batch reads the census of the latest batch_id STRICTLY BELOW its
  * own and overwrites its own partition; a replayed batch re-reads
  * the same predecessor and rewrites an identical partition
  * (spec-pinned fixed point).
  *
  * State bound: ≤ event_types × days × 8 columns regardless of
  * stream length — calendar-sized, the smallest state in the family.
  */
object StreamingMsprt {

  /** One micro-batch of events rows (event_id, user_id, event_type,
    * ts, value).
    */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   storeDir: String, batchId: Long): Unit = {
    val merged = loadState(spark, storeDir, batchId)
      .unionByName(RelationalQueries.msprtDailyCensus(batch))
      .groupBy("event_type", "day")
      .agg(sum("dn_a").as("dn_a"), sum("dn_b").as("dn_b"),
        sum("dsum_a").as("dsum_a"), sum("dsum_b").as("dsum_b"),
        sum("dss_a").as("dss_a"), sum("dss_b").as("dss_b"))
    merged.write.mode("overwrite")
      .parquet(s"$storeDir/batch_id=$batchId")
  }

  private def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, java.sql.Date, Long, Long, Long, Long, Long,
        Long)]
      .toDF("event_type", "day", "dn_a", "dn_b", "dsum_a", "dsum_b",
        "dss_a", "dss_b")
  }

  /** The census of the latest batch strictly BEFORE `batchId` (empty
    * when none) — the read that makes replays converge.
    */
  private val StateCols = Seq("event_type", "day", "dn_a", "dn_b",
    "dsum_a", "dsum_b", "dss_a", "dss_b")

  private def loadState(spark: SparkSession, storeDir: String,
                        batchId: Long): DataFrame =
    BatchStore.latest(spark, storeDir, StateCols, Some(batchId))
      .getOrElse(emptyState(spark))

  /** The stored (event_type, day, six-integer) daily census (latest
    * batch).
    */
  def dailyCensus(spark: SparkSession, storeDir: String): DataFrame =
    BatchStore.latest(spark, storeDir, StateCols)
      .getOrElse(emptyState(spark))

  /** The serving read: the always-valid sequential readout over the
    * accumulated census — R69's own rollup (same columns as q_msprt:
    * event_type, day, cn_a, cn_b, csum_a, csum_b, llr_micro,
    * lp_day_micro, lp_micro, crossed).
    */
  def msprt(spark: SparkSession, storeDir: String): DataFrame =
    RelationalQueries.msprtFromDaily(dailyCensus(spark, storeDir))

  def start(spark: SparkSession, events: DataFrame, storeDir: String,
            checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, storeDir, batchId)
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
}
