package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{SketchQueries, TextOps}

/** T15: streaming heavy hitters — the stateful twin of the X66
  * Misra-Gries sketch (q_heavy), completing the streaming side of the
  * sketch family (T13 did quantiles): each micro-batch's token census
  * collapses to its own ≤ k-counter MG summary BEFORE anything crosses
  * the batch boundary, then merges into the persisted summary with the
  * same [[SketchQueries.mgStep]] used offline (sum counters, subtract
  * the rank-(k+1) value, keep positive). The mergeable-summaries
  * theorem (Agarwal et al., PODS 2012) holds for ANY merge tree, so
  * the streamed summary keeps the full MG guarantee against the whole
  * stream: err ≤ N_total/(k+1), and every token with total frequency
  * above that bound survives — the accumulation a per-batch top-k
  * cannot provide (a token that is light in every batch but heavy
  * across them never tops any single batch).
  *
  * Replay convergence (at-least-once foreachBatch): MG merge is NOT
  * idempotent (re-merging the same summary double-counts), so state
  * rides the [[CusumMonitor]] discipline — each batch reads the
  * summary of the latest batch_id STRICTLY BELOW its own and
  * overwrites its own batch_id partition; a replayed batch re-reads
  * the same predecessor and rewrites an identical partition
  * (spec-pinned fixed point).
  *
  * State bound: ≤ k counter rows per batch partition REGARDLESS of
  * stream length or vocabulary — the mergeable-summary property.
  */
object StreamingHeavyHitters {

  /** One micro-batch of documents-shaped rows (doc_id, text). */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   storeDir: String, batchId: Long): Unit = {
    val bcen = batch
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .withColumn("bucket", lit(0L))
    val bsum = SketchQueries.mgStep(bcen, col("bucket"))
    val prev = loadState(spark, storeDir, batchId)
    val merged = SketchQueries.mgStep(
      prev.unionByName(bsum.select("bucket", "token", "c"))
        .groupBy("bucket", "token").agg(sum("c").as("c")),
      col("bucket"))
    merged.select(col("token"), col("c"))
      .write.mode("overwrite")
      .parquet(s"$storeDir/batch_id=$batchId")
  }

  /** The latest summary strictly BEFORE `batchId` (empty when none) —
    * the read that makes replays converge. Directory probed through
    * the Hadoop FileSystem API (works on HDFS/S3 paths, the
    * CusumMonitor fix).
    */
  private def loadState(spark: SparkSession, storeDir: String,
                        batchId: Long): DataFrame = {
    import spark.implicits._
    BatchStore.latest(spark, storeDir, Seq("token", "c"), Some(batchId))
      .map(_.select(lit(0L).as("bucket"), col("token"), col("c")))
      .getOrElse(Seq.empty[(Long, String, Long)]
        .toDF("bucket", "token", "c"))
  }

  /** The serving read: the current summary (latest batch partition),
    * heaviest counters first; an empty (token, c) frame when the store
    * has no batch partitions yet (same probe as [[loadState]]).
    */
  def summary(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    BatchStore.latest(spark, storeDir, Seq("token", "c"))
      .getOrElse(Seq.empty[(String, Long)].toDF("token", "c"))
      .orderBy(col("c").desc, col("token"))
  }

  def start(spark: SparkSession, docs: DataFrame, storeDir: String,
            checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, storeDir, batchId)
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
}
