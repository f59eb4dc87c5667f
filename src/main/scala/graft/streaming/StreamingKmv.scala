package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.SketchQueries

/** T19: streaming KMV (bottom-k) distinct-count sketch — the stateful
  * twin of X49's batch census (q_kmv): each micro-batch reduces to its
  * per-source distinct 5-gram hashes (the [[SketchQueries.kmvHashes]]
  * universe, shared with the batch census), unions with the persisted
  * bottom-k state, and re-takes the k smallest per source — union +
  * re-take is an EXACT semilattice (the X64/T13 bottom-k property), so
  * the stored state is BIT-IDENTICAL to the batch bottom-k over the
  * concatenated stream (spec-pinned), and the serving estimates match
  * [[SketchQueries.kmvCensus]]'s (source, est) columns exactly.
  *
  * Replay convergence (at-least-once foreachBatch): the T15/T17
  * discipline — each batch reads the state of the latest batch_id
  * STRICTLY BELOW its own and overwrites its own partition; a
  * replayed batch re-reads the same predecessor and rewrites an
  * identical partition (spec-pinned fixed point). Like T18's OR,
  * bottom-k union is idempotent, so the discipline is belt-and-braces
  * here rather than load-bearing.
  *
  * State bound: ≤ k = 64 hash rows per source per batch partition
  * REGARDLESS of stream length (Beyer et al., SIGMOD 2007) — the
  * number a 100 TB pipeline keeps per corpus slice to answer "how
  * many distinct shingles has this source contributed so far"
  * without ever holding the distinct set.
  */
object StreamingKmv {

  /** One micro-batch of (doc_id, text, source) rows. */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   storeDir: String, batchId: Long): Unit = {
    val merged = SketchQueries.kmvBottomK(
      loadState(spark, storeDir, batchId)
        .unionByName(SketchQueries.kmvHashes(batch)))
    merged.write.mode("overwrite")
      .parquet(s"$storeDir/batch_id=$batchId")
  }

  private def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long)].toDF("source", "h")
  }

  private def loadState(spark: SparkSession, storeDir: String,
                        batchId: Long): DataFrame =
    BatchStore.latest(spark, storeDir, Seq("source", "h"), Some(batchId))
      .getOrElse(emptyState(spark))

  /** The serving read: the current bottom-k state as (source, h). */
  def state(spark: SparkSession, storeDir: String): DataFrame =
    BatchStore.latest(spark, storeDir, Seq("source", "h"))
      .getOrElse(emptyState(spark)).orderBy("source", "h")

  /** Per-source distinct-count estimates off the current state —
    * exact below k, the (k−1)·2⁶⁰/kth estimator at k, matching the
    * batch census branch for branch.
    */
  def estimates(spark: SparkSession, storeDir: String): DataFrame =
    SketchQueries.kmvEstimates(state(spark, storeDir))

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
