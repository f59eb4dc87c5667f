package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE load path for batch-versioned parquet stores (ADVICE r14:
  * the 13 streaming stores each carried two hand-copies of the
  * "latest batch_id= partition" read — the serving copy missing the
  * empty-partition null guard, so a store whose batch_id= directory
  * exists but holds zero rows NPE'd on `head().getLong(0)`).
  *
  * Layout contract (shared by every store): `storeDir/batch_id=<id>/`
  * parquet partitions, each a complete self-contained state snapshot;
  * the current state is the rows of the MAX committed batch_id, older
  * partitions are replay history. The partition column infers as INT
  * so it is cast to long before comparison.
  */
object BatchStore {

  /** True iff the store directory holds ≥1 `batch_id=` partition. */
  def hasBatches(spark: SparkSession, storeDir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(path.toUri, spark.sparkContext.hadoopConfiguration)
    fs.exists(path) &&
      fs.listStatus(path).exists(_.getPath.getName.startsWith("batch_id="))
  }

  /** Delete batch_id partitions strictly below `keepFrom` — the
    * replay-history retention every batch-versioned store eventually
    * needs (each batch writes a FULL state snapshot, so an untrimmed
    * store grows O(batches × state); the replay fixed point only ever
    * reads the immediate predecessor, so `batchId − 1` is the tightest
    * safe bound — [[StreamingSample]] prunes inline at that bound,
    * the other stores call this from their maintenance window when
    * replay history has served its audit purpose). Returns the number
    * of partitions deleted.
    */
  def pruneBefore(spark: SparkSession, storeDir: String,
                  keepFrom: Long): Int = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(path.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0
    else fs.listStatus(path).count { st =>
      val nm = st.getPath.getName
      nm.startsWith("batch_id=") &&
        scala.util.Try(nm.stripPrefix("batch_id=").toLong)
          .toOption.exists(_ < keepFrom) &&
        fs.delete(st.getPath, true)
    }
  }

  /** Rows of the latest committed batch (strictly below `maxExclusive`
    * when given — the foreachBatch replay-safety bound), projected to
    * `cols`; None when the store has no partitions OR every qualifying
    * partition is empty (the formerly-unguarded serving case).
    */
  def latest(spark: SparkSession, storeDir: String, cols: Seq[String],
             maxExclusive: Option[Long] = None): Option[DataFrame] = {
    if (!hasBatches(spark, storeDir)) None
    else {
      val read = spark.read.option("basePath", storeDir).parquet(storeDir)
        .withColumn("batch_id", col("batch_id").cast("long"))
      val all = maxExclusive.fold(read)(b => read.filter(col("batch_id") < b))
      val latest = all.agg(max("batch_id")).head()
      if (latest.isNullAt(0)) None
      else Some(all.filter(col("batch_id") === latest.getLong(0))
        .select(cols.map(col): _*))
    }
  }
}
