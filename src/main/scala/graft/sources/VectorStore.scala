package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.KmeansAssign.kmeansAssign
import graft.functions.Hashing.micro
import graft.functions.vector.cosineSim
import graft.operators.SimilarityOps

/** Persisted IVF vector store — the deployment shape of
  * [[SimilarityOps.annIvf]]'s scale note made concrete: the index build
  * (codebook training + cluster assignment) happens ONCE at write time,
  * and the layout is partitioned by cluster id, so a probe query's
  * cluster filter becomes parquet partition pruning — the scan never
  * opens a non-probed cluster's files. At 100 TB with, say, 4,096
  * clusters and nProbe = 32, a query touches <1 % of the index bytes
  * before a single row is read.
  *
  * Build is embarrassingly parallel after training (assignment is the
  * [[graft.functions.KmeansAssign]] per-row kernel, zero shuffles; the
  * partitioned write is the only data movement). Queries recompute
  * nothing: assignment is baked into the layout.
  */
object VectorStore {

  /** Train a codebook on `emb` and write (vec_id, embedding, cluster)
    * partitioned by cluster under `path`. Returns the trained codebook —
    * the query side needs it for probe selection (persist it next to the
    * store in a real deployment).
    */
  def save(emb: DataFrame, path: String, nCentroids: Int,
           rounds: Int = SimilarityOps.KmRounds): Array[Array[Long]] = {
    val cents = SimilarityOps.kmeansCodebook(emb, nCentroids, rounds)
    emb.select(col("vec_id"), col("embedding"),
        kmeansAssign(col("embedding"), cents).as("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
    cents
  }

  /** Top-k cosine ANN against the stored index: probe clusters chosen
    * from the codebook on the driver (same score function as training),
    * the cluster filter prunes partitions at the scan, exact cosine only
    * over surviving rows. Output is identical to
    * [[SimilarityOps.annIvfWith]] on the same codebook (spec-pinned) —
    * the store only changes WHERE assignment is paid, not what it is.
    */
  def annTopK(spark: SparkSession, path: String,
              cents: Array[Array[Long]], queryId: Long, nProbe: Int,
              k: Int): DataFrame = {
    val store = spark.read.parquet(path)
    val probed = SimilarityOps.probeClusters(store, cents, queryId, nProbe)
    val q = store.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    store.filter(col("vec_id") =!= queryId)
      .filter(col("cluster").isin(probed.map(_.toLong): _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cluster"),
        micro(cosineSim(col("embedding"), col("qe"))).as("cos_micro"))
      .orderBy(col("cos_micro").desc, col("vec_id"))
      .limit(k)
  }
}
