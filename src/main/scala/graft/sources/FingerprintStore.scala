package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextOps

/** Persisted winnowing-fingerprint store — the 100 TB deployment shape
  * for the dedup/contamination family.
  *
  * A contamination audit over a training corpus is not a one-off query:
  * the same fingerprint relation serves every (eval set × corpus
  * snapshot) audit, dedup incremental loads, and attribution lookups.
  * Recomputing the winnow scan per audit (what the self-contained
  * [[TextOps.contamination]] does) is the right shape for a demo and the
  * wrong one for a cluster — so this store writes the relation ONCE as a
  * catalog table bucketed by `fingerprint`, and every fingerprint-keyed
  * consumer (the df cap, the cap semi-join, the test⋈train overlap
  * join) then runs without a single Exchange: bucketed scans arrive
  * already hash-partitioned on the join key (same technique
  * StorageLayoutSpec proves for the flights band join).
  *
  * Layout notes for scale: `nBuckets` is chosen so one bucket's rows fit
  * an executor's shuffle-free sort (buckets are also the parallelism
  * floor — 1024 at 100 TB); `sortBy(fingerprint)` makes the overlap
  * join's sort a no-op on the scan side and enables row-group min/max
  * skipping on point fingerprint probes.
  */
object FingerprintStore {

  /** Build the (doc_id, fingerprint, split) relation and save it
    * bucketed by fingerprint as catalog table `table`.
    */
  def save(docs: DataFrame, k: Int, w: Int, trainPct: Int, valPct: Int,
           table: String, nBuckets: Int = 8): Unit =
    TextOps.winnowedSplit(docs, k, w, trainPct, valPct)
      .write.mode("overwrite")
      .bucketBy(nBuckets, "fingerprint").sortBy("fingerprint")
      .saveAsTable(table)

  /** The stored relation, bucket metadata intact. */
  def load(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Contamination audit against the persisted store: identical output
    * to [[TextOps.contamination]] on the same corpus/params (the spec
    * asserts it), but the winnow scan is amortized across audits and
    * the fingerprint-keyed joins are Exchange-free.
    */
  def contamination(spark: SparkSession, table: String, maxDf: Long,
                    ratioMicroMin: Long): DataFrame =
    TextOps.contaminationFrom(load(spark, table), maxDf, ratioMicroMin)
}
