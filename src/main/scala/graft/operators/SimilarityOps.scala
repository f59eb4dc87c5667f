package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing.micro
import graft.functions.vector.cosineSim

/** Embedding similarity operators over an `embeddings`-shaped frame
  * (`vec_id: long, embedding: array<float>, label: int`).
  *
  * The scoring kernel is [[graft.functions.CosineSimilarity]] — a custom
  * Catalyst expression with `doGenCode` (one fused scalar loop inside
  * whole-stage codegen). The built-in formulation
  * (`aggregate(zip_with(...))`) is a `CodegenFallback` higher-order
  * function: interpreted lambda dispatch + a temp array per row — the
  * wrong shape for the O(candidate-pairs) hot loop. Both compute the
  * identical double (same accumulation order), so the DuckDB oracles
  * are unaffected.
  *
  * Scale design:
  *  - pairwise near-dup never goes O(n²): pairs are generated inside
  *    blocking buckets (here the `label` column; at 100 TB a sign-LSH
  *    bucket — see [[TextOps.simhashPairs]] for the banding pattern);
  *  - brute-force top-k is a single scan + TakeOrderedAndProject (no
  *    full sort, no shuffle of the data — only k rows per partition);
  *  - IVF probes restrict the scan to a cluster subset; the centroid
  *    table (the "codebook") is tiny and broadcast, never shuffled.
  */
object SimilarityOps {

  /** Embedding-cosine near-dup pairs, blocked by `label` (the coarse
    * bucket): only same-label pairs are scored, so the join fans out per
    * block instead of globally.
    */
  def embedNearDupPairs(emb: DataFrame, cosMicroMin: Long): DataFrame = {
    val a = emb.select(col("vec_id").as("d1"), col("label"),
      col("embedding").as("e1"))
    val b = emb.select(col("vec_id").as("d2"), col("label"),
      col("embedding").as("e2"))
    a.join(b, Seq("label"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("label"),
        micro(cosineSim(col("e1"), col("e2"))).as("cos_micro"))
      .filter(col("cos_micro") >= cosMicroMin)
  }

  /** Brute-force cosine top-k against the embedding of `queryId`. The
    * single-row query side is broadcast; the scan side never shuffles —
    * Spark plans the orderBy+limit as TakeOrderedAndProject.
    */
  def annTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        micro(cosineSim(col("embedding"), col("qe"))).as("cos_micro"))
      .orderBy(col("cos_micro").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-style ANN: a small codebook of centroids (here the first
    * `nCentroids` vectors — deterministic seeds; k-means would slot in
    * the same way), each vector assigned to its nearest centroid, and
    * the query probed against the `nProbe` nearest clusters only.
    *
    * Everything stays distributed: the codebook and probe list are
    * broadcast joins, the scan reads only probed clusters — at scale the
    * sink would be partitioned by cluster id for partition pruning.
    */
  def annIvf(emb: DataFrame, queryId: Long, nCentroids: Int, nProbe: Int,
             k: Int): DataFrame = {
    val cents = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val cm = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        micro(cosineSim(col("embedding"), col("ce"))).as("cm"))
    val byCm = Window.partitionBy(col("vec_id"))
      .orderBy(col("cm").desc, col("cid"))
    val assign = cm.withColumn("rn", row_number().over(byCm))
      .filter(col("rn") === 1).select(col("vec_id"), col("cid").as("cluster"))
    val probe = cm.filter(col("vec_id") === queryId)
      .orderBy(col("cm").desc, col("cid"))
      .limit(nProbe).select(col("cid").as("probe_cid"))
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= queryId)
      .join(assign, "vec_id")
      .join(broadcast(probe), col("cluster") === col("probe_cid"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cluster"),
        micro(cosineSim(col("embedding"), col("qe"))).as("cos_micro"))
      .orderBy(col("cos_micro").desc, col("vec_id"))
      .limit(k)
  }
}
