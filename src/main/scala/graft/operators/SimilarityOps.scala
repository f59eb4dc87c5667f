package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing.micro

/** Embedding similarity operators over an `embeddings`-shaped frame
  * (`vec_id: long, embedding: array<float>, label: int`).
  *
  * All vector math is built-in higher-order functions (`zip_with` +
  * `aggregate` fold in double precision) — codegen-friendly, no UDFs.
  * Norms are computed once per vector and carried through joins so a
  * pairwise stage does one fused multiply-fold per pair, nothing else.
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

  /** array<float> → array<double>, the precision both engines agree on. */
  def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product in double — mirrors a SUM over the
    * position-joined elements in the oracle (order differences are
    * absorbed by the micro-unit floor).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, z) => acc + z)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** vec_id, v (array<double>), nrm, label — the working projection. */
  def prepared(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))

  /** Cosine in integer micro-units: floor(1e6 * dot/(na*nb)). */
  def cosMicro(a: Column, b: Column, na: Column, nb: Column): Column =
    micro(dot(a, b) / (na * nb))

  /** Embedding-cosine near-dup pairs, blocked by `label` (the coarse
    * bucket): only same-label pairs are scored, so the join fans out per
    * block instead of globally.
    */
  def embedNearDupPairs(emb: DataFrame, cosMicroMin: Long): DataFrame = {
    val e = prepared(emb)
    val a = e.select(col("vec_id").as("d1"), col("label"),
      col("v").as("v1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("d2"), col("label"),
      col("v").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq("label"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("label"),
        cosMicro(col("v1"), col("v2"), col("n1"), col("n2"))
          .as("cos_micro"))
      .filter(col("cos_micro") >= cosMicroMin)
  }

  /** Brute-force cosine top-k against the embedding of `queryId`. The
    * single-row query side is broadcast; the scan side never shuffles —
    * Spark plans the orderBy+limit as TakeOrderedAndProject.
    */
  def annTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val e = prepared(emb)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosMicro(col("v"), col("qv"), col("nrm"), col("qn"))
          .as("cos_micro"))
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
    val e = prepared(emb)
    val cents = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))
    val cm = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        cosMicro(col("v"), col("cv"), col("nrm"), col("cn")).as("cm"))
    val byCm = Window.partitionBy(col("vec_id"))
      .orderBy(col("cm").desc, col("cid"))
    val assign = cm.withColumn("rn", row_number().over(byCm))
      .filter(col("rn") === 1).select(col("vec_id"), col("cid").as("cluster"))
    val probe = cm.filter(col("vec_id") === queryId)
      .orderBy(col("cm").desc, col("cid"))
      .limit(nProbe).select(col("cid").as("probe_cid"))
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    e.filter(col("vec_id") =!= queryId)
      .join(assign, "vec_id")
      .join(broadcast(probe), col("cluster") === col("probe_cid"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cluster"),
        cosMicro(col("v"), col("qv"), col("nrm"), col("qn"))
          .as("cos_micro"))
      .orderBy(col("cos_micro").desc, col("vec_id"))
      .limit(k)
  }
}
