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

  /** Deterministic "random" hyperplanes for sign-LSH: w(j)(i) derived
    * from md5 of a fixed tag, quantized to 3 decimals so the same
    * literals inject exactly into Spark expressions and oracle SQL.
    */
  def planeW(j: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pl${j}_$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
  }

  /** Sign-LSH near-dup pairs — the label-free scale path for
    * [[embedNearDupPairs]]: 16 hyperplane sign bits per vector, banded
    * 4×4; vectors sharing any band bucket become candidates, verified
    * with exact cosine. Candidate generation is a bucket join (no
    * blocking column needed, no O(n²)); recall at cos≥0.5 is ~59% per
    * the standard 1-θ/π sign-agreement bound — raise nPlanes/bands for
    * higher recall at scale.
    */
  def signLshPairs(emb: DataFrame, nPlanes: Int, bandBits: Int,
                   cosMicroMin: Long): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dims = 64
    val nBands = nPlanes / bandBits
    val planes = for {
      j <- 0 until nPlanes; i <- 1 to dims
    } yield (j, i, planeW(j, i))
    val planesDf = planes.toDF("j", "i", "w")
    val ev = emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("i0", "v")))
      .select(col("vec_id"), (col("i0") + 1).as("i"),
        col("v").cast("double").as("v"))
    val dots = ev.join(broadcast(planesDf), "i")
      .groupBy("vec_id", "j").agg(sum(col("v") * col("w")).as("d"))
    val sig = dots.groupBy("vec_id")
      .agg(sum(expr(
        "CASE WHEN d >= 0.0 THEN shiftleft(CAST(1 AS BIGINT), j) " +
          "ELSE CAST(0 AS BIGINT) END")).as("sig"))
    val mask = (1L << bandBits) - 1
    val bandRows = (0 until nBands).map { k =>
      struct(lit(k).as("k"),
        shiftright(col("sig"), bandBits * k).bitwiseAND(lit(mask))
          .as("band"))
    }
    val bands = sig.select(col("vec_id"),
        explode(array(bandRows: _*)).as("s"))
      .select(col("vec_id"), col("s.k").as("k"), col("s.band").as("band"))
    val cand = bands.select(col("vec_id").as("d1"), col("k"), col("band"))
      .join(bands.select(col("vec_id").as("d2"), col("k"), col("band")),
        Seq("k", "band"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    val e1 = emb.select(col("vec_id").as("d1"), col("embedding").as("e1"))
    val e2 = emb.select(col("vec_id").as("d2"), col("embedding").as("e2"))
    cand.join(e1, "d1").join(e2, "d2")
      .select(col("d1"), col("d2"),
        micro(cosineSim(col("e1"), col("e2"))).as("cos_micro"))
      .filter(col("cos_micro") >= cosMicroMin)
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
