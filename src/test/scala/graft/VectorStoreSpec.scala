package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.sources.{Tables, VectorStore}

/** The IVF store's index lifecycle: incremental append (against the
  * stored codebook, into the cluster partition layout) must be
  * indistinguishable from a full rebuild under the same codebook, and
  * the drift metric must fire exactly when the appended data stops
  * looking like the training data.
  */
class VectorStoreSpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)

  test("append + query == rebuild + query on the same data") {
    val d1 = emb.filter(col("vec_id") % 2 === 0)
    val d2 = emb.filter(col("vec_id") % 2 === 1)
    val cents = SimilarityOps.kmeansCodebook(d1, 10, SimilarityOps.KmRounds)

    val rebuilt = Files.createTempDirectory("graft-vs-rebuild").toString
    VectorStore.saveWith(emb, rebuilt, cents)
    val grown = Files.createTempDirectory("graft-vs-grown").toString
    VectorStore.saveWith(d1, grown, cents)
    val drift = VectorStore.append(spark, grown, d2)
    assert(drift.nAppended === d2.count())

    // identical content: every (vec_id, cluster) assignment agrees
    def rows(p: String) = spark.read.parquet(p)
      .select("vec_id", "cluster").collect().map(_.toSeq).toSet
    assert(rows(grown) === rows(rebuilt))
    // identical sidecar codebook (append never touches it)
    assert(VectorStore.readMeta(spark, grown).cents.toSeq.map(_.toSeq) ===
      cents.toSeq.map(_.toSeq))
    // identical query answers, via each store's own sidecar
    def topk(p: String) = VectorStore
      .annTopK(spark, p, queryId = 0L, nProbe = 3, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(topk(grown) === topk(rebuilt))
  }

  test("PQ leg: stored codes serve ADC; full probe == in-query ADC; " +
    "probes prune the codes partitions") {
    val path = Files.createTempDirectory("graft-vs-pq").toString
    VectorStore.save(emb, path, 10)
    val books = VectorStore.savePq(spark, path, nSub = 4, subLen = 16,
      nCents = 8)
    // round-trip: the sidecar reproduces the trained books exactly
    assert(VectorStore.readPqBooks(spark, path)
      .map(_.toSeq.map(_.toSeq)) === books.map(_.toSeq.map(_.toSeq)))
    // full probe: store-served ADC == the in-query formulation
    val served = VectorStore.pqAdcTopK(spark, path, queryId = 0L,
      nProbe = 10, k = 10)
    val inline = SimilarityOps.pqAdcTopK(emb, books, 16, 0L, 10)
    assert(served.collect().map(_.toSeq).toSeq ===
      inline.collect().map(_.toSeq).toSeq)
    // narrow probe: the cluster filter must prune the CODES partitions
    val probed = VectorStore.pqAdcTopK(spark, path, queryId = 0L,
      nProbe = 3, k = 10)
    val scan = probed.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
      .find(s => s.contains("_pqcodes") && s.contains("PartitionFilters"))
    assert(scan.exists(_.contains("cluster")),
      s"probe filter must prune code partitions:\n${scan.getOrElse("")}")
    // and its answers come only from probed clusters: every returned
    // vec_id's stored cluster is in the probe set
    val probeSet = SimilarityOps.probeClusters(
      spark.read.parquet(path), VectorStore.readMeta(spark, path).cents,
      0L, 3).map(_.toLong).toSet
    val clusters = spark.read.parquet(path)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) ->
        r.getAs[Number]("cluster").longValue).toMap
    probed.collect().map(_.getLong(0))
      .foreach(v => assert(probeSet.contains(clusters(v))))
  }

  test("drift fires on distribution shift, stays quiet on more of the same") {
    val path = Files.createTempDirectory("graft-vs-drift").toString
    VectorStore.save(emb.filter(col("vec_id") % 2 === 0), path, 10)
    val baseline = VectorStore.readMeta(spark, path).baselineScoreMicro

    // more of the same distribution: a 10-centroid codebook trained on
    // 250 near-random vectors generalizes imperfectly (the held-out
    // half scores ~0.2 below its training mean on this corpus), but
    // stays well inside the tolerance that separates "imperfect fit"
    // from "wrong data"
    val same = emb.filter(col("vec_id") % 2 === 1)
    val (d1, retrained1) = VectorStore.appendOrRetrain(spark, path, same,
      tolMicro = 300000L, nCentroids = 10)
    assert(!retrained1, s"same-distribution append must not retrain: $d1")
    assert(d1.baselineScoreMicro === baseline)

    // a genuinely shifted batch: vectors in the orthogonal complement
    // of the codebook's span (Gram-Schmidt against the stored
    // centroids) score ~0 cosine against EVERY centroid — on random
    // data that is the real "wrong distribution" shape (negation would
    // still find some positively-aligned centroid)
    val cents0 = VectorStore.readMeta(spark, path).cents
      .map(_.map(_.toDouble))
    val dims = cents0.head.length
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val basis = cents0.foldLeft(Vector.empty[Array[Double]]) { (bs, c) =>
      val r = c.clone()
      bs.foreach { b => val d = dot(r, b)
        (0 until dims).foreach(i => r(i) -= d * b(i)) }
      val n = math.sqrt(dot(r, r))
      if (n > 1e-9) bs :+ r.map(_ / n) else bs
    }
    val shiftedRows = (0 until 50).map { m =>
      val x = new Array[Double](dims)
      x(m % dims) = 1.0
      basis.foreach { b => val d = dot(x, b)
        (0 until dims).foreach(i => x(i) -= d * b(i)) }
      val n = math.sqrt(dot(x, x))
      (1000000L + m, x.map(v => (v / n).toFloat))
    }
    val shifted = shiftedRows.toDF("vec_id", "embedding")
    val (d2, retrained2) = VectorStore.appendOrRetrain(spark, path, shifted,
      tolMicro = 300000L, nCentroids = 10)
    assert(retrained2, s"shifted append must trigger retrain: $d2")
    assert(d2.driftMicro > 300000L)

    // the retrained store: fresh codebook trained on ALL rows, layout
    // rewritten, queries equal to the from-scratch formulation
    val meta = VectorStore.readMeta(spark, path)
    val all = spark.read.parquet(path).select("vec_id", "embedding")
    assert(meta.nTrain === all.count())
    assert(meta.baselineScoreMicro !== baseline)
    val stored = VectorStore
      .annTopK(spark, path, queryId = 0L, nProbe = 3, k = 10)
      .collect().map(_.toSeq).toSeq
    val inline = SimilarityOps.annIvfWith(all, 0L, meta.cents, 3, 10)
      .collect().map(_.toSeq).toSeq
    assert(stored === inline)
  }
}
