package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Dev tool (VERDICT r13 item 8): the V-family scale curve — the
  * [[DedupScale]] protocol applied to the embedding pipelines: one
  * recorded 32× run of the sign-LSH candidate/verified pipelines and
  * the IVF probe path, turning the ANN 100 TB extrapolation from
  * argument into measurement.
  *
  * Method: the ScaleProbe replica construction (vec_id-offset copies —
  * identical embedding content, c× the rows). Copies carry identical
  * sign-LSH signatures and identical cluster assignments, so:
  *  - sign-LSH raw candidates follow the exact closed form
  *    cand(c) = c²·cand(1) + n·c(c−1)/2 (every 1× candidate pair in
  *    all c² copy combinations; every doc pairs with its own c−1
  *    copies — all docs are eligible, every vector has a signature);
  *  - verified pairs follow the SAME closed form (cosine verification
  *    is a deterministic function of content; identical copies score
  *    exactly 10⁶ ≥ any bar);
  *  - IVF visited mass follows visited(c) = c·(visited(1) + Q) − Q
  *    (cluster populations scale exactly ×c under a FIXED 1×-trained
  *    codebook — the deployment shape, codebooks train on samples;
  *    each query excludes only itself, not its copies).
  * The quantity under test is WALL TIME against that known output
  * growth: a pipeline whose time tracks its output is
  * candidate-bounded; an all-pairs hider would grow with the corpus
  * square irrespective of output.
  *
  * Usage: sbt "runMain graft.VectorScale [c1 c2 ...]" (default
  * 1 8 32; points past 32 run the production adaptive path only —
  * c=132 crosses the 16-bit banding boundary on this corpus). Prints
  * one `VECTORSCALE` line per (pipeline, point) and per-pipeline curve
  * lines with the closed-form check and the candidate FRACTION of the
  * all-pairs square.
  */
object VectorScale {
  def main(args: Array[String]): Unit = {
    val points = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 8, 32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val n = emb.count()
    val (planes, bandBits, cosMin) = (16, 4, 400000L)
    val (nCent, nProbe, k, qMax) = (10, 3, 10, 8L)
    // codebook trained ONCE at 1× — the deployment shape (codebooks
    // train on a bounded sample, not the full corpus)
    val cents = SimilarityOps.kmeansCodebook(emb, nCent,
      SimilarityOps.KmRounds)

    def replicate(df: DataFrame, copies: Int): DataFrame = {
      val off = 10000000L
      df.crossJoin(spark.range(copies).toDF("__r"))
        .withColumn("vec_id", col("vec_id") + col("__r") * off)
        .drop("__r")
    }

    def timed(name: String, c: Int)(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"VECTORSCALE $name%-16s c=$c%-3d $dt%8.2f s  rows=$rows")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      (dt, rows)
    }

    case class Curve(name: String, form: (Long, Int) => Long) {
      var base: Long = -1L
      var rows = Vector.empty[(Int, Double, Long)]
      def record(c: Int, dt: Double, cnt: Long): Unit = {
        if (c == 1) base = cnt
        rows :+= ((c, dt, cnt))
      }
      def report(): Unit = rows.foreach { case (c, dt, cnt) =>
        val expected = form(base, c)
        val t1 = rows.find(_._1 == 1).map(_._2).getOrElse(dt)
        val allPairs = (n * c) * (n * c - 1) / 2
        val fracPpm = if (allPairs > 0) 1000000L * cnt / allPairs else 0L
        println(f"VECTORSCALE curve $name%-14s c=$c%-3d " +
          f"time=${dt}%7.2f s (x${dt / t1}%6.1f vs 1x) rows=$cnt " +
          f"expected=$expected frac_ppm=$fracPpm " +
          (if (base >= 0 && cnt == expected) "IDENTITY-OK"
           else if (base < 0) "no-1x-base" else "MISMATCH"))
      }
    }
    // Sign-LSH's scale dial is BAND WIDTH (the df-cap analogue of the
    // DedupScale discipline, which scaled caps ×c): at a FIXED width
    // the per-band bucket count is constant, so buckets grow Θ(n) and
    // candidate mass Θ(n²) — the production 4-bit setting (16
    // buckets/band) already reads 23 % of all pairs as candidates at
    // 1× on this clustered corpus, and at 32× its biggest bucket is a
    // single ~10⁸-pair generation task (measured: the run pins 2
    // cores for >12 min — the quadratic wall, ON PURPOSE the probe's
    // first finding). The production query's own setting is therefore
    // measured to 8× only; the 32× curve runs at the WIDENED 8-bit
    // banding (2 bands × 256 buckets) a deployment would switch to at
    // this corpus size. Closed forms hold at each width separately
    // (the identity is per-parameterization).
    val lshForm = (b: Long, c: Int) =>
      b * c * c + n * c.toLong * (c - 1) / 2
    val lshCandW4 = Curve("signlsh_cand_w4", lshForm)
    val lshPairsW4 = Curve("signlsh_pairs_w4", lshForm)
    val lshCandW8 = Curve("signlsh_cand_w8", lshForm)
    val lshPairsW8 = Curve("signlsh_pairs_w8", lshForm)
    // The PRODUCTION q_embed_lsh path (VERDICT r14 item 1): band width
    // from SimilarityOps.adaptiveBandBits(n·c) — the occupancy-capped
    // rule the query surface now ships. No closed form across the
    // width switch; WITHIN a width the replication identity holds, so
    // each point is checked against c²·base₁(bb) + n·c(c−1)/2 with
    // base₁(bb) the 1× verified-pair count measured AT THE WIDTH the
    // rule picked (memoized — one cheap 1× run per distinct width;
    // this covers the 16-bit branch, which no fixed-width curve
    // carries). Points past 32× run the production path ONLY: the
    // fixed-width curves are quadratic there BY DESIGN (the probe's
    // first finding), and the 16-bit rule boundary sits at 262,145
    // vectors — c=132 on this corpus (VERDICT r15 item 5: measure the
    // wide branch, don't just pin its arithmetic).
    var prodRows = Vector.empty[(Int, Int, Double, Long)]
    val prodBase = scala.collection.mutable.Map.empty[Int, Long]
    // visited(c) = c*(visited(1) + Q) - Q; fraction denominator is the
    // per-query corpus (n*c - 1) * Q
    val ivf = Curve("ivf_visited",
      (b, c) => c.toLong * (b + qMax) - qMax)

    points.foreach { c =>
      val d = replicate(emb, c)
      println(s"--- ${c}x sf0.1 (${n * c} vectors) ---")
      if (c <= 8) {
        val (tC, nC) = timed("signlsh_cand_w4", c)(
          SimilarityOps.signLshCandidates(d, planes, bandBits).count())
        lshCandW4.record(c, tC, nC)
        val (tP, nP) = timed("signlsh_pairs_w4", c)(
          SimilarityOps.signLshPairs(d, planes, bandBits, cosMin)
            .count())
        lshPairsW4.record(c, tP, nP)
      }
      if (c <= 32) {
        val (tC8, nC8) = timed("signlsh_cand_w8", c)(
          SimilarityOps.signLshCandidates(d, planes, 8).count())
        lshCandW8.record(c, tC8, nC8)
        val (tP8, nP8) = timed("signlsh_pairs_w8", c)(
          SimilarityOps.signLshPairs(d, planes, 8, cosMin).count())
        lshPairsW8.record(c, tP8, nP8)
      }
      val prodBb = SimilarityOps.adaptiveBandBits(n * c, planes)
      prodBase.getOrElseUpdate(prodBb,
        SimilarityOps.signLshPairs(emb, planes, prodBb, cosMin).count())
      val (tPr, nPr) = timed(s"signlsh_prod_w$prodBb", c)(
        SimilarityOps.signLshPairs(d, planes, prodBb, cosMin).count())
      prodRows :+= ((c, prodBb, tPr, nPr))
      if (c <= 32) {
        // IVF probe path: per 1×-query probed-cluster candidate mass +
        // the served top-k — the q_ann_ivf serving shape, measured as
        // one pass over the Q-query batch
        val (tV, nV) = timed("ivf_visited", c) {
          val queries = d.filter(col("vec_id") < qMax)
            .select(col("vec_id").as("query_id"))
          val probed = (0L until qMax).flatMap { q =>
            SimilarityOps.probeClusters(d, cents, q, nProbe)
              .map(cl => (q, cl.toLong))
          }.toSeq
          import spark.implicits._
          val pr = probed.toDF("query_id", "cluster")
          val assigned = SimilarityOps.clusterAssignments(d, cents)
          assigned.join(broadcast(pr), Seq("cluster"))
            .filter(col("vec_id") =!= col("query_id"))
            .count()
        }
        ivf.record(c, tV, nV)
      }
    }
    println(s"=== curves (n=$n per copy; closed forms: LSH " +
      s"c^2*base + n*c(c-1)/2, IVF c*(base+Q)-Q with Q=$qMax) ===")
    lshCandW4.report(); lshPairsW4.report()
    lshCandW8.report(); lshPairsW8.report(); ivf.report()
    prodRows.foreach { case (c, bb, dt, cnt) =>
      // within-width replication identity against the 1× base measured
      // at the SAME width (covers the 16-bit branch, which no
      // fixed-width curve carries); the fixed-width cross-check rides
      // along where that curve exists
      val expected = lshForm(prodBase(bb), c)
      val fixed = (if (bb == 4) lshPairsW4 else lshPairsW8)
        .rows.find(_._1 == c)
      val ok =
        (if (cnt == expected) "IDENTITY-OK" else s"MISMATCH vs $expected") +
        (fixed match {
          case Some((_, _, fc)) if fc == cnt => " MATCHES-FIXED-WIDTH"
          case Some((_, _, fc)) => s" MISMATCH-FIXED vs $fc"
          case None => ""
        })
      println(f"VECTORSCALE curve signlsh_prod    c=$c%-3d " +
        f"time=${dt}%7.2f s bb=$bb rows=$cnt $ok")
    }
    spark.stop()
  }
}
