package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Dev tool (VERDICT r12 item 7): the dedup-family scale curve past the
  * 8× point [[ScaleProbe]] records — one recorded 32× run of the three
  * blocking pipelines (D2 n-gram Jaccard, D3 MinHash-LSH, D9 exact
  * substring) turning the 100 TB extrapolation from argument into
  * measurement.
  *
  * Method: the ScaleProbe replica construction (id-offset copies — same
  * content distribution, c× the rows; every near-dup pair of the 1×
  * corpus appears in all c² copy combinations, plus each doc pairs with
  * its own c−1 identical copies), so candidate/pair COUNTS follow exact
  * closed forms — cand(c) = c²·cand(1) + n_eligible·c(c−1)/2 — and the
  * quantity under test is WALL TIME against that known output growth:
  * a blocking pipeline whose time tracks its output (here dominated by
  * the c² true-pair term, since replication is the worst case where
  * EVERYTHING is a duplicate) is candidate-bounded; an all-pairs hider
  * would grow with the corpus square irrespective of output. The df
  * caps scale with c (df at c× is exactly c·df₁ — the ScaleProbe
  * discipline), so the cap keeps the same grams at every point.
  *
  * Usage: sbt "runMain graft.DedupScale [c1 c2 ...]" (default 1 8 32).
  * Prints one `DEDUPSCALE` line per (pipeline, point) with wall time +
  * row count, and per-pipeline curve lines with the closed-form check.
  */
object DedupScale {
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

    def replicate(df: DataFrame, copies: Int): DataFrame = {
      val n = 10000000L
      df.crossJoin(spark.range(copies).toDF("__r"))
        .withColumn("doc_id", col("doc_id") + col("__r") * n)
        .drop("__r")
    }

    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text")
    val nDocs = docs.count()

    def timed(name: String, c: Int)(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"DEDUPSCALE $name%-18s c=$c%-3d $dt%8.2f s  rows=$rows")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      (dt, rows)
    }

    // Eligibility censuses for the identical-copy pair terms (computed
    // once at 1×): a doc pairs with its own copies iff it owns at least
    // one shingle (D2/D3: the copies then share ALL shingles, Jaccard
    // 1 ≥ any threshold) / at least one cap-surviving gram (D9).
    val dShingled = TextOps.shingleSet(docs, 5)
      .select("doc_id").distinct().count()
    val g1 = TextOps.gramFirstPositions(docs, 32)
    val dGrams = g1.join(
        g1.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 50L).select("h"), "h")
      .select("doc_id").distinct().count()

    case class Curve(name: String, eligible: Long) {
      var base: Long = -1L
      var rows = Vector.empty[(Int, Double, Long)]
      def record(c: Int, dt: Double, n: Long): Unit = {
        if (c == 1) base = n
        rows :+= ((c, dt, n))
      }
      def report(): Unit = rows.foreach { case (c, dt, n) =>
        val expected = base * c * c + eligible * c.toLong * (c - 1) / 2
        val t1 = rows.find(_._1 == 1).map(_._2).getOrElse(dt)
        println(f"DEDUPSCALE curve $name%-14s c=$c%-3d time=${dt}%7.2f s " +
          f"(x${dt / t1}%6.1f vs 1x) rows=$n expected=$expected " +
          (if (base >= 0 && n == expected) "IDENTITY-OK"
           else if (base < 0) "no-1x-base"
           else s"MISMATCH"))
      }
    }
    val cJac = Curve("ngram_jaccard", dShingled)
    val cMh = Curve("minhash_cand", -1L) // S-curve filtered: no identity
    val cMhc = Curve("minhash_cand_raw", dShingled)
    val cSub = Curve("substring", dGrams)

    val mhSeeds = graft.functions.Hashing.minhashSeeds(
      TextOps.ScaleMinhashBands * TextOps.ScaleMinhashRows)
    points.foreach { c =>
      val d = replicate(docs, c)
      println(s"--- ${c}x sf0.1 (${nDocs * c} docs) ---")
      // D2: exact n-gram Jaccard over the df-capped inverted index
      val (tJ, nJ) = timed("ngram_jaccard", c)(
        TextOps.ngramJaccardPairs(d, 5, 1000L * c, 800000L).count())
      cJac.record(c, tJ, nJ)
      // D3: MinHash banding candidates at the production wide-band
      // setting — the RAW candidate relation obeys the closed form
      val sh = TextOps.shingleSet(d, 5).select(col("doc_id"),
        graft.functions.Hashing.md5Long(col("sh")).as("h0"))
      val (tC, nC) = timed("minhash_cand_raw", c)(
        TextOps.minhashCandidates(sh, TextOps.ScaleMinhashBands,
          TextOps.ScaleMinhashRows, mhSeeds).count())
      cMhc.record(c, tC, nC)
      // D3: the full verified-pair pipeline (threshold 0.7)
      val (tM, nM) = timed("minhash_lsh", c)(
        TextOps.minhashLshPairs(d, 5, 700000L).count())
      cMh.record(c, tM, nM)
      // D9: exact 32-gram substring spans, df cap scaled by c
      val (tS, nS) = timed("substring", c)(
        TextOps.substringMatches(d, 32, 50L * c).count())
      cSub.record(c, tS, nS)
    }
    println(s"=== curves (closed form: c^2*base + eligible*c(c-1)/2; " +
      s"shingled=$dShingled, cap-surviving=$dGrams of $nDocs docs) ===")
    cJac.report(); cMhc.report(); cSub.report()
    // the verified-pair pipelines follow the same shape but their
    // post-verification thresholds make the closed form a floor, not
    // an identity — report times only
    cMh.rows.foreach { case (c, dt, n) =>
      val t1 = cMh.rows.find(_._1 == 1).map(_._2).getOrElse(dt)
      println(f"DEDUPSCALE curve minhash_lsh    c=$c%-3d time=${dt}%7.2f s " +
        f"(x${dt / t1}%6.1f vs 1x) rows=$n")
    }
    spark.stop()
  }
}
