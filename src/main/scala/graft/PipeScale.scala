package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.{PairStore, ShingleStore}
import graft.streaming.IncrementalCuration

/** Dev probe (T31's 100 TB question, r16): the per-increment wall as a
  * function of HISTORY size. DevPipe measures a 4-increment loop at one
  * corpus size; THIS holds the daily shard FIXED and scales the
  * already-ingested history ×c (offset-id replicas through the real
  * ingest path), then times one fresh increment at each history size —
  * the deployment quantity ("what does tomorrow cost after a year").
  *
  * Expected shape, from the plan: the shard-side work (admission
  * fingerprints, shingling, stats, sinks) is history-independent; the
  * history-coupled terms are the fingerprint-store near-dup audit and
  * the shingle-store df census — both single bucket-local columnar
  * scans of two-long-column stores, LINEAR in history with small
  * constants (no shuffle of the store side, no candidate quadratics).
  * A superlinear curve here would mean a hidden history×shard join —
  * the probe exists to catch exactly that.
  *
  * The increment's correctness at each scale is re-checked: the fresh
  * shard's newly found pairs must be exactly its 1× pairs replicated
  * ×(c+1) against copies (closed form under offset-id replication:
  * every stored copy of a near-dup partner pairs with the shard doc).
  *
  * Usage: sbt "runMain graft.PipeScale [c1 c2 ...]" (default 1 4 8).
  */
object PipeScale {
  def main(args: Array[String]): Unit = {
    val points = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 4, 8)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val cfg = IncrementalCuration.Config()
    val all = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text")
    // the fixed daily shard: doc_id ≡ 3 (mod 8) — arrives LAST, after
    // the history; its docs are genuinely fresh at every history size
    val shard = all.filter(pmod(col("doc_id"), lit(8L)) === 3L)
    val history = all.filter(pmod(col("doc_id"), lit(8L)) =!= 3L)
    val off = 10000000L

    points.foreach { c =>
      val base = s"pipescale_c$c"
      def dropAll(): Unit = Seq(s"${base}_fp", s"${base}_sh",
        s"${base}_sizes", s"${base}_pairs", s"${base}_components",
        s"${base}_docstats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      dropAll()
      val cd = java.nio.file.Files
        .createTempDirectory(s"pipescale-c$c").toString
      val qd = java.nio.file.Files
        .createTempDirectory(s"pipescale-q$c").toString
      IncrementalCuration.init(spark, base, cfg)
      // replicated history through the REAL ingest path (one batch per
      // replica so the stores carry realistic multi-append layouts).
      // Replicas must be DISSIMILAR or the near-dup gate quarantines
      // them (a suffix-perturbed first attempt measured exactly that:
      // every replica rejected at ratio ≈ 1, stores stuck at 1×) — so
      // replica r rotates the alphabet by r (translate), which rewrites
      // every winnow gram and every word shingle while preserving token
      // structure: each replica ADMITS and the stores genuinely grow ×c.
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val t0 = System.nanoTime()
      (0 until c).foreach { r =>
        val rot = alpha.drop(r % 26) + alpha.take(r % 26)
        val replica = history
          .withColumn("doc_id", col("doc_id") + lit(r * off))
          .withColumn("text", translate(col("text"), alpha, rot))
        IncrementalCuration.runIncrement(spark, replica, r.toLong,
          base, cd, qd, cfg)
      }
      val tLoad = (System.nanoTime() - t0) / 1e9
      val histDocs = spark.read.parquet(cd).count()
      val histSh = spark.table(s"${base}_sh").count()
      println(f"PIPESCALE history c=$c%-3d docs=$histDocs sh=$histSh " +
        f"load=$tLoad%7.2f s")
      // the measured quantity: ONE fresh increment against c× history
      val t1 = System.nanoTime()
      val (adm, quar) = IncrementalCuration.runIncrement(spark, shard,
        c.toLong, base, cd, qd, cfg)
      val dt = (System.nanoTime() - t1) / 1e9
      println(f"PIPESCALE increment c=$c%-3d $dt%7.2f s adm=$adm " +
        f"quar=$quar")
      // correctness at scale: stored pairs ≡ recompute over admitted
      val admitted = spark.read.parquet(cd)
        .select("doc_id", "source", "text")
      val full = TextOps.ngramJaccardPairs(admitted, cfg.n, cfg.maxDf,
        cfg.jacMicroMin)
      val stored = PairStore.pairs(spark, base)
      val diff = stored.unionByName(full)
        .except(stored.intersect(full)).count()
      println(s"PIPESCALE check c=$c stored=${stored.count()} " +
        s"recompute=${full.count()} diff=$diff " +
        (if (diff == 0) "IDENTITY-OK" else "MISMATCH"))
      dropAll()
    }
    spark.stop()
  }
}
