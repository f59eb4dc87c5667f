package graft

/** Dev probe (VERDICT r15 item 1's cost row): drive the composed
  * incremental curation pipeline over out-of-order daily shards,
  * compare every store against the from-scratch recompute, and print
  * one `PIPESCALE` line per increment plus the recompute wall — the
  * numbers BASELINE.md quotes for "what does one daily increment cost
  * vs recomputing the corpus".
  *
  * Usage: sbt "runMain graft.DevPipe [sfDir]" (default sf0.01).
  */
object DevPipe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.streaming.IncrementalCuration
    import graft.sources.PairStore
    val base = "devpipe"
    def dropAll(): Unit = Seq(s"${base}_fp", s"${base}_sh",
      s"${base}_sizes", s"${base}_pairs", s"${base}_components",
      s"${base}_docstats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    dropAll()
    val cfg = IncrementalCuration.Config()
    val cd = java.nio.file.Files.createTempDirectory("devpipe-c").toString
    val qd = java.nio.file.Files.createTempDirectory("devpipe-q").toString
    IncrementalCuration.init(spark, base, cfg)
    val all = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text")
    def shard(i: Int) = all.filter(pmod(col("doc_id"), lit(4L)) === i.toLong)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    Seq(2, 0, 3, 1).zipWithIndex.foreach { case (s, bid) =>
      val ((adm, quar), dt) = timed(IncrementalCuration.runIncrement(
        spark, shard(s), bid.toLong, base, cd, qd, cfg))
      println(f"PIPESCALE increment bid=$bid shard=$s $dt%7.2f s " +
        f"adm=$adm quar=$quar pairs=${PairStore.pairs(spark, base).count()}")
    }
    val (wf, tWf) = timed(IncrementalCuration
      .waterfall(spark, base, cfg).collect())
    println(f"PIPESCALE serve_waterfall $tWf%7.2f s rows=${wf.length}")
    val admitted = spark.read.parquet(cd).select("doc_id", "source", "text")
    val (full, tRe) = timed {
      val p = graft.operators.TextOps.ngramJaccardPairs(admitted,
        cfg.n, cfg.maxDf, cfg.jacMicroMin).cache()
      p.count(); p
    }
    println(f"PIPESCALE recompute_pairs $tRe%7.2f s rows=${full.count()}")
    val stored = PairStore.pairs(spark, base)
    val diff = stored.unionByName(full)
      .except(stored.intersect(full)).count()
    println(s"PIPESCALE check admitted=${admitted.count()} " +
      s"quar=${spark.read.parquet(qd).count()} stored=${stored.count()} " +
      s"recompute=${full.count()} diff=$diff " +
      (if (diff == 0) "IDENTITY-OK" else "MISMATCH"))
    println(s"PIPESCALE comps stored=${PairStore.components(spark, base).count()} " +
      s"recomputed=${graft.operators.TextOps.connectedComponents(full).count()}")
    dropAll()
    spark.stop()
  }
}
