package graft

/** Dev scratch: drive the incremental pipeline over out-of-order
  * shards and compare every store against the from-scratch recompute.
  */
object DevPipe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.streaming.IncrementalCuration
    import graft.sources.{PairStore, ShingleStore}
    val base = "devpipe"
    def dropAll(): Unit = Seq(s"${base}_fp", s"${base}_sh",
      s"${base}_sizes", s"${base}_pairs", s"${base}_components")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    dropAll()
    val cfg = IncrementalCuration.Config()
    val cd = java.nio.file.Files.createTempDirectory("devpipe-c").toString
    val qd = java.nio.file.Files.createTempDirectory("devpipe-q").toString
    IncrementalCuration.init(spark, base, cfg)
    val all = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
    def shard(i: Int) = all.filter(pmod(col("doc_id"), lit(4L)) === i.toLong)
    Seq(2, 0, 3, 1).zipWithIndex.foreach { case (s, bid) =>
      val r = IncrementalCuration.runIncrement(spark, shard(s), bid.toLong,
        base, cd, qd, cfg)
      println(s"[dbg] bid=$bid shard=$s adm/quar=$r " +
        s"pairs=${PairStore.pairs(spark, base).count()}")
    }
    val admitted = spark.read.parquet(cd).select("doc_id", "source", "text")
    val full = graft.operators.TextOps.ngramJaccardPairs(admitted,
      cfg.n, cfg.maxDf, cfg.jacMicroMin)
    val stored = PairStore.pairs(spark, base)
    println(s"[dbg] admitted=${admitted.count()} quar=${spark.read.parquet(qd).count()} " +
      s"recompute=${full.count()} stored=${stored.count()} " +
      s"diff=${stored.unionByName(full).except(stored.intersect(full)).count()}")
    println(s"[dbg] storedComps=${PairStore.components(spark, base).count()} " +
      s"recompComps=${graft.operators.TextOps.connectedComponents(full).count()}")
    println(s"[dbg] shingles=${ShingleStore.shingles(spark, base).count()}")
    dropAll()
    spark.stop()
  }
}
