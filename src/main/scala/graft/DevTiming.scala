package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries (args; default = the heavy dedup
  * set) against SPARK_GRAFT_SF_DIR, two passes each (cold + warm).
  */
object DevTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_minhash", "q_dedup_ngram", "q_dedup_simhash")
    SparkEntry.entry(spark).count() // warm the JVM
    names.foreach { n =>
      // Bench protocol: noop sink (full evaluation — count() lets
      // Catalyst prune the measured work), cache cleared per pass
      (1 to 3).foreach { pass =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop")
          .mode("overwrite").save()
        println(f"TIME $n%-20s pass$pass ${(System.nanoTime()-t0)/1e9}%8.3f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
