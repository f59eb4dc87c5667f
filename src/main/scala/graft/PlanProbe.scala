package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: count Exchange kinds in the executed plans of the named
  * queries (default: the round-12 wave-5 set) — the quick smell test
  * that caught hillCensus's global-sort window and fanoCensus's double
  * event scan. Reads sf0.001 so eager caches/checkpoints stay cheap.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_spearman", "q_fano", "q_hill", "q_funnel_ci", "q_yule_k",
      "q_kn_score", "q_splice", "q_lid", "q_media_tv", "q_media_trim",
      "q_detector_diff")
    names.foreach { n =>
      val p = SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      val h = "Exchange hashpartitioning".r.findAllIn(p).length
      val s = "Exchange SinglePartition".r.findAllIn(p).length
      val r = "rangepartitioning".r.findAllIn(p).length
      val scans = "Scan parquet".r.findAllIn(p).length
      val mem = "InMemoryTableScan".r.findAllIn(p).length
      println(s"SHAPE $n hash=$h single=$s range=$r scans=$scans mem=$mem")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
