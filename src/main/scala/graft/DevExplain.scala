package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of named queries
  * against SPARK_GRAFT_SF_DIR (plan-audit feed for PLANS.md).
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    args.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
