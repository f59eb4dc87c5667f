package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    import graft.operators.{RelationalQueries, TextOps}
    val ev = graft.sources.Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "ts", "value")
    def shape(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val h = "Exchange hashpartitioning".r.findAllIn(p).length
      val s = "Exchange SinglePartition".r.findAllIn(p).length
      val r = "rangepartitioning".r.findAllIn(p).length
      println(s"SHAPE $name hash=$h single=$s range=$r")
    }
    shape("spearman", RelationalQueries.spearmanCensus(ev))
    shape("fano", RelationalQueries.fanoCensus(ev))
    shape("hill", RelationalQueries.hillCensus(ev, 64L))
    shape("yulek", TextOps.yuleK(graft.sources.Tables.documents(spark, dir)))
    shape("splice", TextOps.spliceCoherence(graft.sources.Tables.documents(spark, dir)))
    spark.stop()
  }
}
