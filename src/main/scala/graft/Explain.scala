package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for queries (args, or a
  * representative set) at sf0.001 — the plan-shape review loop
  * (pushdown, pruning, broadcast, codegen spans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_flights", "q_dedup_minhash", "q_curate",
        "q_revenue_nation", "q_embed_lsh", "q_asof")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
