package graft
import org.apache.spark.sql.SparkSession
import graft.operators.{TextOps, TextQueries}
import graft.sources.Tables
object DevTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-20s ${(System.nanoTime()-t0)/1e9}%8.3f s  rows=$n")
    }
    t("warmup")(docs.count())
    val sh = TextOps.shingleSet(docs, 5).cache()
    t("shingleSet")(sh.count())
    val minh = TextOps.minhashSignature(sh).cache()
    t("minhash16")(minh.count())
    t("full_pipeline")(TextOps.minhashLshPairs(docs, 5, 700000L).count())
    t("full_again")(TextOps.minhashLshPairs(docs, 5, 700000L).count())
    spark.stop()
  }
}
