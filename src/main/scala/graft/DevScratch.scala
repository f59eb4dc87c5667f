package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main for quick cross-engine parity probes. */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(("kitten", "sitting"), ("", "abc"), ("abc", "abc"),
      ("flaw", "lawn")).toDF("a", "b")
    df.select(levenshtein(col("a"), col("b"))).show()
    spark.stop()
  }
}
