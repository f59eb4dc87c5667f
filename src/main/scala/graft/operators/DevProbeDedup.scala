package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.functions.Hashing.{md5Long, micro}
import graft.sources.Tables

/** Dev probe: dedup-family shared-relation materialization variants
  * (cache vs eager localCheckpoint vs repartitioned checkpoint) under
  * the bench session config. Not part of any driver contract.
  */
object DevProbeDedup {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def time(name: String, passes: Int = 3)(mk: => DataFrame): Unit =
      (1 to passes).foreach { p =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"PROBE $name%-28s pass$p ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        clean()
      }

    def docs = Tables.documents(spark, dir).select("doc_id", "text")
    val n = TextQueries.ShingleN
    val maxDf = TextQueries.MaxShingleDf
    val jacMin = TextQueries.MinhashJacMin

    def shRaw = TextOps.shingleSet(docs, n)
      .select(col("doc_id"), md5Long(col("sh")).as("h0"))

    // the lshRecallAudit body over a supplied sh relation
    def audit(sh: DataFrame): DataFrame = {
      def pairStats(s: DataFrame): DataFrame = {
        val keep = s.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("h")
        val shf = s.join(keep, "h")
        val sizes = s.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = shf.select(col("doc_id").as("d1"), col("h"))
          .join(shf.select(col("doc_id").as("d2"), col("h")), "h")
          .filter(col("d1") < col("d2"))
          .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
          .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      }
      val truth = pairStats(sh.select(col("doc_id"), col("h0").as("h")))
        .withColumn("jac_micro",
          micro(col("inter") / (col("n1") + col("n2") - col("inter"))))
        .filter(col("jac_micro") >= jacMin)
        .select("d1", "d2")
      val lsh = TextOps.minhashScoredFrom(sh, 4, 4, Hashing.MinhashSeeds)
        .filter(col("jac_micro") >= jacMin)
        .select("d1", "d2")
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      val nL = lsh.agg(count(lit(1)).as("n_lsh"))
      val nH = truth.join(lsh, Seq("d1", "d2"))
        .agg(count(lit(1)).as("n_hit"))
      nT.crossJoin(broadcast(nL)).crossJoin(broadcast(nH))
        .select(col("n_truth"), col("n_lsh"), col("n_hit"),
          expr("(1000000 * n_hit) div greatest(n_truth, 1)")
            .as("recall_ppm"),
          expr("(1000000 * (n_lsh - n_hit)) div greatest(n_lsh, 1)")
            .as("extra_ppm"))
    }

    // warm
    graft.SparkEntry.queries("q_lsh_recall")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    clean()
    time("asis")(graft.SparkEntry.queries("q_lsh_recall")(spark, dir))
    time("cache")(audit(shRaw.cache()))
    time("lckpt")(audit(shRaw.localCheckpoint(true)))
    time("repart_lckpt")(audit(
      shRaw.repartition(spark.sparkContext.defaultParallelism, col("h0"))
        .localCheckpoint(true)))
    spark.stop()
  }
}
