package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{TextOps, TextQueries}
import graft.sources.Tables

/** Dev probe: q_eval_gate plan variants (bench session config). */
object DevProbeEvalGate {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          val dur = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          val rdds = si.rddInfos.map(r => r.name).mkString("|").take(200)
          println(f"STAGE ${si.stageId}%4d ${dur.getOrElse(-1L)}%6d ms " +
            f"tasks=${si.numTasks}%3d cpu=${si.taskMetrics.executorCpuTime / 1000000}%6d ms rdds=$rdds")
        }
      })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def docs = Tables.documents(spark, dir).select("doc_id", "text")
    def fsRel = TextOps.winnowedSplit(docs, TextQueries.WinnowK,
      TextQueries.WinnowW, TextQueries.TrainPct, TextQueries.ValPct)

    def evalGateVariant(fs: DataFrame, bcast: Boolean): DataFrame = {
      val ev = fs.filter(col("split") === "test")
        .select(col("doc_id").as("eval_doc"), col("fingerprint"))
      val inc = fs.filter(col("split") === "train")
        .select(col("doc_id").as("new_doc"), col("fingerprint"))
      val keep = ev.groupBy("fingerprint")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= TextQueries.ContamMaxDf).select("fingerprint")
      val evk0 = ev.join(keep, "fingerprint")
      val evk = if (bcast) broadcast(evk0) else evk0
      val nf0 = evk.groupBy("eval_doc").agg(count(lit(1)).as("n_fp"))
      val nf = if (bcast) broadcast(nf0) else nf0
      val ov = inc.join(evk, "fingerprint")
        .groupBy("new_doc", "eval_doc")
        .agg(count(lit(1)).as("shared_fps"))
      ov.join(nf, "eval_doc")
        .withColumn("ratio_micro",
          graft.functions.Hashing.micro(col("shared_fps") / col("n_fp")))
        .filter(col("ratio_micro") >= TextQueries.ContamRatioMin)
        .select("new_doc", "eval_doc", "shared_fps", "ratio_micro")
        .orderBy("new_doc", "eval_doc")
    }

    def time(name: String, passes: Int = 3)(mk: => DataFrame): Unit =
      (1 to passes).foreach { p =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"PROBE $name%-28s pass$p ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        clean()
      }

    // enriched broadcast side: n_fp attached to evk before the big join,
    // so the post-aggregation join disappears entirely
    def evalGateEnriched(fs: DataFrame, sort: Boolean): DataFrame = {
      val ev = fs.filter(col("split") === "test")
        .select(col("doc_id").as("eval_doc"), col("fingerprint"))
      val inc = fs.filter(col("split") === "train")
        .select(col("doc_id").as("new_doc"), col("fingerprint"))
      val keep = ev.groupBy("fingerprint")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= TextQueries.ContamMaxDf).select("fingerprint")
      val evk = ev.join(keep, "fingerprint")
      val nf = evk.groupBy("eval_doc").agg(count(lit(1)).as("n_fp"))
      val evkN = broadcast(evk.join(nf, "eval_doc"))
      val ov = inc.join(evkN, "fingerprint")
        .groupBy("new_doc", "eval_doc")
        .agg(count(lit(1)).as("shared_fps"), first(col("n_fp")).as("n_fp"))
        .withColumn("ratio_micro",
          graft.functions.Hashing.micro(col("shared_fps") / col("n_fp")))
        .filter(col("ratio_micro") >= TextQueries.ContamRatioMin)
        .select("new_doc", "eval_doc", "shared_fps", "ratio_micro")
      if (sort) ov.orderBy("new_doc", "eval_doc") else ov
    }

    // warm
    SparkEntry.queries("q_eval_gate")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    clean()
    time("asis")(SparkEntry.queries("q_eval_gate")(spark, dir))
    time("nocache_bcast")(evalGateVariant(fsRel, bcast = true))
    time("enriched_sort")(evalGateEnriched(fsRel, sort = true))
    time("enriched_nosort")(evalGateEnriched(fsRel, sort = false))
    spark.stop()
  }
}
