package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: time plan variants of a hot query against
  * SPARK_GRAFT_SF_DIR under the bench session config (local[32],
  * shuffle.partitions=32, noop sink, clean() between passes) — the
  * apples-to-apples harness for adjudicating a single plan change
  * before it ships. Not part of any driver contract.
  */
object DevProbe {
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
          println(f"STAGE ${si.stageId}%4d ${dur.getOrElse(-1L)}%6d ms " +
            f"tasks=${si.numTasks}%3d cpu=${si.taskMetrics.executorCpuTime / 1000000}%6d ms")
        }
      })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def time(name: String, passes: Int = 3)(mk: => DataFrame): Unit = {
      (1 to passes).foreach { p =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"PROBE $name%-28s pass$p ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        clean()
      }
    }
    // warm the JVM / codegen on the real query once
    val names = if (args.nonEmpty) args.toSeq else Seq("q_eval_gate")
    names.foreach { n =>
      // NonFatal only, and loudly: a silently-swallowed warmup failure
      // would let the probe report timings for a broken query's
      // retry path and mislead the adjudication it exists for.
      try SparkEntry.queries(n)(spark, dir).write.format("noop")
        .mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        println(s"PROBE $n WARMUP FAILED: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      clean()
      time(n)(SparkEntry.queries(n)(spark, dir))
    }
    spark.stop()
  }
}
