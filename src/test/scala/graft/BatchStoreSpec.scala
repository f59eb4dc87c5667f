package graft

import java.nio.file.Files

import graft.streaming.{BatchStore, StreamingMsprt}

/** The shared latest-batch load path (ADVICE r14): the serving reads
  * used to NPE on a store whose batch_id= partition EXISTS but holds
  * zero rows (an empty first micro-batch writes a real partition
  * directory with a zero-row parquet file). BatchStore must treat
  * that store as empty, not throw.
  */
class BatchStoreSpec extends SparkSpec {
  import sqlImplicits._

  test("latest(): no directory → None; empty partition → None; " +
    "rows → Some with maxExclusive honored") {
    val missing = Files.createTempDirectory("graft-bs").toString + "/nope"
    assert(BatchStore.latest(spark, missing, Seq("a")).isEmpty)

    // a REAL batch_id=0 partition holding zero rows — the NPE trigger
    val dir = Files.createTempDirectory("graft-bs-empty").toString
    Seq.empty[(String, Long)].toDF("a", "b")
      .write.parquet(s"$dir/batch_id=0")
    assert(BatchStore.latest(spark, dir, Seq("a", "b")).isEmpty)

    // the "latest" batch id is computed over ROWS, so when the newest
    // partition is empty the read serves the newest NON-EMPTY batch —
    // pinned here as the load-path contract (an empty merge result
    // means the predecessor state still stands)
    Seq(("x", 1L)).toDF("a", "b").write.parquet(s"$dir/batch_id=1")
    Seq.empty[(String, Long)].toDF("a", "b")
      .write.parquet(s"$dir/batch_id=2")
    val got = BatchStore.latest(spark, dir, Seq("a", "b"))
      .get.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("x", 1L)))
    // maxExclusive bounds the visible batches (the replay read)
    assert(BatchStore.latest(spark, dir, Seq("a", "b"), Some(1L)).isEmpty)
    assert(BatchStore.latest(spark, dir, Seq("a", "b"), Some(2L))
      .get.count() === 1L)
  }

  test("pruneBefore: trims replay history, leaves serving and the " +
    "replay-of-the-retained-window intact") {
    val dir = Files.createTempDirectory("graft-bs-prune").toString
    (0 to 3).foreach { b =>
      Seq(("s", b.toLong)).toDF("a", "b")
        .write.parquet(s"$dir/batch_id=$b")
    }
    val before = BatchStore.latest(spark, dir, Seq("a", "b"))
      .get.collect().map(_.toSeq).toSeq
    // keep the newest + its predecessor (the replay fixed point bound)
    assert(BatchStore.pruneBefore(spark, dir, 2L) === 2)
    assert(BatchStore.latest(spark, dir, Seq("a", "b"))
      .get.collect().map(_.toSeq).toSeq === before)
    // a replay of batch 3 still finds its predecessor (batch 2)
    assert(BatchStore.latest(spark, dir, Seq("a", "b"), Some(3L))
      .get.collect().head.getLong(1) === 2L)
    assert(new java.io.File(s"$dir/batch_id=0").exists === false)
    assert(new java.io.File(s"$dir/batch_id=2").exists === true)
    // idempotent
    assert(BatchStore.pruneBefore(spark, dir, 2L) === 0)
  }

  test("serving reads survive the empty-first-batch store (the r14 " +
    "ADVICE NPE)") {
    val dir = Files.createTempDirectory("graft-bs-msprt").toString
    // simulate an empty first micro-batch: StreamingMsprt.processBatch
    // with zero rows writes a real (empty) batch_id=0 partition
    val empty = Seq.empty[(Long, Long, String, String, Double)]
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts",
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.col("ts_s"))).drop("ts_s")
    StreamingMsprt.processBatch(spark, empty, dir, 0L)
    assert(new java.io.File(s"$dir/batch_id=0").exists,
      "fixture must create the empty partition")
    // pre-fix these threw NullPointerException via head().getLong(0)
    assert(StreamingMsprt.dailyCensus(spark, dir).count() === 0L)
    assert(StreamingMsprt.msprt(spark, dir).count() === 0L)
  }
}
