package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextOps
import graft.streaming.StreamingSample

/** T21 streaming weighted reservoir: store ≡ batch weighted sample
  * bit-for-bit after N micro-batches (top-n union is an exact
  * semilattice), replay fixed point on the rewritten partition,
  * empty-store guard.
  */
class StreamingSampleSpec extends SparkSpec {
  import sqlImplicits._

  val N = 5

  // (doc_id, text, source): token counts vary so inclusion is genuinely
  // weight-biased; 8 docs per batch x 3 batches >> n = 5 so the
  // reservoir evicts across batches
  private def batchRows(b: Int): Seq[(Long, String, String)] =
    (0 until 8).map { i =>
      val id = (b * 20 + i).toLong
      val words = (0 to (i * 3 + b) % 11).map(j => s"w$j")
      (id, words.mkString(" "), s"src${i % 3}")
    }

  private def sampleRows(dir: String) =
    StreamingSample.sample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("sample() on a nonexistent store returns an empty typed frame " +
    "instead of throwing") {
    val missing = Files.createTempDirectory("graft-aes-missing")
      .resolve("never-written").toString
    val df = StreamingSample.sample(spark, missing)
    assert(df.columns.toSeq ===
      Seq("rank", "doc_id", "source", "toks", "key_micro"))
    assert(df.count() === 0L)
  }

  test("after N micro-batches the reservoir equals the batch weighted " +
    "sample over the concatenated stream BIT-FOR-BIT, rank included") {
    val dir = Files.createTempDirectory("graft-aes-store").toString
    val batches = (0 until 3).map(batchRows)
    batches.zipWithIndex.foreach { case (rows, b) =>
      StreamingSample.processBatch(spark,
        rows.toDF("doc_id", "text", "source"), dir, b.toLong, N)
    }
    val all = batches.flatten.toDF("doc_id", "text", "source")
    val batchSample = TextOps.weightedSample(all, N).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(sampleRows(dir) === batchSample)
    assert(batchSample.size === N)
    // the reservoir genuinely evicted: not all survivors are from the
    // last batch
    assert(batchSample.exists(_._2 < 40L))
  }

  test("streamed via foreachBatch: same identity; replayed batch " +
    "rewrites an identical partition (fixed point)") {
    val dir = Files.createTempDirectory("graft-aes-st").toString
    val ckpt = Files.createTempDirectory("graft-aes-ck").toString
    val ms = MemoryStream[(Long, String, String)](spark)
    val q = StreamingSample.start(spark,
      ms.toDF().toDF("doc_id", "text", "source"), dir, ckpt, N)
    try {
      (0 until 3).foreach { b =>
        ms.addData(batchRows(b): _*); q.processAllAvailable()
      }
    } finally q.stop()
    val once = sampleRows(dir)
    def batch1Rows() = spark.read.parquet(s"$dir/batch_id=1")
      .collect().map(r => (r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("toks"), r.getAs[Long]("key_micro")))
      .sorted.toSeq
    val b1Once = batch1Rows()
    StreamingSample.processBatch(spark,
      batchRows(1).toDF("doc_id", "text", "source"), dir, 1L, N)
    assert(batch1Rows() === b1Once)
    assert(sampleRows(dir) === once)
  }
}
