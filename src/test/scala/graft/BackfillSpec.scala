package graft

import java.nio.file.{Files, Path}

import graft.sources.Sbs1
import graft.streaming.Ingest

/** Archive backfill with exactly-once restart: AvailableNow processes
  * what's present and stops; a second run from the same checkpoint
  * picks up only the new files — no reprocessing, no duplicates.
  */
class BackfillSpec extends SparkSpec {

  private def writeArchive(dir: Path, name: String,
                           lines: Seq[String]): Unit =
    Files.writeString(dir.resolve(name), lines.mkString("", "\n", "\n"))

  test("backfill catches up, stops, and restarts exactly-once") {
    val archive = Files.createTempDirectory("sbs1-backfill")
    val sink = Files.createTempDirectory("backfill-sink").toString
    val ckpt = Files.createTempDirectory("backfill-ckpt").toString
    val cfg = Ingest.Config(sinkDir = sink, checkpointDir = ckpt)

    // run 1: one archive file -> 6 valid rows
    writeArchive(archive, "day1.sbs", Sbs1.sampleLines)
    val q1 = Ingest.backfill(spark, archive.toString, cfg)
    q1.awaitTermination(120000)
    assert(!q1.isActive, "AvailableNow must stop after catch-up")
    assert(spark.read.parquet(sink).count() === 6)

    // run 2, same checkpoint: a second file lands; only it is processed
    writeArchive(archive, "day2.sbs", Sbs1.sampleLines)
    val q2 = Ingest.backfill(spark, archive.toString, cfg)
    q2.awaitTermination(120000)
    val rows = spark.read.parquet(sink)
    assert(rows.count() === 12,
      "restart processes only the new file: no reprocessing of day1")
    // PK dedup holds per batch; across batches parsed_time differs
    assert(rows.select("transmission_type", "parsed_time", "hex_ident")
      .distinct().count() === 12)
  }

  test("compaction rewrites a partition into few files, data intact") {
    import sqlImplicits._
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    (1 to 1000).map(i => (i.toLong, "2024-01-01"))
      .toDF("id", "ingest_date")
      .repartition(20)
      .write.partitionBy("ingest_date").mode("overwrite").parquet(root)
    val beforeRows = spark.read.parquet(root)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    val (before, after) = graft.streaming.Maintenance.compactPartition(
      spark, root, "ingest_date=2024-01-01", targetFiles = 2)
    assert(before >= 10, s"expected many small files, got $before")
    assert(after <= 2)
    val afterRows = spark.read.parquet(root)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(afterRows === beforeRows)
  }
}
