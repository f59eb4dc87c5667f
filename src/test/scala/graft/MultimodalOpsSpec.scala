package graft

import graft.operators.MultimodalOps

class MultimodalOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // 80 ASCII chars -> byte_len 80, frames at stride 32/len 16: idx 0,1,2
  private val text = ("abcdefghij" * 8).take(80)
  private val doc = Seq((9L, text, "en", "src2", 80L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mediaMeta: typed metadata, payload sha, frame count") {
    val r = MultimodalOps.mediaMeta(doc).collect().head
    assert(r.getAs[String]("format") === "wav")
    assert(r.getAs[Long]("width") === 16L + (9L & 63L) * 4L)
    assert(r.getAs[Long]("height") === 16L + ((9L >> 3) & 63L) * 4L)
    assert(r.getAs[Long]("resized_width") === r.getAs[Long]("width") / 2)
    assert(r.getAs[Long]("byte_len") === 80L)
    assert(r.getAs[String]("sha") === sha256(text))
    assert(r.getAs[Long]("n_frames") === 3L) // (80-16)/32 + 1
  }

  test("mediaFrames: strided byte slices with per-frame sha") {
    val out = MultimodalOps.mediaFrames(doc).collect()
      .map(r => r.getAs[Long]("frame_idx") -> r.getAs[String]("frame_sha"))
      .toMap
    assert(out.size === 3)
    (0 until 3).foreach { i =>
      assert(out(i.toLong) === sha256(text.substring(i * 32, i * 32 + 16)))
    }
  }

  test("extractFeatures: deterministic stub features, batched") {
    val r = MultimodalOps.mediaFeatures(doc).collect().head
    val bytes = text.getBytes("UTF-8").map(_ & 0xff)
    assert(r.getAs[Long]("n_bytes") === 80L)
    assert(r.getAs[Long]("max_byte") === bytes.max.toLong)
    val mean = math.floor(
      1000000.0 * bytes.map(_.toLong).sum / 80 / 255.0).toLong
    assert(r.getAs[Long]("mean_byte_micro") === mean)
    val ent = math.floor(1000000.0 * bytes.distinct.length / 256.0).toLong
    assert(r.getAs[Long]("byte_entropy_micro") === ent)
  }

  test("mediaDedupCensus: cross-format dup counts once in ALL") {
    // "dup" stored under png (src0), jpeg (src1), and bin (src9) —
    // invisible to every per-format census, visible only to ALL;
    // "solo" is unique. All payloads ASCII: byte_len == char count.
    val docsDf = Seq(
      (1L, "dup text payload", "en", "src0", 16L),
      (2L, "dup text payload", "en", "src1", 16L),
      (3L, "dup text payload", "en", "src9", 16L),
      (4L, "solo", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = MultimodalOps.mediaDedupCensus(docsDf).collect()
      .map(r => r.getAs[String]("format") ->
        ((r.getAs[Long]("n_blobs"), r.getAs[Long]("n_distinct_blobs"),
          r.getAs[Long]("dup_blobs"), r.getAs[Long]("reclaim_bytes"))))
      .toMap
    // per-format: each format sees its copy as distinct, zero dups
    assert(out("png") === ((2L, 2L, 0L, 0L)))
    assert(out("jpeg") === ((1L, 1L, 0L, 0L)))
    assert(out("bin") === ((1L, 1L, 0L, 0L)))
    // ALL re-groups by hash: 4 stored, 2 distinct, 2 dup copies of the
    // 16-byte payload reclaimable
    assert(out("ALL") === ((4L, 2L, 2L, 32L)))
  }
}
