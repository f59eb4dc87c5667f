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

  test("decodeBmp: encode->decode roundtrip recovers closed-form stats") {
    val id = 6L // w = 4+6%5 = 5 -> rowBytes 15, stride 16: padding real
    val d = MultimodalOps.decodeBmp(id, MultimodalOps.encodeBmp(id))
    val w = 4 + id % 5; val h = 2 + id % 3
    val vals = (0L until 3 * w * h).map(k => (id * 7 + k * 13) % 256)
    assert(d.width === Some(w))
    assert(d.height === Some(h))
    assert(d.sample_rate === None)
    assert(d.n_units === vals.length.toLong)
    assert(d.sum_units === vals.sum)
    assert(d.min_unit === vals.min)
    assert(d.max_unit === vals.max)
  }

  test("decodeBmp: honors header fields it did not generate") {
    // hand-built 2x2 top-down BMP (negative height) with a non-54 data
    // offset — fields the generator never emits, so a decoder that
    // assumed the generator's layout would fail here
    val w = 2; val h = 2; val stride = 8; val off = 70
    val buf = java.nio.ByteBuffer.allocate(off + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(off + stride * h)
      .putInt(0).putInt(off).putInt(40).putInt(w).putInt(-h)
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    (54 until off).foreach(_ => buf.put(0xEE.toByte)) // gap bytes
    val px = Array(10, 20, 30, 40, 50, 60).map(_.toByte)
    (0 until h).foreach { r =>
      px.foreach(buf.put); buf.put(0.toByte).put(0.toByte)
    }
    val d = MultimodalOps.decodeBmp(99L, buf.array())
    assert(d.width === Some(2L) && d.height === Some(2L))
    assert(d.n_units === 12L)
    assert(d.sum_units === 2L * px.map(_.toLong).sum)
    assert(d.min_unit === 10L && d.max_unit === 60L)
  }

  test("decodeWav: chunk walk skips LIST, parses fmt + data") {
    val samples = Array[Short](-300, 5, 1200, -4, 0)
    val listLen = 6
    val buf = java.nio.ByteBuffer
      .allocate(12 + 24 + (8 + listLen) + 8 + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(buf.capacity() - 8).put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(44100).putInt(88200)
      .putShort(2).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(listLen)
      .put("INFOab".getBytes("US-ASCII"))
      .put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
    samples.foreach(buf.putShort)
    val d = MultimodalOps.decodeWav(7L, buf.array())
    assert(d.sample_rate === Some(44100L))
    assert(d.n_units === samples.length.toLong)
    assert(d.sum_units === samples.map(_.toLong).sum)
    assert(d.min_unit === -300L && d.max_unit === 1200L)
  }

  test("mediaFeatures: end-to-end BMP/WAV decode over the corpus") {
    val docsDf = Seq(
      (2L, "x", "en", "src0", 1L), (3L, "y", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = MultimodalOps.mediaFeatures(docsDf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(2L).getAs[String]("kind") === "bmp")
    // id 2: w=6, h=1+... w=4+2%5=6, h=2+2%3=4 -> 72 pixel bytes
    assert(out(2L).getAs[Long]("n_units") === 3L * 6 * 4)
    val wavVals = (0L until (64 + 3 % 64)).map(i =>
      ((3 * 31 + i * 17) % 4096) - 2048)
    assert(out(3L).getAs[String]("kind") === "wav")
    assert(out(3L).getAs[Long]("sample_rate") === 8000L)
    assert(out(3L).getAs[Long]("n_units") === wavVals.length.toLong)
    assert(out(3L).getAs[Long]("sum_units") === wavVals.sum)
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
