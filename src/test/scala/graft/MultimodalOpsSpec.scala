package graft

import graft.operators.{MediaBlob, MultimodalOps}

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

  test("mediaHistogram: hand-computed 8-bin pixel histogram off real " +
    "decoded BMP bytes; WAVs excluded") {
    val docsDf = Seq(
      (0L, "x", "en", "src0", 1L), (1L, "y", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // doc 0: w=4, h=2 -> 24 pixel bytes valued (13k) % 256; bins of
    // value div 32 count 6,3,3,2,3,2,3,2; dominant 6/24 = 250000 ppm
    val out = MultimodalOps.mediaHistogram(docsDf).collect()
    assert(out.length === 1) // the WAV doc never reaches the decoder
    val r = out.head
    assert((r.getAs[Long]("doc_id"), r.getAs[Long]("width"),
      r.getAs[Long]("height"), r.getAs[Long]("n_pixels")) ===
      (0L, 4L, 2L, 24L))
    assert((0 until 8).map(i => r.getAs[Long](s"b$i")) ===
      Seq(6L, 3L, 3L, 2L, 3L, 2L, 3L, 2L))
    assert(r.getAs[Long]("dom_ppm") === 250000L)
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

  test("wavEnergyWindows: frame features match the closed form, " +
    "partial tail window kept") {
    val id = 3L // odd -> wav; n = 64 + 3 = 67 samples -> 4 full + 3-tail
    val docsDf = Seq((id, "y", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = MultimodalOps.wavEnergyWindows(
        MultimodalOps.mediaBinary(docsDf))
      .orderBy("window_idx").collect()
    val samples = (0L until 67L).map(i => ((id * 31 + i * 17) % 4096) - 2048)
    val expect = samples.grouped(16).zipWithIndex.map { case (w, wi) =>
      (wi.toLong, w.length.toLong, w.sum, w.map(math.abs).sum,
        w.map(v => v * v).sum, w.map(math.abs).max)
    }.toSeq
    assert(out.length === 5)
    assert(out.map(f => (f.window_idx, f.n_samples, f.sum_amp,
      f.sum_abs, f.sum_sq, f.max_abs)).toSeq === expect)
    assert(out.last.n_samples === 3L)
  }

  test("bmpResizeStats: box filter over image rows matches replica, " +
    "odd height clamps") {
    val id = 4L // even -> bmp; w = 8, h = 3 (odd: leftover image row)
    val docsDf = Seq((id, "x", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = MultimodalOps.bmpResizeStats(
      MultimodalOps.mediaBinary(docsDf)).collect().head
    val w = 8; val h = 3
    def px(ir: Int, c: Int, ch: Int): Long =
      (id * 7 + ((h - 1 - ir) * 3 * w + c * 3 + ch) * 13) % 256
    val pooled = for {
      r2 <- 0 until (h + 1) / 2; c2 <- 0 until (w + 1) / 2
      ch <- 0 until 3
    } yield {
      val cells = for {
        dr <- 0 until 2 if 2 * r2 + dr < h
        dc <- 0 until 2 if 2 * c2 + dc < w
      } yield px(2 * r2 + dr, 2 * c2 + dc, ch)
      cells.sum / cells.length
    }
    assert(r.src_w === 8L && r.src_h === 3L)
    assert(r.out_w === 4L && r.out_h === 2L)
    assert(r.n_px === pooled.length.toLong)
    assert(r.sum_px === pooled.sum)
    assert(r.min_px === pooled.min)
    assert(r.max_px === pooled.max)
  }

  test("bmpResizeStats: top-down and bottom-up encodings of the same " +
    "image resize identically") {
    // 2x3 image, arbitrary distinct pixel bytes; odd height makes the
    // pooling orientation-sensitive, so agreement proves the decoder
    // flips bottom-up storage to image order before pooling
    val w = 2; val h = 3
    val img = Array.tabulate(h, 3 * w)((r, k) => (r * 40 + k * 3 + 5))
    def build(topDown: Boolean): Array[Byte] = {
      val stride = (3 * w + 3) & ~3
      val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
        .putInt(0).putInt(54).putInt(40).putInt(w)
        .putInt(if (topDown) -h else h)
        .putShort(1).putShort(24).putInt(0).putInt(stride * h)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      val fileRows = if (topDown) 0 until h else (h - 1) to 0 by -1
      fileRows.foreach { r =>
        img(r).foreach(v => buf.put(v.toByte))
        (3 * w until stride).foreach(_ => buf.put(0.toByte))
      }
      buf.array()
    }
    val blobs = Seq(
      MediaBlob(1L, "bmp", build(topDown = false)),
      MediaBlob(2L, "bmp", build(topDown = true)))
      .toDS()
    val out = MultimodalOps.bmpResizeStats(blobs).collect()
      .map(r => (r.sum_px, r.min_px, r.max_px, r.n_px))
    assert(out.length === 2)
    assert(out(0) === out(1))
  }

  test("imageDHash: decoded gradient bits match the closed form") {
    import sqlImplicits._
    // closed-form replica of the fixture recurrence (the oracle's math)
    def expected(id: Long): Long = {
      val w = (4 + id % 5).toInt; val h = (2 + id % 3).toInt
      def gray(r: Int, c: Int): Int = (0 until 3).map { ch =>
        ((id * 7 + ((h - 1 - r) * 3 * w + c * 3 + ch) * 13) % 256).toInt
      }.sum / 3
      (for (r <- 0 until h; c <- 0 until w - 1
            if gray(r, c + 1) > gray(r, c))
        yield 1L << (r * (w - 1) + c)).sum
    }
    val ids = Seq(0L, 2L, 4L, 6L, 8L, 100L, 3838L)
    val blobs = ids.map(id =>
      MediaBlob(id, "bmp", MultimodalOps.encodeBmp(id))).toDS()
    val got = MultimodalOps.imageDHash(blobs).collect()
      .map(ih => ih.doc_id -> ih.dhash).toMap
    ids.foreach(id => assert(got(id) === expected(id), s"id $id"))
  }

  test("mediaTotalVariation: directional TV sums match the closed " +
    "form, pair counts exact, per-pair mean one floor division") {
    import sqlImplicits._
    // closed-form replica in FILE row order — TV's adjacency set is
    // flip-invariant, so no orientation term (unlike dhash's h-1-r)
    def expected(id: Long): (Long, Long, Long, Long) = {
      val w = (4 + id % 5).toInt; val h = (2 + id % 3).toInt
      def gray(r: Int, c: Int): Int = (0 until 3).map { ch =>
        ((id * 7 + (r * 3 * w + c * 3 + ch) * 13) % 256).toInt
      }.sum / 3
      val tvH = (for (r <- 0 until h; c <- 0 until w - 1)
        yield math.abs(gray(r, c + 1) - gray(r, c)).toLong).sum
      val tvV = (for (r <- 0 until h - 1; c <- 0 until w)
        yield math.abs(gray(r + 1, c) - gray(r, c)).toLong).sum
      (h.toLong * (w - 1), (h - 1).toLong * w, tvH, tvV)
    }
    val docs = (0L until 20L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = MultimodalOps.mediaTotalVariation(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_h"), r.getAs[Long]("n_v"),
          r.getAs[Long]("tv_h"), r.getAs[Long]("tv_v"),
          r.getAs[Long]("tv_pair_micro"))).toMap
    assert(out.size === 10) // even doc_ids only
    out.foreach { case (id, (nH, nV, tvH, tvV, ppm)) =>
      val (eH, eV, etH, etV) = expected(id)
      assert((nH, nV, tvH, tvV) === (eH, eV, etH, etV), s"id $id")
      assert(ppm === 1000000L * (etH + etV) / (eH + eV), s"ppm id $id")
    }
  }

  test("phashCensus: self/near rows equal brute-force Hamming pairing") {
    import sqlImplicits._
    val docs = (0L until 120L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = MultimodalOps.phashCensus(docs, 3)
      .orderBy("h1", "h2").collect()
      .map(r => (r.getAs[Long]("h1"), r.getAs[Long]("h2"),
        r.getAs[Long]("hamming"), r.getAs[Long]("n_pairs")))
    // brute force over the decoded hashes
    val hs = MultimodalOps.imageDHash(
      MultimodalOps.mediaBinary(docs)).collect().map(_.dhash)
    val byHash = hs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val keys = byHash.keys.toSeq.sorted
    val selfRows = keys.filter(byHash(_) >= 2).map(k =>
      (k, k, 0L, byHash(k) * (byHash(k) - 1) / 2))
    val nearRows = for {
      i <- keys.indices; j <- (i + 1) until keys.length
      ham = java.lang.Long.bitCount(keys(i) ^ keys(j)).toLong
      if ham <= 3
    } yield (keys(i), keys(j), ham, byHash(keys(i)) * byHash(keys(j)))
    assert(out.toSeq === (selfRows ++ nearRows).sortBy(t => (t._1, t._2)))
  }

  test("wavClipRuns: maximal runs counted exactly — boundary " +
    "inclusive, solid clip reads one full-length run, clean audio " +
    "reads zero") {
    import sqlImplicits._
    def wav(samples: Array[Short]): Array[Byte] = {
      val buf = java.nio.ByteBuffer
        .allocate(44 + 2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
        .putInt(buf.capacity() - 8).put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
      samples.foreach(buf.putShort)
      buf.array()
    }
    // doc 1: runs {0,1} len 2 (|-1900| at the INCLUSIVE bar), {3} len
    //   1, {5} len 1 -> n_clip 4, n_runs 3, max_run 2
    // doc 2: solid clip -> one run of 4
    // doc 3: all under the bar -> zeros
    val blobs = Seq(
      MediaBlob(1L, "wav",
        wav(Array[Short](1900, -1900, 0, 1950, 5, 1900))),
      MediaBlob(2L, "wav",
        wav(Array[Short](2000, -2000, 2000, -2000))),
      MediaBlob(3L, "wav", wav(Array[Short](1899, -1899, 0)))).toDS()
    val out = MultimodalOps.wavClipRuns(blobs, 1900L)
      .collect().sortBy(_.doc_id)
      .map(r => (r.doc_id, r.n_samples, r.n_clip, r.n_runs, r.max_run))
    assert(out.toSeq === Seq(
      (1L, 6L, 4L, 3L, 2L),
      (2L, 4L, 4L, 1L, 4L),
      (3L, 3L, 0L, 0L, 0L)))
  }

  test("wavGoertzelStats: pure quarter-rate tone concentrates in the " +
    "c = 0 bin exactly, orthogonal bins read zero, recurrence equals " +
    "the DFT closed form on arbitrary samples") {
    import sqlImplicits._
    def wav(samples: Array[Short]): Array[Byte] = {
      val buf = java.nio.ByteBuffer
        .allocate(44 + 2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
        .putInt(buf.capacity() - 8).put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
      samples.foreach(buf.putShort)
      buf.array()
    }
    // doc 1: x_n = 1000*cos(pi*n/2) over N = 12 (full periods of every
    // bin) -> |X(pi/2)|^2 = (A*N/2)^2 = 6000^2 = 36,000,000 and ZERO
    // at the four orthogonal bins -> energy share 10^6 at bin 2
    val tone = Array.tabulate(12)(n => (Seq(1000, 0, -1000, 0)(n % 4))
      .toShort)
    // doc 2: arbitrary samples for the recurrence == closed-form check
    val arb = Array[Short](-300, 5, 1200, -4, 0, 97, -88)
    val blobs = Seq(
      MediaBlob(1L, "wav", wav(tone)),
      MediaBlob(2L, "wav", wav(arb))).toDS()
    val out = MultimodalOps.wavGoertzelStats(blobs)
      .collect().sortBy(_.doc_id)
    val t = out(0)
    assert((t.n_samples, t.p0, t.p1, t.p2, t.p3, t.p4) ===
      (12L, 0L, 0L, 36000000L, 0L, 0L))
    // closed form 4|X|^2 = C^2 + w*S^2 over the integer sign patterns
    def closed(xs: Array[Short]): Seq[Long] = {
      val a = Map(
        0 -> (Array(2L), Array(0L), 1L),
        1 -> (Array(2L, 1L, -1L, -2L, -1L, 1L),
              Array(0L, 1L, 1L, 0L, -1L, -1L), 3L),
        2 -> (Array(2L, 0L, -2L, 0L), Array(0L, 2L, 0L, -2L), 1L),
        3 -> (Array(2L, -1L, -1L), Array(0L, 1L, -1L), 3L),
        4 -> (Array(2L, -2L), Array(0L), 1L))
      (0 to 4).map { k =>
        val (ca, sa, w) = a(k)
        val c = xs.zipWithIndex
          .map { case (x, n) => x * ca(n % ca.length) }.sum
        val s = xs.zipWithIndex
          .map { case (x, n) => x * sa(n % sa.length) }.sum
        (c * c + w * s * s) / 4
      }
    }
    val g = out(1)
    assert(Seq(g.p0, g.p1, g.p2, g.p3, g.p4) === closed(arb))
    assert(closed(tone) === Seq(0L, 0L, 36000000L, 0L, 0L))
  }

  test("wavZeroCrossings: sign-class changes with zero non-negative, " +
    "ppm per transition, single-sample reads zero") {
    import sqlImplicits._
    def wav(samples: Array[Short]): Array[Byte] = {
      val buf = java.nio.ByteBuffer
        .allocate(44 + 2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
        .putInt(buf.capacity() - 8).put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
      samples.foreach(buf.putShort)
      buf.array()
    }
    // [1,-1,0,-2,3]: every adjacent pair crosses (0 counts as
    // NON-negative, so -1 -> 0 is a crossing) -> 4/4 transitions
    // [5,7,0,2]: no negatives anywhere -> 0 crossings
    // [9]: one sample, no transitions -> ppm 0 by contract
    val blobs = Seq(
      MediaBlob(1L, "wav", wav(Array[Short](1, -1, 0, -2, 3))),
      MediaBlob(2L, "wav", wav(Array[Short](5, 7, 0, 2))),
      MediaBlob(3L, "wav", wav(Array[Short](9)))).toDS()
    val out = MultimodalOps.wavZeroCrossings(blobs)
      .collect().sortBy(_.doc_id)
      .map(z => (z.doc_id, z.n_samples, z.n_cross, z.zcr_ppm))
    assert(out.toSeq === Seq(
      (1L, 5L, 4L, 1000000L),
      (2L, 4L, 0L, 0L),
      (3L, 1L, 0L, 0L)))
  }

  test("channelCensus: closed-form moment replica; grayscale witness " +
    "exact; constant channel guards its correlations") {
    import sqlImplicits._
    // generative replica: channel = byte index mod 3, padding excluded
    def expected(id: Long): (Long, Long, Long, Long) = {
      val w = (4 + id % 5).toInt; val h = (2 + id % 3).toInt
      def v(j: Int) = (id * 7 + j * 13) % 256
      val n = w * h
      val trips = (0 until n).map(p => (v(3 * p), v(3 * p + 1), v(3 * p + 2)))
      (n.toLong, trips.map(_._1).sum, trips.map(t => t._1 * t._2).sum,
        trips.map(t => math.abs(t._1 - t._2)).sum)
    }
    val gen = (0L until 10L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = MultimodalOps.channelCensus(gen).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_px"), r.getAs[Long]("sb"),
          r.getAs[Long]("sbg"), r.getAs[Long]("gap_bg"))).toMap
    out.foreach { case (id, got) =>
      assert(got === expected(id), s"id $id")
    }
    // hand-built: a 2x1 grayscale ramp -> witness fires, corr exactly
    // 1e6 on every pair; a constant-B image guards its two corrs
    def bmp(w: Int, h: Int, px: Seq[(Int, Int, Int)]): Array[Byte] = {
      val rowBytes = 3 * w; val stride = (rowBytes + 3) & ~3
      val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
        .putInt(0).putInt(54).putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24).putInt(0).putInt(stride * h)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (r <- 0 until h) {
        for (c <- 0 until w) {
          val (vb, vg, vr) = px(r * w + c)
          buf.put(vb.toByte).put(vg.toByte).put(vr.toByte)
        }
        (rowBytes until stride).foreach(_ => buf.put(0.toByte))
      }
      buf.array()
    }
    val gray = MultimodalOps.decodeBmpChannels(100L,
      bmp(2, 1, Seq((10, 10, 10), (200, 200, 200))))
    assert((gray.gap_bg, gray.gap_br) === (0L, 0L))
    assert((gray.sb, gray.sg, gray.sr) === (210L, 210L, 210L))
    // Pearson of identical varying planes is exactly 1 under the
    // production expression — check via the same moment tree
    def corr(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long,
             syy: Long): Long = {
      val num = n.toDouble * sxy - sx.toDouble * sy
      val vx = n.toDouble * sxx - sx.toDouble * sx
      val vy = n.toDouble * syy - sy.toDouble * sy
      if (vx == 0.0 || vy == 0.0) 0L
      else math.floor(1e6 * num / math.sqrt(vx * vy)).toLong
    }
    assert(corr(gray.n_px, gray.sb, gray.sg, gray.sbg, gray.sbb,
      gray.sgg) === 1000000L)
    // constant B plane: its two correlations guard to 0, the G/R pair
    // stays perfectly correlated on this ramp
    val const = MultimodalOps.decodeBmpChannels(101L,
      bmp(2, 1, Seq((5, 10, 20), (5, 30, 40))))
    assert(const.sbb * const.n_px === const.sb * const.sb) // var B = 0
    assert(corr(const.n_px, const.sg, const.sr, const.sgr, const.sgg,
      const.srr) === 1000000L)
  }

  test("frameMotion: byte-exact pair differencing over the frame " +
    "stride, static clip reads zero, sub-frame payload degenerate") {
    import sqlImplicits._
    val pad = "." * 16
    // doc 1: frame0 16x'a', frame1 16x'b' -> every byte differs by 1
    val moving = ("a" * 16) + pad + ("b" * 16)
    // doc 2: identical frames -> zero motion
    val static0 = ("c" * 16) + pad + ("c" * 16)
    val docs = Seq((1L, moving, "src0"), (2L, static0, "src0"),
      (3L, "short", "src0")).toDF("doc_id", "text", "source")
    val out = MultimodalOps.frameMotion(docs).orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("motion_sum"),
        r.getAs[Long]("max_pair_sum"),
        r.getAs[Long]("motion_mean_micro")))
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 16L, 16L, 1000000L),
      (2L, 2L, 1L, 0L, 0L, 0L),
      (3L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("wavTrimCensus: leading/trailing low runs, all-low sentinel, " +
    "all-loud zero trim, exact ppm") {
    import sqlImplicits._
    def wav(samples: Array[Short]): Array[Byte] = {
      val buf = java.nio.ByteBuffer
        .allocate(44 + 2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
        .putInt(buf.capacity() - 8).put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
      samples.foreach(buf.putShort)
      buf.array()
    }
    def win(v: Short, n: Int) = Array.fill(n)(v)
    // doc 1: low(100) | loud(2000) | low(0) | loud(1500) | low(50, 8
    // samples partial) -> first_loud 1, last_loud 3, trim 16+8 = 24
    // of 72 -> ppm 333333 (inner low window 2 is NOT trimmed)
    val d1 = win(100, 16) ++ win(2000, 16) ++ win(0, 16) ++
      win(1500, 16) ++ win(50, 8)
    // doc 2: all low -> sentinel -1s, everything trimmed
    val d2 = win(10, 20)
    // doc 3: all loud single window -> zero trim
    val d3 = win(2000, 16)
    val blobs = Seq(MediaBlob(1L, "wav", wav(d1)),
      MediaBlob(2L, "wav", wav(d2)),
      MediaBlob(3L, "wav", wav(d3))).toDS()
    val out = MultimodalOps.wavTrimCensus(blobs).orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_windows"),
        r.getAs[Long]("n_samples"), r.getAs[Long]("first_loud"),
        r.getAs[Long]("last_loud"), r.getAs[Long]("trim_samples"),
        r.getAs[Long]("trim_ppm")))
    assert(out.toSeq === Seq(
      (1L, 5L, 72L, 1L, 3L, 24L, 333333L),
      (2L, 2L, 20L, -1L, -1L, 20L, 1000000L),
      (3L, 1L, 16L, 0L, 0L, 0L, 0L)))
  }

  test("wavClippingStats: threshold inclusive at |s| >= clipAbs, " +
    "exact integer moments, silence reads all zeros") {
    import sqlImplicits._
    def wav(samples: Array[Short]): Array[Byte] = {
      val buf = java.nio.ByteBuffer
        .allocate(44 + 2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
        .putInt(buf.capacity() - 8).put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
      samples.foreach(buf.putShort)
      buf.array()
    }
    // doc 1: symmetric full swing — both samples clip, sum_sq exact
    // doc 2: boundary — 1900 clips (inclusive), -1899 does not
    // doc 3: quiet — nothing clips
    // doc 4: silence — the zero-energy guard input
    val blobs = Seq(
      MediaBlob(1L, "wav", wav(Array[Short](2000, -2000))),
      MediaBlob(2L, "wav", wav(Array[Short](1900, -1899))),
      MediaBlob(3L, "wav", wav(Array[Short](100, -100, 0))),
      MediaBlob(4L, "wav", wav(Array[Short](0, 0)))).toDS()
    val out = MultimodalOps.wavClippingStats(blobs, 1900L)
      .collect().sortBy(_.doc_id)
      .map(c => (c.doc_id, c.n_samples, c.max_abs, c.n_clip, c.sum_sq))
    assert(out.toSeq === Seq(
      (1L, 2L, 2000L, 2L, 8000000L),
      (2L, 2L, 1900L, 1L, 3610000L + 3606201L),
      (3L, 3L, 100L, 0L, 20000L),
      (4L, 2L, 0L, 0L, 0L)))
  }

  test("wavAutocorrStats: exact lag-1 five-sum census, alternating " +
    "signal yields the r = -1 sums, single sample reads zeros") {
    import sqlImplicits._
    def wav(samples: Array[Short]): Array[Byte] = {
      val buf = java.nio.ByteBuffer
        .allocate(44 + 2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
        .putInt(buf.capacity() - 8).put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
      samples.foreach(buf.putShort)
      buf.array()
    }
    val blobs = Seq(
      MediaBlob(1L, "wav", wav(Array[Short](1, 2, 3))),
      MediaBlob(2L, "wav", wav(Array[Short](5, -5, 5, -5))),
      MediaBlob(3L, "wav", wav(Array[Short](7)))).toDS()
    val out = MultimodalOps.wavAutocorrStats(blobs)
      .collect().sortBy(_.doc_id)
      .map(a => (a.doc_id, a.n_pairs, a.sx, a.sy, a.sxy, a.sxx, a.syy))
    // doc 1: pairs (1,2),(2,3) -> sx 3, sy 5, sxy 8, sxx 5, syy 13
    // doc 2: alternating -> cov = 3*(-75) - 5*(-5) = -200,
    //   var_x = var_y = 3*75 - 25 = 200 -> r = -1 downstream
    assert(out.toSeq === Seq(
      (1L, 2L, 3L, 5L, 8L, 5L, 13L),
      (2L, 3L, 5L, -5L, -75L, 75L, 75L),
      (3L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("wavDcStats: halves split at floor(n/2), signed sums exact") {
    import sqlImplicits._
    def wav(samples: Array[Short]): Array[Byte] = {
      val buf = java.nio.ByteBuffer
        .allocate(44 + 2 * samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
        .putInt(buf.capacity() - 8).put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
      samples.foreach(buf.putShort)
      buf.array()
    }
    val blobs = Seq(
      MediaBlob(1L, "wav", wav(Array[Short](10, 20, 30))),
      MediaBlob(2L, "wav", wav(Array[Short](-5, 5)))).toDS()
    val out = MultimodalOps.wavDcStats(blobs)
      .collect().sortBy(_.doc_id)
      .map(d => (d.doc_id, d.n_samples, d.sum_all, d.sum_first,
        d.sum_second))
    // doc 1: half = 1 -> first {10}, second {20, 30}
    assert(out.toSeq === Seq(
      (1L, 3L, 60L, 10L, 50L),
      (2L, 2L, 0L, -5L, 5L)))
  }

  test("magicSniff + magicCensus: bytes beat labels, garbage reads " +
    "unknown, fractions per declared row") {
    import sqlImplicits._
    // real BMP declared wav, real WAV declared bmp, real BMP declared
    // right, garbage declared bmp
    val media = Seq(
      (1L, "wav", MultimodalOps.encodeBmp(1L)),
      (2L, "bmp", MultimodalOps.encodeWav(2L)),
      (3L, "bmp", MultimodalOps.encodeBmp(3L)),
      (4L, "bmp", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))
      .toDF("doc_id", "declared", "payload")
    val out = MultimodalOps.magicCensus(media)
      .orderBy("declared", "sniffed").collect()
      .map(r => (r.getAs[String]("declared"), r.getAs[String]("sniffed"),
        r.getAs[Long]("n"), r.getAs[Long]("frac_micro")))
    assert(out.toSeq === Seq(
      ("bmp", "bmp", 1L, 333333L),
      ("bmp", "unknown", 1L, 333333L),
      ("bmp", "wav", 1L, 333333L),
      ("wav", "bmp", 1L, 1000000L)))
  }

  test("integrityCensus: header size fields vs actual bytes — ok, " +
    "truncated, trailing junk") {
    import sqlImplicits._
    val bmp = MultimodalOps.encodeBmp(2L)
    val wav = MultimodalOps.encodeWav(3L)
    val media = Seq(
      (1L, "bmp", bmp),                              // intact
      (2L, "bmp", bmp.dropRight(7)),                 // truncated by 7
      (3L, "wav", wav),                              // intact
      (4L, "wav", wav ++ Array[Byte](9, 9, 9)))      // 3 trailing bytes
      .toDF("doc_id", "kind", "payload")
    val out = MultimodalOps.integrityCensus(media)
      .orderBy("kind").collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("n"),
        r.getAs[Long]("n_ok"), r.getAs[Long]("n_truncated"),
        r.getAs[Long]("n_trailing"), r.getAs[Long]("missing_bytes")))
    assert(out.toSeq === Seq(
      ("bmp", 2L, 1L, 1L, 0L, 7L),
      ("wav", 2L, 1L, 0L, 1L, 0L)))
  }

  test("mediaBinaryDeclared: the mislabel subset flips, everything " +
    "else keeps its parity kind") {
    import sqlImplicits._
    val docs = (0L until 28L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = MultimodalOps.mediaBinaryDeclared(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("declared"))
      .toMap
    (0L until 28L).foreach { i =>
      val actual = if (i % 2 == 0) "bmp" else "wav"
      val expect =
        if (i % 7 == 3) (if (actual == "bmp") "wav" else "bmp")
        else actual
      assert(out(i) === expect, s"doc $i")
    }
  }
}
