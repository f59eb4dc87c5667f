package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import graft.operators.PngCodec

/** M23 — the pure-JVM PNG codec, differential-tested against
  * `javax.imageio`. PNG is lossless, so every comparison here is EXACT
  * equality — no conformance tolerance anywhere: my encoder's files
  * must decode identically under the reference decoder, and
  * reference-encoded files must decode identically under mine.
  */
class PngSpec extends SparkSpec {

  private def expected(id: Long, k: Int): Int =
    ((7 * id + 13L * k) % 256).toInt

  test("fixture roundtrip: decode(encode(id)) recovers every sample, " +
    "through all five filter types (the fixture cycles them per row)") {
    (0L until 30L).foreach { id =>
      val img = PngCodec.decode(PngCodec.encode(id))
      val w = (8 + id % 9).toInt
      val h = (6 + (id / 3) % 7).toInt
      assert(img.width === w && img.height === h && img.channels === 3)
      img.samples.indices.foreach { k =>
        assert(img.samples(k) === expected(id, k), s"id=$id k=$k")
      }
    }
  }

  test("my encoder's files are valid PNG: ImageIO decodes them " +
    "EXACTLY (lossless — no tolerance)") {
    (0L until 12L).foreach { id =>
      val bi = ImageIO.read(new ByteArrayInputStream(PngCodec.encode(id)))
      val w = bi.getWidth
      (0 until bi.getHeight).foreach { yy =>
        (0 until w).foreach { xx =>
          val p = bi.getRGB(xx, yy)
          val base = (yy * w + xx) * 3
          assert(((p >> 16) & 0xff) === expected(id, base) &&
            ((p >> 8) & 0xff) === expected(id, base + 1) &&
            (p & 0xff) === expected(id, base + 2), s"id=$id ($xx,$yy)")
        }
      }
    }
  }

  test("ImageIO-encoded PNGs (RGB and grayscale) decode EXACTLY " +
    "under my decoder — bytes my encoder never produced") {
    val (w, h) = (37, 21) // odd dims: no alignment crutch
    val ci = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(yy => (0 until w).foreach { xx =>
      ci.setRGB(xx, yy, (((xx * 7) % 256) << 16) |
        (((yy * 11) % 256) << 8) | ((xx * yy + 3) % 256))
    })
    val bos = new ByteArrayOutputStream()
    ImageIO.write(ci, "png", bos)
    val mine = PngCodec.decode(bos.toByteArray)
    assert(mine.width === w && mine.height === h && mine.channels === 3)
    (0 until h).foreach(yy => (0 until w).foreach { xx =>
      val base = (yy * w + xx) * 3
      assert(mine.samples(base) === (xx * 7) % 256 &&
        mine.samples(base + 1) === (yy * 11) % 256 &&
        mine.samples(base + 2) === (xx * yy + 3) % 256, s"($xx,$yy)")
    })
    val gi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(yy => (0 until w).foreach(xx =>
      gi.getRaster.setSample(xx, yy, 0, (xx * 13 + yy * 5) % 256)))
    val gos = new ByteArrayOutputStream()
    ImageIO.write(gi, "png", gos)
    val gm = PngCodec.decode(gos.toByteArray)
    assert(gm.channels === 1)
    (0 until h).foreach(yy => (0 until w).foreach(xx =>
      assert(gm.samples(yy * w + xx) === (xx * 13 + yy * 5) % 256)))
  }

  test("fail-loud gates: chunk CRC corruption and unsupported IHDR " +
    "shapes raise naming the problem") {
    val bytes = PngCodec.encode(3L)
    // flip one byte inside the IDAT payload → CRC must catch it
    val idatIdx = {
      var i = 8
      var found = -1
      while (found < 0) {
        val len = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
          ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        val kind = new String(bytes, i + 4, 4, "US-ASCII")
        if (kind == "IDAT") found = i + 8 else i += 12 + len
      }
      found
    }
    val corrupt = bytes.clone()
    corrupt(idatIdx) = (corrupt(idatIdx) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decode(corrupt))
    assert(e.getMessage.contains("CRC"))
    // 16-bit depth gate (patch IHDR depth byte + fix its CRC)
    val deep = bytes.clone()
    deep(8 + 8 + 8) = 16.toByte // depth field of IHDR
    val crc = new java.util.zip.CRC32()
    crc.update(deep, 12, 4 + 13)
    val cv = crc.getValue.toInt
    deep(8 + 8 + 13) = (cv >> 24).toByte
    deep(8 + 8 + 14) = (cv >> 16).toByte
    deep(8 + 8 + 15) = (cv >> 8).toByte
    deep(8 + 8 + 16) = cv.toByte
    val e2 = intercept[IllegalArgumentException](PngCodec.decode(deep))
    assert(e2.getMessage.contains("bit depth"))
  }

  test("the M4 dispatch seam serves png: decodeMedia over a png blob " +
    "returns the sample-unit MediaDecoded row") {
    import sqlImplicits._
    import graft.operators.{MediaBlob, MultimodalOps}
    val ds = Seq(MediaBlob(4L, "png", PngCodec.encode(4L))).toDS()
    val out = MultimodalOps.decodeMedia(ds).collect()
    assert(out.length === 1)
    val r = out(0)
    val w = 8 + 4 % 9; val h = 6 + (4 / 3) % 7
    assert(r.width === Some(w.toLong) && r.height === Some(h.toLong))
    assert(r.n_units === 3L * w * h)
    var sum = 0L
    (0 until 3 * w * h).foreach(k => sum += expected(4L, k))
    assert(r.sum_units === sum)
  }
}
