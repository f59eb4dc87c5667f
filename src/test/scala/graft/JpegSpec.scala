package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import graft.operators.JpegCodec

/** M21 — the pure-JVM baseline JFIF codec (VERDICT r15 item 2),
  * differential-tested against `javax.imageio` (the JDK's bundled
  * libjpeg): the in-repo decoder must agree with a reference
  * implementation on files NEITHER side controls, not merely roundtrip
  * its own encoder. Tolerances are principled, not hopeful:
  *  - flat-MCU fixtures: EXACT everywhere through my codec, and EXACT
  *    on MCU-interior pixels under ImageIO (T.81 leaves chroma
  *    upsampling decoder-defined — libjpeg's triangular filter blends
  *    across MCU boundaries where replication does not; over a flat
  *    neighborhood both are the identity, so interior disagreement
  *    would be a real bug);
  *  - non-flat images: ±1 per channel (the IDCT variance the T.81
  *    conformance model allows between two correct decoders).
  */
class JpegSpec extends SparkSpec {

  private def closedForm(id: Long, w: Int, gw: Int, xx: Int, yy: Int)
  : (Int, Int, Int) = {
    val m = (yy / 16) * gw + (xx / 16)
    (128 + 16 * (((id + 3 * m) % 9) - 4).toInt,
      128 + 17 * (((5 * id + 7 * m) % 5) - 2).toInt,
      128 + 17 * (((11 * id + 13 * m) % 5) - 2).toInt)
  }

  test("flat-MCU fixtures roundtrip BIT-EXACTLY through the full " +
    "entropy-coded path (Huffman, zigzag, dequant, IDCT, upsample)") {
    (0L until 24L).foreach { id =>
      val img = JpegCodec.decode(JpegCodec.encode(id))
      val w = 16 * (1 + (id % 3)).toInt
      val h = 16 * (1 + ((id / 4) % 2)).toInt
      assert(img.width === w && img.height === h)
      (0 until h).foreach { yy =>
        (0 until w).foreach { xx =>
          val (ey, ecb, ecr) = closedForm(id, w, w / 16, xx, yy)
          val i = yy * w + xx
          assert(img.y(i) === ey && img.cb(i) === ecb && img.cr(i) === ecr,
            s"id=$id ($xx,$yy)")
        }
      }
    }
  }

  test("my encoder's files are valid baseline JFIF: ImageIO decodes " +
    "them to the closed form EXACTLY on MCU-interior pixels") {
    (0L until 12L).foreach { id =>
      val bi = ImageIO.read(new ByteArrayInputStream(JpegCodec.encode(id)))
      val w = bi.getWidth
      (0 until bi.getHeight).foreach { yy =>
        (0 until w).foreach { xx =>
          // ≥2px inside the MCU: outside the reach of libjpeg's
          // triangular chroma upsampler at a flat-MCU boundary
          if (xx % 16 >= 2 && xx % 16 <= 13 &&
              yy % 16 >= 2 && yy % 16 <= 13) {
            val (ey, ecb, ecr) = closedForm(id, w, w / 16, xx, yy)
            val (er, eg, eb) = JpegCodec.yccToRgb(ey, ecb, ecr)
            val p = bi.getRGB(xx, yy)
            assert(((p >> 16) & 0xff) === er && ((p >> 8) & 0xff) === eg
              && (p & 0xff) === eb, s"id=$id ($xx,$yy)")
          }
        }
      }
    }
  }

  test("ImageIO-encoded grayscale gradient: my decoder ≡ ImageIO's " +
    "within the ±1 IDCT conformance tolerance (single component — " +
    "no upsampling freedom in play)") {
    val (w, h) = (40, 24)
    val gimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(yy => (0 until w).foreach(xx =>
      gimg.getRaster.setSample(xx, yy, 0,
        (xx * 5 + yy * 7 + (xx * yy) % 23) % 256)))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(gimg, "jpg", bos)
    val bytes = bos.toByteArray
    val mine = JpegCodec.decode(bytes)
    assert(mine.isGray && mine.width === w && mine.height === h)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    (0 until h).foreach(yy => (0 until w).foreach { xx =>
      val d = math.abs(mine.y(yy * w + xx) -
        theirs.getRaster.getSample(xx, yy, 0))
      assert(d <= 1, s"($xx,$yy): diff $d")
    })
  }

  test("ImageIO-encoded color (gradient luma, per-MCU-flat chroma): " +
    "±1 on interior pixels — full 4:2:0 AC-coefficient path exercised " +
    "on bytes my encoder never produced") {
    val (w, h) = (48, 32)
    val ci = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { yy =>
      (0 until w).foreach { xx =>
        val m = (yy / 16) * (w / 16) + (xx / 16)
        val y = 60 + ((xx * 3 + yy * 2) % 130)
        val (r, g, b) = JpegCodec.yccToRgb(y,
          128 + 17 * (m % 5 - 2), 128 + 17 * ((m * 3) % 5 - 2))
        ci.setRGB(xx, yy, (r << 16) | (g << 8) | b)
      }
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(ci, "jpg", bos)
    val bytes = bos.toByteArray
    val mine = JpegCodec.decode(bytes)
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    (0 until h).foreach { yy =>
      (0 until w).foreach { xx =>
        if (xx % 16 >= 2 && xx % 16 <= 13 &&
            yy % 16 >= 2 && yy % 16 <= 13) {
          val (mr, mg, mb) = mine.rgb(yy * w + xx)
          val p = theirs.getRGB(xx, yy)
          val d = math.abs(((p >> 16) & 0xff) - mr) max
            math.abs(((p >> 8) & 0xff) - mg) max
            math.abs((p & 0xff) - mb)
          assert(d <= 1, s"($xx,$yy): diff $d")
        }
      }
    }
  }

  test("restart markers: DRI/RSTn honored (bit alignment + DC " +
    "predictor reset), decode still bit-exact") {
    def color(m: Long) = (128 + 16 * ((m % 9) - 4).toInt,
      128 + 17 * ((m % 5) - 2).toInt, 128)
    val bytes = JpegCodec.encodeFlatMcus(48, 32, color,
      restartInterval = 2)
    val img = JpegCodec.decode(bytes)
    (0 until 32).foreach { yy =>
      (0 until 48).foreach { xx =>
        val m = (yy / 16) * 3 + (xx / 16)
        val (ey, ecb, ecr) = color(m.toLong)
        val i = yy * 48 + xx
        assert(img.y(i) === ey && img.cb(i) === ecb && img.cr(i) === ecr,
          s"($xx,$yy)")
      }
    }
    // the restart stream is also valid for the reference decoder
    assert(ImageIO.read(new ByteArrayInputStream(bytes)).getWidth === 48)
  }

  test("fail-loud scope gate: progressive (SOF2) raises naming the " +
    "marker instead of mis-decoding") {
    val bytes = JpegCodec.encode(0L)
    // patch the SOF0 marker byte to SOF2
    val idx = bytes.indices.sliding(2).find(p =>
      (bytes(p(0)) & 0xff) == 0xff && (bytes(p(1)) & 0xff) == 0xc0).get
    bytes(idx(1)) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decode(bytes))
    assert(e.getMessage.contains("progressive"))
  }

  test("the M4 dispatch seam serves jpeg: decodeMedia over a jpeg " +
    "blob returns the RGB-unit MediaDecoded row") {
    import sqlImplicits._
    import graft.operators.{MediaBlob, MultimodalOps}
    val ds = Seq(MediaBlob(5L, "jpeg", JpegCodec.encode(5L))).toDS()
    val out = MultimodalOps.decodeMedia(ds).collect()
    assert(out.length === 1)
    val r = out(0)
    val w = 16 * (1 + 5 % 3)
    val h = 16 * (1 + (5 / 4) % 2)
    assert(r.width === Some(w.toLong) && r.height === Some(h.toLong))
    assert(r.n_units === 3L * w * h)
    // cross-check the sum against the decoded planes directly
    val img = JpegCodec.decode(JpegCodec.encode(5L))
    var sum = 0L
    (0 until w * h).foreach { i =>
      val (rr, gg, bb) = img.rgb(i); sum += rr.toLong + gg + bb
    }
    assert(r.sum_units === sum)
  }
}
