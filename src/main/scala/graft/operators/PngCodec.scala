package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (M23) — the second compressed image format real
  * corpora carry, and the LOSSLESS one: unlike [[JpegCodec]] (where
  * fixture construction buys exactness), every PNG decode is bit-exact
  * by the format's nature, so the oracle closed form needs no special
  * fixture shape and the ImageIO differential demands perfect
  * equality, not an IDCT tolerance.
  *
  * No codec library: the container walk (signature, IHDR/IDAT/IEND,
  * per-chunk CRC32 verification), DEFLATE via the JDK's zlib binding
  * (`java.util.zip` — part of the platform, same dependency class as
  * `MessageDigest`), and all five scanline filters (None/Sub/Up/
  * Average/Paeth, RFC 2083 §6) implemented here. The fixture encoder
  * deliberately CYCLES the filter type per row so the decoder's five
  * unfilter paths are all exercised on every image.
  *
  * SCOPE — 8-bit depth, color types 2 (truecolor RGB) and 0
  * (grayscale), no interlace. Everything else fails loud naming the
  * field (Adam7, 16-bit, palette, alpha — the [[JpegCodec]] gate
  * discipline).
  */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // --------------------------------------------------------- encoder

  /** Fixture generator: w = 8 + id mod 9, h = 6 + (id div 3) mod 7,
    * RGB byte k (row-major, interleaved) valued (7·id + 13·k) mod 256
    * — the closed form the oracle mirrors. Row y is filtered with type
    * (id + y) mod 5, so one image exercises every unfilter path.
    */
  def encode(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (6 + (id / 3) % 7).toInt
    val raw = new Array[Byte](3 * w * h)
    var k = 0
    while (k < raw.length) {
      raw(k) = ((7 * id + 13L * k) % 256).toByte
      k += 1
    }
    encodeRgb(w, h, raw, y => ((id + y) % 5).toInt)
  }

  /** RGB encoder core: filter each scanline with `filterOf(row)`,
    * deflate, wrap in chunks. Exposed for spec fixtures.
    */
  def encodeRgb(w: Int, h: Int, rgb: Array[Byte],
                filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(rgb.length == 3 * w * h, "rgb length")
    val bpp = 3
    val rowBytes = bpp * w
    val filtered = new Array[Byte](h * (1 + rowBytes))
    var y = 0
    while (y < h) {
      val ft = filterOf(y)
      filtered(y * (1 + rowBytes)) = ft.toByte
      var i = 0
      while (i < rowBytes) {
        val cur = rgb(y * rowBytes + i) & 0xff
        val left = if (i >= bpp) rgb(y * rowBytes + i - bpp) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * rowBytes + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp)
          rgb((y - 1) * rowBytes + i - bpp) & 0xff else 0
        val predicted = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered(y * (1 + rowBytes) + 1 + i) =
          ((cur - predicted) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor RGB
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    writeChunk(out, "IHDR", ihdr.array())
    val deflater = new Deflater()
    deflater.setInput(filtered); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished())
      zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    writeChunk(out, "IDAT", zbuf.toByteArray)
    writeChunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream,
                         kind: String, data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val kindB = kind.getBytes("US-ASCII")
    out.write(kindB)
    out.write(data)
    val crc = new CRC32()
    crc.update(kindB); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array())
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // --------------------------------------------------------- decoder

  /** Decoded image: interleaved 8-bit samples — 3 per pixel for RGB
    * (color type 2), 1 for grayscale (color type 0).
    */
  final case class PngImage(width: Int, height: Int, channels: Int,
                            samples: Array[Int])

  def decode(bytes: Array[Byte]): PngImage = {
    require(bytes.length > 8 &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), Signature),
      "not a PNG (bad signature)")
    var pos = 8
    var w = 0; var h = 0; var channels = 0
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    def u32(p: Int): Int =
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    while (!sawEnd) {
      require(pos + 8 <= bytes.length, "truncated PNG")
      val len = u32(pos)
      val kind = new String(bytes, pos + 4, 4, "US-ASCII")
      require(pos + 12 + len <= bytes.length, s"truncated $kind chunk")
      // per-chunk CRC verification — corruption fails loud, not quietly
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == u32(pos + 8 + len),
        s"CRC mismatch in $kind chunk")
      kind match {
        case "IHDR" =>
          w = u32(pos + 8); h = u32(pos + 12)
          val depth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(depth == 8, s"unsupported bit depth $depth (8 only)")
          require(colorType == 2 || colorType == 0,
            s"unsupported color type $colorType (RGB/gray only)")
          require(interlace == 0, "Adam7 interlace not supported")
          channels = if (colorType == 2) 3 else 1
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) skipped
      }
      pos += 12 + len
    }
    require(w > 0 && h > 0 && channels > 0, "no IHDR before IDAT/IEND")

    val rowBytes = channels * w
    val filtered = new Array[Byte](h * (1 + rowBytes))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < filtered.length && !inflater.finished()) {
      val n = inflater.inflate(filtered, off, filtered.length - off)
      require(n > 0 || inflater.finished(), "bad DEFLATE stream")
      off += n
    }
    inflater.end()
    require(off == filtered.length,
      s"short pixel data: $off of ${filtered.length}")

    val out = new Array[Int](h * rowBytes)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (1 + rowBytes)) & 0xff
      require(ft <= 4, s"bad filter type $ft on row $y")
      var i = 0
      while (i < rowBytes) {
        val raw = filtered(y * (1 + rowBytes) + 1 + i) & 0xff
        val left = if (i >= channels) out(y * rowBytes + i - channels) else 0
        val up = if (y > 0) out((y - 1) * rowBytes + i) else 0
        val ul = if (y > 0 && i >= channels)
          out((y - 1) * rowBytes + i - channels) else 0
        val predicted = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        out(y * rowBytes + i) = (raw + predicted) & 0xff
        i += 1
      }
      y += 1
    }
    PngImage(w, h, channels, out)
  }
}
