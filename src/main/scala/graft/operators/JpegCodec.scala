package graft.operators

/** Pure-JVM baseline JFIF (JPEG) codec — the M-family's documented gap
  * closed (VERDICT r15 item 2): real corpora are JPEG, and the decode
  * seam (`MultimodalOps.decodeMedia`'s per-kind dispatch) was designed
  * for exactly this drop-in. No codec library, no native code: Huffman
  * entropy decode (ITU-T T.81 §F.2.2 canonical DECODE procedure),
  * dequantization, separable double-precision IDCT over a
  * StrictMath-built basis (bit-reproducible across JVMs — Math.cos is
  * only 1-ulp-bounded, StrictMath is fdlibm-exact), per-component
  * planes with generic 1–2× sampling factors (4:4:4, 4:2:2, 4:2:0),
  * pixel-replication chroma upsample, and libjpeg's fixed-point
  * YCbCr→RGB integer formula (so the conversion is exactly mirrorable
  * in oracle SQL).
  *
  * DECODER SCOPE — baseline sequential DCT (SOF0), 8-bit precision,
  * 1 or 3 components, interleaved single scan, restart markers
  * honored. Progressive (SOF2), arithmetic coding, and 12-bit inputs
  * raise loud errors naming the unsupported marker — the same
  * fail-loud contract as `decodeBmp`'s variant gate.
  *
  * FIXTURE EXACTNESS (what makes the lossy format oracle-able): the
  * in-repo [[JpegCodec.encode]] fixture generator emits images whose
  * 8×8 blocks are FLAT (one color per 16×16 MCU) with component values
  * offset from 128 by exact multiples of the table's DC quantizer
  * step. A flat block's forward DCT is DC-only with F(0,0) = 8·(v−128),
  * so quantization (÷16 luma, ÷17 chroma) is exact, and the decoder's
  * IDCT of a DC-only block is the constant F(0,0)/8 — the roundtrip
  * recovers every pixel bit-for-bit THROUGH the real entropy-coded
  * path (Huffman, zigzag, dequant, IDCT, upsample, color convert),
  * which is what lets the DuckDB oracle predict decoded statistics
  * from the generative closed form without parsing a byte. JpegSpec
  * additionally differential-tests the decoder against
  * `javax.imageio` (the JDK's libjpeg) on NON-flat images, where
  * outputs agree within the IDCT tolerance the T.81 conformance model
  * allows.
  */
object JpegCodec {

  // ---------------------------------------------------------- tables

  /** Zigzag scan: natural-order index of the k-th zigzag element. */
  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table, natural row order. */
  private[operators] val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table, natural row order. */
  private[operators] val QChr: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 standard Huffman specifications: (BITS[1..16], HUFFVAL)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** IDCT basis B(u, x) = 0.5·c(u)·cos((2x+1)·u·π/16), StrictMath so
    * every JVM computes the identical doubles. A DC-only block decodes
    * to F(0,0)·B(0,x)·B(0,y) = F(0,0)/8·(1 ± 1ulp) — rounding an exact
    * integer ± 1ulp is that integer, the fixture-exactness keystone.
    */
  private val Basis: Array[Array[Double]] = {
    val b = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) StrictMath.sqrt(0.5) else 1.0
      var x = 0
      while (x < 8) {
        b(u)(x) = 0.5 * cu *
          StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        x += 1
      }
      u += 1
    }
    b
  }

  // ----------------------------------------------------- Huffman

  /** Canonical Huffman table from (BITS, HUFFVAL) — the T.81 §C.2 code
    * assignment, shared by encoder (symbol → (code, len)) and decoder
    * (MINCODE/MAXCODE/VALPTR arrays for §F.2.2.3 DECODE).
    */
  private[operators] final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val (codeOf, lenOf) = {
      val c = new java.util.HashMap[Int, Int]()
      val l = new java.util.HashMap[Int, Int]()
      var code = 0
      var k = 0
      var size = 1
      while (size <= 16) {
        var i = 0
        while (i < bits(size - 1)) {
          c.put(vals(k) & 0xff, code); l.put(vals(k) & 0xff, size)
          code += 1; k += 1; i += 1
        }
        code <<= 1
        size += 1
      }
      (c, l)
    }
    val (minCode, maxCode, valPtr) = {
      val mn = new Array[Int](17)
      val mx = new Array[Int](17)
      val vp = new Array[Int](17)
      var code = 0
      var k = 0
      var size = 1
      while (size <= 16) {
        vp(size) = k
        mn(size) = code
        code += bits(size - 1); k += bits(size - 1)
        mx(size) = code - 1
        if (bits(size - 1) == 0) mx(size) = -1
        code <<= 1
        size += 1
      }
      (mn, mx, vp)
    }
    def value(idx: Int): Int = vals(idx) & 0xff
  }

  private lazy val StdDcLum = new Huff(DcLumBits, DcLumVals)
  private lazy val StdDcChr = new Huff(DcChrBits, DcChrVals)
  private lazy val StdAcLum = new Huff(AcLumBits, AcLumVals)
  private lazy val StdAcChr = new Huff(AcChrBits, AcChrVals)

  // --------------------------------------------------------- encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 §F.1.2.3). */
    def flush(): Unit =
      if (nBits > 0) { put(0xff, 8 - nBits) }
  }

  private def magnitudeCat(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** Fixture generator: a baseline 4:2:0 YCbCr JFIF whose 16×16 MCUs
    * are each one flat color with Y−128 a multiple of 16 (= QLum DC
    * step) and Cb/Cr−128 multiples of 17 (= QChr DC step) — the
    * roundtrip-exact construction documented on the object. Dimensions
    * and MCU colors derive from `id` (the closed form the oracle
    * mirrors):
    *   width = 16·(1 + id mod 3), height = 16·(1 + (id div 4) mod 2),
    *   MCU m: y = 128 + 16·((id + 3m) mod 9 − 4),
    *          cb = 128 + 17·((5id + 7m) mod 5 − 2),
    *          cr = 128 + 17·((11id + 13m) mod 5 − 2)
    * — all components stay in [60, 196], so neither the sample clamp
    * nor the RGB clamp ever fires on fixture data.
    */
  def encode(id: Long): Array[Byte] = {
    val w = 16 * (1 + (id % 3)).toInt
    val h = 16 * (1 + ((id / 4) % 2)).toInt
    val gw = w / 16
    val gh = h / 16
    def yOf(m: Long) = 128 + 16 * (((id + 3 * m) % 9) - 4).toInt
    def cbOf(m: Long) = 128 + 17 * (((5 * id + 7 * m) % 5) - 2).toInt
    def crOf(m: Long) = 128 + 17 * (((11 * id + 13 * m) % 5) - 2).toInt
    encodeFlatMcus(w, h, m => (yOf(m), cbOf(m), crOf(m)))
  }

  /** Flat-MCU 4:2:0 encoder core: one (y, cb, cr) per 16×16 MCU.
    * Exposed for spec fixtures (restart-interval and ImageIO
    * differential tests reuse it with custom color functions).
    */
  def encodeFlatMcus(w: Int, h: Int, color: Long => (Int, Int, Int),
                     restartInterval: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "flat-MCU fixture dims")
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int): Unit = { out.write(0xff); out.write(b) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xe0); u16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1) // no units, 1:1
    out.write(0); out.write(0) // no thumbnail
    // DQT: two 8-bit tables, values written in zigzag order
    m(0xdb); u16(2 + 2 * 65)
    out.write(0x00); (0 until 64).foreach(k => out.write(QLum(Zigzag(k))))
    out.write(0x01); (0 until 64).foreach(k => out.write(QChr(Zigzag(k))))
    // SOF0: 3 components, luma 2×2, chroma 1×1
    m(0xc0); u16(17)
    out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write(0x22); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    // DHT: the four Annex K.3 tables
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      m(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      out.write(vals)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    dht(0, 1, DcChrBits, DcChrVals); dht(1, 1, AcChrBits, AcChrVals)
    if (restartInterval > 0) { m(0xdd); u16(4); u16(restartInterval) }
    // SOS
    m(0xda); u16(12)
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)
    // entropy-coded data: per MCU 4 flat luma blocks + 1 cb + 1 cr;
    // flat block = DC diff + EOB
    var bw = new BitWriter(out)
    var predY = 0; var predCb = 0; var predCr = 0
    var rst = 0
    var sinceRestart = 0
    val nMcu = (w / 16) * (h / 16)
    var mi = 0
    while (mi < nMcu) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        bw.flush()
        m(0xd0 + rst); rst = (rst + 1) % 8
        predY = 0; predCb = 0; predCr = 0
        sinceRestart = 0
        bw = new BitWriter(out)
      }
      val (y, cb, cr) = color(mi.toLong)
      val dcY = 8 * ((y - 128) / QLum(0))  // exact: y−128 = 16k, QLum(0)=16
      val dcCb = 8 * ((cb - 128) / QChr(0))
      val dcCr = 8 * ((cr - 128) / QChr(0))
      def block(dc: Int, pred: Int, dcT: Huff, acT: Huff): Int = {
        val diff = dc - pred
        val cat = magnitudeCat(diff)
        bw.put(dcT.codeOf.get(cat), dcT.lenOf.get(cat))
        if (cat > 0) {
          val bitsVal = if (diff >= 0) diff else diff + (1 << cat) - 1
          bw.put(bitsVal, cat)
        }
        bw.put(acT.codeOf.get(0x00), acT.lenOf.get(0x00)) // EOB
        dc
      }
      var i = 0
      while (i < 4) { predY = block(dcY, predY, StdDcLum, StdAcLum); i += 1 }
      predCb = block(dcCb, predCb, StdDcChr, StdAcChr)
      predCr = block(dcCr, predCr, StdDcChr, StdAcChr)
      sinceRestart += 1
      mi += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }

  // --------------------------------------------------------- decoder

  /** Decoded image: full-resolution (post-upsample) component planes,
    * values 0–255. Grayscale images carry `cb = cr = null`.
    */
  final case class JpegImage(width: Int, height: Int,
                             y: Array[Int], cb: Array[Int], cr: Array[Int]) {
    def isGray: Boolean = cb == null
    /** libjpeg's fixed-point YCbCr→RGB (the JDK decoder's own math):
      * r = y + (91881·(cr−128) + 32768) >> 16, etc., clamped — integer
      * arithmetic the oracle mirrors exactly.
      */
    def rgb(i: Int): (Int, Int, Int) =
      if (isGray) (y(i), y(i), y(i))
      else JpegCodec.yccToRgb(y(i), cb(i), cr(i))
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** The shared fixed-point conversion (also the oracle's closed form:
    * the shifts are arithmetic, but every operand is biased positive in
    * the SQL mirror so floor = truncate there).
    */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val r = y + ((91881 * (cr - 128) + 32768) >> 16)
    val g = y - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
    val b = y + ((116130 * (cb - 128) + 32768) >> 16)
    (clamp8(r), clamp8(g), clamp8(b))
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    /** Next entropy bit; 0xFF00 stuffing unwrapped; hitting a real
      * marker mid-symbol is a bitstream error (fail loud).
      */
    def bit(): Int = {
      if (nBits == 0) {
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val nxt = bytes(pos) & 0xff
          if (nxt == 0x00) pos += 1
          else throw new IllegalArgumentException(
            f"marker 0xff$nxt%02x inside entropy data")
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def alignAndExpectRestart(n: Int): Unit = {
      nBits = 0
      require((bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == (0xd0 + n),
        s"expected RST$n at $pos")
      pos += 2
    }
    def decode(t: Huff): Int = {
      var code = bit()
      var size = 1
      while (size <= 16 && (t.maxCode(size) < 0 || code > t.maxCode(size))) {
        code = (code << 1) | bit()
        size += 1
      }
      require(size <= 16, "corrupt Huffman stream")
      t.value(t.valPtr(size) + code - t.minCode(size))
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td: Int = 0
    var ta: Int = 0
  }

  /** Decode a baseline JFIF byte array to full-resolution planes. */
  def decode(bytes: Array[Byte]): JpegImage = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    def u16(p: Int) = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    var sosAt = -1
    while (sosAt < 0) {
      require((bytes(pos) & 0xff) == 0xff, s"expected marker at $pos")
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
        case mk if mk >= 0xd0 && mk <= 0xd7 => // RSTn outside scan: skip
        case 0x01 => // TEM, no payload
        case 0xc0 => // SOF0 baseline
          val len = u16(pos)
          require(bytes(pos + 2) == 8, "only 8-bit precision (baseline)")
          h = u16(pos + 3); w = u16(pos + 5)
          val nf = bytes(pos + 7) & 0xff
          require(nf == 1 || nf == 3, s"unsupported component count $nf")
          comps = (0 until nf).map { i =>
            val o = pos + 8 + 3 * i
            val hv = bytes(o + 1) & 0xff
            Component(bytes(o) & 0xff, hv >> 4, hv & 0xf,
              bytes(o + 2) & 0xff)
          }.toArray
          comps.foreach(c => require(c.h >= 1 && c.h <= 2 &&
            c.v >= 1 && c.v <= 2, s"unsupported sampling ${c.h}x${c.v}"))
          pos += len
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) not supported — baseline decoder")
        case mk if (mk >= 0xc1 && mk <= 0xcf) && mk != 0xc4 && mk != 0xc8 =>
          throw new IllegalArgumentException(
            f"unsupported SOF marker 0xff$mk%02x — baseline decoder")
        case 0xc4 => // DHT (possibly several tables)
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val tcth = bytes(p) & 0xff
            val bits = (1 to 16).map(i => bytes(p + i) & 0xff).toArray
            val nVals = bits.sum
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17,
              p + 17 + nVals)
            val t = new Huff(bits, vals)
            if ((tcth >> 4) == 0) dcT(tcth & 0xf) = t
            else acT(tcth & 0xf) = t
            p += 17 + nVals
          }
          pos += len
        case 0xdb => // DQT (possibly several tables)
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val pqtq = bytes(p) & 0xff
            require((pqtq >> 4) == 0, "16-bit quant tables not baseline")
            val nat = new Array[Int](64)
            var k = 0
            while (k < 64) {
              nat(Zigzag(k)) = bytes(p + 1 + k) & 0xff; k += 1
            }
            qt(pqtq & 0xf) = nat
            p += 65
          }
          pos += len
        case 0xdd =>
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xda =>
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xff
          require(comps != null && ns == comps.length,
            "non-interleaved scans not supported")
          (0 until ns).foreach { i =>
            val cid = bytes(pos + 3 + 2 * i) & 0xff
            val tdta = bytes(pos + 4 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"scan names comp $cid"))
            c.td = tdta >> 4; c.ta = tdta & 0xf
          }
          sosAt = pos + len
        case _ => pos += u16(pos) // APPn / COM / DNL etc.
      }
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuW = 8 * hmax
    val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // per-component plane at ITS resolution, MCU-padded
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(i =>
      new Array[Int](planeW(i) * planeH(i))).toArray
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val br = new BitReader(bytes, sosAt)
    var rst = 0
    var sinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          br.alignAndExpectRestart(rst)
          rst = (rst + 1) % 8
          java.util.Arrays.fill(preds, 0)
          sinceRestart = 0
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qt(c.tq)
          require(q != null, s"missing quant table ${c.tq}")
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(coef, 0)
              val t = br.decode(dcT(c.td))
              preds(ci) += extend(br.bits(t), t)
              coef(0) = preds(ci) * q(0)
              var k = 1
              while (k < 64) {
                val rs = br.decode(acT(c.ta))
                val r = rs >> 4; val s = rs & 0xf
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += r
                  require(k < 64, "AC index overrun")
                  coef(Zigzag(k)) = extend(br.bits(s), s) * q(Zigzag(k))
                  k += 1
                }
              }
              idctInto(coef, planes(ci), planeW(ci),
                (mx * c.h + bx) * 8, (my * c.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        sinceRestart += 1
        mx += 1
      }
      my += 1
    }

    // crop + upsample (pixel replication) to full resolution
    def fullPlane(ci: Int): Array[Int] = {
      val c = comps(ci)
      val out = new Array[Int](w * h)
      val pw = planeW(ci)
      var yy = 0
      while (yy < h) {
        val sy = yy * c.v / vmax
        var xx = 0
        while (xx < w) {
          out(yy * w + xx) = planes(ci)(sy * pw + (xx * c.h / hmax))
          xx += 1
        }
        yy += 1
      }
      out
    }
    if (comps.length == 1) JpegImage(w, h, fullPlane(0), null, null)
    else JpegImage(w, h, fullPlane(0), fullPlane(1), fullPlane(2))
  }

  /** Separable IDCT: rows then columns over [[Basis]], +128 level
    * shift, clamp to 0–255, written at (ox, oy) of a plane.
    */
  private def idctInto(coef: Array[Int], plane: Array[Int], pw: Int,
                       ox: Int, oy: Int): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: tmp(y)(x) = Σ_u coef(y)(u)·B(u,x)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(y * 8 + u) * Basis(u)(x); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns: out(y)(x) = Σ_v tmp(v)(x)·B(v,y)
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * Basis(v)(yy); v += 1 }
        val px = clamp8(StrictMath.round(s).toInt + 128)
        plane((oy + yy) * pw + (ox + x)) = px
        yy += 1
      }
      x += 1
    }
  }
}
