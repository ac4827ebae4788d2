package graft.ops

/** JPEG codec in pure Scala — baseline sequential AND progressive
  * (SOF2), grayscale and YCbCr color.
  *
  * JPEG's "codec" is huffman entropy coding + dequantization + the
  * 8×8 inverse DCT: all integer/double arithmetic, no library needed.
  * The decoder reads the quantization and huffman tables FROM THE
  * FILE (DQT/DHT), handles byte stuffing, restart markers, ZRL/EOB
  * runs, and negative-coefficient ones'-complement extension.
  * Progressive streams (spec §G.2) decode through the full scan
  * machinery: spectral-selection band scans, successive-approximation
  * first and REFINEMENT scans (DC and AC, with EOB-run correction
  * bits), interleaved DC scans, and per-scan huffman table capture.
  * Arithmetic-coded, lossless, and hierarchical frames refuse with
  * None rather than mis-decode.
  *
  * Reference capability: xorq treats media as opaque bytes flowing
  * through exchange UDFs (expr/relations.py:580-823) and has no codec
  * either; this closes the plumbing's decode seam for real.
  *
  * Exactness: lossy codecs still decode DETERMINISTICALLY. Images
  * whose 8×8 blocks are constant have energy only in the DC
  * coefficient; with the uniform quant table the encoder writes,
  * round(8v/8)·8 survives quantization exactly and the IDCT returns
  * the constant — so block-constant fixtures round-trip bit-exact and
  * sit under the driver's hash gate, while arbitrary images carry the
  * usual bounded quantization error (spec-checked).
  */
object Jpeg {

  // JPEG zigzag scan order: zigzag(i) = raster index of the i-th
  // scanned coefficient (ISO/IEC 10918-1 Figure 5)
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var i = 0
    // walk anti-diagonals alternating direction
    var d = 0
    while (d < 15) {
      // even diagonals walk x ascending (up-right), odd descending
      val range = if (d % 2 == 0) (math.max(0, d - 7) to math.min(d, 7))
        else (math.min(d, 7) to math.max(0, d - 7) by -1)
      range.foreach { x =>
        val y = d - x
        z(i) = y * 8 + x
        i += 1
      }
      d += 1
    }
    z
  }

  // --------------------------------------------------- bit plumbing

  /** MSB-first bit writer with JPEG 0xFF byte stuffing. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def put(value: Int, bits: Int): Unit = {
      var k = bits - 1
      while (k >= 0) {
        cur = (cur << 1) | ((value >> k) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // byte stuffing
          cur = 0; nBits = 0
        }
        k -= 1
      }
    }
    /** Pad the current partial byte with 1s (spec: fill bits). */
    def align(): Unit = if (nBits > 0) put((1 << (8 - nBits)) - 1, 8 - nBits)
    /** Write a marker (not byte-stuffed); must be byte-aligned. */
    def rawMarker(m: Int): Unit = { align(); out.write(0xff); out.write(m) }
    def flush(): Array[Byte] = { align(); out.toByteArray }
  }

  /** MSB-first bit reader over entropy-coded data with un-stuffing;
    * stops cleanly at any non-RST marker. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nBits = 0
    var hitMarker = false
    /** -1 on exhausted input. */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) return -1
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) return -1
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else if (m >= 0xd0 && m <= 0xd7) { // RSTn: caller resyncs
            hitMarker = true; pos -= 1; return -1
          } else { hitMarker = true; pos -= 1; return -1 }
        }
        cur = b; nBits = 8
      }
      nBits -= 1
      (cur >> nBits) & 1
    }
    /** Consume an expected RSTn marker and realign. True on success. */
    def restart(): Boolean = {
      nBits = 0
      if (pos + 1 >= data.length || (data(pos) & 0xff) != 0xff) return false
      val m = data(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2; hitMarker = false
      true
    }
  }

  // --------------------------------------------------- huffman

  /** Canonical huffman decode table built per the JPEG spec from the
    * DHT (bits, huffval) arrays: mincode/maxcode/valptr per length. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    /** Read one symbol; -1 on error/exhaustion. */
    def decode(br: BitReader): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        val b = br.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return vals(valPtr(l) + code - minCode(l))
        l += 1
      }
      -1
    }
    /** Encoder view: symbol → (code, length). */
    val encode: Map[Int, (Int, Int)] = {
      var code = 0; var k = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          m += vals(k) -> (code, l)
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
      m.result()
    }
  }

  // Writer-side tables: flat canonical codes (12 DC categories at 4
  // bits, all 162 run/size AC symbols at 8 bits — max assigned code
  // stays below all-ones, as the spec requires). The DHT segment
  // embeds them, so any baseline decoder reads this file.
  private val DcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  private val AcVals: Array[Int] = {
    val syms = Array.newBuilder[Int]
    syms += 0x00 // EOB
    for (run <- 0 to 15; size <- 1 to 10) syms += (run << 4) | size
    syms += 0xf0 // ZRL
    syms.result()
  }
  private val AcBits: Array[Int] = {
    val b = new Array[Int](16)
    b(7) = AcVals.length // all 162 symbols at length 8
    b
  }

  // --------------------------------------------------- DCT

  private val CosTable: Array[Double] = {
    val t = new Array[Double](8 * 8)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private def c(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 8×8 DCT of level-shifted samples (row-major 64). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) * CosTable(x * 8 + u) * CosTable(y * 8 + v)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = 0.25 * c(u) * c(v) * s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse 8×8 DCT → level-shifted samples. */
  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            s += c(u) * c(v) * coef(v * 8 + u) *
              CosTable(x * 8 + u) * CosTable(y * 8 + v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    out
  }

  // --------------------------------------------------- encode

  /** Quantize and entropy-code one level-shifted 8×8 block with the
    * writer-side flat tables; returns the new DC predictor. */
  private def emitBlock(bw: BitWriter, dcTab: Map[Int, (Int, Int)],
      acTab: Map[Int, (Int, Int)], shifted: Array[Double], quant: Int,
      prevDc: Int): Int = {
    def category(v: Int): Int = { // bit length of |v|
      var a = math.abs(v); var n = 0
      while (a > 0) { a >>= 1; n += 1 }
      n
    }
    val coefs = fdct(shifted)
    val q = new Array[Int](64)
    var i = 0
    while (i < 64) {
      q(i) = math.round(coefs(Zigzag(i)) / quant).toInt
      i += 1
    }
    // DC: category + ones'-complement-extended diff bits
    val diff = q(0) - prevDc
    val s = category(diff)
    val (dcCode, dcLen) = dcTab(s)
    bw.put(dcCode, dcLen)
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    // AC: run/size symbols in zigzag order
    var run = 0
    i = 1
    while (i < 64) {
      if (q(i) == 0) run += 1
      else {
        while (run > 15) {
          val (c, l) = acTab(0xf0); bw.put(c, l); run -= 16
        }
        val sz = category(q(i))
        val (c, l) = acTab((run << 4) | sz)
        bw.put(c, l)
        bw.put(if (q(i) >= 0) q(i) else q(i) + (1 << sz) - 1, sz)
        run = 0
      }
      i += 1
    }
    if (run > 0) { val (c, l) = acTab(0x00); bw.put(c, l) } // EOB
    q(0)
  }

  /** Encode a genuine baseline-sequential grayscale JPEG (SOI, DQT,
    * SOF0, DHT×2, SOS, entropy-coded scan with byte stuffing, EOI)
    * from row-major 0-255 values. Dimensions need not be multiples of
    * 8 — edge blocks replicate the last row/column, as real encoders
    * do. `quant` fills a uniform quantization table; 8 keeps
    * block-constant images bit-exact through the round trip. */
  def encodeGray(w: Int, h: Int, px: Array[Int], quant: Int = 8,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h,
      s"encodeGray: expected ${w * h} values, got ${px.length}")
    // quant 1 could need DC category 12 / AC size 11 on adversarial
    // inputs (basis-aligned ±128 images) — outside baseline's tables
    require(quant >= 2 && quant <= 255, "quant must be 2..255")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT, table 0, 8-bit
    (0 until 64).foreach(_ => out.write(quant))
    marker(0xc0) // SOF0 baseline
    u16(8 + 3 * 1); out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // comp 1, 1×1, qtable 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write(cls << 4)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    if (restartInterval > 0) { // DRI
      marker(0xdd); u16(4); u16(restartInterval)
    }
    marker(0xda) // SOS
    u16(6 + 2 * 1); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al
    val dcTab = new HuffTable(DcBits, DcVals).encode
    val acTab = new HuffTable(AcBits, AcVals).encode
    val bw = new BitWriter
    var prevDc = 0
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val shifted = new Array[Double](64)
    var mcu = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.rawMarker(0xd0 + ((mcu / restartInterval - 1) % 8))
          prevDc = 0
        }
        var i = 0
        while (i < 64) {
          // clamp-replicate edge samples into partial blocks
          val sy = math.min(by * 8 + i / 8, h - 1)
          val sx = math.min(bx * 8 + i % 8, w - 1)
          shifted(i) = px(sy * w + sx) - 128.0
          i += 1
        }
        prevDc = emitBlock(bw, dcTab, acTab, shifted, quant, prevDc)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    out.write(bw.flush())
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a genuine baseline COLOR JPEG (BT.601/JFIF YCbCr, box-
    * average chroma downsampling) from row-major interleaved RGB.
    * `lumaH`/`lumaV` are the luma sampling factors: (1,1) = 4:4:4,
    * (2,1) = 4:2:2, (2,2) = 4:2:0 — the layouts real encoders emit.
    * The color transform stays full-precision double until each
    * block's DCT, so constant-color images are DC-only per plane and
    * round-trip deterministically (integer-rounded once per plane). */
  def encodeColorRgb(w: Int, h: Int, rgb: Array[Int], quant: Int = 8,
      lumaH: Int = 2, lumaV: Int = 2): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodeColorRgb: expected ${w * h * 3} values, got ${rgb.length}")
    require(quant >= 2 && quant <= 255, "quant must be 2..255")
    require(lumaH >= 1 && lumaH <= 2 && lumaV >= 1 && lumaV <= 2,
      "sampling factors must be 1 or 2")
    val yP = new Array[Double](w * h)
    val cbFull = new Array[Double](w * h)
    val crFull = new Array[Double](w * h)
    var i = 0
    while (i < w * h) {
      val r = rgb(3 * i); val g = rgb(3 * i + 1); val b = rgb(3 * i + 2)
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
      cbFull(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
      crFull(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
      i += 1
    }
    val cw = (w + lumaH - 1) / lumaH
    val ch = (h + lumaV - 1) / lumaV
    def down(src: Array[Double]): Array[Double] =
      if (lumaH == 1 && lumaV == 1) src
      else {
        val o = new Array[Double](cw * ch)
        var y = 0
        while (y < ch) {
          var x = 0
          while (x < cw) {
            var s = 0.0; var n = 0
            var dy = 0
            while (dy < lumaV) {
              var dx = 0
              while (dx < lumaH) {
                val sx = x * lumaH + dx; val sy = y * lumaV + dy
                if (sx < w && sy < h) { s += src(sy * w + sx); n += 1 }
                dx += 1
              }
              dy += 1
            }
            o(y * cw + x) = s / n
            x += 1
          }
          y += 1
        }
        o
      }
    val cbP = down(cbFull); val crP = down(crFull)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8)
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00)
    (0 until 64).foreach(_ => out.write(quant))
    marker(0xc0); u16(8 + 3 * 3); out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write((lumaH << 4) | lumaV); out.write(0) // Y
    out.write(2); out.write(0x11); out.write(0)                 // Cb
    out.write(3); out.write(0x11); out.write(0)                 // Cr
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write(cls << 4)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    marker(0xda); u16(6 + 2 * 3); out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x00)
    out.write(3); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val dcT = new HuffTable(DcBits, DcVals).encode
    val acT = new HuffTable(AcBits, AcVals).encode
    val bw = new BitWriter
    val mcusX = (w + 8 * lumaH - 1) / (8 * lumaH)
    val mcusY = (h + 8 * lumaV - 1) / (8 * lumaV)
    val shifted = new Array[Double](64)
    def loadBlock(plane: Array[Double], pw: Int, ph: Int, bx: Int,
        by: Int): Unit = {
      var k = 0
      while (k < 64) {
        val sy = math.min(by * 8 + k / 8, ph - 1)
        val sx = math.min(bx * 8 + k % 8, pw - 1)
        shifted(k) = plane(sy * pw + sx) - 128.0
        k += 1
      }
    }
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var by = 0
        while (by < lumaV) {
          var bx = 0
          while (bx < lumaH) {
            loadBlock(yP, w, h, mx * lumaH + bx, my * lumaV + by)
            dcY = emitBlock(bw, dcT, acT, shifted, quant, dcY)
            bx += 1
          }
          by += 1
        }
        loadBlock(cbP, cw, ch, mx, my)
        dcCb = emitBlock(bw, dcT, acT, shifted, quant, dcCb)
        loadBlock(crP, cw, ch, mx, my)
        dcCr = emitBlock(bw, dcT, acT, shifted, quant, dcCr)
        mx += 1
      }
      my += 1
    }
    out.write(bw.flush())
    marker(0xd9)
    out.toByteArray
  }

  // --------------------------------------------------- decode

  /** Decode a baseline-sequential GRAYSCALE JPEG: (width, height,
    * row-major 0-255 values). Delegates to [[decode]] and refuses
    * color frames. */
  /** Encode a genuine PROGRESSIVE JPEG (SOF2, spec §G): grayscale or
    * 4:4:4 color, six/ten scans using both progressive dimensions —
    * spectral selection (DC scan, AC band 1-5, AC band 6-63) and
    * successive approximation (first scans at Al=1, then DC and AC
    * refinement scans appending bit 0). The refinement emitters mirror
    * the decoder's bit order exactly (correction bits buffered between
    * symbols, flushed after each symbol/EOB — the §G.1.2.3 discipline
    * libjpeg implements). The coefficient stream is the SAME quantized
    * data a sequential encode produces, so a progressive round trip
    * must decode pixel-identical to the sequential one — which is what
    * JpegSpec asserts. */
  def encodeProgressive(w: Int, h: Int, channels: Int, px: Array[Int],
      quant: Int = 8): Array[Byte] = {
    require(channels == 1 || channels == 3,
      s"encodeProgressive: channels must be 1 or 3, got $channels")
    require(w > 0 && h > 0 && px.length == w * h * channels,
      s"encodeProgressive: expected ${w * h * channels} values")
    require(quant >= 2 && quant <= 255, "quant must be 2..255")
    // ---- color transform to per-component planes (0-255 domain)
    val planes: Array[Array[Double]] =
      if (channels == 1) Array(px.map(_.toDouble))
      else {
        val yP = new Array[Double](w * h)
        val cbP = new Array[Double](w * h)
        val crP = new Array[Double](w * h)
        var i = 0
        while (i < w * h) {
          val r = px(3 * i); val g = px(3 * i + 1); val b = px(3 * i + 2)
          yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
          cbP(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
          crP(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
          i += 1
        }
        Array(yP, cbP, crP)
      }
    // ---- forward DCT + quantize every block (zigzag-ordered ints)
    val bXn = (w + 7) / 8
    val bYn = (h + 7) / 8
    val shifted = new Array[Double](64)
    val coefs: Array[Array[Int]] = planes.map { plane =>
      val co = new Array[Int](bXn * bYn * 64)
      var by = 0
      while (by < bYn) {
        var bx = 0
        while (bx < bXn) {
          var i = 0
          while (i < 64) {
            val sy = math.min(by * 8 + i / 8, h - 1)
            val sx = math.min(bx * 8 + i % 8, w - 1)
            shifted(i) = plane(sy * w + sx) - 128.0
            i += 1
          }
          val f = fdct(shifted)
          val base = (by * bXn + bx) * 64
          var zz = 0
          while (zz < 64) {
            co(base + zz) = math.round(f(Zigzag(zz)) / quant).toInt
            zz += 1
          }
          bx += 1
        }
        by += 1
      }
      co
    }
    // ---- headers
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00)
    (0 until 64).foreach(_ => out.write(quant))
    marker(0xc2) // SOF2 progressive
    u16(8 + 3 * channels); out.write(8); u16(h); u16(w); out.write(channels)
    (0 until channels).foreach { c =>
      out.write(c + 1); out.write(0x11); out.write(0) // 1×1, qtable 0
    }
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write(cls << 4)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    val dcTab = new HuffTable(DcBits, DcVals).encode
    val acTab = new HuffTable(AcBits, AcVals).encode
    def sos(cs: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); u16(6 + 2 * cs.length); out.write(cs.length)
      cs.foreach { c => out.write(c + 1); out.write(0x00) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    def category(v: Int): Int = {
      var a = math.abs(v); var n = 0
      while (a > 0) { a >>= 1; n += 1 }
      n
    }
    val allComps = 0 until channels
    val nBlocks = bXn * bYn
    // ---- scan 1: DC first, Al=1 (interleaved when color)
    sos(allComps, 0, 0, 0, 1)
    locally {
      val bw = new BitWriter
      val prevDc = new Array[Int](channels)
      var bi = 0
      while (bi < nBlocks) {
        allComps.foreach { ci =>
          val v = coefs(ci)(bi * 64) >> 1 // DC point transform: arith shift
          val diff = v - prevDc(ci); prevDc(ci) = v
          val s = category(diff)
          val (c0, l0) = dcTab(s); bw.put(c0, l0)
          if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        }
        bi += 1
      }
      out.write(bw.flush())
    }
    // ---- AC first scans per component, Al=1, split bands
    def acFirstScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(ci), ss, se, 0, al)
      val bw = new BitWriter
      val co = coefs(ci)
      var bi = 0
      while (bi < nBlocks) {
        val base = bi * 64
        var r = 0
        var k = ss
        while (k <= se) {
          val t = co(base + k)
          val v = { val m = math.abs(t) >> al; if (t < 0) -m else m }
          if (v == 0) r += 1
          else {
            while (r > 15) {
              val (zc, zl) = acTab(0xf0); bw.put(zc, zl); r -= 16
            }
            val s = category(v)
            val (c0, l0) = acTab((r << 4) | s); bw.put(c0, l0)
            bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
            r = 0
          }
          k += 1
        }
        if (r > 0) { val (c0, l0) = acTab(0x00); bw.put(c0, l0) } // EOB
        bi += 1
      }
      out.write(bw.flush())
    }
    val bands = Seq((1, 5), (6, 63))
    allComps.foreach { ci =>
      bands.foreach { case (ss, se) => acFirstScan(ci, ss, se, 1) }
    }
    // ---- DC refinement: one raw bit per block (interleaved when color)
    sos(allComps, 0, 0, 1, 0)
    locally {
      val bw = new BitWriter
      var bi = 0
      while (bi < nBlocks) {
        allComps.foreach { ci => bw.put(coefs(ci)(bi * 64) & 1, 1) }
        bi += 1
      }
      out.write(bw.flush())
    }
    // ---- AC refinement scans: mirror the decoder's §G.1.2.3 bit order
    def acRefineScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(ci), ss, se, al + 1, al)
      val bw = new BitWriter
      val co = coefs(ci)
      var bi = 0
      while (bi < nBlocks) {
        val base = bi * 64
        val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
        def flush(): Unit = {
          pending.foreach(b => bw.put(b, 1)); pending.clear()
        }
        var r = 0
        var k = ss
        while (k <= se) {
          val t = co(base + k)
          val temp = math.abs(t) >> al
          if (temp == 0) r += 1
          else {
            // drain ZRLs at EVERY nonzero position so buffered
            // correction bits never span a ZRL (the djpeg invariant)
            while (r > 15) {
              val (zc, zl) = acTab(0xf0); bw.put(zc, zl); r -= 16
              flush()
            }
            if (temp > 1) pending += (temp & 1) // history coef: one bit
            else { // newly nonzero: run/1 symbol + sign + buffered bits
              val (c0, l0) = acTab((r << 4) | 1); bw.put(c0, l0)
              bw.put(if (t < 0) 0 else 1, 1)
              flush()
              r = 0
            }
          }
          k += 1
        }
        if (r > 0 || pending.nonEmpty) { // EOB terminates the block
          val (c0, l0) = acTab(0x00); bw.put(c0, l0)
          flush()
        }
        bi += 1
      }
      out.write(bw.flush())
    }
    allComps.foreach { ci =>
      bands.foreach { case (ss, se) => acRefineScan(ci, ss, se, 0) }
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decode(bytes) match {
      case Some((w, h, 1, px)) => Some((w, h, px))
      case _ => None
    }

  /** One frame component: id, sampling factors, quant table, and the
    * huffman table ids bound by the scan header. */
  private final class Comp(val id: Int, val hs: Int, val vs: Int,
    val tq: Int) { var td: Int = 0; var ta: Int = 0 }

  /** One progressive scan: participating frame-component indices with
    * the huffman tables in effect AT SOS TIME (DHT may redefine tables
    * between scans), the spectral band [ss, se], successive-
    * approximation bit positions (ah high, al low), the entropy-data
    * offset, and the restart interval in effect. */
  private final class PScan(val cis: Array[Int],
    val dc: Array[HuffTable], val ac: Array[HuffTable],
    val ss: Int, val se: Int, val ah: Int, val al: Int,
    val start: Int, val rst: Int)

  /** Sign-extend an s-bit magnitude-coded value (spec F.12 EXTEND). */
  private def extend(v: Int, s: Int): Int =
    if (s > 0 && v < (1 << (s - 1))) v - ((1 << s) - 1) else v

  /** Decode a baseline-sequential OR progressive JPEG: (width, height,
    * channels, row-major interleaved 0-255 values). channels = 1
    * (grayscale) or 3 (YCbCr → RGB). Tables come from the file's own
    * DQT/DHT segments; sampling factors up to 2×2 (4:4:4, 4:2:2,
    * 4:2:0) with replicated chroma upsampling; restart markers
    * honored. Progressive frames accumulate coefficients across all
    * scans (spectral selection + successive approximation, §G.2)
    * before one IDCT pass. Arithmetic/lossless/hierarchical frames,
    * >2 sampling factors, and corrupt streams → None. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
      (bytes(1) & 0xff) != 0xd8) return None
    def beU16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    var w = 0; var h = 0
    var qTables = Map.empty[Int, Array[Int]] // natural (raster) order
    var dcTables = Map.empty[Int, HuffTable]
    var acTables = Map.empty[Int, HuffTable]
    var comps: Array[Comp] = null
    var restartInterval = 0
    var progressive = false
    val pScans = scala.collection.mutable.ArrayBuffer.empty[PScan]
    var i = 2
    var scanStart = -1
    var headerEnd = false
    while (scanStart < 0 && !headerEnd && i + 4 <= bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None
      val m = bytes(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill byte before a marker
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else if (m == 0xd9) { // EOI: ends a progressive scan sequence
        if (progressive && pScans.nonEmpty) headerEnd = true
        else return None
      }
      else {
        val len = beU16(i + 2)
        val body = i + 4
        if (len < 2 || body + len - 2 > bytes.length) return None
        m match {
          case 0xdb => // DQT: possibly several tables in one segment
            var p = body
            while (p < body + len - 2) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              if (pq != 0) return None // 16-bit tables unsupported
              if (p + 65 > bytes.length) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(Zigzag(k)) = bytes(p + 1 + k) & 0xff
                k += 1
              }
              qTables += tq -> t
              p += 65
            }
          case 0xc4 => // DHT: possibly several tables
            var p = body
            while (p < body + len - 2) {
              val cls = (bytes(p) & 0xff) >> 4
              val id = bytes(p) & 0x0f
              val bits = Array.tabulate(16)(k => bytes(p + 1 + k) & 0xff)
              val n = bits.sum
              if (p + 17 + n > bytes.length) return None
              val vals = Array.tabulate(n)(k => bytes(p + 17 + k) & 0xff)
              val tab = new HuffTable(bits, vals)
              if (cls == 0) dcTables += id -> tab else acTables += id -> tab
              p += 17 + n
            }
          case 0xc0 | 0xc1 | 0xc2 => // baseline / ext-sequential / PROGRESSIVE
            if (bytes(body) != 8) return None
            progressive = m == 0xc2
            h = beU16(body + 1); w = beU16(body + 3)
            val nComp = bytes(body + 5) & 0xff
            if (nComp != 1 && nComp != 3) return None
            comps = Array.tabulate(nComp) { k =>
              val p = body + 6 + 3 * k
              val hs = (bytes(p + 1) & 0xff) >> 4
              val vs = bytes(p + 1) & 0x0f
              new Comp(bytes(p) & 0xff, hs, vs, bytes(p + 2) & 0x0f)
            }
            // single-component scans are non-interleaved: sampling
            // factors are ignored (spec A.2) — normalize to 1×1
            if (nComp == 1) comps = Array(
              new Comp(comps(0).id, 1, 1, comps(0).tq))
            if (comps.exists(c => c.hs < 1 || c.hs > 2 || c.vs < 1 ||
              c.vs > 2)) return None
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
            return None // lossless/arithmetic/hierarchical
          case 0xdd =>
            restartInterval = beU16(body)
          case 0xda => // SOS: bind huffman table ids to components
            val nComp = bytes(body) & 0xff
            if (comps == null || nComp < 1 || nComp > comps.length)
              return None
            if (body + 4 + 2 * nComp > bytes.length) return None
            val scanCis = new Array[Int](nComp)
            var k = 0
            while (k < nComp) {
              val cid = bytes(body + 1 + 2 * k) & 0xff
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              scanCis(k) = ci
              comps(ci).td = (bytes(body + 2 + 2 * k) & 0xff) >> 4
              comps(ci).ta = bytes(body + 2 + 2 * k) & 0x0f
              k += 1
            }
            if (!progressive) {
              if (nComp != comps.length) return None
              scanStart = body + len - 2
            } else {
              val ss = bytes(body + 1 + 2 * nComp) & 0xff
              val se = bytes(body + 2 + 2 * nComp) & 0xff
              val ahAl = bytes(body + 3 + 2 * nComp) & 0xff
              val (ah, al) = (ahAl >> 4, ahAl & 0x0f)
              if (ss > 63 || se > 63 || se < ss) return None
              if (ss == 0 && se != 0) return None // DC scans are DC-only
              if (ss > 0 && nComp != 1) return None // AC: single comp
              // capture the tables in effect NOW; refinement-only scans
              // that never huffman-decode may omit them (null is fine —
              // the scan loop validates at use)
              val dcT = scanCis.map(ci =>
                dcTables.getOrElse(comps(ci).td, null))
              val acT = scanCis.map(ci =>
                acTables.getOrElse(comps(ci).ta, null))
              val start = body + len - 2
              pScans += new PScan(scanCis, dcT, acT, ss, se, ah, al,
                start, restartInterval)
              // skip the entropy-coded segment: next non-stuffed,
              // non-RST marker starts the next header
              var p = start
              var stop = -1
              while (stop < 0 && p + 1 < bytes.length) {
                if ((bytes(p) & 0xff) == 0xff) {
                  val mm = bytes(p + 1) & 0xff
                  if (mm != 0x00 && !(mm >= 0xd0 && mm <= 0xd7)) stop = p
                  else p += 2
                } else p += 1
              }
              i = if (stop >= 0) stop else bytes.length
            }
          case _ => () // APPn/COM/etc: skip
        }
        if (scanStart < 0 && !(progressive && m == 0xda))
          i = body + len - 2
      }
    }
    if (w <= 0 || h <= 0 || comps == null) return None
    if (!progressive && scanStart < 0) return None
    if (progressive && pScans.isEmpty) return None
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component block-padded planes at sampled resolution
    val planeW = comps.map(c => mcusX * c.hs * 8)
    val planes = comps.zipWithIndex.map { case (c, ci) =>
      new Array[Int](planeW(ci) * mcusY * c.vs * 8) }
    val quants = comps.map(c => qTables.getOrElse(c.tq, return None))

    if (progressive) {
      if (!decodeProgressive(bytes, comps, w, h, pScans.toSeq, hmax, vmax,
        mcusX, mcusY, quants, planes, planeW)) return None
      return emitPixels(w, h, comps, hmax, vmax, planes, planeW)
    }

    val dcTabs = comps.map(c => dcTables.getOrElse(c.td, return None))
    val acTabs = comps.map(c => acTables.getOrElse(c.ta, return None))
    val br = new BitReader(bytes, scanStart)
    val prevDc = new Array[Int](comps.length)
    val coef = new Array[Double](64)

    /** Decode one entropy-coded block of component ci into its plane
      * at block position (bx, by); false on corrupt data. */
    def block(ci: Int, bx: Int, by: Int): Boolean = {
      val quant = quants(ci)
      java.util.Arrays.fill(coef, 0.0)
      val s = dcTabs(ci).decode(br)
      if (s < 0 || s > 11) return false
      var diff = 0
      if (s > 0) {
        var k = 0
        while (k < s) {
          val b = br.bit(); if (b < 0) return false
          diff = (diff << 1) | b
          k += 1
        }
        if (diff < (1 << (s - 1))) diff -= (1 << s) - 1
      }
      prevDc(ci) += diff
      coef(0) = prevDc(ci).toDouble * quant(0)
      var zz = 1
      var eob = false
      while (zz < 64 && !eob) {
        val sym = acTabs(ci).decode(br)
        if (sym < 0) return false
        if (sym == 0x00) eob = true
        else if (sym == 0xf0) zz += 16
        else {
          val run = sym >> 4
          val size = sym & 0x0f
          zz += run
          if (zz > 63 || size == 0) return false
          var v = 0
          var k = 0
          while (k < size) {
            val b = br.bit(); if (b < 0) return false
            v = (v << 1) | b
            k += 1
          }
          if (v < (1 << (size - 1))) v -= (1 << size) - 1
          // both coef and the parsed quant table are in natural
          // (raster) order; zz is the zigzag position
          coef(Zigzag(zz)) = v.toDouble * quant(Zigzag(zz))
          zz += 1
        }
      }
      val samples = idct(coef)
      val pw = planeW(ci)
      val plane = planes(ci)
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          val v = math.round(samples(yy * 8 + xx) + 128.0).toInt
          plane((by * 8 + yy) * pw + bx * 8 + xx) =
            math.max(0, math.min(255, v))
          xx += 1
        }
        yy += 1
      }
      true
    }

    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.restart()) return None
          java.util.Arrays.fill(prevDc, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var by = 0
          while (by < c.vs) {
            var bx = 0
            while (bx < c.hs) {
              if (!block(ci, mx * c.hs + bx, my * c.vs + by)) return None
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    emitPixels(w, h, comps, hmax, vmax, planes, planeW)
  }

  /** Crop/upsample decoded planes to interleaved output pixels:
    * grayscale pass-through or replicated chroma upsampling +
    * BT.601/JFIF YCbCr → RGB. */
  private def emitPixels(w: Int, h: Int, comps: Array[Comp], hmax: Int,
      vmax: Int, planes: Array[Array[Int]],
      planeW: Array[Int]): Option[(Int, Int, Int, Array[Int])] = {
    if (comps.length == 1) {
      val out = new Array[Int](w * h)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = planes(0)(y * pw + x); x += 1 }
        y += 1
      }
      Some((w, h, 1, out))
    } else {
      val out = new Array[Int](w * h * 3)
      def sample(ci: Int, x: Int, y: Int): Int = {
        val c = comps(ci)
        planes(ci)((y * c.vs / vmax) * planeW(ci) + (x * c.hs / hmax))
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = sample(0, x, y).toDouble
          val cb = sample(1, x, y).toDouble
          val cr = sample(2, x, y).toDouble
          def clamp(d: Double): Int =
            math.max(0, math.min(255, math.round(d).toInt))
          val o = (y * w + x) * 3
          out(o) = clamp(yv + 1.402 * (cr - 128))
          out(o + 1) = clamp(yv - 0.344136 * (cb - 128) -
            0.714136 * (cr - 128))
          out(o + 2) = clamp(yv + 1.772 * (cb - 128))
          x += 1
        }
        y += 1
      }
      Some((w, h, 3, out))
    }
  }

  /** Decode a progressive (SOF2) scan sequence into coefficient arrays
    * (spec §G.2), then dequantize + IDCT every block into the planes.
    * Coefficients accumulate across scans: DC first/refine scans may be
    * interleaved over the scan's components; AC scans are single-
    * component over that component's own block grid. Successive
    * approximation: first scans code values at bit position Al
    * (point-transformed), refinement scans append one lower-order bit
    * per coefficient. Returns false on corrupt streams. */
  private def decodeProgressive(bytes: Array[Byte], comps: Array[Comp],
      w: Int, h: Int, scans: Seq[PScan], hmax: Int, vmax: Int,
      mcusX: Int, mcusY: Int, quants: Array[Array[Int]],
      planes: Array[Array[Int]], planeW: Array[Int]): Boolean = {
    val bX = comps.map(c => mcusX * c.hs) // padded (interleaved) grid
    val bY = comps.map(c => mcusY * c.vs)
    // non-interleaved scans cover only the component's OWN block grid
    val nbX = comps.map(c => ((w * c.hs + hmax - 1) / hmax + 7) / 8)
    val nbY = comps.map(c => ((h * c.vs + vmax - 1) / vmax + 7) / 8)
    val coefs = comps.indices
      .map(ci => new Array[Int](bX(ci) * bY(ci) * 64)).toArray

    for (scan <- scans) {
      val br = new BitReader(bytes, scan.start)
      val prevDc = new Array[Int](comps.length)
      var eobrun = 0
      var unit = 0 // MCUs (interleaved) or blocks since scan start
      def maybeRestart(): Boolean = {
        if (scan.rst > 0 && unit > 0 && unit % scan.rst == 0) {
          if (!br.restart()) return false
          java.util.Arrays.fill(prevDc, 0)
          eobrun = 0
        }
        true
      }
      def readBits(n: Int): Int = { // -1 on exhausted input
        var v = 0; var k = 0
        while (k < n) {
          val b = br.bit(); if (b < 0) return -1
          v = (v << 1) | b; k += 1
        }
        v
      }

      def dcFirst(si: Int, ci: Int, base: Int): Boolean = {
        val tab = scan.dc(si); if (tab == null) return false
        val s = tab.decode(br)
        if (s < 0 || s > 11) return false
        var diff = 0
        if (s > 0) {
          val v = readBits(s); if (v < 0) return false
          diff = extend(v, s)
        }
        prevDc(ci) += diff
        coefs(ci)(base) = prevDc(ci) << scan.al
        true
      }
      def dcRefine(ci: Int, base: Int): Boolean = {
        val b = br.bit(); if (b < 0) return false
        if (b == 1) coefs(ci)(base) |= 1 << scan.al
        true
      }
      def acFirst(si: Int, co: Array[Int], base: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        val tab = scan.ac(si); if (tab == null) return false
        var k = scan.ss
        while (k <= scan.se) {
          val sym = tab.decode(br); if (sym < 0) return false
          val r = sym >> 4; val s = sym & 15
          if (s != 0) {
            k += r
            if (k > scan.se) return false
            val v = readBits(s); if (v < 0) return false
            co(base + k) = extend(v, s) << scan.al
            k += 1
          } else if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1 // current block counts itself
            if (r > 0) {
              val v = readBits(r); if (v < 0) return false
              eobrun += v
            }
            return true
          }
        }
        true
      }
      def acRefine(si: Int, co: Array[Int], base: Int): Boolean = {
        val p1 = 1 << scan.al; val m1 = -1 << scan.al
        def correct(k: Int): Boolean = {
          val cv = co(base + k)
          val b = br.bit(); if (b < 0) return false
          if (b == 1 && (cv & p1) == 0)
            co(base + k) = cv + (if (cv >= 0) p1 else m1)
          true
        }
        var k = scan.ss
        if (eobrun == 0) {
          val tab = scan.ac(si); if (tab == null) return false
          var broke = false
          while (k <= scan.se && !broke) {
            val sym = tab.decode(br); if (sym < 0) return false
            var r = sym >> 4; val s = sym & 15
            var newVal = 0
            if (s == 0) {
              if (r != 15) { // EOBn: run length, then correction tail
                eobrun = 1 << r
                if (r > 0) {
                  val v = readBits(r); if (v < 0) return false
                  eobrun += v
                }
                broke = true
              }
              // r == 15 (ZRL): advance over 16 zero-history coefs
            } else {
              if (s != 1) return false // refinement codes only ±1
              val b = br.bit(); if (b < 0) return false
              newVal = if (b == 1) p1 else m1
            }
            if (!broke) {
              var placed = false
              while (k <= scan.se && !placed) {
                if (co(base + k) != 0) {
                  if (!correct(k)) return false
                  k += 1
                } else if (r == 0) {
                  if (newVal != 0) co(base + k) = newVal
                  k += 1
                  placed = true
                } else { r -= 1; k += 1 }
              }
              if (!placed && newVal != 0) return false // run past band
            }
          }
        }
        if (eobrun > 0) { // correction bits for the rest of the band
          while (k <= scan.se) {
            if (co(base + k) != 0 && !correct(k)) return false
            k += 1
          }
          eobrun -= 1
        }
        true
      }

      val interleaved = scan.cis.length > 1
      if (scan.ss == 0) { // DC scan (first or refinement)
        if (interleaved) {
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              if (!maybeRestart()) return false
              var si = 0
              while (si < scan.cis.length) {
                val ci = scan.cis(si)
                val c = comps(ci)
                var by = 0
                while (by < c.vs) {
                  var bx = 0
                  while (bx < c.hs) {
                    val bi = (my * c.vs + by) * bX(ci) + mx * c.hs + bx
                    val ok = if (scan.ah == 0) dcFirst(si, ci, bi * 64)
                      else dcRefine(ci, bi * 64)
                    if (!ok) return false
                    bx += 1
                  }
                  by += 1
                }
                si += 1
              }
              unit += 1
              mx += 1
            }
            my += 1
          }
        } else {
          val ci = scan.cis(0)
          var by = 0
          while (by < nbY(ci)) {
            var bx = 0
            while (bx < nbX(ci)) {
              if (!maybeRestart()) return false
              val bi = by * bX(ci) + bx
              val ok = if (scan.ah == 0) dcFirst(0, ci, bi * 64)
                else dcRefine(ci, bi * 64)
              if (!ok) return false
              unit += 1
              bx += 1
            }
            by += 1
          }
        }
      } else { // AC scan: always single-component
        if (interleaved) return false
        val ci = scan.cis(0)
        val co = coefs(ci)
        var by = 0
        while (by < nbY(ci)) {
          var bx = 0
          while (bx < nbX(ci)) {
            if (!maybeRestart()) return false
            val base = (by * bX(ci) + bx) * 64
            val ok = if (scan.ah == 0) acFirst(0, co, base)
              else acRefine(0, co, base)
            if (!ok) return false
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
    }

    // all scans applied: dequantize + IDCT every block into the planes
    val coefD = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val quant = quants(ci)
      val co = coefs(ci)
      val pw = planeW(ci)
      val plane = planes(ci)
      var by = 0
      while (by < bY(ci)) {
        var bx = 0
        while (bx < bX(ci)) {
          val base = (by * bX(ci) + bx) * 64
          var zz = 0
          while (zz < 64) {
            val nat = Zigzag(zz)
            coefD(nat) = co(base + zz).toDouble * quant(nat)
            zz += 1
          }
          val samples = idct(coefD)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val v = math.round(samples(yy * 8 + xx) + 128.0).toInt
              plane((by * 8 + yy) * pw + bx * 8 + xx) =
                math.max(0, math.min(255, v))
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    true
  }

}
