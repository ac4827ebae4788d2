package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed decode.
  *
  * The reference treats non-tabular payloads as byte columns flowing
  * through table-in/table-out exchange functions (xorq flight UDXF,
  * expr/relations.py:580-823). The Spark-native shape is the same: a
  * `binary` column, decoded partition-by-partition by a typed function
  * with an explicit output schema — here `Dataset#mapPartitions` over a
  * case-class row, the Scala analogue of `mapInPandas` batches.
  *
  * Decode status: header metadata parsing is REAL for
  * PNG/JPEG/GIF/BMP/WAV ([[sniff]]), and pixel/sample decode is REAL
  * for all five formats — 24-bit uncompressed BMP ([[decodeBmp]]),
  * PCM16 WAV ([[decodeWavPcm16]]), PNG ([[decodePng]] — JDK
  * `Inflater` zlib stream + all five scanline unfilters; 8/16-bit
  * gray/RGB/RGBA, palette at depths 1/2/4/8, plain or Adam7
  * interlaced), GIF ([[decodeGif]] — variable-width LZW written
  * here, global or local palette), and baseline JPEG, grayscale AND
  * YCbCr color, baseline AND progressive ([[graft.ops.Jpeg]] —
  * huffman entropy decode + dequant + IDCT + chroma upsample +
  * spectral-selection/successive-approximation scan accumulation,
  * tables read from the file). Remaining declared limits:
  * arithmetic-coded JPEG and sub-8-bit grayscale PNG refuse with
  * None rather than mis-decode. The Spark-side contract — binary
  * column in, typed struct out, partition-local, no shuffle, no
  * driver collect — is identical across all of them and is what
  * survives a codec swap at 100 TB.
  */
object Multimodal {

  /** Decoded "media" metadata (fake). */
  final case class Decoded(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      head_csv: String)

  /** Attach an opaque binary payload column derived from text (stand-in
    * for a real image/audio column in the driver's synthetic data). */
  def withBinaryPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  // ------------------------------------------- REAL header sniffing

  /** Parsed container-format metadata — REAL byte-level parsing, no
    * codec required (the pixel/sample DECODE stays stubbed; container
    * headers are pure arithmetic). */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      sample_rate: Int,
      duration_ms: Long,
      n_bytes: Long)

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Sniff PNG / JPEG / GIF / BMP / WAV headers from raw bytes. The
    * formats' dimension fields are fixed-offset (or, for JPEG, found
    * by a marker scan) — standard container layouts, parseable without
    * any decoder. Unknown/truncated payloads degrade to format
    * "unknown" with zeroed fields, never a task failure. */
  def sniff(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    def unknown = MediaMeta(id, "unknown", 0, 0, 0, 0, 0L, n)
    try {
      if (bytes.length >= 24 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G') {
        // IHDR is always the first chunk: width@16 height@20 BE,
        // color type@25 → channel count
        val channels = if (bytes.length > 25) bytes(25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => 0
        } else 0
        MediaMeta(id, "png", beU32(bytes, 16).toInt, beU32(bytes, 20).toInt,
          channels, 0, 0L, n)
      } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8) {
        // JPEG: scan segment markers for a start-of-frame (C0-C3,
        // C5-C7, C9-CB, CD-CF); dims sit at fixed offsets inside it
        var i = 2
        var out: MediaMeta = unknown.copy(format = "jpeg")
        var done = false
        while (!done && i + 9 < bytes.length) {
          if ((bytes(i) & 0xff) != 0xff) done = true
          else {
            val marker = bytes(i + 1) & 0xff
            val len = beU16(bytes, i + 2)
            val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof) {
              out = MediaMeta(id, "jpeg", beU16(bytes, i + 7),
                beU16(bytes, i + 5), bytes(i + 9) & 0xff, 0, 0L, n)
              done = true
            } else i += 2 + len
          }
        }
        out
      } else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F') {
        MediaMeta(id, "gif", leU16(bytes, 6), leU16(bytes, 8), 3, 0, 0L, n)
      } else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M') {
        // biHeight is NEGATIVE for top-down row order — magnitude is
        // still the pixel height
        MediaMeta(id, "bmp", leU32(bytes, 18).toInt,
          math.abs(leU32(bytes, 22).toInt), 3, 0, 0L, n)
      } else if (bytes.length >= 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
        bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
        // canonical WAV: fmt chunk at 12 — channels@22, rate@24,
        // block align@32; data length@40 → duration
        val channels = leU16(bytes, 22)
        val rate = leU32(bytes, 24).toInt
        val blockAlign = leU16(bytes, 32)
        val dataLen = leU32(bytes, 40)
        val durationMs =
          if (rate > 0 && blockAlign > 0)
            dataLen * 1000L / (rate.toLong * blockAlign)
          else 0L
        MediaMeta(id, "wav", 0, 0, channels, rate, durationMs, n)
      } else unknown
    } catch { case _: IndexOutOfBoundsException => unknown }
  }

  /** Partition-local header extraction over a binary column — the same
    * mapPartitions shape as [[decodeStub]], but the parsing is real. */
  def sniffHeaders(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        sniff(id, if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull)
      })
  }

  // ------------------------------ REAL decode (codec-free formats)
  //
  // BMP (24-bit uncompressed) and WAV (PCM16) are pure byte layout —
  // no entropy coding, no codec library — so their PIXEL/SAMPLE decode
  // is implemented for real here. PNG and GIF decode are real too
  // (below): PNG's codec is JDK zlib, GIF's is an LZW written in this
  // file. Baseline grayscale JPEG decode lives in [[graft.ops.Jpeg]]
  // (huffman + dequant + IDCT, also written here).

  /** Decoded 24-bit BMP: (width, height, row-major TOP-DOWN RGB byte
    * values 0-255, 3 per pixel). Handles bottom-up (positive height)
    * and top-down (negative height) row order, 4-byte row padding, and
    * the BGR channel order on disk. None for anything that is not an
    * uncompressed 24bpp BMP. */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val off = leU32(bytes, 10).toInt
    val w = leU32(bytes, 18).toInt
    val hRaw = leU32(bytes, 22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = leU16(bytes, 28)
    val compression = leU32(bytes, 30)
    if (bpp != 24 || compression != 0L || w <= 0 || h == 0) return None
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + rowSize.toLong * h > bytes.length) return None
    val out = new Array[Int](w * h * 3)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      val base = off + srcRow * rowSize
      var x = 0
      while (x < w) {
        val src = base + x * 3
        val dst = (row * w + x) * 3
        out(dst) = bytes(src + 2) & 0xff     // R (disk order is BGR)
        out(dst + 1) = bytes(src + 1) & 0xff // G
        out(dst + 2) = bytes(src) & 0xff     // B
        x += 1
      }
      row += 1
    }
    Some((w, h, out))
  }

  /** Decoded PCM16 WAV: (channels, sample rate, interleaved samples).
    * Walks RIFF chunks (not fixed offsets — fmt/data may follow other
    * chunks), requires audio format 1 (PCM) at 16 bits. */
  def decodeWavPcm16(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (bytes.length < 44 || bytes(0) != 'R' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'W' ||
      bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    var channels = 0; var rate = 0; var bits = 0; var fmtOk = false
    var samples: Array[Short] = null
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = leU32(bytes, i + 4).toInt
      // a chunk size >= 2^31 reads negative: advancing by it would spin
      // forever (and a negative data size would NegativeArraySize) — a
      // corrupt/adversarial payload must yield None, not a hung task
      if (size < 0) return None
      val body = i + 8
      if (id == "fmt " && size >= 16 && body + 16 <= bytes.length) {
        val audioFormat = leU16(bytes, body)
        channels = leU16(bytes, body + 2)
        rate = leU32(bytes, body + 4).toInt
        bits = leU16(bytes, body + 14)
        fmtOk = audioFormat == 1 && bits == 16 && channels > 0
      } else if (id == "data") {
        val n = math.min(size, bytes.length - body) / 2
        val s = new Array[Short](n)
        var k = 0
        while (k < n) {
          s(k) = ((bytes(body + 2 * k) & 0xff) |
            (bytes(body + 2 * k + 1) << 8)).toShort
          k += 1
        }
        samples = s
      }
      i = body + size + (size & 1) // chunks are word-aligned
    }
    if (fmtOk && samples != null) Some((channels, rate, samples)) else None
  }

  // ----------------------------------------- REAL decode: PNG
  //
  // PNG's only codec is zlib DEFLATE, which ships in the JDK
  // (java.util.zip.Inflater) — so PNG pixel decode is pure byte work:
  // chunk walk, inflate the concatenated IDAT stream, then undo the
  // per-scanline filter (None/Sub/Up/Average/Paeth). Supported
  // layouts: gray/RGB/RGBA at bit depth 8 or 16, palette (color type
  // 3, PLTE) at depths 1/2/4/8, each plain or Adam7-interlaced — i.e.
  // everything a standard encoder emits except sub-8-bit grayscale.

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Adam7 pass origins and strides: (x0, y0, dx, dy) per spec §8.2. */
  private val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Decoded PNG: (width, height, channels, row-major interleaved
    * channel values). Palette images resolve through PLTE to 3-channel
    * RGB; 8-bit (and palette) samples are 0-255, 16-bit samples keep
    * their full 0-65535 range. None for non-PNG, unsupported layouts,
    * or corrupt/truncated streams. Consumers that need to know the
    * sample range use [[decodePngDepth]] — the parser accepts chunks
    * in any order, so re-reading the IHDR bit-depth byte at a fixed
    * absolute offset is NOT equivalent (ADVICE r10). */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] =
    decodePngDepth(bytes).map { case (w, h, ch, _, px) => (w, h, ch, px) }

  /** [[decodePng]] plus the PARSED IHDR bit depth: (width, height,
    * channels, bitDepth, values). bitDepth is 16 exactly when the
    * values span 0-65535; palette images report their index depth
    * (1/2/4/8) but always resolve to 0-255 RGB values. This is the
    * single source of truth for the sample range — every depth-aware
    * consumer (imageQuality's 8-bit luma normalization; decodePixels /
    * resizeBox, which by CONTRACT keep raw source-depth values) keys
    * off this return, never off raw header bytes. */
  def decodePngDepth(
      bytes: Array[Byte]): Option[(Int, Int, Int, Int, Array[Int])] = {
    if (bytes.length < 45 || !bytes.take(8).sameElements(PngSig)) return None
    var w = 0; var h = 0; var bitDepth = 0; var colorType = -1
    var interlace = 0
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawEnd = false
    while (!sawEnd && i + 12 <= bytes.length) {
      val len = beU32(bytes, i).toInt
      val body = i + 8
      if (len < 0 || body + len + 4 > bytes.length) return None
      new String(bytes, i + 4, 4, "US-ASCII") match {
        case "IHDR" =>
          if (len < 13) return None
          w = beU32(bytes, body).toInt; h = beU32(bytes, body + 4).toInt
          bitDepth = bytes(body + 8) & 0xff
          colorType = bytes(body + 9) & 0xff
          interlace = bytes(body + 12) & 0xff
        case "PLTE" => plte = java.util.Arrays.copyOfRange(bytes, body,
          body + len)
        case "IDAT" => idat.write(bytes, body, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) are skippable
      }
      i = body + len + 4 // trailing CRC
    }
    val chRaw = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 6 => 4; case _ => return None
    }
    val depthOk = colorType match {
      case 3 => bitDepth == 1 || bitDepth == 2 || bitDepth == 4 ||
        bitDepth == 8
      case _ => bitDepth == 8 || bitDepth == 16
    }
    if (!depthOk || interlace > 1 || w <= 0 || h <= 0 || !sawEnd) return None
    if (colorType == 3 &&
      (plte == null || plte.length < 3 || plte.length % 3 != 0)) return None
    val bitsPP = chRaw * bitDepth
    def rowBytes(pw: Int): Int = (pw * bitsPP + 7) / 8
    // filtering operates on BYTES; for sub-byte depths the "pixel to
    // the left" is the previous byte (spec: bpp rounded up to 1)
    val bppF = math.max(1, bitsPP / 8)
    val passes =
      if (interlace == 0) Seq((0, 0, 1, 1)) else Adam7
    val dims = passes.map { case (x0, y0, dx, dy) =>
      (math.max(0, (w - x0 + dx - 1) / dx),
        math.max(0, (h - y0 + dy - 1) / dy))
    }
    val total = dims.map { case (pw, ph) =>
      if (pw > 0 && ph > 0) ph.toLong * (1L + rowBytes(pw)) else 0L }.sum
    if (total <= 0 || total > Int.MaxValue) return None
    val raw = new Array[Byte](total.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    if (off < raw.length) return None
    val outCh = if (colorType == 3) 3 else chRaw
    val out = new Array[Int](w * h * outCh)
    var base = 0
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val (pw, ph) = dims(pi)
      if (pw > 0 && ph > 0) {
        val rb = rowBytes(pw)
        // reconstruct this pass's scanline bytes (filters per spec §9)
        val recon = new Array[Int](ph * rb)
        var yy = 0
        while (yy < ph) {
          val filter = raw(base + yy * (rb + 1)) & 0xff
          val src = base + yy * (rb + 1) + 1
          val dst = yy * rb
          var x = 0
          while (x < rb) {
            val rx = raw(src + x) & 0xff
            val a = if (x >= bppF) recon(dst + x - bppF) else 0
            val b = if (yy > 0) recon(dst - rb + x) else 0
            val c = if (yy > 0 && x >= bppF) recon(dst - rb + x - bppF)
              else 0
            val v = filter match {
              case 0 => rx
              case 1 => rx + a
              case 2 => rx + b
              case 3 => rx + ((a + b) >> 1)
              case 4 =>
                val p = a + b - c
                val pa = math.abs(p - a); val pb = math.abs(p - b)
                val pc = math.abs(p - c)
                rx + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b
                  else c)
              case _ => return None
            }
            recon(dst + x) = v & 0xff
            x += 1
          }
          yy += 1
        }
        // scatter this pass's pixels to their final positions
        yy = 0
        while (yy < ph) {
          val oy = y0 + yy * dy
          val row = yy * rb
          var xx = 0
          while (xx < pw) {
            val ox = x0 + xx * dx
            val dst = (oy * w + ox) * outCh
            if (colorType == 3) {
              val spb = 8 / bitDepth // samples per byte
              val idx = (recon(row + xx / spb) >>
                (8 - bitDepth * (xx % spb + 1))) & ((1 << bitDepth) - 1)
              if ((idx + 1) * 3 > plte.length) return None
              out(dst) = plte(idx * 3) & 0xff
              out(dst + 1) = plte(idx * 3 + 1) & 0xff
              out(dst + 2) = plte(idx * 3 + 2) & 0xff
            } else if (bitDepth == 8) {
              var c = 0
              while (c < chRaw) {
                out(dst + c) = recon(row + xx * chRaw + c); c += 1
              }
            } else { // 16-bit big-endian samples
              var c = 0
              while (c < chRaw) {
                val s = row + (xx * chRaw + c) * 2
                out(dst + c) = (recon(s) << 8) | recon(s + 1); c += 1
              }
            }
            xx += 1
          }
          yy += 1
        }
        base += ph * (rb + 1)
      }
      pi += 1
    }
    // palette depth is the INDEX width; resolved RGB values are 8-bit
    Some((w, h, outCh, if (colorType == 3) 8 else bitDepth, out))
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    val b = java.nio.ByteBuffer.allocate(12 + data.length)
    b.putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
    b.array()
  }

  private def zlibDeflate(data: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(data); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    defl.end()
    zOut.toByteArray
  }

  /** Byte-level scanline filtering (spec §9): `rows` is h×rb raw bytes,
    * output is h×(rb+1) with the per-row filter tag prepended. `bpp` is
    * the byte distance to the pixel on the left (min 1). */
  private def pngFilter(rows: Array[Byte], h: Int, rb: Int, bpp: Int,
      filterForRow: Int => Int): Array[Byte] = {
    val filtered = new Array[Byte](h * (rb + 1))
    var y = 0
    while (y < h) {
      val f = math.floorMod(filterForRow(y), 5)
      filtered(y * (rb + 1)) = f.toByte
      var x = 0
      while (x < rb) {
        val cur = rows(y * rb + x) & 0xff
        val a = if (x >= bpp) rows(y * rb + x - bpp) & 0xff else 0
        val b = if (y > 0) rows((y - 1) * rb + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) rows((y - 1) * rb + x - bpp) & 0xff
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        filtered(y * (rb + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    filtered
  }

  private def pngAssemble(w: Int, h: Int, bitDepth: Int, colorType: Int,
      interlace: Int, idat: Array[Byte],
      plte: Array[Byte] = null): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()
    val plteChunk =
      if (plte == null) Array.empty[Byte] else pngChunk("PLTE", plte)
    PngSig ++ pngChunk("IHDR", ihdr) ++ plteChunk ++
      pngChunk("IDAT", zlibDeflate(idat)) ++
      pngChunk("IEND", Array.empty[Byte])
  }

  /** Encode a genuine PNG (signature, CRC-correct IHDR/IDAT/IEND,
    * zlib-deflated filtered scanlines) from row-major interleaved
    * channel values. `filterForRow` picks the per-row filter type
    * (0-4) — fixtures use a rotating choice so a decode round-trip
    * exercises every unfilter path. Any PNG viewer opens the output. */
  def encodePng(w: Int, h: Int, channels: Int, px: Array[Int],
      filterForRow: Int => Int = _ % 5): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4,
      s"encodePng: channels must be 1/3/4, got $channels")
    require(px.length == w * h * channels,
      s"encodePng: expected ${w * h * channels} values, got ${px.length}")
    val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val rows = px.map(v => (v & 0xff).toByte)
    pngAssemble(w, h, 8, colorType, 0,
      pngFilter(rows, h, w * channels, channels, filterForRow))
  }

  /** 16-bit-per-sample PNG (big-endian samples, values 0-65535);
    * filtering is byte-wise with a 2×channels left offset per spec. */
  def encodePng16(w: Int, h: Int, channels: Int, px: Array[Int],
      filterForRow: Int => Int = _ % 5): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4,
      s"encodePng16: channels must be 1/3/4, got $channels")
    require(px.length == w * h * channels,
      s"encodePng16: expected ${w * h * channels} values, got ${px.length}")
    val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val rb = w * channels * 2
    val rows = new Array[Byte](h * rb)
    var i = 0
    while (i < px.length) {
      rows(i * 2) = ((px(i) >> 8) & 0xff).toByte
      rows(i * 2 + 1) = (px(i) & 0xff).toByte
      i += 1
    }
    pngAssemble(w, h, 16, colorType, 0,
      pngFilter(rows, h, rb, channels * 2, filterForRow))
  }

  /** Palette PNG (color type 3): `paletteRgb` is 3 values per entry,
    * `indices` one entry per pixel, packed MSB-first at `bitDepth`
    * (1/2/4/8) per spec §7.2. */
  def encodePngPalette(w: Int, h: Int, bitDepth: Int, paletteRgb: Array[Int],
      indices: Array[Int], filterForRow: Int => Int = _ % 5): Array[Byte] = {
    require(bitDepth == 1 || bitDepth == 2 || bitDepth == 4 || bitDepth == 8,
      s"encodePngPalette: bad depth $bitDepth")
    require(paletteRgb.length % 3 == 0 && paletteRgb.nonEmpty &&
      paletteRgb.length / 3 <= (1 << bitDepth),
      "encodePngPalette: palette size must be a multiple of 3 and fit depth")
    require(indices.length == w * h,
      s"encodePngPalette: expected ${w * h} indices, got ${indices.length}")
    val nEntries = paletteRgb.length / 3
    require(indices.forall(ix => ix >= 0 && ix < nEntries),
      "encodePngPalette: index out of palette range")
    val spb = 8 / bitDepth
    val rb = (w * bitDepth + 7) / 8
    val rows = new Array[Byte](h * rb)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val shift = 8 - bitDepth * (x % spb + 1)
        val at = y * rb + x / spb
        rows(at) = (rows(at) | (indices(y * w + x) << shift)).toByte
        x += 1
      }
      y += 1
    }
    pngAssemble(w, h, bitDepth, 3, 0,
      pngFilter(rows, h, rb, 1, filterForRow),
      paletteRgb.map(v => (v & 0xff).toByte))
  }

  /** Adam7-interlaced 8-bit PNG: pixels are gathered into the seven
    * sub-images (spec §8.2), each filtered independently, and the
    * passes concatenated into one IDAT stream. */
  def encodePngInterlaced(w: Int, h: Int, channels: Int, px: Array[Int],
      filterForRow: Int => Int = _ % 5): Array[Byte] = {
    require(channels == 1 || channels == 3 || channels == 4,
      s"encodePngInterlaced: channels must be 1/3/4, got $channels")
    require(px.length == w * h * channels,
      s"encodePngInterlaced: expected ${w * h * channels} values")
    val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val out = new java.io.ByteArrayOutputStream()
    Adam7.foreach { case (x0, y0, dx, dy) =>
      val pw = math.max(0, (w - x0 + dx - 1) / dx)
      val ph = math.max(0, (h - y0 + dy - 1) / dy)
      if (pw > 0 && ph > 0) {
        val rb = pw * channels
        val rows = new Array[Byte](ph * rb)
        var yy = 0
        while (yy < ph) {
          var xx = 0
          while (xx < pw) {
            val src = ((y0 + yy * dy) * w + (x0 + xx * dx)) * channels
            var c = 0
            while (c < channels) {
              rows(yy * rb + xx * channels + c) =
                (px(src + c) & 0xff).toByte
              c += 1
            }
            xx += 1
          }
          yy += 1
        }
        out.write(pngFilter(rows, ph, rb, channels, filterForRow))
      }
    }
    pngAssemble(w, h, 8, colorType, 1, out.toByteArray)
  }

  // ----------------------------------------- REAL decode: GIF
  //
  // GIF's codec is LZW with variable code width — ~60 lines of pure
  // integer work, written here (no library). Supported layout:
  // non-interlaced single image, global or local color table.

  /** Variable-width LZW decode (GIF flavor: LSB-first bit packing,
    * clear/EOI codes, width grows when the table fills, KwKwK case).
    * Returns exactly `nPixels` palette indices or None. */
  private[ops] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      nPixels: Int): Option[Array[Int]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val maxDict = 4096
    val prefix = new Array[Int](maxDict)
    val suffix = new Array[Int](maxDict)
    val stack = new Array[Int](maxDict + 1)
    var dictSize = eoi + 1
    var codeSize = minCodeSize + 1
    var bitPos = 0
    val nBits = data.length * 8
    def readCode(): Int = {
      if (bitPos + codeSize > nBits) return -1
      var v = 0; var k = 0
      while (k < codeSize) {
        val bit = bitPos + k
        if (((data(bit >> 3) >> (bit & 7)) & 1) != 0) v |= 1 << k
        k += 1
      }
      bitPos += codeSize
      v
    }
    // walk a code's prefix chain down to its first (literal) byte
    def firstOf(code: Int): Int = {
      var c = code
      while (c > eoi) c = prefix(c)
      c
    }
    val out = new Array[Int](nPixels)
    var outN = 0
    var prev = -1
    while (outN < nPixels) {
      val code = readCode()
      if (code < 0 || code > dictSize) return None
      if (code == clear) { dictSize = eoi + 1; codeSize = minCodeSize + 1
        prev = -1 }
      else if (code == eoi) return None // early EOI: short of nPixels
      else {
        var sp = 0
        var c = code
        if (code == dictSize) { // KwKwK: string(prev) + first(prev)
          if (prev < 0) return None
          stack(sp) = firstOf(prev); sp += 1
          c = prev
        }
        while (c > eoi) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= clear) return None
        stack(sp) = c; sp += 1
        val first = c
        while (sp > 0) {
          sp -= 1
          if (outN < nPixels) { out(outN) = stack(sp); outN += 1 }
          else return None // string overruns the image
        }
        if (prev >= 0 && dictSize < maxDict) {
          prefix(dictSize) = prev; suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** Decoded GIF: (width, height, row-major RGB values via the color
    * table, 3 per pixel). First image of the stream; extensions are
    * skipped; None for interlaced images or corrupt LZW data. */
  def decodeGif(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 14) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val packed = bytes(10) & 0xff
    var palette: Array[Int] = null
    var i = 13
    if ((packed & 0x80) != 0) {
      val n = (2 << (packed & 7)) * 3
      if (i + n > bytes.length) return None
      palette = new Array[Int](n)
      var k = 0
      while (k < n) { palette(k) = bytes(i + k) & 0xff; k += 1 }
      i += n
    }
    while (i < bytes.length) {
      (bytes(i) & 0xff) match {
        case 0x21 => // extension: label byte then length-prefixed sub-blocks
          i += 2
          while (i < bytes.length && (bytes(i) & 0xff) != 0)
            i += 1 + (bytes(i) & 0xff)
          i += 1
        case 0x2c => // image descriptor
          if (i + 10 > bytes.length) return None
          val w = leU16(bytes, i + 5); val h = leU16(bytes, i + 7)
          val ip = bytes(i + 9) & 0xff
          i += 10
          if ((ip & 0x80) != 0) { // local color table wins
            val n = (2 << (ip & 7)) * 3
            if (i + n > bytes.length) return None
            palette = new Array[Int](n)
            var k = 0
            while (k < n) { palette(k) = bytes(i + k) & 0xff; k += 1 }
            i += n
          }
          if ((ip & 0x40) != 0 || palette == null || w <= 0 || h <= 0)
            return None
          if (i >= bytes.length) return None
          val minCodeSize = bytes(i) & 0xff; i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (i < bytes.length && (bytes(i) & 0xff) != 0) {
            val n = bytes(i) & 0xff
            if (i + 1 + n > bytes.length) return None
            data.write(bytes, i + 1, n); i += 1 + n
          }
          val decoded = lzwDecode(data.toByteArray, minCodeSize, w * h)
          if (decoded.isEmpty) return None
          val idx = decoded.get
          val out = new Array[Int](w * h * 3)
          var p = 0
          while (p < idx.length) {
            val base = idx(p) * 3
            if (base + 2 >= palette.length) return None
            out(p * 3) = palette(base)
            out(p * 3 + 1) = palette(base + 1)
            out(p * 3 + 2) = palette(base + 2)
            p += 1
          }
          return Some((w, h, out))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** Encode a genuine GIF89a (logical screen descriptor, 256-entry
    * global color table, real LSB-packed variable-width LZW stream
    * with periodic clear codes, sub-block framing, trailer) from
    * palette indices. Any GIF viewer opens the output. */
  def encodeGif(w: Int, h: Int, indices: Array[Int],
      palette: Array[Int]): Array[Byte] = {
    require(palette.length == 768, "encodeGif: palette must be 256 RGB")
    require(indices.length == w * h,
      s"encodeGif: expected ${w * h} indices, got ${indices.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0xf7) // global table, 8-bit color resolution, 256 entries
    out.write(0); out.write(0)
    palette.foreach(v => out.write(v & 0xff))
    out.write(0x2c) // image descriptor at (0,0), no local table
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0)
    val minCodeSize = 8
    out.write(minCodeSize)
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val lzw = new java.io.ByteArrayOutputStream()
    var cur = 0L; var nBits = 0
    def emit(code: Int, codeSize: Int): Unit = {
      cur |= code.toLong << nBits
      nBits += codeSize
      while (nBits >= 8) { lzw.write((cur & 0xff).toInt); cur >>= 8
        nBits -= 8 }
    }
    // literal-code stream: each pixel emitted as its own 9-bit code,
    // with a clear whenever the decoder's table would reach 512 and
    // widen the code — the classic bounded "uncompressed GIF" scheme
    emit(clear, 9)
    var dictSize = eoi + 1
    indices.foreach { idx =>
      if (dictSize >= 510) { emit(clear, 9); dictSize = eoi + 1 }
      emit(idx, 9)
      dictSize += 1 // decoder adds an entry per code after the first
    }
    emit(eoi, 9)
    if (nBits > 0) lzw.write((cur & 0xff).toInt)
    val lzwBytes = lzw.toByteArray
    var off = 0
    while (off < lzwBytes.length) {
      val n = math.min(255, lzwBytes.length - off)
      out.write(n)
      out.write(lzwBytes, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Per-image pixel statistics from REAL decoding (BMP/PNG/GIF) —
    * format, dimensions, per-channel means. Payloads in formats with
    * no real decoder here (e.g. progressive JPEG) report their sniffed
    * format with zeroed stats. */
  final case class PixelStats(doc_id: Long, format: String, width: Int,
      height: Int, mean_r: Double, mean_g: Double, mean_b: Double)

  def decodePixels(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[PixelStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        // format dispatch by magic; (w, h, channels, interleaved values)
        // PNG comes through decodePngDepth: 16-bit samples are kept at
        // their RAW 0-65535 range BY CONTRACT — the means report the
        // source-depth values (the mm_decode_png_layouts oracle keys
        // on % 65536 means), and the depth return documents that
        // choice at the one place it is made (ADVICE r10 convention).
        val decoded: Option[(String, Int, Int, Int, Array[Int])] =
          decodeBmp(bytes).map { case (w, h, px) => ("bmp", w, h, 3, px) }
            .orElse(decodePngDepth(bytes).map { case (w, h, ch, _, px) =>
              ("png", w, h, ch, px) })
            .orElse(decodeGif(bytes).map { case (w, h, px) =>
              ("gif", w, h, 3, px) })
            .orElse(Jpeg.decode(bytes).map { case (w, h, ch, px) =>
              ("jpeg", w, h, ch, px) })
        decoded match {
          case Some((fmt, w, h, ch, px)) =>
            // means of the first three channels (alpha excluded);
            // grayscale replicates its single channel into r/g/b
            val sums = new Array[Long](3)
            var i = 0
            while (i < px.length) {
              val c = i % ch
              if (ch == 1) { sums(0) += px(i); sums(1) += px(i)
                sums(2) += px(i) }
              else if (c < 3) sums(c) += px(i)
              i += 1
            }
            val npx = (w.toLong * h).toDouble
            PixelStats(id, fmt, w, h, sums(0) / npx, sums(1) / npx,
              sums(2) / npx)
          case None =>
            val m = sniff(id, bytes)
            PixelStats(id, m.format, m.width, m.height, 0, 0, 0)
        }
      })
  }

  /** Per-image histogram-equalization statistics from REAL BMP
    * decoding — the classic contrast-normalization preprocessing step
    * an image-training pipeline runs before feature extraction. Gray
    * levels come from the decoded R channel (the fixtures are gray,
    * r=g=b); the 256-bin histogram and its CDF are per-image local
    * work, and the standard mapping v → round(255·(cdf−cdfmin)/
    * (n−cdfmin)) is computed as EXACT half-up integer division
    * ((510·x + den) / (2·den)) so both engines land on identical
    * levels with no FP rounding in the loop. All-one-level images map
    * to 0 (the den = 0 guard). Partition-local, zero shuffles — the
    * 100 TB shape for per-asset preprocessing. */
  final case class EqualizeStats(doc_id: Long, width: Int, height: Int,
      n_px: Long, lo_before: Int, hi_before: Int, levels_before: Int,
      lo_after: Long, hi_after: Long, levels_after: Int, sum_after: Long)

  def equalizeGray(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[EqualizeStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            val n = (w.toLong * h)
            val hist = new Array[Long](256)
            var i = 0
            while (i < px.length) { hist(px(i)) += 1; i += 3 } // R channel
            var lo = 255; var hi = 0; var levB = 0
            var v = 0
            while (v < 256) {
              if (hist(v) > 0) {
                levB += 1; if (v < lo) lo = v; if (v > hi) hi = v
              }
              v += 1
            }
            val cmin = hist(lo) // CDF at the first occupied level
            val den = n - cmin
            var cdf = 0L
            var loA = Long.MaxValue; var hiA = Long.MinValue
            var levA = 0; var sumA = 0L
            v = 0
            while (v < 256) {
              if (hist(v) > 0) {
                cdf += hist(v)
                val ev =
                  if (den == 0L) 0L
                  else (510L * (cdf - cmin) + den) / (2L * den)
                if (ev < loA) loA = ev
                if (ev > hiA) hiA = ev
                levA += 1 // distinct inputs stay distinct? count below
                sumA += ev * hist(v)
              }
              v += 1
            }
            // distinct OUTPUT levels can collapse (that is the point of
            // equalization on sparse histograms) — recount them
            val outs = scala.collection.mutable.SortedSet.empty[Long]
            cdf = 0L
            v = 0
            while (v < 256) {
              if (hist(v) > 0) {
                cdf += hist(v)
                outs += (if (den == 0L) 0L
                         else (510L * (cdf - cmin) + den) / (2L * den))
              }
              v += 1
            }
            EqualizeStats(id, w, h, n, lo, hi, levB, loA, hiA,
              outs.size, sumA)
          }
      })
  }

  final case class OtsuStats(doc_id: Long, width: Int, height: Int,
      n_px: Long, threshold: Int, n_bg: Long, n_fg: Long,
      sum_bg: Long, sum_fg: Long, score_q: Long)

  /** Otsu's automatic binarization threshold (Otsu 1979) from REAL
    * decoded gray BMP pixels — the standard scan-cleanup /
    * figure-extraction step before OCR in a document pipeline (ref
    * treats images as opaque bytes; udf/expr scalar seam is
    * python/xorq/expr/udf.py:329). The whole computation is EXACT
    * integer arithmetic so both engines agree bit-for-bit: with
    * per-level counts h(v), prefix counts n0(t) and prefix sums s0(t),
    * the between-class variance ordering of
    *   sigma_B^2(t) = (n*s0 - sT*n0)^2 / (n*n0*(n-n0))
    * is preserved by the integer score
    *   score_q(t) = (n*s0 - sT*n0)^2 * 2^20 // (n0*(n-n0))
    * (n is constant across t; the 2^20 scaling keeps floor-division
    * resolution far above any plateau the tie rule cares about). The
    * numerator is up to ~(255/4)^2 * n^4 * 2^20, past 2^63 already for
    * a few-hundred-pixel bimodal image, so the sweep runs in BigInt —
    * the argmax is exact at ANY image size and can never wrap; the
    * emitted score_q narrows back to Long via longValueExact, failing
    * LOUDLY (ArithmeticException) if an image is ever large enough
    * that the winning score itself exceeds 2^63 (match the oracle's
    * HUGEINT/BIGINT behavior, never a silent wrap). Candidates are the occupied
    * levels with n0 < n (scores are constant between occupied levels),
    * argmax ties break to the LOWEST level. Runs partition-local per
    * image via mapPartitions — the at-scale shape (no shuffle; one
    * histogram per image, never per-pixel rows). */
  def otsuGray(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[OtsuStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            val n = w.toLong * h
            val hist = new Array[Long](256)
            var i = 0
            while (i < px.length) { hist(px(i)) += 1; i += 3 } // R = gray
            var sT = 0L
            var v = 0
            while (v < 256) { sT += v * hist(v); v += 1 }
            var n0 = 0L; var s0 = 0L
            var bestT = -1; var bestScore = BigInt(-1)
            v = 0
            while (v < 256) {
              if (hist(v) > 0) {
                n0 += hist(v); s0 += v.toLong * hist(v)
                if (n0 < n) {
                  val num = BigInt(n) * s0 - BigInt(sT) * n0
                  val score = num * num * 1048576 / (BigInt(n0) * (n - n0))
                  if (score > bestScore) { bestScore = score; bestT = v }
                }
              }
              v += 1
            }
            var nBg = 0L; var sBg = 0L
            v = 0
            while (v <= bestT) { nBg += hist(v); sBg += v.toLong * hist(v); v += 1 }
            OtsuStats(id, w, h, n, bestT, nBg, n - nBg, sBg, sT - sBg,
              bestScore.bigInteger.longValueExact())
          }
      })
  }

  final case class RleStats(doc_id: Long, width: Int, height: Int,
      n_px: Long, n_fg: Long, n_runs: Long)

  /** Per-image run-length statistics over binarized decoded gray BMPs
    * — the compressibility signal of document imaging (a clean scan
    * RLE-compresses to a handful of runs per row; dense noise/dither
    * does not — the classic pre-OCR speckle/halftone discriminant,
    * and the row-wise run model beneath CCITT G3/G4 fax coding).
    * Foreground = gray value below `fgBelow` (ink on paper); a run is
    * a maximal constant segment WITHIN one pixel row (rows never
    * merge). Exact integer counting, partition-local per image via
    * mapPartitions (same no-shuffle shape as [[otsuGray]]); run count
    * is invariant to row order and scan direction, so it is
    * reproducible from the generation law alone — what lets the
    * DuckDB oracle replay it without a decoder. Images that fail to
    * decode are dropped. */
  def rleGray(df: DataFrame, idCol: String, fgBelow: Int = 128,
      payloadCol: String = "payload"): Dataset[RleStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            var nFg = 0L; var nRuns = 0L
            var y = 0
            while (y < h) {
              var x = 0
              var prev = -1
              while (x < w) {
                val fg = if (px((y * w + x) * 3) < fgBelow) 1 else 0
                nFg += fg
                if (fg != prev) { nRuns += 1; prev = fg }
                x += 1
              }
              y += 1
            }
            RleStats(id, w, h, w.toLong * h, nFg, nRuns)
          }
      })
  }

  final case class BlurStats(doc_id: Long, width: Int, height: Int,
      n_px: Long, sum_nsum: Long, sum_ncnt: Long, lap_energy: Long)

  /** 3×3 box-filter statistics over decoded gray BMPs — the local
    * smoothness/edge-energy signal of image QA (a text scan has high
    * Laplacian energy at glyph edges; a blank or blurred page has
    * almost none — the same family as [[sharpnessGray]] but with the
    * border handled by CLAMPED windows, so every pixel contributes).
    * Per pixel p with 3×3 neighborhood (clamped at the borders,
    * self included): nsum = Σ neighbor values, ncnt = window size,
    * lap = v·ncnt − nsum (= Σ (v − v_b), an un-normalized clamped
    * Laplacian — EXACT integers throughout, no division anywhere).
    * Emits per image: Σnsum, Σncnt and the Laplacian energy Σ lap².
    * Partition-local per image via mapPartitions — no shuffle, never
    * per-pixel rows; the oracle replays the arithmetic pixel law on a
    * generated grid with a 3×3 offset join. */
  def boxBlurStats(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[BlurStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            var sNsum = 0L; var sNcnt = 0L; var lapE = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = px((y * w + x) * 3).toLong
                var nsum = 0L; var ncnt = 0L
                var dy = -1
                while (dy <= 1) {
                  var dx = -1
                  while (dx <= 1) {
                    val nx = x + dx; val ny = y + dy
                    if (nx >= 0 && nx < w && ny >= 0 && ny < h) {
                      nsum += px((ny * w + nx) * 3); ncnt += 1
                    }
                    dx += 1
                  }
                  dy += 1
                }
                val lap = v * ncnt - nsum
                sNsum += nsum; sNcnt += ncnt; lapE += lap * lap
                x += 1
              }
              y += 1
            }
            BlurStats(id, w, h, w.toLong * h, sNsum, sNcnt, lapE)
          }
      })
  }

  final case class SobelStats(doc_id: Long, width: Int, height: Int,
      n_interior: Long, sum_gx_abs: Long, sum_gy_abs: Long,
      grad_energy: Long, max_grad: Long)

  /** Sobel gradient statistics over decoded gray BMPs — the
    * edge-density signal of an image-QA router (text scans and
    * diagrams carry high |G|, blank/blurred frames near zero). The
    * 3×3 Sobel pair Gx = [[-1,0,1],[-2,0,2],[-1,0,1]], Gy = Gxᵀ runs
    * on INTERIOR pixels only (1..w−2 × 1..h−2 — no clamping
    * ambiguity), per-pixel magnitude is the L1 |Gx|+|Gy| — EXACT
    * integers end to end, no division, no sqrt. Emits per image:
    * interior count, Σ|Gx|, Σ|Gy|, Σ(|Gx|+|Gy|)² (edge energy) and
    * the max magnitude. Partition-local per image via mapPartitions —
    * no shuffle, never per-pixel rows; the oracle replays the gray
    * law on a generated grid with a 3×3 weighted offset join. */
  def sobelStats(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[SobelStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            var n = 0L; var sgx = 0L; var sgy = 0L
            var energy = 0L; var mx = 0L
            var y = 1
            while (y < h - 1) {
              var x = 1
              while (x < w - 1) {
                var gx = 0L; var gy = 0L
                var dy = -1
                while (dy <= 1) {
                  var dx = -1
                  while (dx <= 1) {
                    val v = px(((y + dy) * w + (x + dx)) * 3).toLong
                    gx += dx * (if (dy == 0) 2L else 1L) * v
                    gy += dy * (if (dx == 0) 2L else 1L) * v
                    dx += 1
                  }
                  dy += 1
                }
                val m = math.abs(gx) + math.abs(gy)
                n += 1; sgx += math.abs(gx); sgy += math.abs(gy)
                energy += m * m; if (m > mx) mx = m
                x += 1
              }
              y += 1
            }
            SobelStats(id, w, h, n, sgx, sgy, energy, mx)
          }
      })
  }

  final case class IntegralStats(doc_id: Long, width: Int, height: Int,
      n_px: Long, sat_corner: Long, sat_sum: Long, q00: Long, q10: Long,
      q01: Long, q11: Long)

  /** Summed-area table (integral image — Crow 1984; the constant-time
    * box-sum primitive behind Viola-Jones features and fast box
    * blurs) over decoded gray BMPs: SAT(x,y) = Σ_{x'≤x, y'≤y} v.
    * Emitted stats pin BOTH construction and USE: `sat_corner` =
    * SAT(w−1,h−1) (must equal the plain gray total), `sat_sum` =
    // Σ over all cells of SAT (equals Σ v·(w−x)(h−y) — the identity
    * an oracle can compute without materializing the table), and the
    * four QUADRANT box sums read back through the classic 4-corner
    * expression SAT(x2,y2) − SAT(x1−1,y2) − SAT(x2,y1−1) +
    * SAT(x1−1,y1−1) — which must match direct conditional sums.
    * Exact integers; partition-local per image (the 100 TB shape for
    * per-asset work); the oracle replays the gray law on the (x, y)
    * grid with conditional aggregates. */
  def integralStats(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[IntegralStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            val sat = Array.ofDim[Long](h, w)
            var y = 0
            while (y < h) {
              var rowSum = 0L
              var x = 0
              while (x < w) {
                rowSum += px((y * w + x) * 3).toLong
                sat(y)(x) = rowSum + (if (y > 0) sat(y - 1)(x) else 0L)
                x += 1
              }
              y += 1
            }
            var satSum = 0L
            y = 0
            while (y < h) {
              var x = 0
              while (x < w) { satSum += sat(y)(x); x += 1 }
              y += 1
            }
            // quadrant box sums via the 4-corner identity; the
            // quadrant split is at (w/2, h/2) (left/top halves get
            // the floor-sized block)
            val xm = w / 2; val ym = h / 2
            def box(x1: Int, y1: Int, x2: Int, y2: Int): Long = {
              val a = sat(y2)(x2)
              val b = if (x1 > 0) sat(y2)(x1 - 1) else 0L
              val cc = if (y1 > 0) sat(y1 - 1)(x2) else 0L
              val d =
                if (x1 > 0 && y1 > 0) sat(y1 - 1)(x1 - 1) else 0L
              a - b - cc + d
            }
            IntegralStats(id, w, h, w.toLong * h,
              sat(h - 1)(w - 1), satSum,
              box(0, 0, xm - 1, ym - 1), box(xm, 0, w - 1, ym - 1),
              box(0, ym, xm - 1, h - 1), box(xm, ym, w - 1, h - 1))
          }
      })
  }

  final case class BayerStats(doc_id: Long, width: Int, height: Int,
      n_px: Long, n_on: Long, moment: Long)

  /** Ordered (Bayer) dithering with the classic 4×4 index matrix
    * (Bayer 1973): pixel (x, y) turns ON when its gray value exceeds
    * the tiled threshold 16·B[y%4][x%4] + 8 (the exact integer form
    * of (B + 0.5)·256/16) — the standard halftoning step before
    * 1-bit image compression or display. Emits per image the ON
    * count and the position-weighted moment Σ on·(x+1)·(y+3) (a
    * checksum that pins WHICH pixels fired, not just how many).
    * Exact integers; partition-local per image; the oracle tiles the
    * same matrix as a flat 16-literal list indexed by
    * (y%4)·4 + x%4. */
  def bayerStats(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[BayerStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    val bayer = Array(0, 8, 2, 10, 12, 4, 14, 6, 3, 11, 1, 9, 15, 7, 13, 5)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            var on = 0L; var moment = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = px((y * w + x) * 3).toLong
                val thr = 16L * bayer((y % 4) * 4 + (x % 4)) + 8L
                if (v > thr) {
                  on += 1
                  moment += (x + 1).toLong * (y + 3)
                }
                x += 1
              }
              y += 1
            }
            BayerStats(id, w, h, w.toLong * h, on, moment)
          }
      })
  }

  final case class HistEqStats(doc_id: Long, width: Int, height: Int,
      n_px: Long, n_levels_before: Long, n_levels_after: Long,
      sum_before: Long, sum_after: Long, min_after: Long,
      max_after: Long)

  /** Histogram equalization over decoded gray BMPs — the global
    * tone-mapping normalizer of an imaging pipeline (stretches the
    * gray CDF to the full 0..255 range before downstream feature
    * extraction). Remap is the classic integer form
    * v' = (cdf(v) − cdf_min) · 255 / (n_px − cdf_min) with FLOOR
    * integer division (exact on both engines; a constant image maps
    * to 0), so every emitted statistic is exact integer arithmetic.
    * Emits per image: pixel count, distinct gray levels before/after,
    * Σgray before/after, and the remapped min/max. Partition-local
    * per image via mapPartitions; the oracle replays the gray law
    * with a histogram + running-CDF window per image. */
  def histEqStats(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[HistEqStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            val n = w.toLong * h
            val hist = new Array[Long](256)
            var i = 0
            while (i < n) { hist(px(i.toInt * 3) & 0xff) += 1; i += 1 }
            val cdf = new Array[Long](256)
            var run = 0L
            var v = 0
            var cdfMin = 0L; var seenMin = false
            while (v < 256) {
              run += hist(v); cdf(v) = run
              if (!seenMin && hist(v) > 0) { cdfMin = run; seenMin = true }
              v += 1
            }
            val remap = new Array[Long](256)
            v = 0
            while (v < 256) {
              remap(v) =
                if (n == cdfMin) 0L
                else (cdf(v) - cdfMin) * 255L / (n - cdfMin)
              v += 1
            }
            var before = 0L; var after = 0L
            var minA = 255L; var maxA = 0L
            var levelsB = 0L
            val seenAfter = new Array[Boolean](256)
            var levelsA = 0L
            v = 0
            while (v < 256) {
              if (hist(v) > 0) {
                levelsB += 1
                before += hist(v) * v
                val r = remap(v)
                after += hist(v) * r
                if (r < minA) minA = r
                if (r > maxA) maxA = r
                if (!seenAfter(r.toInt)) { seenAfter(r.toInt) = true
                  levelsA += 1 }
              }
              v += 1
            }
            if (levelsB == 0) { minA = 0L }
            HistEqStats(id, w, h, n, levelsB, levelsA, before, after,
              minA, maxA)
          }
      })
  }

  final case class MorphStats(doc_id: Long, width: Int, height: Int,
      n_ink: Long, n_eroded: Long, n_dilated: Long, n_gradient: Long)

  /** Binary 4-neighborhood morphology (erosion / dilation / gradient)
    * over binarized decoded gray BMPs — the speckle/stroke-width
    * signal of a document-imaging pipeline (erosion kills 1-px noise,
    * the morphological gradient counts boundary pixels). Foreground =
    * gray < `fgBelow` (ink); out-of-image counts as BACKGROUND, so a
    * border ink pixel never survives erosion and always contributes
    * to the gradient if retained by dilation. Exact integer counts:
    * eroded = ink pixels whose 4 in-bounds neighbors are all ink
    * (i.e. ink-neighbor count = 4); dilated = ink pixels + background
    * pixels with ≥1 ink 4-neighbor; gradient = dilated − eroded.
    * Partition-local per image via mapPartitions; the oracle replays
    * the ink-mask law with a 4-offset neighbor join. */
  def morphStats(df: DataFrame, idCol: String, fgBelow: Int = 128,
      payloadCol: String = "payload"): Dataset[MorphStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            def ink(x: Int, y: Int): Boolean =
              x >= 0 && x < w && y >= 0 && y < h &&
                (px((y * w + x) * 3) & 0xff) < fgBelow
            var nInk = 0L; var nEro = 0L; var nDil = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val self = ink(x, y)
                var nn = 0
                if (ink(x - 1, y)) nn += 1
                if (ink(x + 1, y)) nn += 1
                if (ink(x, y - 1)) nn += 1
                if (ink(x, y + 1)) nn += 1
                if (self) {
                  nInk += 1
                  if (nn == 4) nEro += 1
                  nDil += 1
                } else if (nn >= 1) nDil += 1
                x += 1
              }
              y += 1
            }
            MorphStats(id, w, h, nInk, nEro, nDil, nDil - nEro)
          }
      })
  }

  final case class BlobStats(doc_id: Long, width: Int, height: Int,
      n_fg: Long, n_blobs: Long, max_blob: Long)

  /** Connected-component labeling (4-connectivity) over binarized
    * decoded gray BMPs — the blob-count / dominant-blob-size signal a
    * document-imaging pipeline uses to separate figures from noise
    * speckle after Otsu binarization. Foreground = gray value below
    * `fgBelow` (ink on paper). Runs partition-local per image via
    * mapPartitions with a flat-array union-find over the pixel grid
    * (path-halving; one row-major pass unions each foreground pixel
    * with its left and up neighbors) — O(n_px alpha(n_px)) per image,
    * no shuffle, never per-pixel rows. Images that fail to decode are
    * dropped; fully-background images emit zeros. */
  def blobsGray(df: DataFrame, idCol: String, fgBelow: Int = 128,
      payloadCol: String = "payload"): Dataset[BlobStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            val n = w * h
            val fg = new Array[Boolean](n)
            var i = 0
            while (i < n) { fg(i) = px(i * 3) < fgBelow; i += 1 }
            val parent = Array.tabulate(n)(identity)
            def find(x0: Int): Int = {
              var x = x0
              while (parent(x) != x) {
                parent(x) = parent(parent(x)); x = parent(x)
              }
              x
            }
            def union(a: Int, b: Int): Unit = {
              val ra = find(a); val rb = find(b)
              if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
            }
            var p = 0
            while (p < n) {
              if (fg(p)) {
                if (p % w > 0 && fg(p - 1)) union(p, p - 1)
                if (p >= w && fg(p - w)) union(p, p - w)
              }
              p += 1
            }
            val sizes = scala.collection.mutable.LongMap.empty[Long]
            var nFg = 0L
            p = 0
            while (p < n) {
              if (fg(p)) {
                nFg += 1
                val r = find(p).toLong
                sizes(r) = sizes.getOrElse(r, 0L) + 1L
              }
              p += 1
            }
            BlobStats(id, w, h, nFg, sizes.size.toLong,
              if (sizes.isEmpty) 0L else sizes.values.max)
          }
      })
  }

  final case class ProfileStats(doc_id: Long, width: Int, height: Int,
      n_inked_rows: Long, n_lines: Long, max_line_height: Long,
      max_row_ink: Long)

  /** Horizontal projection profile + text-line segmentation — the
    * classic pre-OCR layout step (rows with ink form the profile;
    * maximal runs of consecutive inked rows are the text lines).
    * Foreground = gray value below `fgBelow`. Partition-local per
    * image (one pass over the decoded rows; O(height) state), same
    * decode path as [[otsuGray]]/[[blobsGray]]. */
  def projectionProfile(df: DataFrame, idCol: String, fgBelow: Int = 128,
      payloadCol: String = "payload"): Dataset[ProfileStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            var inked = 0L; var lines = 0L
            var run = 0L; var maxRun = 0L; var maxInk = 0L
            var y = 0
            while (y < h) {
              var ink = 0L
              var x = 0
              while (x < w) {
                if (px((y * w + x) * 3) < fgBelow) ink += 1
                x += 1
              }
              if (ink > 0) {
                inked += 1
                if (run == 0L) lines += 1
                run += 1
                if (run > maxRun) maxRun = run
                if (ink > maxInk) maxInk = ink
              } else run = 0L
              y += 1
            }
            ProfileStats(id, w, h, inked, lines, maxRun, maxInk)
          }
      })
  }

  final case class EntropyStats(doc_id: Long, width: Int, height: Int,
      n_levels: Int, max_count: Long, entropy: Double)

  /** Shannon entropy of the gray-level histogram per decoded BMP —
    * the standard image-complexity / information-content screen (a
    * blank scan has entropy ~0; dense text or texture approaches
    * ln(levels)). H = ln(n) - (Sum_v cnt_v * ln(cnt_v)) / n with the
    * level fold in PINNED ascending-v order, so the only FP inputs
    * are ln() of exact integers — the same cross-engine class as the
    * corpus ln queries, absorbed by the caller's rounding. Partition-
    * local per image, O(256) state. */
  def entropyGray(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[EntropyStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            val n = w.toLong * h
            val hist = new Array[Long](256)
            var i = 0
            while (i < px.length) { hist(px(i)) += 1; i += 3 }
            var levels = 0; var maxC = 0L; var acc = 0.0
            var v = 0
            while (v < 256) { // pinned ascending-v fold
              val c = hist(v)
              if (c > 0) {
                levels += 1
                if (c > maxC) maxC = c
                acc += c * math.log(c.toDouble)
              }
              v += 1
            }
            EntropyStats(id, w, h, levels, maxC,
              math.log(n.toDouble) - acc / n)
          }
      })
  }

  final case class BboxStats(doc_id: Long, width: Int, height: Int,
      n_fg: Long, x0: Int, x1: Int, y0: Int, y1: Int,
      crop_w: Int, crop_h: Int)

  /** Content bounding box per decoded BMP — the auto-crop step before
    * OCR/thumbnailing: the tightest [x0,x1] x [y0,y1] rectangle
    * containing every foreground (ink, gray < `fgBelow`) pixel.
    * Blank images report an empty box (-1 coordinates, 0-sized crop).
    * Partition-local single pass, O(1) state. */
  def cropBbox(df: DataFrame, idCol: String, fgBelow: Int = 128,
      payloadCol: String = "payload"): Dataset[BboxStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeBmp(if (bytes == null) Array.empty[Byte] else bytes)
          .map { case (w, h, px) =>
            var nFg = 0L
            var x0 = -1; var x1 = -1; var y0 = -1; var y1 = -1
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                if (px((y * w + x) * 3) < fgBelow) {
                  nFg += 1
                  if (x0 < 0 || x < x0) x0 = x
                  if (x > x1) x1 = x
                  if (y0 < 0) y0 = y
                  y1 = y
                }
                x += 1
              }
              y += 1
            }
            BboxStats(id, w, h, nFg, x0, x1, y0, y1,
              if (nFg == 0L) 0 else x1 - x0 + 1,
              if (nFg == 0L) 0 else y1 - y0 + 1)
          }
      })
  }

  /** Per-clip sample statistics from REAL PCM16 decoding — mean, RMS,
    * absolute peak over the interleaved samples. */
  final case class SampleStats(doc_id: Long, channels: Int,
      sample_rate: Int, n_samples: Long, mean: Double, rms: Double,
      peak: Int)

  def decodeSamples(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[SampleStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        decodeWavPcm16(bytes) match {
          case Some((ch, rate, s)) =>
            var sum = 0.0; var sq = 0.0; var peak = 0
            var i = 0
            while (i < s.length) {
              val v = s(i).toInt
              sum += v; sq += v.toDouble * v
              if (math.abs(v) > peak) peak = math.abs(v)
              i += 1
            }
            val n = math.max(s.length, 1).toDouble
            SampleStats(id, ch, rate, s.length, sum / n,
              math.sqrt(sq / n), peak)
          case None => SampleStats(id, 0, 0, 0L, 0, 0, 0)
        }
      })
  }

  /** Integer-factor box-filter downsample (the "resize" of a
    * multimodal ingest pipeline, AlexNet-style area pooling): decode
    * (same magic dispatch as [[decodePixels]]), then pool each
    * factor×factor block. The pooled grid is emitted as INTEGER block
    * sums ("r:g:b;…" row-major) — exact on any engine, so the resize
    * kernel itself sits under the hash gate; a consumer divides by
    * factor² for the mean image. Partition-local map, zero shuffle —
    * the multimodal contract shared by every decoder here. Trailing
    * rows/cols that do not fill a block are dropped (floor semantics,
    * the pooling convention). */
  final case class ResizedGrid(doc_id: Long, format: String, src_w: Int,
      src_h: Int, out_w: Int, out_h: Int, grid_csv: String)

  def resizeBox(df: DataFrame, idCol: String, factor: Int,
      payloadCol: String = "payload"): Dataset[ResizedGrid] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        // same raw source-depth convention as decodePixels: 16-bit PNG
        // box means stay on the 0-65535 scale (documented, depth-keyed)
        val decoded: Option[(String, Int, Int, Int, Array[Int])] =
          decodeBmp(bytes).map { case (w, h, px) => ("bmp", w, h, 3, px) }
            .orElse(decodePngDepth(bytes).map { case (w, h, ch, _, px) =>
              ("png", w, h, ch, px) })
            .orElse(decodeGif(bytes).map { case (w, h, px) =>
              ("gif", w, h, 3, px) })
            .orElse(Jpeg.decode(bytes).map { case (w, h, ch, px) =>
              ("jpeg", w, h, ch, px) })
        decoded match {
          case Some((fmt, w, h, ch, px)) =>
            val ow = w / factor; val oh = h / factor
            val sb = new StringBuilder
            var by = 0
            while (by < oh) {
              var bx = 0
              while (bx < ow) {
                val sums = new Array[Long](3)
                var dy = 0
                while (dy < factor) {
                  var dx = 0
                  while (dx < factor) {
                    val base =
                      (((by * factor + dy) * w) + bx * factor + dx) * ch
                    var c = 0
                    while (c < 3) {
                      // grayscale replicates; alpha (ch=4) is excluded
                      sums(c) += (if (ch == 1) px(base)
                        else if (c < ch) px(base + c) else 0)
                      c += 1
                    }
                    dx += 1
                  }
                  dy += 1
                }
                if (sb.nonEmpty) sb.append(';')
                sb.append(sums(0)).append(':').append(sums(1))
                  .append(':').append(sums(2))
                bx += 1
              }
              by += 1
            }
            ResizedGrid(id, fmt, w, h, ow, oh, sb.toString)
          case None => ResizedGrid(id, "unknown", 0, 0, 0, 0, "")
        }
      })
  }

  /** Stride frame sampling over a CLIP container (the video analogue
    * of [[resizeBox]]'s image path): a clip is "GCLP" + u32LE frame
    * count + frames as [u32LE length][image payload]. Frames are
    * decoded ONLY when sampled — unsampled frames are SKIPPED by their
    * length header without touching the codec, which is the whole
    * point of stride sampling at corpus scale (a 1-fps sample of a
    * 30-fps archive must not pay 30× decode). One output row per
    * sampled frame; corrupt/truncated containers yield the frames that
    * parsed. Partition-local flatMap, zero shuffle. */
  final case class FrameStats(doc_id: Long, frame_idx: Int,
      format: String, width: Int, height: Int, mean_r: Double,
      mean_g: Double, mean_b: Double)

  def sampleFrames(df: DataFrame, idCol: String, stride: Int,
      payloadCol: String = "payload"): Dataset[FrameStats] = {
    require(stride >= 1, s"frame stride must be >= 1, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytesOrNull) =>
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        val out = scala.collection.mutable.ArrayBuffer.empty[FrameStats]
        if (bytes.length >= 8 && bytes(0) == 'G' && bytes(1) == 'C' &&
            bytes(2) == 'L' && bytes(3) == 'P') {
          val n = leU32(bytes, 4).toInt
          var off = 8
          var f = 0
          var ok = true
          while (ok && f < n && off + 4 <= bytes.length) {
            val len = leU32(bytes, off).toInt
            val body = off + 4
            if (len < 0 || body + len > bytes.length) ok = false
            else {
              if (f % stride == 0) {
                val frame =
                  java.util.Arrays.copyOfRange(bytes, body, body + len)
                decodeBmp(frame).foreach { case (w, h, px) =>
                  val sums = new Array[Long](3)
                  var i = 0
                  while (i < px.length) { sums(i % 3) += px(i); i += 1 }
                  val npx = (w.toLong * h).toDouble
                  out += FrameStats(id, f, "bmp", w, h, sums(0) / npx,
                    sums(1) / npx, sums(2) / npx)
                }
              }
              off = body + len
              f += 1
            }
          }
        }
        out.iterator
      })
  }

  /** Partition-local stub decode: binary → typed metadata. Real decode
    * would call the codec here; everything around it (schema, encoder,
    * partitioning) is production-shaped. */
  def decodeStub(df: DataFrame, idCol: String): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        // a NULL payload is an empty medium, not a task-killing NPE
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        val n = bytes.length.toLong
        Decoded(
          doc_id = id,
          n_bytes = n,
          width = (n % 640L).toInt,
          height = (n % 480L).toInt,
          channels = 1 + (n % 3L).toInt,
          head_csv = bytes.take(3).map(b => (b & 0xff).toString)
            .mkString(","))
      })
  }

  /** Image-quality gate statistics — the brightness/contrast/clipping
    * screen a training-data ingest runs before an image reaches the
    * corpus (LAION-style filtering). REAL decode (same magic dispatch
    * as [[decodePixels]]), then EXACT integer luma statistics: per
    * pixel the integer Rec.709 luma lum = 2126·R + 7152·G + 722·B
    * (weights ×10⁴, no division anywhere), accumulated as Longs in
    * pixel order plus threshold counts for clipped-bright (≥240 gray)
    * and near-black (≤16 gray) pixels. Every output is an integer sum
    * or count, so the decode+stats kernel sits fully under the
    * exact-hash gate; consumers derive brightness/contrast by dividing
    * at read time. Partition-local map, zero shuffle — at archive
    * scale this runs beside the scan. Bounds: lum ≤ 2.55e6, lum² ≤
    * 6.6e12, so sum_luma_sq stays in Long headroom past a megapixel. */
  final case class ImageQuality(doc_id: Long, format: String,
      width: Int, height: Int, n_px: Long, sum_luma: Long,
      sum_luma_sq: Long, n_bright: Long, n_dark: Long)

  def imageQuality(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[ImageQuality] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        val decoded: Option[(String, Int, Int, Int, Array[Int])] =
          decodeBmp(bytes).map { case (w, h, px) => ("bmp", w, h, 3, px) }
            .orElse(decodePngDepth(bytes).map { case (w, h, ch, d, px) =>
              // decodePng passes 16-bit samples through at full
              // 0-65535 range (its roundtrip contract), but the luma
              // weights, bright/dark thresholds, and the Long-headroom
              // bound below all assume 8-bit — downshift (>> 8, the
              // standard 16->8 truncation) before the stats loop,
              // keyed off the PARSED IHDR depth (the parser accepts
              // chunks in any order, so the former absolute-offset-24
              // byte read could disagree with the decode; ADVICE r10).
              val px8 = if (d == 16) px.map(_ >> 8) else px
              ("png", w, h, ch, px8) })
            .orElse(decodeGif(bytes).map { case (w, h, px) =>
              ("gif", w, h, 3, px) })
            .orElse(Jpeg.decode(bytes).map { case (w, h, ch, px) =>
              ("jpeg", w, h, ch, px) })
        decoded match {
          case Some((fmt, w, h, ch, px)) =>
            var sl = 0L; var sq = 0L; var nb = 0L; var nd = 0L
            var i = 0
            val n = px.length / math.max(ch, 1)
            while (i < n) {
              val base = i * ch
              val lum: Long =
                if (ch == 1) 10000L * px(base)
                else 2126L * px(base) + 7152L * px(base + 1) +
                  722L * px(base + 2)
              sl += lum; sq += lum * lum
              if (lum >= 2400000L) nb += 1
              if (lum <= 160000L) nd += 1
              i += 1
            }
            ImageQuality(id, fmt, w, h, n.toLong, sl, sq, nb, nd)
          case None =>
            ImageQuality(id, "unknown", 0, 0, 0L, 0L, 0L, 0L, 0L)
        }
      })
  }

  /** Framewise audio features — the VAD-style energy/silence screen of
    * an audio ingest pipeline. REAL PCM16 decode, then per frame of
    * `frameLen` samples (floor-partial last frame kept): integer
    * energy Σs², strict sign-flip zero crossings (s·prev < 0, both
    * samples inside the frame), and a silence flag by integer peak
    * threshold. Every output is an integer count/sum — exact on any
    * engine. Partition-local map, zero shuffle. */
  final case class AudioFeatures(doc_id: Long, n_samples: Long,
      n_frames: Long, total_zc: Long, silent_frames: Long,
      max_frame_energy: Long)

  def audioFeatures(df: DataFrame, idCol: String, frameLen: Int,
      silencePeak: Int,
      payloadCol: String = "payload"): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        decodeWavPcm16(bytes) match {
          case Some((_, _, s)) =>
            var zc = 0L; var silent = 0L; var maxE = 0L
            var i = 0
            val n = s.length
            var frames = 0L
            while (i < n) {
              val end = math.min(i + frameLen, n)
              var e = 0L; var pk = 0; var j = i
              while (j < end) {
                val v = s(j).toInt
                e += v.toLong * v
                if (math.abs(v) > pk) pk = math.abs(v)
                if (j > i && s(j - 1).toInt * v < 0) zc += 1
                j += 1
              }
              if (pk < silencePeak) silent += 1
              if (e > maxE) maxE = e
              frames += 1
              i = end
            }
            AudioFeatures(id, n.toLong, frames, zc, silent, maxE)
          case None => AudioFeatures(id, 0L, 0L, 0L, 0L, 0L)
        }
      })
  }

  /** Per-FRAME audio feature rows (the exploded companion to
    * [[audioFeatures]] — one row per frame so downstream relational
    * logic can segment, join, or window over frames): integer energy
    * Σs², integer peak, silence flag by threshold. Partition-local
    * decode+frame walk, zero shuffle; frame count is bounded by
    * clip length / frameLen. */
  final case class FrameFeature(doc_id: Long, frame_idx: Long,
      energy: Long, peak: Int, silent: Boolean)

  def frameFeatures(df: DataFrame, idCol: String, frameLen: Int,
      silencePeak: Int,
      payloadCol: String = "payload"): Dataset[FrameFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytesOrNull) =>
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        decodeWavPcm16(bytes) match {
          case Some((_, _, s)) =>
            val out = scala.collection.mutable.ArrayBuffer
              .empty[FrameFeature]
            var i = 0; var f = 0L
            val n = s.length
            while (i < n) {
              val end = math.min(i + frameLen, n)
              var e = 0L; var pk = 0; var j = i
              while (j < end) {
                val v = s(j).toInt
                e += v.toLong * v
                if (math.abs(v) > pk) pk = math.abs(v)
                j += 1
              }
              out += FrameFeature(id, f, e, pk, pk < silencePeak)
              f += 1
              i = end
            }
            out.iterator
          case None => Iterator.empty
        }
      })
  }

  /** Image SHARPNESS / texture stats (the blur screen beside
    * [[imageQuality]]'s exposure screen — a training corpus drops
    * blurry frames before captioning): horizontal+vertical gradient
    * energy Σ|Δluma| over the integer Rec.709 luma grid, distinct-luma
    * count, and the dominant luma's pixel count (flat/synthetic-fill
    * detector). Every output is an exact integer — no transcendental,
    * no division. Partition-local decode+scan, zero shuffle. */
  final case class ImageSharpness(doc_id: Long, width: Int, height: Int,
      n_px: Long, grad_h: Long, grad_v: Long, n_distinct_luma: Long,
      dom_luma_count: Long)

  def imageSharpness(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[ImageSharpness] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        decodeBmp(bytes) match {
          case Some((w, h, px)) =>
            val lum = new Array[Long](w * h)
            var i = 0
            while (i < w * h) {
              lum(i) = 2126L * px(i * 3) + 7152L * px(i * 3 + 1) +
                722L * px(i * 3 + 2)
              i += 1
            }
            var gh = 0L; var gv = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = y * w + x
                if (x < w - 1) gh += math.abs(lum(p + 1) - lum(p))
                if (y < h - 1) gv += math.abs(lum(p + w) - lum(p))
                x += 1
              }
              y += 1
            }
            val counts = lum.groupBy(identity).map(_._2.length)
            ImageSharpness(id, w, h, (w.toLong * h), gh, gv,
              counts.size.toLong, counts.max.toLong)
          case None =>
            ImageSharpness(id, 0, 0, 0L, 0L, 0L, 0L, 0L)
        }
      })
  }

  /** Pinned integer DCT-II cosine table, cos(π(2k+1)u/16)×10³ rounded
    * half-up, flat index k*8+u. Embedded VERBATIM here and in the SQL
    * oracle so no engine ever evaluates a transcendental — the r5-r7
    * determinism lesson applied to signal processing. */
  private val dctCos: Array[Long] = Array(
    1000, 981, 924, 831, 707, 556, 383, 195,
    1000, 831, 383, -195, -707, -981, -924, -556,
    1000, 556, -383, -981, -707, 195, 924, 831,
    1000, 195, -924, -556, 707, 831, -383, -981,
    1000, -195, -924, 556, 707, -831, -383, 981,
    1000, -556, -383, 981, -707, -195, 924, -831,
    1000, -831, 383, 195, -707, 981, -924, 556,
    1000, -981, 924, -831, 707, -556, 383, -195)

  /** Perceptual hash (pHash, DCT variant — the image near-dup key of a
    * multimodal dedup pipeline, Zauner 2010): REAL decode, integer
    * Rec.709 luma (×10⁴ weights), 2-D DCT-II over the 8×8 luma grid
    * via [[dctCos]], the 15 top-left AC coefficients (4×4 minus DC),
    * bit i set iff coeff_i > median (8th order statistic of the 15 —
    * an exact integer compare, constant-offset brightness shifts only
    * move DC so they hash identically). Pure integer arithmetic end to
    * end: term bound 2.55e6·10³·10³·64 ≈ 1.6e14, inside Long.
    * Partition-local, zero shuffle; the hash is the key for banded
    * hamming dedup downstream. Non-8×8 or undecodable input hashes to
    * -1 (a sentinel bucket the caller filters). */
  final case class PHash(doc_id: Long, phash: Long)

  def phash8(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): Dataset[PHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytesOrNull) =>
        val bytes =
          if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
        val decoded: Option[(Int, Int, Int, Array[Int])] =
          decodeBmp(bytes).map { case (w, h, px) => (w, h, 3, px) }
            .orElse(decodePng(bytes))
            .orElse(decodeGif(bytes).map { case (w, h, px) =>
              (w, h, 3, px) })
            .orElse(Jpeg.decode(bytes))
        decoded match {
          case Some((8, 8, ch, px)) =>
            val lum = new Array[Long](64)
            var p = 0
            while (p < 64) {
              val base = p * ch
              lum(p) =
                if (ch == 1) 10000L * px(base)
                else 2126L * px(base) + 7152L * px(base + 1) +
                  722L * px(base + 2)
              p += 1
            }
            val coef = new Array[Long](15)
            var uvi = 1
            while (uvi <= 15) {
              val u = uvi % 4; val v = uvi / 4
              var s = 0L; var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  s += lum(y * 8 + x) * dctCos(x * 8 + u) *
                    dctCos(y * 8 + v)
                  x += 1
                }
                y += 1
              }
              coef(uvi - 1) = s
              uvi += 1
            }
            val med = coef.sorted.apply(7)
            var hash = 0L; var i = 0
            while (i < 15) {
              if (coef(i) > med) hash |= 1L << i
              i += 1
            }
            PHash(id, hash)
          case _ => PHash(id, -1L)
        }
      })
  }
}
