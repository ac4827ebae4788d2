package graft.ops

import graft.SparkSpec

/** Baseline grayscale JPEG codec: huffman + dequant + IDCT written in
  * this repo. Block-constant images must round-trip EXACTLY (DC-only
  * blocks survive the uniform quant table); arbitrary images carry
  * bounded quantization error; unsupported frame types refuse. */
class JpegSpec extends SparkSpec {

  private def constBlocks(w: Int, h: Int, blockVal: (Int, Int) => Int)
      : Array[Int] =
    Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      blockVal(x / 8, y / 8) & 0xff
    }

  test("block-constant images round-trip bit-exact (DC-only path)") {
    // 4×2 blocks covering value extremes and odd values
    val vals = Array(0, 255, 128, 1, 77, 200, 33, 254)
    val px = constBlocks(32, 16, (bx, by) => vals(by * 4 + bx))
    val bytes = Jpeg.encodeGray(32, 16, px, quant = 8)
    val Some((w, h, got)) = Jpeg.decodeGray(bytes)
    assert(w == 32 && h == 16)
    assert(got.sameElements(px))
    // the container is a spec-conformant baseline JPEG sniff agrees with
    val m = Multimodal.sniff(1, bytes)
    assert(m.format == "jpeg" && m.width == 32 && m.height == 16 &&
      m.channels == 1)
  }

  test("arbitrary images decode within quantization error; gradients " +
    "exercise AC runs and ZRL") {
    val (w, h) = (24, 24)
    val ramp = Array.tabulate(w * h)(i => ((i % w) * 10 + (i / w) * 3) % 256)
    val noisy = Array.tabulate(w * h)(i => (i * i * 31 + i * 7 + 5) % 256)
    for ((px, name) <- Seq((ramp, "ramp"), (noisy, "noisy"))) {
      val Some((gw, gh, got)) = Jpeg.decodeGray(Jpeg.encodeGray(w, h, px, 4))
      assert(gw == w && gh == h, name)
      val maxErr = px.indices.map(i => math.abs(got(i) - px(i))).max
      assert(maxErr <= 24, s"$name maxErr=$maxErr") // ~quant·8/2 envelope
      val meanErr = px.indices.map(i => math.abs(got(i) - px(i))).sum /
        px.length.toDouble
      assert(meanErr <= 4.0, s"$name meanErr=$meanErr")
    }
  }

  test("non-multiple-of-8 dimensions: edge blocks replicate and crop") {
    val (w, h) = (13, 5)
    val px = constBlocks(w, h, (bx, by) => 40 + 60 * bx + 20 * by)
    val Some((gw, gh, got)) = Jpeg.decodeGray(Jpeg.encodeGray(w, h, px, 8))
    assert(gw == w && gh == h)
    assert(got.sameElements(px)) // constant blocks stay exact when cropped
  }

  test("restart markers: DRI interval honored, DC predictor resets") {
    val px = constBlocks(48, 8, (bx, _) => 20 + bx * 39) // 6 MCUs
    val bytes = Jpeg.encodeGray(48, 8, px, quant = 8, restartInterval = 2)
    // stream really contains RST markers (FFD0..FFD7 outside stuffing)
    val hasRst = bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "expected RSTn markers in the scan")
    val Some((_, _, got)) = Jpeg.decodeGray(bytes)
    assert(got.sameElements(px))
  }

  test("unsupported and corrupt streams refuse with None") {
    val good = Jpeg.encodeGray(16, 16, Array.fill(256)(90), 8)
    assert(Jpeg.decodeGray(good).isDefined)
    assert(Jpeg.decodeGray(good.dropRight(12)).isEmpty) // truncated scan
    assert(Jpeg.decodeGray(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(Jpeg.decodeGray(Array.empty[Byte]).isEmpty)
    // progressive frame: flip SOF0 marker to SOF2
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeGray(prog).isEmpty)
    // a color (3-component) SOF must refuse, not decode luma silently
    val colorSof = good.clone()
    colorSof(sofAt + 9) = 3.toByte // component count byte inside SOF
    assert(Jpeg.decodeGray(colorSof).isEmpty)
  }

  /** Closed-form prediction of the decoder's output for a CONSTANT
    * color: the planes are DC-only, so the round trip is the color
    * transform → one integer rounding per plane → inverse transform. */
  private def predictConstColor(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val y = 0.299 * r + 0.587 * g + 0.114 * b
    val cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    val cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    val yq = math.round(y - 128).toInt + 128
    val cbq = math.round(cb - 128).toInt + 128
    val crq = math.round(cr - 128).toInt + 128
    def clamp(d: Double) = math.max(0, math.min(255, math.round(d).toInt))
    (clamp(yq + 1.402 * (crq - 128)),
      clamp(yq - 0.344136 * (cbq - 128) - 0.714136 * (crq - 128)),
      clamp(yq + 1.772 * (cbq - 128)))
  }


  // ------------------------------------------------ progressive (SOF2)

  test("progressive gray decodes pixel-identical to sequential: the " +
    "scan sequence is a lossless reorganization of the same coefficients") {
    val (w, h) = (29, 21) // odd dims: partial edge blocks
    val noisy = Array.tabulate(w * h)(i => (i * i * 31 + i * 7 + 5) % 256)
    val ramp = Array.tabulate(w * h)(i => ((i % w) * 9 + (i / w) * 5) % 256)
    for ((px, name) <- Seq((noisy, "noisy"), (ramp, "ramp"))) {
      val seq = Jpeg.decodeGray(Jpeg.encodeGray(w, h, px, 4)).get._3
      val prog = Jpeg.encodeProgressive(w, h, 1, px, 4)
      val Some((gw, gh, got)) = Jpeg.decodeGray(prog)
      assert(gw == w && gh == h, name)
      assert(got.sameElements(seq), s"$name: progressive != sequential")
      val m = Multimodal.sniff(1, prog)
      assert(m.format == "jpeg" && m.width == w && m.height == h)
    }
  }

  test("progressive: sparse spike images exercise ZRL and EOB-heavy " +
    "refinement paths; block-constant images stay bit-exact") {
    val (w, h) = (40, 32)
    // mostly-flat image with isolated spikes → long zero runs, EOB
    // per block, newly-nonzero refinement coefficients
    val sparse = Array.tabulate(w * h) { i =>
      if (i % 97 == 0) 250 else if (i % 53 == 0) 3 else 120
    }
    val seq = Jpeg.decodeGray(Jpeg.encodeGray(w, h, sparse, 8)).get._3
    val Some((_, _, got)) =
      Jpeg.decodeGray(Jpeg.encodeProgressive(w, h, 1, sparse, 8))
    assert(got.sameElements(seq))
    // DC-only images survive the progressive DC first+refine chain
    val vals = Array(0, 255, 128, 1, 77, 200, 33, 254)
    val px = constBlocks(32, 16, (bx, by) => vals(by * 4 + bx))
    val Some((_, _, flat)) =
      Jpeg.decodeGray(Jpeg.encodeProgressive(32, 16, 1, px, 8))
    assert(flat.sameElements(px))
  }

  test("progressive color 4:4:4 matches sequential color decode; " +
    "interleaved DC scans + per-component AC band scans") {
    val (w, h) = (19, 13)
    val rgb = Array.tabulate(w * h * 3)(i => (i * 37 + (i % 3) * 91 + 11) % 256)
    val seq = Jpeg.decode(Jpeg.encodeColorRgb(w, h, rgb, 6, 1, 1)).get
    val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, 3, rgb, 6)).get
    assert(prog._1 == w && prog._2 == h && prog._3 == 3)
    assert(prog._4.sameElements(seq._4),
      "progressive color != sequential color")
  }

  test("progressive: truncated and corrupt scan data refuse with None") {
    val (w, h) = (16, 16)
    val px = Array.tabulate(w * h)(i => (i * 13 + 7) % 256)
    val good = Jpeg.encodeProgressive(w, h, 1, px, 8)
    assert(Jpeg.decode(good).isDefined)
    // cut inside the scan sequence: some scan's entropy data vanishes
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty)
    assert(Jpeg.decode(good.dropRight(8)).isEmpty) // EOI + tail gone
    // corrupt a huffman-coded byte mid-stream: decode fails, no garbage
    val bad = good.clone()
    val mid = good.length / 2
    bad(mid) = (bad(mid) ^ 0x7f).toByte
    // either refuses or still yields a full-size result (a bit flip in
    // entropy data may decode to different-but-valid symbols) — it must
    // never throw or hang
    Jpeg.decode(bad).foreach { case (gw, gh, ch, data) =>
      assert(gw == w && gh == h && data.length == w * h * ch)
    }
  }

  test("color 4:2:0 and 4:4:4: constant-color images round-trip to the " +
    "closed-form prediction; sniff sees 3 components") {
    for ((lh, lv) <- Seq((2, 2), (1, 1), (2, 1));
         (r, g, b) <- Seq((120, 121, 118), (200, 40, 90), (10, 250, 128))) {
      val (w, h) = (16, 16)
      val rgb = Array.tabulate(w * h * 3)(i => i % 3 match {
        case 0 => r; case 1 => g; case _ => b
      })
      val bytes = Jpeg.encodeColorRgb(w, h, rgb, quant = 8, lh, lv)
      val Some((gw, gh, ch, got)) = Jpeg.decode(bytes)
      assert(gw == w && gh == h && ch == 3, s"($lh,$lv) rgb($r,$g,$b)")
      val (er, eg, eb) = predictConstColor(r, g, b)
      assert(got(0) == er && got(1) == eg && got(2) == eb,
        s"($lh,$lv) rgb($r,$g,$b): got (${got(0)},${got(1)},${got(2)}), " +
          s"expected ($er,$eg,$eb)")
      // constant image: every pixel identical
      assert(got.grouped(3).map(_.toSeq).toSet.size == 1)
      val m = Multimodal.sniff(1, bytes)
      assert(m.format == "jpeg" && m.channels == 3)
    }
  }

  test("color: arbitrary images decode within quantization error; " +
    "4:2:0 chroma smoothing bounded on smooth gradients") {
    val (w, h) = (24, 16)
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      i % 3 match {
        case 0 => math.min(255, 30 + x * 6)
        case 1 => math.min(255, 40 + y * 8)
        case _ => math.min(255, 60 + (x + y) * 3)
      }
    }
    for ((lh, lv) <- Seq((1, 1), (2, 2))) {
      val Some((_, _, 3, got)) =
        Jpeg.decode(Jpeg.encodeColorRgb(w, h, rgb, quant = 4, lh, lv))
      val maxErr = rgb.indices.map(i => math.abs(got(i) - rgb(i))).max
      val meanErr = rgb.indices.map(i =>
        math.abs(got(i) - rgb(i))).sum / rgb.length.toDouble
      // 4:2:0 pays extra chroma-replication error on gradients
      val bound = if (lh == 2) 40 else 24
      assert(maxErr <= bound, s"($lh,$lv) maxErr=$maxErr")
      assert(meanErr <= 6.0, s"($lh,$lv) meanErr=$meanErr")
    }
  }

  test("decodePixels dispatches color JPEG with per-channel means") {
    val sp = spark
    import sp.implicits._
    val rgb = Array.tabulate(8 * 8 * 3)(i => i % 3 match {
      case 0 => 200; case 1 => 40; case _ => 90
    })
    val jp = Jpeg.encodeColorRgb(8, 8, rgb, quant = 8, 1, 1)
    val got = Multimodal.decodePixels(Seq((7L, jp)).toDF("doc_id", "payload"),
      "doc_id").collect().head
    val (er, eg, eb) = predictConstColor(200, 40, 90)
    assert(got.format == "jpeg" && got.mean_r == er.toDouble &&
      got.mean_g == eg.toDouble && got.mean_b == eb.toDouble)
  }

  test("decodePixels dispatches real JPEG decode (gray replicated)") {
    val sp = spark
    import sp.implicits._
    val jp = Jpeg.encodeGray(8, 8, Array.fill(64)(66), 8)
    val got = Multimodal.decodePixels(Seq((5L, jp)).toDF("doc_id", "payload"),
      "doc_id").collect().head
    assert(got.format == "jpeg" && got.width == 8 && got.height == 8 &&
      got.mean_r == 66.0 && got.mean_g == 66.0 && got.mean_b == 66.0)
  }
}
