package graft.ops

import graft.SparkSpec
import java.nio.{ByteBuffer, ByteOrder}

/** Container-header sniffing over raw bytes — fixture headers are
  * built to the published layouts (PNG IHDR, JPEG SOF scan, GIF/BMP
  * fixed offsets, canonical RIFF/WAVE). */
class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int, colorType: Byte): Array[Byte] = {
    val b = ByteBuffer.allocate(26)
    b.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h).put(8.toByte).put(colorType)
    b.array()
  }

  private def jpeg(w: Int, h: Int, comps: Byte): Array[Byte] = {
    val b = ByteBuffer.allocate(64)
    b.put(0xff.toByte).put(0xd8.toByte)
    // APP0 segment the scanner must skip
    b.put(0xff.toByte).put(0xe0.toByte).putShort(16)
      .put(new Array[Byte](14))
    // SOF0: len 11, precision, height, width, n components
    b.put(0xff.toByte).put(0xc0.toByte).putShort(11)
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(comps)
    b.array()
  }

  private def wav(channels: Int, rate: Int, secs: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataLen = rate.toLong * blockAlign * secs
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt((36 + dataLen).toInt)
      .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen.toInt)
    b.array()
  }

  test("PNG IHDR: dimensions and color-type channel mapping") {
    val m = Multimodal.sniff(1, png(640, 480, 6))
    assert(m.format == "png" && m.width == 640 && m.height == 480 &&
      m.channels == 4)
    assert(Multimodal.sniff(2, png(1, 1, 0)).channels == 1)
    assert(Multimodal.sniff(3, png(8192, 4096, 2)).width == 8192)
  }

  test("JPEG: marker scan skips APP segments and reads SOF dims") {
    val m = Multimodal.sniff(1, jpeg(1024, 768, 3))
    assert(m.format == "jpeg" && m.width == 1024 && m.height == 768 &&
      m.channels == 3)
  }

  test("GIF and BMP fixed-offset dims") {
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xf0.toByte, 0x00) // 320 x 240 LE
    val g = Multimodal.sniff(1, gif)
    assert(g.format == "gif" && g.width == 320 && g.height == 240)
    val bmp = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
      .put('B'.toByte).put('M'.toByte).put(new Array[Byte](16))
      .putInt(800).putInt(600).array()
    val b = Multimodal.sniff(2, bmp)
    assert(b.format == "bmp" && b.width == 800 && b.height == 600)
    // top-down BMP: biHeight stored negative, magnitude is the height
    val topDown = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
      .put('B'.toByte).put('M'.toByte).put(new Array[Byte](16))
      .putInt(800).putInt(-600).array()
    val td = Multimodal.sniff(3, topDown)
    assert(td.format == "bmp" && td.width == 800 && td.height == 600)
  }

  test("WAV: channels, rate, and data-length-derived duration") {
    val m = Multimodal.sniff(1, wav(channels = 2, rate = 44100, secs = 3))
    assert(m.format == "wav" && m.channels == 2 &&
      m.sample_rate == 44100 && m.duration_ms == 3000)
  }

  test("truncated, empty, and garbage payloads degrade to 'unknown', " +
    "never a task failure") {
    assert(Multimodal.sniff(1, Array.empty[Byte]).format == "unknown")
    assert(Multimodal.sniff(2, Array[Byte](1, 2, 3)).format == "unknown")
    assert(Multimodal.sniff(3, png(640, 480, 6).take(10)).format == "unknown")
    // JPEG SOI with no SOF: stays jpeg-tagged but zero dims
    val m = Multimodal.sniff(4, Array(0xff.toByte, 0xd8.toByte, 0x00, 0x00))
    assert(m.width == 0 && m.height == 0)
  }

  test("sniffHeaders is partition-local over a DataFrame binary column") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, png(640, 480, 2)), (2L, wav(1, 8000, 2)), (3L, Array[Byte](9)))
    val out = Multimodal.sniffHeaders(
        rows.toDF("doc_id", "payload"), "doc_id")
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).format == "png" && out(1L).channels == 3)
    assert(out(2L).format == "wav" && out(2L).duration_ms == 2000)
    assert(out(3L).format == "unknown")
    val plan = Multimodal.sniffHeaders(
      rows.toDF("doc_id", "payload"), "doc_id").queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), "header sniffing must not shuffle")
  }
}
