package graft.llmdata

import java.io.ByteArrayOutputStream
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The real codecs: BMP and RIFF/WAVE-PCM assets built byte by byte
  * with known pixel/sample values, decoded down to signal statistics.
  * Padding bytes, alpha bytes, top-down row order, odd-sized RIFF
  * chunks, and non-PCM encodings are all laid as traps — a decoder
  * that only pretends to read the payload gets a wrong aggregate. */
class MultimodalSpec extends SparkSpec {

  // ---- byte builders --------------------------------------------------

  private class B {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): B = { out.write(v & 0xff); this }
    def le16(v: Int): B = { u8(v); u8(v >> 8) }
    def le32(v: Int): B = { le16(v); le16(v >> 16) }
    def ascii(s: String): B = { out.write(s.getBytes("US-ASCII")); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** 24-bit BI_RGB BMP; `pixels` are (r, g, b) rows top-to-bottom.
    * Rows are written bottom-up unless `topDown`; padding is 0xAA to
    * poison any decoder that fails to skip it. */
  private def bmp24(pixels: Seq[Seq[(Int, Int, Int)]],
                    topDown: Boolean = false): Array[Byte] = {
    val h = pixels.size; val w = pixels.head.size
    val rowSize = ((24 * w + 31) / 32) * 4
    val b = new B
    b.ascii("BM").le32(54 + rowSize * h).le32(0).le32(54)
    b.le32(40).le32(w).le32(if (topDown) -h else h)
      .le16(1).le16(24).le32(0).le32(rowSize * h)
      .le32(2835).le32(2835).le32(0).le32(0)
    val rows = if (topDown) pixels else pixels.reverse
    for (row <- rows) {
      for ((r, g, bl) <- row) b.u8(bl).u8(g).u8(r) // stored BGR
      for (_ <- 0 until rowSize - 3 * w) b.u8(0xAA)
    }
    b.bytes
  }

  /** 32-bit BI_RGB BMP with junk alpha bytes (must be ignored). */
  private def bmp32(pixels: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.size; val w = pixels.head.size
    val b = new B
    b.ascii("BM").le32(54 + 4 * w * h).le32(0).le32(54)
    b.le32(40).le32(w).le32(h).le16(1).le16(32).le32(0).le32(4 * w * h)
      .le32(2835).le32(2835).le32(0).le32(0)
    for (row <- pixels.reverse; (r, g, bl) <- row)
      b.u8(bl).u8(g).u8(r).u8(0x77)
    b.bytes
  }

  /** PCM WAV; 16-bit signed or 8-bit unsigned samples, interleaved.
    * `junkChunk` prepends an ODD-sized chunk before fmt to exercise
    * RIFF word alignment. */
  private def wav(samples: Seq[Int], channels: Int, rate: Int,
                  bits: Int, formatTag: Int = 1,
                  junkChunk: Boolean = false): Array[Byte] = {
    val bytesPer = bits / 8
    val dataSize = samples.size * bytesPer
    val b = new B
    val junkSize = if (junkChunk) 8 + 3 + 1 else 0 // header + 3 + pad
    b.ascii("RIFF").le32(4 + junkSize + 24 + 8 + dataSize).ascii("WAVE")
    if (junkChunk) { b.ascii("junk").le32(3).u8(1).u8(2).u8(3).u8(0) }
    b.ascii("fmt ").le32(16).le16(formatTag).le16(channels).le32(rate)
      .le32(rate * channels * bytesPer).le16(channels * bytesPer).le16(bits)
    b.ascii("data").le32(dataSize)
    for (s <- samples) if (bits == 16) b.le16(s) else b.u8(s)
    b.bytes
  }

  private def lum(p: (Int, Int, Int)): Double =
    (0.299 * p._1 + 0.587 * p._2 + 0.114 * p._3) / 255.0
  private def meanRms(vs: Seq[Double]): (Double, Double) =
    (vs.sum / vs.size, math.sqrt(vs.map(v => v * v).sum / vs.size))
  private def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-12

  private val px = Seq(
    Seq((255, 255, 255), (0, 0, 0), (255, 0, 0)),
    Seq((0, 255, 0), (0, 0, 255), (51, 51, 51)))
  private val (expMean, expRms) = meanRms(px.flatten.map(lum))

  test("BMP: 24-bit bottom-up, top-down, and 32-bit all decode to the same pixels") {
    for (payload <- Seq(bmp24(px), bmp24(px, topDown = true), bmp32(px))) {
      val c = Multimodal.decodeBmp(payload).get
      assert((c.width, c.height, c.frames) === ((3, 2, 1)))
      assert(c.kind === "image")
      assert(close(c.signal_mean, expMean),
        s"${c.signal_mean} != $expMean — row padding or BGR order misread")
      assert(close(c.signal_rms, expRms))
    }
    assert(Multimodal.decodeBmp(bmp24(px)).get.channels === 3)
    assert(Multimodal.decodeBmp(bmp32(px)).get.channels === 4)
  }

  test("WAV: PCM16 mono with full-scale samples; chunk walker survives odd junk") {
    val samples = Seq(16384, -16384, 32767, -32768)
    val norm = samples.map(_.toDouble / 32768.0)
    val (m, r) = meanRms(norm)
    for (payload <- Seq(wav(samples, 1, 8000, 16),
                        wav(samples, 1, 8000, 16, junkChunk = true))) {
      val c = Multimodal.decodeWav(payload).get
      assert((c.kind, c.channels, c.sample_rate, c.frames) ===
        (("audio", 1, 8000, 4)))
      assert(close(c.signal_mean, m), s"${c.signal_mean} != $m")
      assert(close(c.signal_rms, r))
    }
  }

  test("WAV: 8-bit stereo normalizes around the 128 midpoint; frames count pairs") {
    val samples = Seq(128, 255, 0, 128) // L R L R
    val norm = samples.map(s => (s - 128).toDouble / 128.0)
    val (m, r) = meanRms(norm)
    val c = Multimodal.decodeWav(wav(samples, 2, 44100, 8)).get
    assert((c.channels, c.sample_rate, c.frames) === ((2, 44100, 2)))
    assert(close(c.signal_mean, m) && close(c.signal_rms, r))
  }

  test("non-PCM WAV and compressed payloads fall to the opaque seam") {
    // format tag 85 = MP3-in-RIFF: parseable header, undecodable data
    assert(Multimodal.decodeWav(
      wav(Seq(1, 2), 1, 8000, 16, formatTag = 85)).isEmpty)
    val jpegish = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++
      Array.fill(60)(0x42.toByte)
    assert(Multimodal.decodeBmp(jpegish).isEmpty)
    assert(Multimodal.decodeWav(jpegish).isEmpty)
    val row = Multimodal.MediaRow(7L, jpegish, "image/jpeg", jpegish.length)
    assert(Multimodal.decodeContentOne(row).kind === "opaque")
  }

  test("extractContent: mixed media through the Spark operator, no shuffle") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, bmp24(px), "image/bmp"),
      (2L, wav(Seq(16384, -16384, 32767, -32768), 1, 8000, 16), "audio/wav"),
      (3L, "just text bytes that are neither format".getBytes("UTF-8"),
        "text/plain"))
      .map { case (id, p, f) => (id, p, f, p.length.toLong) }
      .toDF("doc_id", "payload", "format", "n_bytes")
    val out = Multimodal.extractContent(rows)
    // partition-local: the decode adds no Exchange
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val byId = out.collect().map(c => c.doc_id -> c).toMap
    assert(byId(1L).kind === "image" && byId(1L).width === 3)
    assert(close(byId(1L).signal_mean, expMean))
    assert(byId(2L).kind === "audio" && byId(2L).frames === 4)
    assert(byId(3L).kind === "opaque")
    // the metadata surface sees the REAL dimensions for decodable media
    val feats = Multimodal.extractFeatures(rows).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).width === 3 && feats(1L).height === 2 &&
      feats(1L).channels === 3 && feats(1L).frames === 1)
    assert(feats(2L).channels === 1 && feats(2L).frames === 4)
  }
}
