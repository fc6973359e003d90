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
    def be16(v: Int): B = { u8(v >> 8); u8(v) }
    def be32(v: Int): B = { be16(v >> 16); be16(v) }
    def raw(p: Array[Byte]): B = { out.write(p); this }
    def zeros(n: Int): B = { for (_ <- 0 until n) u8(0); this }
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

  // ---- compressed still images (JDK ImageIO readers) ----------------

  private def encodeImage(pixels: Seq[Seq[(Int, Int, Int)]], fmt: String,
                          argb: Boolean = false): Array[Byte] = {
    val h = pixels.size; val w = pixels.head.size
    val t = if (argb) java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, t)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixels(y)(x)
      img.setRGB(x, y, 0xff000000 | (r << 16) | (g << 8) | b)
    }
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** Reference stats computed straight off `ImageIO.read` of the
    * encoded bytes — the writer-independent ground truth a real decode
    * must reproduce exactly (a decoder faking stats from the header
    * cannot hit it). */
  private def imageIoTruth(payload: Array[Byte]): (Double, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val vs = for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) yield {
      val p = img.getRGB(x, y)
      (0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
        0.114 * (p & 0xff)) / 255.0
    }
    meanRms(vs)
  }

  test("PNG decodes losslessly: stats match the BMP twin of the same pixels") {
    val png = encodeImage(px, "png")
    assert(Multimodal.isPng(png))
    val c = Multimodal.decodeImageIo(png).get
    assert((c.kind, c.width, c.height, c.channels) === (("image", 3, 2, 3)))
    // same per-pixel Rec.601 arithmetic as the BMP path; accumulation
    // ORDER differs (BMP folds in stored bottom-up row order), so the
    // two sums agree to rounding, not bit-for-bit
    val viaBmp = Multimodal.decodeBmp(bmp24(px)).get
    assert(close(c.signal_mean, viaBmp.signal_mean),
      s"${c.signal_mean} != ${viaBmp.signal_mean} — PNG and BMP paths diverged")
    assert(close(c.signal_rms, viaBmp.signal_rms))
    // alpha-carrying PNG reports 4 channels; the junk alpha is opaque
    val c4 = Multimodal.decodeImageIo(encodeImage(px, "png", argb = true)).get
    assert(c4.channels === 4)
    assert(close(c4.signal_mean, expMean))
  }

  test("GIF and JPEG stats equal ImageIO's own decoded pixels (writer may quantize)") {
    // the JDK GIF writer palettizes WITH dithering and JPEG is lossy,
    // so the original pixel stats are not the contract — reproducing
    // ImageIO's actual decoded pixels is (a header-only fake cannot)
    for (fmt <- Seq("gif", "jpg")) {
      val payload = encodeImage(px, fmt)
      assert(if (fmt == "gif") Multimodal.isGif(payload)
             else Multimodal.isJpeg(payload))
      val c = Multimodal.decodeImageIo(payload).get
      assert((c.width, c.height) === ((3, 2)), s"$fmt dims")
      val (tMean, tRms) = imageIoTruth(payload)
      assert(close(c.signal_mean, tMean),
        s"$fmt mean ${c.signal_mean} != decoded-pixel truth $tMean")
      assert(close(c.signal_rms, tRms))
      // and the decode is still recognizably the source image
      assert(math.abs(c.signal_mean - expMean) < 0.25,
        s"$fmt mean ${c.signal_mean} nowhere near source $expMean")
    }
  }

  // ---- video containers (pure JVM box/chunk walkers) -----------------

  /** ISO-BMFF box: 32-bit size header + type + payload. */
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    new B().be32(8 + body.length).ascii(typ).raw(body).bytes
  }

  /** tkhd with dims in 16.16 fixed point; v1 widens the time fields —
    * both version offsets must be exercised. */
  private def tkhd(w: Int, h: Int, v1: Boolean): Array[Byte] = {
    val b = new B
    b.u8(if (v1) 1 else 0).u8(0).u8(0).u8(7)
    b.zeros(if (v1) 32 else 20) // times / track id / reserved / duration
    b.zeros(8 + 8 + 36)         // reserved, layer/alt/volume/resv, matrix
    b.be32(w << 16).be32(h << 16)
    box("tkhd", b.bytes)
  }

  private def mdhd(timescale: Int, v1: Boolean): Array[Byte] = {
    val b = new B
    b.u8(if (v1) 1 else 0).u8(0).u8(0).u8(0)
    b.zeros(if (v1) 16 else 8) // creation/modification times
    b.be32(timescale)
    b.zeros(if (v1) 8 else 4)  // duration
    b.zeros(4)                 // language + quality
    box("mdhd", b.bytes)
  }

  private def hdlr(handler: String): Array[Byte] = {
    val b = new B
    b.zeros(4).zeros(4).ascii(handler).zeros(12).u8(0)
    box("hdlr", b.bytes)
  }

  private def stsz(count: Int): Array[Byte] = {
    val b = new B
    b.zeros(4).be32(0).be32(count)
    for (_ <- 0 until count) b.be32(100)
    box("stsz", b.bytes)
  }

  private def trak(handler: String, w: Int, h: Int, timescale: Int,
                   samples: Int, v1: Boolean): Array[Byte] =
    box("trak", tkhd(w, h, v1),
      box("mdia", mdhd(timescale, v1), hdlr(handler),
        box("minf", box("stbl", stsz(samples)))))

  private def mp4(videoFrames: Int, audioRate: Int): Array[Byte] = {
    val ftyp = box("ftyp",
      new B().ascii("isom").be32(0x200).ascii("isomiso2").bytes)
    // video track uses v1 headers, audio v0 — both offset paths covered
    val moov = box("moov",
      trak("vide", 320, 240, 30, videoFrames, v1 = true),
      trak("soun", 0, 0, audioRate, 0, v1 = false))
    val mdat = box("mdat", Array.fill[Byte](32)(0x55))
    ftyp ++ moov ++ mdat
  }

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val b = new B().ascii(id).le32(payload.length).raw(payload)
    if (payload.length % 2 == 1) b.u8(0)
    b.bytes
  }
  private def riffList(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    new B().ascii("LIST").le32(4 + body.length).ascii(typ).raw(body).bytes
  }

  private def avi(w: Int, h: Int, frames: Int, streams: Int,
                  audioRate: Int): Array[Byte] = {
    val avih = {
      val b = new B
      b.le32(33333).le32(0).le32(0).le32(0) // usec/frame, maxbps, pad, flags
      b.le32(frames).le32(0).le32(streams).le32(0)
      b.le32(w).le32(h).zeros(16)
      riffChunk("avih", b.bytes)
    }
    def strh(fcc: String, scale: Int, rate: Int) = {
      val b = new B
      b.ascii(fcc).zeros(4).le32(0).le16(0).le16(0).le32(0)
      b.le32(scale).le32(rate).zeros(28)
      riffChunk("strh", b.bytes)
    }
    val hdrl = riffList("hdrl", avih,
      riffList("strl", strh("vids", 1, 30)),
      riffList("strl", strh("auds", 2, 16000))) // rate/scale = 8000 Hz
    val movi = riffList("movi", riffChunk("00dc", Array.fill[Byte](9)(0x11)))
    val body = hdrl ++ movi
    new B().ascii("RIFF").le32(4 + body.length).ascii("AVI ").raw(body).bytes
  }

  test("MP4: box walk reads dims, frame count, track count, audio rate — both header versions") {
    val payload = mp4(videoFrames = 90, audioRate = 44100)
    assert(Multimodal.isMp4(payload))
    val c = Multimodal.decodeMp4(payload).get
    assert(c.kind === "video")
    assert((c.width, c.height) === ((320, 240)), "tkhd 16.16 dims (v1 offsets)")
    assert(c.frames === 90, "stsz sample count of the vide track")
    assert(c.channels === 2, "channels = track count")
    assert(c.sample_rate === 44100, "soun mdhd timescale")
    // codec payload is the disclosed seam: no pixel stats
    assert(c.signal_mean === 0.0 && c.signal_rms === 0.0)
  }

  test("AVI: hdrl walk reads avih dims/frames/streams and auds rate/scale") {
    val payload = avi(160, 120, frames = 48, streams = 2, audioRate = 8000)
    assert(Multimodal.isAvi(payload) && !Multimodal.isWav(payload))
    val c = Multimodal.decodeAvi(payload).get
    assert((c.kind, c.width, c.height) === (("video", 160, 120)))
    assert((c.frames, c.channels, c.sample_rate) === ((48, 2, 8000)))
  }

  test("malformed containers fall through, never crash or misreport") {
    // moov-less MP4 (ftyp + mdat only) → None → opaque fallback
    val noMoov = box("ftyp", new B().ascii("isom").be32(0).bytes) ++
      box("mdat", Array.fill[Byte](16)(1))
    assert(Multimodal.decodeMp4(noMoov).isEmpty)
    // truncated mid-box: the walker must stop, not read past the end
    val trunc = mp4(90, 44100).take(40)
    assert(Multimodal.decodeMp4(trunc).isEmpty)
    // RIFF/AVI missing avih → None; WAV is not routed to the AVI path
    val noAvih = new B().ascii("RIFF").le32(4).ascii("AVI ").bytes
    assert(Multimodal.decodeAvi(noAvih).isEmpty)
    assert(Multimodal.decodeAvi(wav(Seq(1, 2), 1, 8000, 16)).isEmpty)
    val row = Multimodal.MediaRow(9L, noMoov, "video/mp4", noMoov.length)
    assert(Multimodal.decodeContentOne(row).kind === "opaque")
  }

  /** Hand-built MPEG-1 Layer III frames: 128 kbps @ 44100 Hz →
    * 144·128000/44100 = 417 bytes/frame (no padding bit). */
  private def mp3(frames: Int, id3: Boolean = false,
                  mono: Boolean = false): Array[Byte] = {
    val b = new B
    if (id3) { b.ascii("ID3").u8(4).u8(0).u8(0).be32(5).zeros(5) }
    for (_ <- 0 until frames) {
      // sync(11) ver=3 layer=01 prot=1 | brIdx=9(128k) srIdx=0 pad=0 priv=0
      // | mode (00 stereo / 11 mono) ...
      b.u8(0xff).u8(0xfb).u8(0x90).u8(if (mono) 0xc0 else 0x00)
      b.zeros(417 - 4)
    }
    b.bytes
  }

  test("MP3: frame-header walk counts frames, reads rate and channel mode; ID3v2 skipped") {
    for (payload <- Seq(mp3(5), mp3(5, id3 = true))) {
      val c = Multimodal.decodeMp3(payload).get
      assert((c.kind, c.frames, c.sample_rate, c.channels) ===
        (("audio", 5, 44100, 2)))
      assert(c.signal_mean === 0.0, "payload decode is the disclosed seam")
    }
    assert(Multimodal.decodeMp3(mp3(3, mono = true)).get.channels === 1)
    // a single stray sync (< 2 consistent frames) must NOT read as audio
    assert(Multimodal.decodeMp3(mp3(1)).isEmpty)
    assert(Multimodal.decodeMp3(
      "plain text, definitely not audio frames".getBytes("UTF-8")).isEmpty)
    // truncated second frame: the walk stops at 1 consistent frame → None
    assert(Multimodal.decodeMp3(mp3(2).take(500)).isEmpty)
  }

  test("video metadata feeds frame sampling end to end") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (10L, mp4(90, 44100), "video/mp4"),
      (11L, avi(160, 120, 48, 2, 8000), "video/avi"))
      .map { case (id, p, f) => (id, p, f, p.length.toLong) }
      .toDF("doc_id", "payload", "format", "n_bytes")
    val content = Multimodal.extractContent(rows)
    assert(!content.queryExecution.executedPlan.toString.contains("Exchange"))
    val byId = content.collect().map(c => c.doc_id -> c).toMap
    assert(byId(10L).kind === "video" && byId(10L).frames === 90)
    assert(byId(11L).kind === "video" && byId(11L).frames === 48)
    // stride-30 sampling over the REAL frame counts: 90 → 0/30/60
    val sampled = Multimodal.sampleFrames(
      content.toDF(), stride = 30).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted).toMap
    assert(sampled(10L).toSeq === Seq(0, 30, 60))
    assert(sampled(11L).toSeq === Seq(0, 30))
  }

  test("extractContent: mixed media through the Spark operator, no shuffle") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, bmp24(px), "image/bmp"),
      (2L, wav(Seq(16384, -16384, 32767, -32768), 1, 8000, 16), "audio/wav"),
      (3L, "just text bytes that are neither format".getBytes("UTF-8"),
        "text/plain"),
      (4L, encodeImage(px, "png"), "image/png"))
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
    assert(byId(4L).kind === "image" && byId(4L).width === 3)
    assert(close(byId(4L).signal_mean, expMean))
    // the metadata surface sees the REAL dimensions for decodable media
    val feats = Multimodal.extractFeatures(rows).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).width === 3 && feats(1L).height === 2 &&
      feats(1L).channels === 3 && feats(1L).frames === 1)
    assert(feats(2L).channels === 1 && feats(2L).frames === 4)
  }
}
