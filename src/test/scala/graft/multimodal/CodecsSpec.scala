package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Golden-bytes tests for the REAL pure-JVM codecs: hand-assembled BMP and
  * WAV files with every header byte written explicitly, plus ImageIO-encoded
  * PNG/JPEG golden images — the parsers must read back exactly what the
  * bytes say, and the pixel paths must round-trip.
  */
class CodecsSpec extends AnyFunSuite {

  /** Minimal 24bpp bottom-up BMP: 2×2 pixels, rows padded to 4 bytes.
    * Layout: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40) + 2 rows × 8
    * bytes (6 pixel bytes + 2 pad). Pixels (BGR, bottom row first):
    * bottom = red, green; top = blue, white.
    */
  private def goldenBmp: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out.write('B'); out.write('M')
    le32(14 + 40 + 16)    // file size
    le32(0)               // reserved
    le32(14 + 40)         // pixel data offset
    le32(40)              // DIB header size
    le32(2); le32(2)      // width, height
    le16(1); le16(24)     // planes, bpp
    le32(0); le32(16)     // no compression, image size
    le32(2835); le32(2835); le32(0); le32(0) // ppm, palette
    // bottom row: red (00 00 FF), green (00 FF 00), pad
    out.write(Array[Byte](0, 0, -1, 0, -1, 0, 0, 0))
    // top row: blue (FF 00 00), white (FF FF FF), pad
    out.write(Array[Byte](-1, 0, 0, -1, -1, -1, 0, 0))
    out.toByteArray
  }

  /** Minimal PCM16 mono WAV @ 8000 Hz with samples 0, 1000, -1000, 32767,
    * -32768, 5, -5, 0.
    */
  private def goldenWav: Array[Byte] = {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 5, -5, 0)
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes); le32(36 + samples.length * 2)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(16)
    le16(1)       // PCM
    le16(1)       // mono
    le32(8000)    // sample rate
    le32(16000)   // byte rate
    le16(2)       // block align
    le16(16)      // bits per sample
    out.write("data".getBytes); le32(samples.length * 2)
    samples.foreach(s => le16(s & 0xffff))
    out.toByteArray
  }

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) << 8)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  test("sniff recognizes each container by magic bytes") {
    assert(Codecs.sniff(goldenBmp) === "bmp")
    assert(Codecs.sniff(goldenWav) === "wav")
    assert(Codecs.sniff(encode("png", 3, 2)) === "png")
    assert(Codecs.sniff(encode("jpg", 3, 2)) === "jpeg")
    assert(Codecs.sniff("just some text".getBytes) === "unknown")
    assert(Codecs.sniff(Array.emptyByteArray) === "unknown")
    assert(Codecs.sniff(MediaSynth.gif(2, 2, 255, 0, 0)) === "gif")
    assert(Codecs.sniff(encode("gif", 3, 2)) === "gif")
    // "GIF" alone isn't a GIF — the version bytes are part of the magic
    assert(Codecs.sniff("GIFfy".getBytes) === "unknown")
  }

  test("GIF round-trip: forward-written synthesizer bytes → header parse " +
    "→ ImageIO pixel decode") {
    val gif = MediaSynth.gif(5, 3, 200, 10, 30)
    // header parse: width LE16 @6, height LE16 @8, colorRes bits of LSD
    // packed (7+1 = 8 bits/primary as written)
    assert(Codecs.imageMeta(gif) === Some(Codecs.ImageMeta("gif", 5, 3, 8)))
    // the hand-rolled LZW stream must decode through the INDEPENDENT JDK
    // decoder to the exact solid color
    val img = Codecs.decodeImage(gif).get
    assert(img.getWidth === 5 && img.getHeight === 3)
    for (x <- 0 until 5; y <- 0 until 3)
      assert((img.getRGB(x, y) & 0xffffff) === ((200 << 16) | (10 << 8) | 30))
    // and the third-party (ImageIO, GIF89a) encoder parses the same way
    val external = encode("gif", 17, 9)
    val m = Codecs.imageMeta(external).get
    assert(m.format === "gif" && m.width === 17 && m.height === 9)
    // resize path accepts GIF input end-to-end
    val resized = Codecs.resizeToPng(gif, 4, 2).get
    assert(Codecs.imageMeta(resized).map(x => (x.width, x.height)) === Some((4, 2)))
  }

  test("BMP header parse reads the exact golden dimensions") {
    assert(Codecs.imageMeta(goldenBmp) === Some(Codecs.ImageMeta("bmp", 2, 2, 24)))
  }

  test("PNG and JPEG header parse match what ImageIO encoded") {
    val png = Codecs.imageMeta(encode("png", 17, 9))
    assert(png.map(m => (m.format, m.width, m.height)) === Some(("png", 17, 9)))
    val jpg = Codecs.imageMeta(encode("jpg", 33, 21))
    assert(jpg.map(m => (m.format, m.width, m.height)) === Some(("jpeg", 33, 21)))
  }

  test("BMP pixel decode returns the exact golden pixels") {
    val img = Codecs.decodeImage(goldenBmp).get
    assert(img.getWidth === 2 && img.getHeight === 2)
    def rgb(x: Int, y: Int): Int = img.getRGB(x, y) & 0xffffff
    assert(rgb(0, 0) === 0x0000ff) // top-left blue
    assert(rgb(1, 0) === 0xffffff) // top-right white
    assert(rgb(0, 1) === 0xff0000) // bottom-left red
    assert(rgb(1, 1) === 0x00ff00) // bottom-right green
  }

  test("resizeToPng really resamples: output decodes at the target size") {
    val out = Codecs.resizeToPng(goldenBmp, 8, 4).get
    assert(Codecs.sniff(out) === "png")
    val back = Codecs.decodeImage(out).get
    assert(back.getWidth === 8 && back.getHeight === 4)
    // non-decodable input -> None, never garbage
    assert(Codecs.resizeToPng("not an image".getBytes, 8, 4).isEmpty)
  }

  test("WAV header parse reads the exact golden layout") {
    val m = Codecs.wavMeta(goldenWav).get
    assert(m.channels === 1 && m.sampleRate === 8000 && m.bitsPerSample === 16)
    assert(m.blockAlign === 2 && m.nSampleFrames === 8)
    assert(m.dataOffset === 44 && m.dataBytes === 16)
  }

  test("WAV PCM16 decode returns the exact golden samples incl. extremes") {
    assert(Codecs.wavSamples(goldenWav, 0, 8).get.toSeq ===
      Seq(0, 1000, -1000, 32767, -32768, 5, -5, 0))
    // block-aligned seek mid-stream
    assert(Codecs.wavSamples(goldenWav, 3, 2).get.toSeq === Seq(32767, -32768))
    // reads clamp at the end instead of over-running
    assert(Codecs.wavSamples(goldenWav, 6, 99).get.toSeq === Seq(-5, 0))
  }

  test("malformed WAV chunk sizes terminate the walk (no executor hang/crash)") {
    // negative chunk size: increment would be 8 + (-8) + 0 = 0 → without the
    // guard the walk loops forever on one offset
    val neg = goldenWav.clone()
    neg(40) = -8; neg(41) = -1; neg(42) = -1; neg(43) = -1  // LE32 data size = -8... (0xFFFFFFF8)
    val m1 = Codecs.wavMeta(neg)                             // must return, not hang
    assert(m1.isEmpty || m1.get.dataBytes >= 0)
    // huge positive size: offset would overflow Int → must stop, keep fmt
    val huge = goldenWav.clone()
    huge(40) = -8; huge(41) = -1; huge(42) = -1; huge(43) = 0x7f  // 0x7FFFFFF8
    val m2 = Codecs.wavMeta(huge)
    assert(m2.isEmpty || m2.get.dataBytes >= 0)
  }

  test("JPEG fill bytes (0xFF runs before markers) are skipped, not parsed as length") {
    // golden JPEG from ImageIO, then inject two fill bytes after SOI
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val j = baos.toByteArray
    val filled = Array[Byte](j(0), j(1), 0xff.toByte, 0xff.toByte) ++ j.drop(2)
    val m = Codecs.imageMeta(filled)
    assert(m.exists(im => im.format == "jpeg" && im.width == 8 && im.height == 4),
      s"fill bytes desynced the segment walk: $m")
  }

  test("NULL payload cells decode as empty (stub row / None), never NPE") {
    assert(Codecs.sniff(null) === "unknown")
    assert(Codecs.decodeImage(null).isEmpty)
    assert(Codecs.resizeToPng(null, 2, 2).isEmpty)
    val meta = Multimodal.decodeMeta(9L, "binary", null)
    assert(meta.n_bytes === 0L && meta.container === "unknown")
  }

  test("decodeMeta routes real formats to real parsers, unknown to the stub") {
    val bmp = Multimodal.decodeMeta(1L, "image", goldenBmp)
    assert(bmp.container === "bmp" && bmp.width === 2 && bmp.height === 2)
    val wav = Multimodal.decodeMeta(2L, "audio", goldenWav)
    assert(wav.container === "wav" && wav.n_frames === 8 &&
      wav.sample_rate === 8000 && wav.channels === 1)
    val stub = Multimodal.decodeMeta(3L, "binary", "opaque".getBytes)
    assert(stub.container === "unknown" && stub.width >= 64)
    val mp4 = Multimodal.decodeMeta(4L, "video", MediaSynth.mp4(600, 1234,
      Seq((320, 180))))
    assert(mp4.container === "mp4" && mp4.width === 320 && mp4.height === 180 &&
      mp4.n_frames === 1234 && mp4.sample_rate === 600 && mp4.channels === 1)
  }

  // ---- MP4 / ISO-BMFF ------------------------------------------------

  /** Hand-assembled BMFF with v1 mvhd and v1 tkhd — every byte written
    * explicitly and independently of BOTH MediaSynth.mp4 (v0 writer) and
    * Codecs.mp4Meta, so the v1 offset branch is a true golden test.
    */
  private def goldenMp4V1(timescale: Int, duration: Long,
      w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def be64(v: Long): Unit = { be32((v >> 32).toInt); be32(v.toInt) }
    be32(16); out.write("ftyp".getBytes); out.write("mp41".getBytes); be32(0)
    // moov: mvhd v1 (120 bytes) + trak(8 + tkhd v1 104)
    be32(8 + 120 + 8 + 104); out.write("moov".getBytes)
    be32(120); out.write("mvhd".getBytes)
    be32(0x01000000)          // version 1, flags 0
    be64(0L); be64(0L)        // creation, modification (64-bit in v1)
    be32(timescale); be64(duration)
    be32(0x00010000); be32(0x01000000) // rate, volume+reserved
    be32(0); be32(0)          // reserved
    be32(0x00010000); be32(0); be32(0); be32(0); be32(0x00010000); be32(0)
    be32(0); be32(0); be32(0x40000000)
    for (_ <- 0 until 6) be32(0)
    be32(2)                   // next_track_ID
    be32(8 + 104); out.write("trak".getBytes)
    be32(104); out.write("tkhd".getBytes)
    be32(0x01000007)          // version 1, flags enabled|in-movie|in-preview
    be64(0L); be64(0L)        // creation, modification
    be32(1); be32(0)          // track_ID, reserved
    be64(duration)            // duration (64-bit in v1)
    be32(0); be32(0)          // reserved
    be32(0); be32(0)          // layer/altgroup, volume/reserved
    be32(0x00010000); be32(0); be32(0); be32(0); be32(0x00010000); be32(0)
    be32(0); be32(0); be32(0x40000000)
    be32(w << 16); be32(h << 16)
    out.toByteArray
  }

  test("MP4 round-trip: forward-written v0 skeleton → box walk reads the " +
    "exact parameters, incl. the multi-track first-video-dims rule") {
    val one = MediaSynth.mp4(600, 4321, Seq((640, 360)))
    assert(one.length === MediaSynth.mp4Bytes(1))
    assert(Codecs.sniff(one) === "mp4")
    assert(Codecs.mp4Meta(one) ===
      Some(Codecs.Mp4Meta("isom", 600, 4321L, 1, 640, 360)))
    // audio-style zero-dim track second: dims must come from the video one
    val two = MediaSynth.mp4(1200, 99, Seq((1920, 1080), (0, 0)))
    assert(two.length === MediaSynth.mp4Bytes(2))
    assert(Codecs.mp4Meta(two) ===
      Some(Codecs.Mp4Meta("isom", 1200, 99L, 2, 1920, 1080)))
    // zero-dim track FIRST: the walk must skip it, not report 0x0
    val flipped = MediaSynth.mp4(1200, 99, Seq((0, 0), (1280, 720)))
    assert(Codecs.mp4Meta(flipped).map(m => (m.width, m.height, m.nTracks)) ===
      Some((1280, 720, 2)))
    assert(Codecs.mp4Meta(one).get.durationSeconds === 4321.0 / 600.0)
  }

  test("MP4 v1 mvhd/tkhd (64-bit times) parse through the shifted offsets") {
    val g = goldenMp4V1(90000, 0x1_0000_0001L, 3840, 2160)
    assert(Codecs.mp4Meta(g) ===
      Some(Codecs.Mp4Meta("mp41", 90000, 0x1_0000_0001L, 1, 3840, 2160)))
  }

  test("malformed MP4 box sizes terminate the walk (no executor hang/crash)") {
    val ok = MediaSynth.mp4(600, 10, Seq((64, 64)))
    // size field that fails to advance (size < 8 but not 0/1) → stop
    val stuck = ok.clone(); stuck(0) = 0; stuck(1) = 0; stuck(2) = 0; stuck(3) = 4
    assert(Codecs.mp4Meta(stuck).isEmpty) // returned, didn't hang
    // truncated mid-moov: walk stops at the buffer edge
    val trunc = java.util.Arrays.copyOfRange(ok, 0, 40)
    assert(Codecs.mp4Meta(trunc).isEmpty)
    // size 0 = "to end of scope" on the LAST box is legal BMFF: patch the
    // moov size to 0 — everything must still parse
    val toEnd = ok.clone()
    toEnd(24) = 0; toEnd(25) = 0; toEnd(26) = 0; toEnd(27) = 0
    assert(Codecs.mp4Meta(toEnd) ===
      Some(Codecs.Mp4Meta("isom", 600, 10L, 1, 64, 64)))
    // largesize (size==1 + 64-bit length) on the ftyp box
    val ftypLarge = new java.io.ByteArrayOutputStream()
    ftypLarge.write(Array[Byte](0, 0, 0, 1))
    ftypLarge.write("ftyp".getBytes)
    ftypLarge.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 32)) // largesize 32
    ftypLarge.write("avc1".getBytes); ftypLarge.write(Array[Byte](0, 0, 0, 0))
    ftypLarge.write("avc1isom".getBytes)
    val rest = java.util.Arrays.copyOfRange(ok, 24, ok.length) // the moov
    val large = ftypLarge.toByteArray ++ rest
    assert(Codecs.mp4Meta(large) ===
      Some(Codecs.Mp4Meta("avc1", 600, 10L, 1, 64, 64)))
  }

  test("mp4Frames walks self-delimiting BMP samples out of the mdat and " +
    "returns the exact frame bytes in order") {
    val f0 = MediaSynth.bmpPixels(8, 8, (x, y) =>
      if ((x + y) % 2 == 0) (255, 255, 255) else (0, 0, 0))
    val f1 = MediaSynth.bmp(4, 4, 10, 20, 30) // different size than f0
    val v = MediaSynth.mp4WithFrames(600, 600, Seq((8, 8)), Seq(f0, f1))
    // the skeleton metadata is untouched by the appended mdat
    assert(Codecs.mp4Meta(v) === Some(Codecs.Mp4Meta("isom", 600, 600L, 1, 8, 8)))
    val frames = Codecs.mp4Frames(v).get
    assert(frames.size === 2)
    assert(frames(0).toSeq === f0.toSeq && frames(1).toSeq === f1.toSeq)
    // each slice is independently decodable
    assert(frames.forall(Codecs.decodeImage(_).isDefined))
    // no mdat at all -> zero frames, not an error (a metadata-only skeleton)
    assert(Codecs.mp4Frames(MediaSynth.mp4(600, 600, Seq((8, 8)))) ===
      Some(Vector()))
  }

  test("malformed mdat samples return None (no executor hang, no wild slice)") {
    val f0 = MediaSynth.bmp(4, 4, 1, 2, 3)
    val ok = MediaSynth.mp4WithFrames(600, 600, Seq((4, 4)), Seq(f0))
    val mdatPayload = ok.length - f0.length // first sample offset
    // sample magic corrupted -> None
    val badMagic = ok.clone(); badMagic(mdatPayload) = 'X'
    assert(Codecs.mp4Frames(badMagic).isEmpty)
    // declared sample size overruns the box -> None (never slices past it)
    val badSize = ok.clone()
    badSize(mdatPayload + 2) = -1; badSize(mdatPayload + 3) = -1
    badSize(mdatPayload + 4) = -1; badSize(mdatPayload + 5) = 0x7f
    assert(Codecs.mp4Frames(badSize).isEmpty)
    // declared size below the 54-byte header (cannot advance) -> None
    val tiny = ok.clone()
    tiny(mdatPayload + 2) = 8; tiny(mdatPayload + 3) = 0
    tiny(mdatPayload + 4) = 0; tiny(mdatPayload + 5) = 0
    assert(Codecs.mp4Frames(tiny).isEmpty)
    // a frame count past maxFrames stops at the cap instead of ballooning
    val many = MediaSynth.mp4WithFrames(600, 600, Seq((4, 4)),
      Seq.fill(10)(f0))
    assert(Codecs.mp4Frames(many, maxFrames = 3).get.size === 3)
  }
}
