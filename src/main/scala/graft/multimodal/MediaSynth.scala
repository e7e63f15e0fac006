package graft.multimodal

/** Deterministic media-payload synthesizers — the ENCODER half of the codec
  * differential gate. [[Codecs]] parses real byte layouts; these write the
  * same layouts from scalar parameters, so a Spark query can synthesize a
  * payload per row, push it through the REAL decode path, and a DuckDB
  * oracle can recompute every emitted field from the parameters with plain
  * arithmetic (q_media_meta / q_media_resize). No randomness, no
  * wall-clock: byte-identical output for equal inputs on every executor.
  */
object MediaSynth {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Rows are padded to 4-byte boundaries per the BMP spec. */
  def bmpRowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Total file size of a 24bpp BMP: 54-byte header + padded pixel rows. */
  def bmpBytes(width: Int, height: Int): Int = 54 + height * bmpRowStride(width)

  /** Solid-color 24bpp bottom-up BMP (BITMAPINFOHEADER), the format
    * [[Codecs.imageMeta]] parses and `javax.imageio` decodes. Pixel order in
    * a BMP row is B,G,R.
    */
  def bmp(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val stride = bmpRowStride(width)
    val total = bmpBytes(width, height)
    val out = new java.io.ByteArrayOutputStream(total)
    out.write('B'); out.write('M')
    out.write(le32(total)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40))                 // BITMAPINFOHEADER
    out.write(le32(width)); out.write(le32(height))
    out.write(le16(1)); out.write(le16(24))   // planes, bpp
    out.write(le32(0))                  // BI_RGB, uncompressed
    out.write(le32(height * stride))
    out.write(le32(2835)); out.write(le32(2835)) // 72 dpi
    out.write(le32(0)); out.write(le32(0))
    val row = new Array[Byte](stride)
    var x = 0
    while (x < width) {
      row(x * 3) = b.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = r.toByte
      x += 1
    }
    var y = 0
    while (y < height) { out.write(row); y += 1 }
    out.toByteArray
  }

  /** Per-pixel 24bpp bottom-up BMP — [[bmp]]'s layout with an arbitrary
    * pixel function `pix(x, y) = (r, g, b)`, y = 0 at the TOP (the writer
    * handles the BMP bottom-up row order). The q_media_dedup fixture paints
    * an 8×8 bit pattern with it: pixel (x, y) is white iff bit (y·8 + x) of
    * a doc-derived 62-bit key is set, so the REAL decode → area-average →
    * threshold pipeline must reproduce the key exactly ([[Phash.aHash]]
    * with strict > recovers any key with popcount < 64 — bright cells sit
    * above the mean, dark cells at-or-below).
    */
  def bmpPixels(width: Int, height: Int,
      pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = bmpRowStride(width)
    val total = bmpBytes(width, height)
    val out = new java.io.ByteArrayOutputStream(total)
    out.write('B'); out.write('M')
    out.write(le32(total)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40))
    out.write(le32(width)); out.write(le32(height))
    out.write(le16(1)); out.write(le16(24))
    out.write(le32(0))
    out.write(le32(height * stride))
    out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    val row = new Array[Byte](stride)
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow // bottom-up: first stored row is the last
      var x = 0
      while (x < width) {
        val (r, g, b) = pix(x, y)
        row(x * 3) = b.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = r.toByte
        x += 1
      }
      out.write(row)
      fileRow += 1
    }
    out.toByteArray
  }

  /** Solid-color GIF87a. Layout written forward, independent of both
    * [[Codecs.imageMeta]] (reader) and ImageIO (pixel decoder), so the
    * round-trip tests are genuine differentials:
    *   - 6-byte signature "GIF87a";
    *   - logical screen descriptor: width LE16 @6, height LE16 @8, packed
    *     @10 = GCT present | color-resolution 7 (8 bits/primary) | GCT size
    *     1 (4 entries), background 0, aspect 0;
    *   - global color table: entry 0 = (r,g,b), entries 1-3 black;
    *   - image descriptor (0x2C, full frame, no local table);
    *   - LZW data, min code size 2: the stream alternates CLEAR with literal
    *     index 0 for every pixel, then EOI. Re-clearing before each literal
    *     keeps the dictionary empty so every code stays 3 bits — valid LZW
    *     (a decoder emits the literal after CLEAR and adds nothing), at the
    *     price of ~6 bits/pixel, irrelevant for synthesis;
    *   - 0x00 sub-block terminator + 0x3B trailer.
    */
  def gif(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64 + width * height)
    out.write("GIF87a".getBytes("US-ASCII"))
    out.write(le16(width)); out.write(le16(height))
    out.write(0x80 | (7 << 4) | 1)       // GCT flag, colorRes=7, GCT size 2^2
    out.write(0); out.write(0)           // background index, aspect
    out.write(r); out.write(g); out.write(b)
    for (_ <- 0 until 9) out.write(0)    // palette entries 1-3 = black
    out.write(0x2c)                      // image descriptor
    out.write(le16(0)); out.write(le16(0))
    out.write(le16(width)); out.write(le16(height))
    out.write(0)                         // no LCT, not interlaced
    out.write(2)                         // LZW min code size
    // 3-bit codes LSB-first: CLEAR(4), 0 per pixel (re-cleared), EOI(5)
    val codes = Iterator(4) ++
      Iterator.range(0, width * height).flatMap(i =>
        if (i == 0) Iterator(0) else Iterator(4, 0)) ++ Iterator(5)
    var acc = 0L; var nBits = 0
    val data = new java.io.ByteArrayOutputStream()
    codes.foreach { c =>
      acc |= (c.toLong << nBits); nBits += 3
      while (nBits >= 8) { data.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
    }
    if (nBits > 0) data.write((acc & 0xff).toInt)
    // chunk into <=255-byte sub-blocks
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(255, bytes.length - off)
      out.write(n); out.write(bytes, off, n); off += n
    }
    out.write(0)                         // sub-block terminator
    out.write(0x3b)                      // trailer
    out.toByteArray
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Total file size of a canonical [[mp4]] skeleton: 24-byte ftyp +
    * moov header + 108-byte mvhd v0 + one 100-byte track (8-byte trak
    * header + 92-byte tkhd v0 box incl. its own 8-byte header) per
    * track — plain arithmetic for the oracle.
    */
  def mp4Bytes(nTracks: Int): Int = 24 + 8 + 108 + nTracks * (8 + 92)

  /** Minimal ISO-BMFF / MP4 skeleton, written forward and independent of
    * [[Codecs.mp4Meta]]'s box walk (the GIF/LZW differential precedent):
    *   - `ftyp` (24 bytes): major brand "isom", minor version 0,
    *     compatible brands "isom","mp42";
    *   - `moov` containing an mvhd v0 (canonical 108 bytes: version/flags,
    *     two zero times, timescale, duration, rate 1.0, volume 1.0,
    *     reserved, identity matrix, predefined, next-track-id) and one
    *     trak/tkhd v0 (92 bytes) per `(width, height)` in `tracks`, dims
    *     as 16.16 fixed point, identity matrix, track ids 1..n.
    * No mdat — a metadata skeleton is a valid BMFF file and the parser
    * under test never reads samples.
    */
  def mp4(timescale: Int, durationTicks: Int,
      tracks: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(mp4Bytes(tracks.size))
    // ftyp: size(4) + type(4) + major(4) + minor(4) + 2 compat brands(8)
    out.write(be32(24)); out.write("ftyp".getBytes("US-ASCII"))
    out.write("isom".getBytes("US-ASCII")); out.write(be32(0))
    out.write("isom".getBytes("US-ASCII"))
    out.write("mp42".getBytes("US-ASCII"))
    // moov
    out.write(be32(8 + 108 + tracks.size * (8 + 92)))
    out.write("moov".getBytes("US-ASCII"))
    // mvhd v0
    out.write(be32(108)); out.write("mvhd".getBytes("US-ASCII"))
    out.write(be32(0))                       // version 0 + flags
    out.write(be32(0)); out.write(be32(0))   // creation, modification
    out.write(be32(timescale)); out.write(be32(durationTicks))
    out.write(be32(0x00010000))              // rate 1.0 (16.16)
    out.write(be32(0x01000000))              // volume 1.0 (8.8 BE) + reserved16
    for (_ <- 0 until 2) out.write(be32(0))  // reserved
    out.write(be32(0x00010000)); out.write(be32(0)); out.write(be32(0)) // matrix
    out.write(be32(0)); out.write(be32(0x00010000)); out.write(be32(0))
    out.write(be32(0)); out.write(be32(0)); out.write(be32(0x40000000))
    for (_ <- 0 until 6) out.write(be32(0))  // pre_defined
    out.write(be32(tracks.size + 1))         // next_track_ID
    // trak/tkhd v0 per track
    tracks.zipWithIndex.foreach { case ((w, h), t) =>
      out.write(be32(8 + 92)); out.write("trak".getBytes("US-ASCII"))
      out.write(be32(92)); out.write("tkhd".getBytes("US-ASCII"))
      out.write(be32(7))                     // version 0, flags: enabled|in-movie|in-preview
      out.write(be32(0)); out.write(be32(0)) // creation, modification
      out.write(be32(t + 1))                 // track_ID
      out.write(be32(0))                     // reserved
      out.write(be32(durationTicks))
      for (_ <- 0 until 2) out.write(be32(0)) // reserved
      out.write(be32(0))                     // layer + alternate_group
      out.write(be32(0))                     // volume + reserved (video track)
      out.write(be32(0x00010000)); out.write(be32(0)); out.write(be32(0)) // matrix
      out.write(be32(0)); out.write(be32(0x00010000)); out.write(be32(0))
      out.write(be32(0)); out.write(be32(0)); out.write(be32(0x40000000))
      out.write(be32(w << 16)); out.write(be32(h << 16)) // 16.16 fixed
    }
    out.toByteArray
  }

  /** [[mp4]] skeleton plus an `mdat` box carrying `frames` back-to-back —
    * the minimal DECODABLE payload (r12, VERDICT r11 #7): each frame is a
    * SELF-DELIMITING sample (a BMP, whose own header declares its byte
    * length at offset 2 LE32), standing in for the stsz/stco sample tables
    * a full container would carry — the skeleton writer never emits those,
    * so the sample boundaries must live in the samples themselves for the
    * walk to be honest rather than hardcoded. Forward-written like every
    * MediaSynth layout; the frame walker ([[Codecs.mp4Frames]]) shares no
    * code with this.
    */
  def mp4WithFrames(timescale: Int, durationTicks: Int,
      tracks: Seq[(Int, Int)], frames: Seq[Array[Byte]]): Array[Byte] = {
    val head = mp4(timescale, durationTicks, tracks)
    val dataLen = frames.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(head.length + 8 + dataLen)
    out.write(head, 0, head.length)
    out.write(be32(8 + dataLen)); out.write("mdat".getBytes("US-ASCII"))
    frames.foreach(f => out.write(f, 0, f.length))
    out.toByteArray
  }

  /** Mono PCM16 RIFF/WAVE carrying caller-provided samples — the shaped-
    * payload writer behind q_media_audio_dedup (the WAV analogue of
    * [[bmpPixels]]' bit-pattern images). Same canonical 44-byte forward
    * layout as [[wav]]; the parser never shares this code.
    */
  def wavMono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    out.write(le32(36 + dataLen))
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    out.write(le32(16))
    out.write(le16(1))                  // PCM
    out.write(le16(1))                  // mono
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * 2))
    out.write(le16(2)); out.write(le16(16))
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    out.write(le32(dataLen))
    var s = 0
    while (s < samples.length) { out.write(le16(samples(s) & 0xffff)); s += 1 }
    out.toByteArray
  }

  /** PCM16 RIFF/WAVE with the canonical fmt+data layout [[Codecs.wavMeta]]
    * walks. Sample s of channel c is the deterministic ramp
    * `(s * 31 + c * 7) mod 32768` — seekable ground truth for
    * [[Codecs.wavSamples]].
    */
  def wav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataLen = nFrames * blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    out.write(le32(36 + dataLen))
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    out.write(le32(16))
    out.write(le16(1))                  // PCM
    out.write(le16(channels))
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * blockAlign))
    out.write(le16(blockAlign)); out.write(le16(16))
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    out.write(le32(dataLen))
    var s = 0
    while (s < nFrames) {
      var c = 0
      while (c < channels) { out.write(le16((s * 31 + c * 7) % 32768)); c += 1 }
      s += 1
    }
    out.toByteArray
  }
}
