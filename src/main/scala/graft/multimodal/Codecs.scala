package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** REAL pure-JVM media codecs — no external libraries, no JNI:
  *
  *   - container sniffing by magic bytes (BMP / PNG / JPEG / WAV-RIFF);
  *   - header parsers that read dimensions / sample layout directly from the
  *     byte layout of each format (documented offset-by-offset below);
  *   - full image pixel decode + resize through `javax.imageio` (ships with
  *     the JDK's java.desktop module — BMP, PNG, JPEG readers are built in)
  *     with bilinear `Graphics2D` resampling, all headless-safe;
  *   - WAV PCM16 sample decode with block-aligned seeking.
  *
  * These are the decode seams [[Multimodal]] routes through: a payload whose
  * magic bytes identify a supported container takes the REAL path end to end
  * (parse → decode → transform); only unrecognized containers (e.g. video,
  * which has no pure-JVM decoder) fall back to the clearly-marked
  * deterministic stub.
  *
  * Everything here is executor-side, allocation-light, and driver-free: one
  * call per row inside a `mapPartitions` batch, no shared state.
  */
object Codecs {

  final case class ImageMeta(format: String, width: Int, height: Int, bitsPerPixel: Int)
  final case class WavMeta(channels: Int, sampleRate: Int, bitsPerSample: Int,
      dataOffset: Int, dataBytes: Int) {
    def blockAlign: Int = channels * math.max(bitsPerSample / 8, 1)
    def nSampleFrames: Int = if (blockAlign == 0) 0 else dataBytes / blockAlign
  }
  final case class Mp4Meta(majorBrand: String, timescale: Int,
      durationTicks: Long, nTracks: Int, width: Int, height: Int) {
    def durationSeconds: Double =
      if (timescale > 0) durationTicks.toDouble / timescale else 0.0
  }

  // ---- little/big-endian readers (bounds-checked by callers) -------------
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** Container sniff by magic bytes: "bmp" | "png" | "jpeg" | "wav" |
    * "gif" | "mp4" | "unknown". NULL-safe (a NULL binary cell sniffs
    * "unknown"). MP4/ISO-BMFF has no fixed magic at offset 0 — the
    * identifying invariant is the `ftyp` box type at offset 4 (the first
    * box of every ISO-BMFF file per ISO 14496-12 §4.3).
    */
  def sniff(b: Array[Byte]): String =
    if (b == null) "unknown"
    else if (b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
      b(7) == 'p') "mp4"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') "gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 8 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a &&
      u8(b, 7) == 0x0a) "png"
    else if (b.length >= 3 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 &&
      u8(b, 2) == 0xff) "jpeg"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else "unknown"

  /** Image dimensions straight from the header bytes — no pixel decode.
    *   - BMP: BITMAPINFOHEADER at offset 14; width LE32 @18, height LE32 @22
    *     (negative height = top-down rows → abs), bpp LE16 @28.
    *   - PNG: IHDR is always the first chunk at offset 8 (len BE32 + "IHDR");
    *     width BE32 @16, height BE32 @20, bit depth @24.
    *   - JPEG: walk FF-prefixed segments; SOF0/1/2 (baseline/extended/
    *     progressive) carry height BE16 @+5, width BE16 @+7, precision @+4.
    *   - GIF: logical screen descriptor right after the 6-byte signature;
    *     width LE16 @6, height LE16 @8, color resolution = LSD packed
    *     @10 bits 4-6 (+1 = bits per primary).
    */
  def imageMeta(b: Array[Byte]): Option[ImageMeta] = sniff(b) match {
    case "gif" if b.length >= 11 =>
      Some(ImageMeta("gif", le16(b, 6), le16(b, 8), ((u8(b, 10) >> 4) & 7) + 1))
    case "bmp" if b.length >= 30 =>
      Some(ImageMeta("bmp", le32(b, 18), math.abs(le32(b, 22)), le16(b, 28)))
    case "png" if b.length >= 26 &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R' =>
      Some(ImageMeta("png", be32(b, 16), be32(b, 20), u8(b, 24)))
    case "jpeg" =>
      var i = 2
      while (i + 9 < b.length && u8(b, i) == 0xff) {
        val marker = u8(b, i + 1)
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
          return Some(ImageMeta("jpeg", be16(b, i + 7), be16(b, i + 5), u8(b, i + 4) * 8))
        // 0xFF is a fill byte (spec allows any run before a marker): skip ONE
        // byte and resync — treating it as length-bearing desyncs the walk.
        // Standalone markers (D0-D9) have no length field.
        i += (if (marker == 0xff) 1
              else if (marker >= 0xd0 && marker <= 0xd9) 2
              else 2 + be16(b, i + 2))
      }
      None
    case _ => None
  }

  /** RIFF/WAVE chunk walk: "fmt " carries channels LE16 @+10, sampleRate
    * LE32 @+12, bitsPerSample LE16 @+22 (offsets from the chunk id); "data"
    * gives the PCM byte extent. Chunks are word-aligned (odd sizes pad 1).
    */
  def wavMeta(b: Array[Byte]): Option[WavMeta] = {
    if (sniff(b) != "wav") return None
    var channels, rate, bits = 0
    var dataOff, dataLen = -1
    var i = 12
    var ok = true
    while (ok && i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ' &&
        i + 24 <= b.length) {
        channels = le16(b, i + 10); rate = le32(b, i + 12); bits = le16(b, i + 22)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataOff = i + 8; dataLen = math.max(0, math.min(size, b.length - dataOff))
      }
      // malformed size guard (corrupt corpus payloads): a negative LE32 size
      // would pin `i` in place (infinite loop on an executor); a huge one
      // would overflow the offset — stop the walk, keep whatever parsed
      val next = i.toLong + 8L + size.toLong + (size & 1)
      if (size < 0 || next <= i || next > Int.MaxValue) ok = false
      else i = next.toInt
    }
    if (channels > 0 && dataOff >= 0) Some(WavMeta(channels, rate, bits, dataOff, dataLen))
    else None
  }

  /** PCM16 LE samples [from, from+n) of channel 0 — a REAL block-aligned
    * seek + decode (the audio analogue of frame extraction).
    */
  def wavSamples(b: Array[Byte], from: Int, n: Int): Option[Array[Int]] =
    wavMeta(b).filter(_.bitsPerSample == 16).map { m =>
      (from until math.min(from + n, m.nSampleFrames)).map { s =>
        le16(b, m.dataOffset + s * m.blockAlign).toShort.toInt
      }.toArray
    }

  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i) & 0xffffffffL) << 32) | (be32(b, i + 4) & 0xffffffffL)
  private def fourCC(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** One ISO-BMFF box walk level: calls `visit(type, payloadStart,
    * payloadEnd)` for each box in [from, to). Box header per ISO 14496-12
    * §4.2: size BE32 + type 4CC; size==1 → 64-bit largesize follows;
    * size==0 → box extends to the end of the enclosing scope. The same
    * malformed-size guards as [[wavMeta]]'s chunk walk: a size that fails
    * to advance the cursor (or overflows it) stops the walk instead of
    * pinning an executor in an infinite loop on a corrupt payload.
    */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)
      (visit: (String, Int, Int) => Unit): Unit = {
    var i = from
    var ok = true
    while (ok && i + 8 <= to) {
      val size32 = be32(b, i)
      val (payload, end) =
        if (size32 == 0) (i + 8L, to.toLong) // to end of scope
        else if (size32 == 1 && i + 16 <= to) (i + 16L, i + be64(b, i + 8))
        else (i + 8L, i + (size32 & 0xffffffffL))
      if (end <= i || payload > end || end > to) ok = false
      else {
        visit(fourCC(b, i + 4), payload.toInt, end.toInt)
        if (end.toInt <= i) ok = false else i = end.toInt
      }
    }
  }

  /** MP4/ISO-BMFF metadata straight from the box tree — no sample decode:
    *   - `ftyp` (always the first box): major brand 4CC at payload+0;
    *   - `moov`/`mvhd`: version byte at payload+0; v0 carries timescale
    *     BE32 at payload+12 and duration BE32 at payload+16 (after
    *     version/flags + two 32-bit times), v1 shifts them to +20/+24 with
    *     a 64-bit duration (two 64-bit times precede them);
    *   - `moov`/`trak`/`tkhd`: width/height as 16.16 fixed-point BE32 at
    *     payload+76/+80 (v0; after the 36-byte matrix) or +88/+92 (v1);
    *     the reported dims are the first track with a nonzero width
    *     (audio tracks carry 0×0), track count is the number of `trak`
    *     children.
    * None for payloads that don't sniff as "mp4" or whose moov/mvhd never
    * materializes (truncated or corrupt box tree).
    */
  def mp4Meta(b: Array[Byte]): Option[Mp4Meta] = {
    if (sniff(b) != "mp4") return None
    var brand = ""
    var timescale = 0; var duration = 0L
    var nTracks = 0; var width = 0; var height = 0
    var sawMvhd = false
    walkBoxes(b, 0, b.length) { (typ, p, end) =>
      typ match {
        case "ftyp" if p + 4 <= end => brand = fourCC(b, p)
        case "moov" =>
          walkBoxes(b, p, end) { (t2, p2, end2) =>
            t2 match {
              case "mvhd" if p2 + 20 <= end2 =>
                sawMvhd = true
                if (u8(b, p2) == 1 && p2 + 32 <= end2) {
                  timescale = be32(b, p2 + 20); duration = be64(b, p2 + 24)
                } else {
                  timescale = be32(b, p2 + 12)
                  duration = be32(b, p2 + 16) & 0xffffffffL
                }
              case "trak" =>
                nTracks += 1
                walkBoxes(b, p2, end2) { (t3, p3, end3) =>
                  if (t3 == "tkhd") {
                    val off = if (u8(b, p3) == 1) 88 else 76
                    if (p3 + off + 8 <= end3 && width == 0) {
                      val w = be32(b, p3 + off) >>> 16 // 16.16 fixed point
                      if (w > 0) {
                        width = w; height = be32(b, p3 + off + 4) >>> 16
                      }
                    }
                  }
                }
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    if (sawMvhd) Some(Mp4Meta(brand, timescale, duration, nTracks, width, height))
    else None
  }

  /** Keyframe samples out of an MP4 whose `mdat` holds SELF-DELIMITING BMP
    * payloads (the [[MediaSynth.mp4WithFrames]] convention: each sample's
    * length is its own BMP header's declared file size at offset 2 LE32,
    * standing in for the stsz/stco tables the skeleton writer does not
    * emit). Walk: locate the top-level `mdat` through the same guarded box
    * walk as [[mp4Meta]], then hop sample to sample by declared size.
    * Guards (the wavMeta rules — a corrupt payload must return None, never
    * pin an executor): every sample must carry the 'BM' magic, declare a
    * size ≥ the 54-byte header that stays inside the box, and strictly
    * advance the cursor; `maxFrames` bounds the walk so a pathological
    * mdat of thousands of tiny samples cannot balloon one row's output.
    */
  def mp4Frames(b: Array[Byte], maxFrames: Int = 64): Option[Vector[Array[Byte]]] = {
    if (sniff(b) != "mp4") return None
    var out = Vector.empty[Array[Byte]]
    var bad = false
    walkBoxes(b, 0, b.length) { (typ, p, end) =>
      if (typ == "mdat" && !bad) {
        var i = p
        while (!bad && i < end && out.size < maxFrames) {
          if (i + 6 > end || b(i) != 'B' || b(i + 1) != 'M') bad = true
          else {
            val sz = le32(b, i + 2) // the BMP's declared total byte length
            if (sz < 54 || i.toLong + sz > end) bad = true // long: no int wrap
            else {
              out = out :+ java.util.Arrays.copyOfRange(b, i, i + sz)
              i += sz
            }
          }
        }
      }
    }
    if (bad) None else Some(out)
  }

  /** Full pixel decode via the JDK's built-in readers (BMP/PNG/JPEG/GIF).
    * None when no reader claims the bytes (or the cell is NULL) — the
    * caller's stub seam.
    *
    * Uses an EXPLICIT in-memory ImageInputStream (r13): the
    * `ImageIO.read(InputStream)` convenience spools every call through a
    * TEMP FILE by default (`FileCacheImageInputStream` — getUseCache()
    * is true out of the box), which at one decode per document means the
    * per-doc cost is dominated by file creation syscalls and varies with
    * filesystem state — the shape behind the driver-flagged
    * q_media_resize bench wobble. The MemoryCache stream keeps decode
    * heap-only and deterministic in cost, without flipping the JVM-global
    * `ImageIO.setUseCache` switch on library consumers.
    */
  def decodeImage(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (b == null) None
    else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(b))
      // ImageIO.read(ImageInputStream) closes the stream itself once a
      // reader claims it (JDK behavior, despite the javadoc); the guarded
      // close below only matters on the no-reader path, where the stream
      // is still open — a second close on MemoryCacheImageInputStream
      // throws IOException("closed"), so swallow exactly that.
      try Option(javax.imageio.ImageIO.read(iis))
      finally {
        try iis.close() catch { case _: java.io.IOException => () }
      }
    }

  /** REAL resize: decode → bilinear Graphics2D resample → PNG re-encode.
    * Headless-safe (BufferedImage rasters never touch a display).
    */
  def resizeToPng(b: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    decodeImage(b).map { img =>
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val baos = new ByteArrayOutputStream()
      // explicit in-memory ImageOutputStream for the same reason as
      // decodeImage: the OutputStream convenience overload writes through
      // a FileCacheImageOutputStream temp file per call
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try javax.imageio.ImageIO.write(out, "png", ios)
      finally { ios.flush(); ios.close() }
      baos.toByteArray
    }
}
