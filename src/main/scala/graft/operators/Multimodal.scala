package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batches.
  *
  * Header decode is REAL for the common image containers — PNG (IHDR), JPEG
  * (SOF scan), GIF (logical screen descriptor + image-descriptor frame
  * count) — parsed directly from the payload bytes per the public format
  * specs, pure JVM. Feature extraction and resize are REAL for PNG, JPEG,
  * and GIF payloads: pixel decode via `javax.imageio` with per-channel
  * mean/std statistics ([[pixelFeatures]]). Audio is REAL for RIFF/PCM
  * WAV payloads ([[parseWav]] / [[extractWavFeatures]] — header fields and
  * per-channel RMS/peak are pure public byte parsing, no codec needed).
  * Video is REAL for AVI containers ([[parseAvi]] — header dims + counted
  * `movi` frame chunks), and for MJPEG streams the first frame decodes
  * through the image pixel path ([[firstAviFrame]] — each `00dc` chunk is
  * a complete JPEG). Compressed-audio METADATA is REAL for MPEG-1/2
  * Layer III streams ([[parseMp3]] / [[extractMp3Features]] — the 4-byte
  * frame-header walk is the public ISO/IEC 11172-3 spec, no codec) and
  * for FLAC ([[parseFlac]] / [[extractFlacFeatures]] — the STREAMINFO
  * bit fields per RFC 9639).
  * Payloads that are none of these fall back to the
  * **clearly marked deterministic STUB** paths (`stubDecode`,
  * `stubFeature`): no audio-DECODE codec or non-MJPEG video codec
  * ships in this container, so those derive fake but stable values from
  * the payload bytes. Swapping in a richer codec or embedding model means
  * replacing exactly those functions; the `mapPartitions` batch contract
  * stays.
  */
object Multimodal {

  // ImageIO's default stream cache is FILE-backed: every decode of an
  // in-memory byte array writes (and deletes) a temp cache file. All
  // payloads here are byte arrays already in memory, so the disk bounce is
  // pure per-frame overhead on the decode hot path (guide §1.2 per-task
  // work) — use the memory-backed cache. Decoded pixels are unaffected.
  javax.imageio.ImageIO.setUseCache(false)

  /** One bulk getRGB of the whole decoded image — the exact ints
    * per-pixel `img.getRGB(x, y)` returns (both run the same ColorModel
    * conversion), in one call instead of w·h: the per-pixel accessor
    * re-enters the color model and bounds checks per call and dominated
    * decode-side CPU in the round-19 profiles. Row-major: pixel (x, y)
    * is `arr(y * w + x)`.
    */
  private def rgbArray(img: java.awt.image.BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  /** Exact integer mean-RGB of a decoded frame as (sumR, sumG, sumB) —
    * shared by the shot-boundary walks; divide by w·h at the caller.
    */
  private def rgbSums(arr: Array[Int]): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < arr.length) {
      val p = arr(i)
      sr += (p >>> 16) & 0xFF; sg += (p >>> 8) & 0xFF; sb += p & 0xFF
      i += 1
    }
    (sr, sg, sb)
  }

  /** Decoded-media metadata row. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Int,
      format: String,
      width: Int,
      height: Int,
      frame_count: Int)

  /** ==== STUB ==== deterministic fake decode: derives metadata from the
    * payload length alone so an external oracle can reproduce it. A real
    * implementation would parse the container header here.
    */
  def stubDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(
      doc_id = id,
      byte_len = n,
      format = "stub",
      width = 64 + n % 512,
      height = 64 + (n / 7) % 512,
      frame_count = 1 + n % 16)
  }

  // ---------------- real container-header parsing ----------------

  @inline private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  @inline private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  @inline private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  @inline private def le16s(b: Array[Byte], i: Int): Int = (le16(b, i) << 16) >> 16

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first per spec) —
    * width/height are big-endian u32 at payload offsets 16/20.
    */
  private def parsePng(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 33 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w > 0 && h > 0) Some(("png", w, h)) else None
    } else None

  /** BMP (Windows DIB): 'BM' magic, BITMAPINFOHEADER (size ≥ 40) with
    * little-endian width/height at offsets 18/22 (negative height =
    * top-down — dimensions reported absolute), exactly one plane, and a
    * defined bit depth. Core-header (BITMAPCOREHEADER, size 12) and
    * malformed payloads are rejected.
    */
  private def parseBmp(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M' && le32(b, 14) >= 40) {
      val w = le32(b, 18); val h = le32(b, 22)
      val planes = le16(b, 26); val bpp = le16(b, 28)
      if (w > 0 && h != 0 && planes == 1 &&
          Set(1, 4, 8, 16, 24, 32).contains(bpp))
        Some(("bmp", w, math.abs(h)))
      else None
    } else None

  /** JPEG: SOI marker, then scan marker segments until a start-of-frame
    * (SOF0-15 minus DHT/JPG/DAC); height/width are big-endian u16 at frame
    * header offsets 3/5.
    */
  private def parseJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xFF) == 0xFF) {
      // consume 0xFF fill/padding bytes before the marker byte (legal per
      // the spec) — without this a padded stream would misread the second
      // 0xFF as part of a segment length and skip to a bogus offset
      while (i + 4 <= b.length && (b(i + 1) & 0xFF) == 0xFF) i += 1
      val marker = b(i + 1) & 0xFF
      val isSof = marker >= 0xC0 && marker <= 0xCF &&
        marker != 0xC4 && marker != 0xC8 && marker != 0xCC
      if (isSof) {
        if (i + 9 > b.length) return None
        val h = be16(b, i + 5); val w = be16(b, i + 7)
        return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
      } else if (marker == 0xD8 || marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) {
        i += 2 // standalone markers carry no length
      } else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return None
        i += 2 + segLen
      }
    }
    None
  }

  /** GIF87a/89a: width/height little-endian u16 at offsets 6/8. */
  private def parseGif(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0) Some(("gif", w, h)) else None
    } else None

  /** REAL GIF frame count: walk the data stream counting image descriptors
    * (0x2C blocks) — skip the global color table per its LSD flag, skip
    * extension blocks (0x21 label + sub-blocks) and each frame's local
    * color table + LZW sub-blocks, stop at the 0x3B trailer. A truncated /
    * malformed stream stops the walk; a stream with no countable
    * descriptor reports 1 (the static-image reading of the header).
    */
  private def gifFrameCount(b: Array[Byte]): Int = {
    // parseGif accepts >= 10 bytes (header + LSD dims), but the walk needs
    // the packed byte at 10 and starts at 13: a truncated stream is a
    // single-frame header, not an ArrayIndexOutOfBounds
    if (b.length < 13) return 1
    def skipSubBlocks(start: Int): Int = {
      var p = start
      while (p < b.length && b(p) != 0) p += 1 + (b(p) & 0xFF)
      p + 1 // block terminator
    }
    var pos = 13
    val packed = b(10) & 0xFF
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1)) // global color table
    var frames = 0
    var done = false
    while (!done && pos < b.length) {
      (b(pos) & 0xFF) match {
        case 0x21 => // extension: introducer + label, then sub-blocks
          pos = skipSubBlocks(pos + 2)
        case 0x2C => // image descriptor
          frames += 1
          if (pos + 10 > b.length) done = true
          else {
            val ip = b(pos + 9) & 0xFF
            pos += 10
            if ((ip & 0x80) != 0) pos += 3 * (1 << ((ip & 7) + 1)) // local color table
            pos += 1 // LZW minimum code size
            pos = skipSubBlocks(pos)
          }
        case 0x3B => done = true // trailer
        case _ => done = true // malformed: stop, keep what was counted
      }
    }
    math.max(frames, 1)
  }

  // ---------------- real WAV/PCM audio parsing ----------------

  /** Parsed RIFF/WAVE facts: linear-PCM format fields plus the location of
    * the sample data inside the payload.
    */
  final case class WavInfo(
      sampleRate: Int, channels: Int, bitDepth: Int, dataOff: Int, dataLen: Int)

  /** REAL WAV header parse — RIFF/PCM needs NO codec: a strict chunk walk
    * per the public RIFF spec ("RIFF"<size>"WAVE", then word-aligned
    * <id><size> chunks), keeping the `fmt ` fields (PCM format tag 1 only,
    * 8- or 16-bit) and the `data` chunk extent. Returns None for anything
    * malformed, truncated, or non-PCM — callers fall back or dead-letter,
    * never throw.
    */
  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44 ||
        !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var p = 12
    var sr = 0; var ch = 0; var bits = 0; var fmtOk = false
    var dOff = -1; var dLen = 0
    while (p + 8 <= b.length) {
      val sz = le32(b, p + 4)
      if (sz < 0 || p + 8 + sz > b.length) return None // truncated chunk
      if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' && b(p + 3) == ' ' && sz >= 16) {
        val tag = le16(b, p + 8)
        ch = le16(b, p + 10)
        sr = le32(b, p + 12)
        bits = le16(b, p + 22)
        fmtOk = tag == 1 && ch >= 1 && (bits == 8 || bits == 16)
      } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' && b(p + 3) == 'a') {
        dOff = p + 8; dLen = sz
      }
      p += 8 + sz + (sz & 1) // chunks are word-aligned per RIFF
    }
    if (fmtOk && sr > 0 && dOff >= 0) Some(WavInfo(sr, ch, bits, dOff, dLen))
    else None
  }

  // ---------------- real AVI/MJPEG video parsing ----------------

  /** Parsed AVI facts: main-header dimensions, the frame count (counted
    * `NNdc`/`NNdb` chunks in the `movi` list when present, else the
    * header's declared total), and the first video stream's codec fourcc.
    */
  final case class AviInfo(width: Int, height: Int, frames: Int, fourcc: String)

  /** REAL AVI header parse — the video container, like WAV, is pure RIFF
    * byte walking, NO codec needed: `RIFF…AVI ` → recurse through `LIST`
    * chunks, read `avih` (56-byte main header: dwTotalFrames at data
    * offset 16, dwWidth/dwHeight at 32/36), take the first `vids` stream's
    * handler fourcc from `strh`, and COUNT the actual frame chunks inside
    * the `movi` list (ids `NNdc`/`NNdb`) rather than trusting the declared
    * total. None for anything malformed or truncated.
    */
  def parseAvi(b: Array[Byte]): Option[AviInfo] = {
    if (b.length < 24 ||
        !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
    var w = 0; var h = 0; var declared = 0; var counted = 0
    var fourcc = ""; var sawAvih = false
    def fcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    def isFrameChunk(p: Int): Boolean =
      b(p) >= '0' && b(p) <= '9' && b(p + 1) >= '0' && b(p + 1) <= '9' &&
        (b(p + 2) == 'd' && (b(p + 3) == 'c' || b(p + 3) == 'b'))
    def walk(start: Int, end: Int, inMovi: Boolean): Boolean = {
      var p = start
      while (p + 8 <= end) {
        val sz = le32(b, p + 4)
        if (sz < 0 || p + 8 + sz > end) return false // truncated chunk
        if (fcc(p) == "LIST" && sz >= 4) {
          val listType = fcc(p + 8)
          if (!walk(p + 12, p + 8 + sz, inMovi || listType == "movi")) return false
        } else if (fcc(p) == "avih" && sz >= 40) {
          declared = le32(b, p + 8 + 16)
          w = le32(b, p + 8 + 32); h = le32(b, p + 8 + 36)
          sawAvih = true
        } else if (fcc(p) == "strh" && sz >= 8) {
          if (fcc(p + 8) == "vids" && fourcc.isEmpty) fourcc = fcc(p + 12)
        } else if (inMovi && isFrameChunk(p)) {
          counted += 1
        }
        p += 8 + sz + (sz & 1) // word alignment per RIFF
      }
      true
    }
    if (!walk(12, b.length, inMovi = false)) return None
    if (sawAvih && w > 0 && h > 0)
      Some(AviInfo(w, h, if (counted > 0) counted else math.max(declared, 1), fourcc))
    else None
  }

  /** Payload bytes of the FIRST video frame chunk (`NNdc`/`NNdb`) in the
    * `movi` list — for MJPG streams this is a complete JPEG the image
    * pixel path can decode (the keyframe-thumbnail read of a video
    * pipeline). None when there is no frame chunk.
    */
  def firstAviFrame(b: Array[Byte]): Option[Array[Byte]] = {
    if (parseAvi(b).isEmpty) return None
    def fcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    def walk(start: Int, end: Int, inMovi: Boolean): Option[Array[Byte]] = {
      var p = start
      while (p + 8 <= end) {
        val sz = le32(b, p + 4)
        if (sz < 0 || p + 8 + sz > end) return None
        if (fcc(p) == "LIST" && sz >= 4) {
          val r = walk(p + 12, p + 8 + sz, inMovi || fcc(p + 8) == "movi")
          if (r.isDefined) return r
        } else if (inMovi &&
            b(p) >= '0' && b(p) <= '9' && b(p + 1) >= '0' && b(p + 1) <= '9' &&
            b(p + 2) == 'd' && (b(p + 3) == 'c' || b(p + 3) == 'b')) {
          return Some(java.util.Arrays.copyOfRange(b, p + 8, p + 8 + sz))
        }
        p += 8 + sz + (sz & 1)
      }
      None
    }
    walk(12, b.length, inMovi = false)
  }

  /** REAL header decode: PNG / JPEG / GIF dimensions parsed from the
    * container bytes — and for GIF the frame count from the image
    * descriptor walk (PNG/JPEG containers are single-frame by definition
    * here; APNG is out of scope). Anything else falls back to
    * [[stubDecode]].
    */
  def decodeHeader(id: Long, payload: Array[Byte]): MediaMeta =
    parsePng(payload).orElse(parseJpeg(payload)).orElse(parseGif(payload))
      .orElse(parseBmp(payload)) match {
      case Some((fmt, w, h)) =>
        val frames = if (fmt == "gif") gifFrameCount(payload) else 1
        MediaMeta(id, payload.length, fmt, w, h, frames)
      case None => parseAvi(payload) match {
        case Some(AviInfo(w, h, frames, _)) =>
          MediaMeta(id, payload.length, "avi", w, h, frames)
        case None => parseWav(payload) match {
          // audio reuses the row shape: the spatial slots carry
          // (sample_rate, channels), frame_count = PCM sample frames
          case Some(wi) =>
            val fb = (wi.bitDepth / 8) * wi.channels
            MediaMeta(id, payload.length, "wav", wi.sampleRate, wi.channels,
              if (fb == 0) 0 else wi.dataLen / fb)
          case None => stubDecode(id, payload)
        }
      }
    }

  // ---------------- planted real payloads (test/oracle surface) ----------------

  @inline private def wbe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def plantDims(id: Long): (Int, Int) =
    ((16 + id % 512).toInt, (16 + (id * 7) % 512).toInt)

  /** A minimal REAL PNG (signature + spec-valid IHDR with correct CRC32 +
    * IEND) with dimensions derived from the id — 45 bytes.
    */
  def plantPng(id: Long): Array[Byte] = {
    val (w, h) = plantDims(id)
    val out = new java.io.ByteArrayOutputStream(45)
    out.write(PngSig, 0, 8)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      val len = new Array[Byte](4); wbe32(len, 0, data.length); out.write(len, 0, 4)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val cb = new Array[Byte](4); wbe32(cb, 0, crc.getValue.toInt); out.write(cb, 0, 4)
    }
    val ihdr = new Array[Byte](13)
    wbe32(ihdr, 0, w); wbe32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor
    chunk("IHDR", ihdr)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A minimal REAL JPEG (SOI + APP0/JFIF + SOF0 + EOI) with dimensions
    * derived from the id — 41 bytes. The APP0 segment before the SOF
    * exercises the parser's skip loop.
    */
  def plantJpeg(id: Long): Array[Byte] = {
    val (w, h) = plantDims(id)
    val b = Array[Int](
      0xFF, 0xD8, // SOI
      0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00, 0x01, 0x01, 0x00,
      0x00, 0x01, 0x00, 0x01, 0x00, 0x00, // APP0, 16-byte segment
      0xFF, 0xC0, 0x00, 0x11, 0x08, // SOF0, 17-byte segment, 8-bit precision
      (h >>> 8) & 0xFF, h & 0xFF, (w >>> 8) & 0xFF, w & 0xFF,
      0x03, // 3 components
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01,
      0xFF, 0xD9 // EOI
    ).map(_.toByte)
    b
  }

  /** Planted GIF frame count: 1-5 frames derived from the id. */
  def plantGifFrames(id: Long): Int = (1 + id % 5).toInt

  /** A minimal REAL multi-frame GIF89a: header + logical screen descriptor
    * (dims from the id, no global color table), then [[plantGifFrames]]
    * image descriptors — each a 1×1 frame with a 2-entry local color table
    * and a spec-valid LZW data stream (clear, pixel 0, end-of-information
    * in 3-bit codes) — then the trailer. 14 + 21·frames bytes. The gate
    * oracle recomputes both the dimensions and the frame count.
    */
  def plantGif(id: Long): Array[Byte] = {
    val (w, h) = plantDims(id)
    val frames = plantGifFrames(id)
    val out = new java.io.ByteArrayOutputStream(14 + 21 * frames)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    def le(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    le(w); le(h)
    out.write(0x00) // packed: no global color table
    out.write(0x00) // background color index
    out.write(0x00) // pixel aspect ratio
    var f = 0
    while (f < frames) {
      out.write(0x2C) // image descriptor
      le(0); le(0); le(1); le(1) // left, top, 1×1
      out.write(0x80) // packed: local color table, 2 entries
      out.write(Array[Byte](0, 0, 0, -1, -1, -1), 0, 6) // LCT: black, white
      out.write(0x02) // LZW minimum code size
      // codes (3-bit): clear=4, pixel 0, EOI=5 → LSB-first packed 0x44 0x01
      out.write(0x02); out.write(0x44); out.write(0x01); out.write(0x00)
      f += 1
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Planted solid color: (r, g, b) derived from the id. */
  def plantSolidColor(id: Long): (Int, Int, Int) =
    ((id % 256).toInt, ((id * 3) % 256).toInt, ((id * 7) % 256).toInt)

  /** Planted solid-PNG dimensions (small — the pixel path decodes them). */
  def plantSolidDims(id: Long): (Int, Int) =
    ((4 + id % 13).toInt, (4 + (id * 5) % 11).toInt)

  /** A COMPLETE real BMP (BITMAPFILEHEADER + BITMAPINFOHEADER +
    * uncompressed bottom-up 24-bpp BGR rows with 4-byte row padding —
    * the Windows DIB spec) filled with the planted solid color; decodable
    * by `javax.imageio`'s built-in BMP reader, so it drives both the
    * header walk and the REAL pixel path with a closed-form oracle.
    */
  def plantSolidBmp(id: Long): Array[Byte] = {
    val (w, h) = plantSolidDims(id)
    val (r, g, b) = plantSolidColor(id)
    val rowBytes = (w * 3 + 3) & ~3
    val pixBytes = rowBytes * h
    val out = new Array[Byte](54 + pixBytes)
    out(0) = 'B'; out(1) = 'M'
    wle32(out, 2, 54 + pixBytes)
    wle32(out, 10, 54)      // pixel data offset
    wle32(out, 14, 40)      // BITMAPINFOHEADER size
    wle32(out, 18, w)
    wle32(out, 22, h)       // positive = bottom-up
    out(26) = 1             // planes
    out(28) = 24            // bpp
    wle32(out, 34, pixBytes)
    wle32(out, 38, 2835); wle32(out, 42, 2835) // 72 dpi
    var row = 0
    while (row < h) {
      var x = 0
      val base = 54 + row * rowBytes
      while (x < w) {
        out(base + x * 3) = b.toByte
        out(base + x * 3 + 1) = g.toByte
        out(base + x * 3 + 2) = r.toByte
        x += 1
      }
      row += 1
    }
    out
  }

  @inline private def wle32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
    b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
  }

  /** A COMPLETE real PNG (signature, IHDR, deflate-compressed truecolor
    * IDAT, IEND) filled with the planted solid color — decodable by any
    * conformant reader, including `javax.imageio`. The gate oracle
    * recomputes the per-channel statistics from the color formula.
    */
  def plantSolidPng(id: Long): Array[Byte] = {
    val (w, h) = plantSolidDims(id)
    val (r, g, b) = plantSolidColor(id)
    val out = new java.io.ByteArrayOutputStream(256)
    out.write(PngSig, 0, 8)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      val len = new Array[Byte](4); wbe32(len, 0, data.length); out.write(len, 0, 4)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val cb = new Array[Byte](4); wbe32(cb, 0, crc.getValue.toInt); out.write(cb, 0, 4)
    }
    val ihdr = new Array[Byte](13)
    wbe32(ihdr, 0, w); wbe32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor
    chunk("IHDR", ihdr)
    // raw scanlines: filter byte 0 + w × (r, g, b) per row, zlib-deflated
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    while (y < h) {
      val base = y * (1 + 3 * w)
      raw(base) = 0
      var x = 0
      while (x < w) {
        raw(base + 1 + 3 * x) = r.toByte
        raw(base + 2 + 3 * x) = g.toByte
        raw(base + 3 + 3 * x) = b.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A BufferedImage of [[plantSolidDims]] filled with [[plantSolidColor]]. */
  private def solidImage(id: Long): java.awt.image.BufferedImage = {
    val (w, h) = plantSolidDims(id)
    val (r, g, b) = plantSolidColor(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }

  /** A COMPLETE real JPEG of the planted solid color, encoded by the JDK's
    * own writer (`javax.imageio`, baseline JFIF). A solid image has only DC
    * coefficients, so the DECODED image is still perfectly uniform (std
    * exactly 0); the uniform color itself shifts by DC quantization, which
    * is why the JPEG gate asserts uniformity + a mean tolerance instead of
    * the exact color formula.
    */
  def plantSolidJpeg(id: Long): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream(512)
    // pin the encoder quality EXPLICITLY: the gate's mean-color tolerance
    // budgets for the DC quantization of a KNOWN quantization table, and
    // the JDK default quality is an unversioned implementation detail a
    // JDK upgrade may change — MODE_EXPLICIT at 0.9 keeps the planted
    // bytes stable across JDKs
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.9f)
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(solidImage(id), null, null), param)
    } finally { ios.close(); writer.dispose() }
    baos.toByteArray
  }

  /** A COMPLETE real GIF of the planted solid color (JDK writer). GIF is a
    * lossless palette format: decode returns the exact planted color, so the
    * gate oracle recomputes the channel means from the color formula like
    * the PNG path.
    */
  def plantSolidGif(id: Long): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream(512)
    javax.imageio.ImageIO.write(solidImage(id), "gif", baos)
    baos.toByteArray
  }

  /** The 64-bit dHash a [[plantDhashPng]] image decodes to, in closed form
    * from the id — 25 hash "families" (base pattern in bit segments
    * [0,5)/[13,18)/[27,32)/[41,46)/[55,60), disjoint and injective in the
    * family, so DISTINCT families are ≥ 5 bits apart and never collide on
    * any 16-bit band) with a per-member near-dup axis in bits [60,63):
    * member m flips the low `m % 4` of those bits, so within a family the
    * pairwise Hamming distance is exactly |m₁%4 − m₂%4| ∈ {0,1,2,3}. The
    * DuckDB oracle replays this formula and brute-forces the pair set.
    */
  def plantDhashBits(id: Long): Long = {
    val f = id % 25
    val m = (id / 25) % 4
    (f ^ (f << 13) ^ (f << 27) ^ (f << 41) ^ (f << 55)) ^ (((1L << m) - 1L) << 60)
  }

  /** A REAL 9×8 grayscale PNG whose [[dHash64]] is exactly
    * [[plantDhashBits]] (id): row r starts at gray 128 and steps ±10 per
    * column as bit r·8+c of the target directs (values stay in [48, 208]),
    * so the horizontal-gradient comparison reproduces each bit. PNG is
    * lossless and the image already has the dHash grid dimensions, so the
    * decode→downsample→compare round trip is pixel-exact.
    */
  def plantDhashPng(id: Long): Array[Byte] = {
    val bits = plantDhashBits(id)
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var gray = 128
      img.setRGB(0, r, (gray << 16) | (gray << 8) | gray)
      var c = 0
      while (c < 8) {
        gray += (if (((bits >>> (r * 8 + c)) & 1L) == 1L) 10 else -10)
        img.setRGB(c + 1, r, (gray << 16) | (gray << 8) | gray)
        c += 1
      }
      r += 1
    }
    val baos = new java.io.ByteArrayOutputStream(256)
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** (doc_id, payload, media_type) of REAL planted container bytes — the
    * gate surface proving [[decodeHeader]] / [[extractFeatures]] round-trip
    * dimensions, frame counts, and pixel statistics from actual format
    * payloads.
    */
  def plantImagePayloads(docs: DataFrame, idCol: String, format: String): DataFrame = {
    val planter: Long => Array[Byte] = format match {
      case "png" => plantPng
      case "jpeg" => plantJpeg
      case "gif" => plantGif
      case "png_solid" => plantSolidPng
      case "jpeg_solid" => plantSolidJpeg
      case "gif_solid" => plantSolidGif
      case "bmp_solid" => plantSolidBmp
      case "dhash_png" => plantDhashPng
      case other => throw new IllegalArgumentException(s"unsupported plant format $other")
    }
    val mediaType = "image/" + format.stripSuffix("_solid")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, planter(id), mediaType)) }
      .toDF("doc_id", "payload", "media_type")
  }

  /** Wrap a text corpus as fake media payloads: (doc_id, payload: binary,
    * media_type). Stands in for reading real image/audio bytes.
    */
  def asBinaryPayloads(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      lit("application/x-stub").as("media_type"))

  /** Batch decode via mapPartitions — one iterator pass per partition, no
    * per-row task overhead, the shape a real codec (which amortizes library
    * init per batch) needs. Real header parse (PNG/JPEG/GIF) with stub
    * fallback for unrecognized payloads.
    */
  def decodeMeta(payloads: DataFrame): Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pixel codecs would init the decoder once here, per partition
        it.map { case (id, bytes) => decodeHeader(id, bytes) }
      }
  }

  /** Frame-INDEX sampling over decoded metadata: emits every k-th frame
    * index as (doc_id, frame_idx) — the explode/generator shape used for
    * frame-level datasets, driven by the REAL decoded frame counts (GIF
    * descriptor walk / AVI `movi` chunk count). Pure narrow projection.
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyK: Int): DataFrame =
    meta.toDF().select(col("doc_id"),
      explode(sequence(lit(0), col("frame_count") - 1, lit(everyK))).as("frame_idx"))

  /** ALL video frame chunks of an AVI payload in stream order:
    * (frame_idx, bytes) for each `NNdc`/`NNdb` chunk inside `movi` lists.
    * Empty for non-AVI / malformed payloads.
    */
  def aviFrames(b: Array[Byte]): Seq[(Int, Array[Byte])] = {
    if (parseAvi(b).isEmpty) return Nil
    def fcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var p = start
      while (p + 8 <= end) {
        val sz = le32(b, p + 4)
        if (sz < 0 || p + 8 + sz > end) return // parseAvi already vetted; defensive
        if (fcc(p) == "LIST" && sz >= 4) {
          walk(p + 12, p + 8 + sz, inMovi || fcc(p + 8) == "movi")
        } else if (inMovi &&
            b(p) >= '0' && b(p) <= '9' && b(p + 1) >= '0' && b(p + 1) <= '9' &&
            b(p + 2) == 'd' && (b(p + 3) == 'c' || b(p + 3) == 'b')) {
          out += ((out.length, java.util.Arrays.copyOfRange(b, p + 8, p + 8 + sz)))
        }
        p += 8 + sz + (sz & 1)
      }
    }
    walk(12, b.length, inMovi = false)
    out.toSeq
  }

  /** REAL video frame sampling: extract every k-th ACTUAL frame chunk from
    * AVI payloads and decode it through the image pixel path (MJPEG frames
    * are complete JPEGs) — the frame-level-dataset shape of a video
    * pipeline, with real bytes instead of synthesized indices. Emits
    * (doc_id, frame_idx, width, height, mean_r, mean_g, mean_b, std_r,
    * std_g, std_b); undecodable frames and non-AVI payloads are DROPPED
    * (dead-letter route). Per-partition batch contract like every
    * Multimodal operator; output grows with frames/k, never wider than the
    * decoded statistics — no raw pixels cross an exchange.
    */
  def sampleVideoFrames(payloads: DataFrame, everyK: Int): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          aviFrames(bytes).iterator
            .filter { case (idx, _) => idx % everyK == 0 }
            .flatMap { case (idx, frame) =>
              val img =
                if (parseJpeg(frame).isDefined)
                  try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
                  catch { case scala.util.control.NonFatal(_) => null }
                else null
              if (img == null) None
              else {
                val f = pixelFeatures(id, img)
                Some((id, idx, img.getWidth, img.getHeight,
                  f.f0, f.f1, f.f2, f.f3, f.f4, f.f5))
              }
            }
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height",
        "mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b")
  }

  /** Fixed-width media "feature vector" row (8 dims as scalar columns —
    * comparator-friendly and column-pruned like a real feature table).
    */
  final case class MediaFeatures(
      doc_id: Long, f0: Double, f1: Double, f2: Double, f3: Double,
      f4: Double, f5: Double, f6: Double, f7: Double)

  /** ==== STUB ==== deterministic fake feature extraction for payloads no
    * in-container codec can decode: 8 doubles derived from the payload
    * length only, so an external oracle can reproduce them from
    * octet_length. Recognized PNG payloads take the REAL pixel path in
    * [[extractFeatures]] instead.
    */
  def stubFeature(n: Int, j: Int): Double = ((n.toLong * (j + 3)) % 97).toDouble / 97.0

  /** REAL pixel features of a decoded image: per-channel mean and standard
    * deviation over all pixels (each normalized to [0,1]) plus the
    * dimensions scaled by 1/1024 — (mean_r, mean_g, mean_b, std_r, std_g,
    * std_b, w/1024, h/1024) in the 8 [[MediaFeatures]] slots. Integer pixel
    * sums stay exact in double (< 2^53), so for planted solid-color images
    * the means reproduce the color formula bit-exactly and the stds are
    * exactly zero — oracle-checkable.
    */
  def pixelFeatures(id: Long, img: java.awt.image.BufferedImage): MediaFeatures = {
    val w = img.getWidth; val h = img.getHeight
    val arr = rgbArray(img)
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var qr = 0.0; var qg = 0.0; var qb = 0.0
    var i = 0
    while (i < arr.length) {
      val rgb = arr(i)
      val r = (rgb >>> 16) & 0xFF; val g = (rgb >>> 8) & 0xFF; val b = rgb & 0xFF
      sr += r; sg += g; sb += b
      qr += r.toDouble * r; qg += g.toDouble * g; qb += b.toDouble * b
      i += 1
    }
    val n = w.toDouble * h
    def std(sum: Double, sq: Double): Double =
      math.sqrt(math.max(0.0, sq / n - (sum / n) * (sum / n)))
    MediaFeatures(id,
      sr / n / 255.0, sg / n / 255.0, sb / n / 255.0,
      std(sr, qr) / 255.0, std(sg, qg) / 255.0, std(sb, qb) / 255.0,
      w / 1024.0, h / 1024.0)
  }

  /** ImageIO pixel decode for any payload whose container the header
    * parsers recognize (PNG / JPEG / GIF — the formats `javax.imageio`
    * ships decoders for); null for unrecognized containers or corrupt
    * streams, so callers can fall back instead of failing the batch. The
    * header check is a cheap byte probe that keeps ImageIO's
    * exception-driven rejection off the non-image hot path.
    */
  private def decodePixels(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (parsePng(bytes).orElse(parseJpeg(bytes)).orElse(parseGif(bytes))
        .orElse(parseBmp(bytes)).isDefined)
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    else firstAviFrame(bytes) match {
      // video: decode the FIRST frame (keyframe-thumbnail semantics) —
      // for MJPG streams each frame chunk is a complete JPEG
      case Some(frame) if parseJpeg(frame).isDefined =>
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
        catch { case scala.util.control.NonFatal(_) => null }
      case _ => null
    }

  /** 64-bit DIFFERENCE HASH (Krawetz dHash, the public perceptual-hash
    * spec): box-average the decoded pixels to a 9-wide × 8-tall grayscale
    * grid, then bit r·8+c is set iff cell (r, c+1) is STRICTLY brighter
    * than cell (r, c) — the horizontal luminance gradient, which survives
    * rescaling, recompression, and small edits. All arithmetic is integer
    * (REC-601-weighted luma `(299r+587g+114b)/1000`, exact block sums,
    * one integer division per cell), so the hash is bit-reproducible
    * across JVMs and platforms. Images smaller than the grid point-sample
    * (each cell reads ≥ 1 pixel); a 9×8 input maps cell = pixel.
    */
  def dHash64(img: java.awt.image.BufferedImage): Long =
    dHash64(rgbArray(img), img.getWidth, img.getHeight)

  /** [[dHash64]] over an already-extracted row-major RGB array — lets the
    * keyframe walk hash the same pixels it just averaged without a second
    * bulk extraction. Identical bits to the image overload.
    */
  private[operators] def dHash64(arr: Array[Int], w: Int, h: Int): Long = {
    val gw = 9; val gh = 8
    val grid = Array.ofDim[Long](gh, gw)
    var r = 0
    while (r < gh) {
      val y0 = r * h / gh; val y1 = math.max(y0 + 1, (r + 1) * h / gh)
      var c = 0
      while (c < gw) {
        val x0 = c * w / gw; val x1 = math.max(x0 + 1, (c + 1) * w / gw)
        var sum = 0L; var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          val row = y * w
          var x = x0
          while (x < x1 && x < w) {
            val rgb = arr(row + x)
            sum += (299L * ((rgb >>> 16) & 0xFF) + 587L * ((rgb >>> 8) & 0xFF) +
              114L * (rgb & 0xFF)) / 1000L
            n += 1; x += 1
          }
          y += 1
        }
        grid(r)(c) = if (n == 0) 0L else sum / n
        c += 1
      }
      r += 1
    }
    var bits = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r)(c + 1) > grid(r)(c)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Per-image [[dHash64]] over real decoded pixels: (doc_id, dhash) for
    * every payload the pixel path can decode (PNG/JPEG/GIF/BMP, or the
    * first MJPEG frame of an AVI); undecodable payloads are DROPPED
    * (dead-letter route — a payload with no pixels has no perceptual
    * hash). Per-partition batch contract like every Multimodal operator;
    * only (long, long) rows leave the scan — pixels never cross an
    * exchange.
    */
  def imageDHashes(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = decodePixels(bytes)
          if (img == null) None else Some((id, dHash64(img)))
        }
      }
      .toDF("doc_id", "dhash")
  }

  /** Feature extraction: REAL pixel statistics for PNG / JPEG / GIF / BMP
    * payloads (decoded pure-JVM via `javax.imageio` inside the
    * per-partition batch — the reader is probed once per payload, codec
    * state amortized per partition), [[stubFeature]] for everything else
    * (no audio/video codec ships in-container). An unreadable/corrupt
    * image also falls back to the stub rather than failing the batch.
    */
  def extractFeatures(payloads: DataFrame): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real extractors init the model once here, per partition
        it.map { case (id, bytes) =>
          val img = decodePixels(bytes)
          if (img != null) pixelFeatures(id, img)
          else {
            val n = bytes.length
            MediaFeatures(id,
              stubFeature(n, 0), stubFeature(n, 1), stubFeature(n, 2),
              stubFeature(n, 3), stubFeature(n, 4), stubFeature(n, 5),
              stubFeature(n, 6), stubFeature(n, 7))
          }
        }
      }
  }

  /** Per-payload WAV facts + per-channel signal statistics. `rms_*` /
    * `peak_*` are normalized to [0,1] full-scale; channel-1 slots are null
    * for mono payloads. Channels beyond the first two contribute to
    * neither (curation pipelines key on the first stereo pair).
    */
  final case class WavFeatures(
      doc_id: Long, sample_rate: Int, channels: Int, bit_depth: Int,
      n_frames: Long, rms_ch0: Double, peak_ch0: Double,
      rms_ch1: Option[Double], peak_ch1: Option[Double])

  /** REAL audio features for WAV/PCM payloads — RIFF parsing and PCM sample
    * math are pure public byte walking, no codec needed (the same genre as
    * the PNG/GIF walkers). Per channel: RMS and peak of the normalized
    * samples. Sample squares are exact dyadic rationals (integer / 2^30),
    * so the sums — and for planted closed-form waveforms the RMS itself —
    * are bit-reproducible across engines and partitionings. Non-WAV /
    * non-PCM payloads are DROPPED (dead-letter route, like
    * [[resizePixels]]); the audio STUB now stands in only for payloads
    * that are neither a decodable image nor RIFF/PCM.
    * Per-partition batch contract like every Multimodal operator.
    */
  def extractWavFeatures(payloads: DataFrame): Dataset[WavFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseWav(bytes).map { info =>
            val bytesPerSample = info.bitDepth / 8
            val frameBytes = bytesPerSample * info.channels
            val n = if (frameBytes == 0) 0L else (info.dataLen / frameBytes).toLong
            val nch = math.min(info.channels, 2)
            val sumSq = new Array[Double](2)
            val peak = new Array[Double](2)
            var i = 0L
            while (i < n) {
              var c = 0
              while (c < nch) {
                val off = info.dataOff + (i * frameBytes).toInt + c * bytesPerSample
                val s =
                  if (info.bitDepth == 16) le16s(bytes, off).toDouble / 32768.0
                  else ((bytes(off) & 0xFF) - 128).toDouble / 128.0
                sumSq(c) += s * s
                val a = math.abs(s); if (a > peak(c)) peak(c) = a
                c += 1
              }
              i += 1
            }
            def rms(c: Int): Double = if (n == 0) 0.0 else math.sqrt(sumSq(c) / n)
            WavFeatures(id, info.sampleRate, info.channels, info.bitDepth, n,
              rms(0), peak(0),
              if (nch > 1) Some(rms(1)) else None,
              if (nch > 1) Some(peak(1)) else None)
          }
        }
      }
  }

  /** Planted WAV parameters from the id — shared by [[plantWavPcm]] and the
    * gate oracle: (sample rate, channels, frames, per-channel amplitude).
    * Amplitudes are EVEN so the quarter-amplitude square wave's half
    * samples stay integers and every squared sample is an exact dyadic
    * rational.
    */
  def plantWavParams(id: Long): (Int, Int, Int, Int => Int) = {
    val sr = 8000 + (id % 8).toInt * 1000
    val ch = (1 + id % 2).toInt
    val frames = (64 + (id % 16) * 4).toInt // multiple of 4: whole periods
    val amp = (c: Int) => 2 * (1 + ((id * 7 + c * 11) % 8192)).toInt // <= 16384, even
    (sr, ch, frames, amp)
  }

  /** A COMPLETE real 16-bit PCM WAV (RIFF + fmt + data) of a
    * period-4 square wave per channel: samples +A, -A, A/2, -A/2 — so
    * RMS = A·sqrt(5/8)/32768 and peak = A/32768 in closed form, which the
    * DuckDB gate oracle recomputes exactly from the id.
    */
  def plantWavPcm(id: Long): Array[Byte] = {
    val (sr, ch, frames, amp) = plantWavParams(id)
    val dataLen = frames * ch * 2
    val b = new Array[Byte](44 + dataLen)
    def wstr(i: Int, s: String): Unit = { var j = 0; while (j < s.length) { b(i + j) = s.charAt(j).toByte; j += 1 } }
    def wle32(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte; b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte }
    def wle16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte }
    wstr(0, "RIFF"); wle32(4, 36 + dataLen); wstr(8, "WAVE")
    wstr(12, "fmt "); wle32(16, 16)
    wle16(20, 1) // PCM
    wle16(22, ch); wle32(24, sr)
    wle32(28, sr * ch * 2) // byte rate
    wle16(32, ch * 2) // block align
    wle16(34, 16) // bits per sample
    wstr(36, "data"); wle32(40, dataLen)
    var i = 0
    while (i < frames) {
      val phase = i % 4
      var c = 0
      while (c < ch) {
        val a = amp(c)
        val v = phase match {
          case 0 => a; case 1 => -a; case 2 => a / 2; case _ => -a / 2
        }
        wle16(44 + (i * ch + c) * 2, v)
        c += 1
      }
      i += 1
    }
    b
  }

  // ---------------- real MP3 frame-header parsing ----------------

  /** Parsed MP3 stream facts from the frame-header walk — header fields of
    * the first frame plus counted frames and total samples (the duration
    * numerator: duration = samples / sample_rate). NO codec involved: the
    * 4-byte frame header and the frame-length formula are the public
    * MPEG-1/2 audio spec (ISO/IEC 11172-3), the same genre as the
    * RIFF/PNG/GIF walkers.
    */
  final case class Mp3Info(
      version: String, layer: Int, bitrateKbps: Int, sampleRate: Int,
      channels: Int, frames: Int, samples: Long)

  private val Mp3BitrateKbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateKbpsV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3SampleRateV1 = Array(44100, 48000, 32000)

  /** REAL MP3 metadata walk (Layer III): skip a leading ID3v2 tag
    * (syncsafe size), then require a valid frame at every position — 11-bit
    * sync, version/layer/bitrate/samplerate table lookups, frame length
    * `144000·kbps/sr + pad` (MPEG1; 72000 for MPEG2/2.5) — counting frames
    * and 1152/576 samples each until the payload ends (a trailing 128-byte
    * ID3v1 `TAG` block is allowed). Returns None for anything malformed,
    * truncated, free-format (bitrate index 0), or non-Layer-III — callers
    * dead-letter, never throw. First-frame header fields are reported as
    * the stream facts (VBR streams vary bitrate per frame; the walk still
    * counts them because each frame carries its own length).
    */
  def parseMp3(b: Array[Byte]): Option[Mp3Info] = {
    var p = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      p = 10 + sz
      if (p > b.length) return None
    }
    var frames = 0; var samples = 0L
    var ver = ""; var kbps0 = 0; var sr0 = 0; var ch0 = 0
    while (p < b.length) {
      if (b.length - p == 128 && b(p) == 'T' && b(p + 1) == 'A' && b(p + 2) == 'G') {
        p = b.length // trailing ID3v1 block
      } else {
        if (p + 4 > b.length) return None
        val h = be32(b, p)
        if ((h >>> 21) != 0x7FF) return None // 11-bit sync
        val verBits = (h >>> 19) & 3 // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
        val layerBits = (h >>> 17) & 3 // 1=Layer III
        if (verBits == 1 || layerBits != 1) return None
        val brIdx = (h >>> 12) & 0xF
        val srIdx = (h >>> 10) & 3
        val pad = (h >>> 9) & 1
        val mode = (h >>> 6) & 3 // 3 = mono
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
        val mpeg1 = verBits == 3
        val kbps = (if (mpeg1) Mp3BitrateKbpsV1L3 else Mp3BitrateKbpsV2L3)(brIdx)
        val srBase = Mp3SampleRateV1(srIdx)
        val sr = if (mpeg1) srBase else if (verBits == 2) srBase / 2 else srBase / 4
        val flen = (if (mpeg1) 144000 else 72000) * kbps / sr + pad
        if (flen <= 4 || p + flen > b.length) return None
        if (frames == 0) {
          ver = if (mpeg1) "mpeg1" else if (verBits == 2) "mpeg2" else "mpeg2.5"
          kbps0 = kbps; sr0 = sr; ch0 = if (mode == 3) 1 else 2
        }
        frames += 1
        samples += (if (mpeg1) 1152L else 576L)
        p += flen
      }
    }
    if (frames > 0) Some(Mp3Info(ver, 3, kbps0, sr0, ch0, frames, samples))
    else None
  }

  /** Planted MP3 parameters from the id — shared by [[plantMp3]] and the
    * gate oracle: (bitrate kbps, sample rate, frames, channels).
    */
  def plantMp3Params(id: Long): (Int, Int, Int, Int) = (
    Mp3BitrateKbpsV1L3(1 + (id % 14).toInt),
    Mp3SampleRateV1((id % 3).toInt),
    (3 + id % 6).toInt,
    if (id % 2 == 0) 2 else 1)

  /** A COMPLETE spec-valid MPEG-1 Layer III stream: a small ID3v2 tag
    * (exercises the syncsafe skip), then the planted number of frames —
    * each a real 4-byte header (sync/version/layer/bitrate/samplerate/
    * padding/mode) followed by a zero payload of exactly the
    * `144000·kbps/sr + pad` frame length the header declares. No codec
    * writes audio — frame STRUCTURE is the entire claim, and every header
    * field replays from the id formulas in closed form.
    */
  def plantMp3(id: Long): Array[Byte] = {
    val (kbps, sr, frames, ch) = plantMp3Params(id)
    val brIdx = Mp3BitrateKbpsV1L3.indexOf(kbps)
    val srIdx = Mp3SampleRateV1.indexOf(sr)
    val pad = ((id / 3) % 2).toInt
    val flen = 144000 * kbps / sr + pad
    val tagBody = 8
    val out = new java.io.ByteArrayOutputStream(10 + tagBody + frames * flen)
    // ID3v2.3 header: "ID3", version, flags, syncsafe size
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(0); out.write(tagBody)
    (0 until tagBody).foreach(_ => out.write(0))
    val frame = new Array[Byte](flen)
    frame(0) = 0xFF.toByte
    frame(1) = 0xFB.toByte // sync + MPEG1 + Layer III + no CRC
    frame(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    frame(3) = (if (ch == 1) 0xC0 else 0x00).toByte // mode: mono / stereo
    for (_ <- 0 until frames) out.write(frame, 0, flen)
    out.toByteArray
  }

  /** (doc_id, payload, media_type) of REAL planted MP3 streams — the
    * compressed-audio twin of [[plantAudioPayloads]].
    */
  def plantMp3Payloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantMp3(id), "audio/mpeg")) }
      .toDF("doc_id", "payload", "media_type")
  }

  /** REAL MP3 metadata features via [[parseMp3]]: one row per parseable
    * Layer III payload — (doc_id, version, layer, bitrate_kbps,
    * sample_rate, channels, n_frames, n_samples). Non-MP3 payloads are
    * DROPPED (dead-letter route, like [[extractWavFeatures]]); the audio
    * stub now stands in only for payloads that are neither a decodable
    * image, RIFF/PCM, nor a Layer III stream. Per-partition batch
    * contract like every Multimodal operator.
    */
  def extractMp3Features(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseMp3(bytes).map { i =>
            (id, i.version, i.layer, i.bitrateKbps, i.sampleRate,
              i.channels, i.frames, i.samples)
          }
        }
      }
      .toDF("doc_id", "version", "layer", "bitrate_kbps", "sample_rate",
        "channels", "n_frames", "n_samples")
  }

  // ---------------- real FLAC STREAMINFO parsing ----------------

  /** Parsed FLAC stream facts from the STREAMINFO metadata block — the
    * lossless-audio twin of [[Mp3Info]]: everything a curation pipeline
    * needs (rate, channels, depth, duration numerator) without touching a
    * codec. Public spec (RFC 9639 / the original FLAC format document).
    */
  final case class FlacInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, minBlock: Int, maxBlock: Int)

  private def be24(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 16) | ((b(i + 1) & 0xFF) << 8) | (b(i + 2) & 0xFF)

  /** REAL FLAC metadata walk: `fLaC` magic, then metadata blocks
    * (1-byte last-flag+type, 3-byte big-endian length) of which
    * STREAMINFO (type 0, 34 bytes) MUST be first per spec — sample rate
    * (20 bits), channels−1 (3), bits-per-sample−1 (5) and total samples
    * (36) unpacked from its bit fields. Walks the remaining metadata
    * blocks to validate structure, stops at the last-block flag (audio
    * frames after it are codec territory and not validated). None for
    * anything malformed or truncated.
    */
  def parseFlac(b: Array[Byte]): Option[FlacInfo] = {
    if (b.length < 42 ||
        !(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    if ((b(4) & 0x7F) != 0) return None // STREAMINFO must be the first block
    if (be24(b, 5) != 34) return None
    // STREAMINFO bit fields sit after min/max blocksize (2×16) and
    // min/max framesize (2×24) — i.e. at payload offset 8 + 10
    val minBlock = be16(b, 8); val maxBlock = be16(b, 10)
    val sr = ((b(18) & 0xFF) << 12) | ((b(19) & 0xFF) << 4) | ((b(20) & 0xFF) >> 4)
    val ch = ((b(20) >> 1) & 0x7) + 1
    val bps = (((b(20) & 1) << 4) | ((b(21) & 0xFF) >> 4)) + 1
    val total = (((b(21) & 0xF).toLong) << 32) |
      ((b(22) & 0xFF).toLong << 24) | ((b(23) & 0xFF).toLong << 16) |
      ((b(24) & 0xFF).toLong << 8) | (b(25) & 0xFF).toLong
    if (sr == 0) return None // 0 is invalid per spec
    // walk the remaining metadata blocks for structural validity
    var p = 8 + 34
    var last = (b(4) & 0x80) != 0
    while (!last) {
      if (p + 4 > b.length) return None
      last = (b(p) & 0x80) != 0
      val len = be24(b, p + 1)
      if (p + 4 + len > b.length) return None
      p += 4 + len
    }
    Some(FlacInfo(sr, ch, bps, total, minBlock, maxBlock))
  }

  /** Planted FLAC parameters from the id: (sample rate, channels, bits per
    * sample, total samples) — shared with the gate oracle.
    */
  def plantFlacParams(id: Long): (Int, Int, Int, Long) = (
    Array(44100, 48000, 32000, 96000)((id % 4).toInt),
    (1 + id % 2).toInt,
    if (id % 3 == 0) 24 else 16,
    1000L + (id % 9000))

  /** A COMPLETE spec-valid FLAC metadata stream: `fLaC` + STREAMINFO
    * (bit-packed planted fields, zeroed md5) + a PADDING block marked
    * last (exercises the block walk) + a few trailing bytes standing in
    * for audio frames (the walk must stop at the last-block flag, not
    * read them).
    */
  def plantFlac(id: Long): Array[Byte] = {
    val (sr, ch, bps, total) = plantFlacParams(id)
    val out = new java.io.ByteArrayOutputStream(64)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0x00) // STREAMINFO, not last
    out.write(0); out.write(0); out.write(34)
    def wbe16(v: Int): Unit = { out.write((v >>> 8) & 0xFF); out.write(v & 0xFF) }
    def wbe24(v: Int): Unit = { out.write((v >>> 16) & 0xFF); out.write((v >>> 8) & 0xFF); out.write(v & 0xFF) }
    wbe16(4096); wbe16(4096) // min/max blocksize
    wbe24(0); wbe24(0) // min/max framesize (0 = unknown, legal)
    out.write((sr >>> 12) & 0xFF)
    out.write((sr >>> 4) & 0xFF)
    out.write(((sr & 0xF) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4))
    out.write((((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF).toInt)
    out.write(((total >> 24) & 0xFF).toInt); out.write(((total >> 16) & 0xFF).toInt)
    out.write(((total >> 8) & 0xFF).toInt); out.write((total & 0xFF).toInt)
    (0 until 16).foreach(_ => out.write(0)) // md5 of the audio data (zeroed)
    out.write(0x81) // PADDING block, LAST
    out.write(0); out.write(0); out.write(4)
    (0 until 4).foreach(_ => out.write(0))
    out.write(0xFF); out.write(0xF8) // fake frame-sync bytes (not validated)
    out.toByteArray
  }

  /** (doc_id, payload, media_type) of REAL planted FLAC streams. */
  def plantFlacPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantFlac(id), "audio/flac")) }
      .toDF("doc_id", "payload", "media_type")
  }

  /** REAL FLAC metadata features via [[parseFlac]] — non-FLAC payloads
    * DROPPED (dead-letter route); per-partition batch contract.
    */
  def extractFlacFeatures(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseFlac(bytes).map { i =>
            (id, i.sampleRate, i.channels, i.bitsPerSample, i.totalSamples,
              i.minBlock, i.maxBlock)
          }
        }
      }
      .toDF("doc_id", "sample_rate", "channels", "bits_per_sample",
        "total_samples", "min_block", "max_block")
  }

  /** Planted AVI frame count: 1-4 frames derived from the id. */
  def plantAviFrames(id: Long): Int = (1 + id % 4).toInt

  /** A COMPLETE real AVI/MJPEG container (RIFF AVI: hdrl with avih +
    * vids/MJPG strl, movi with [[plantAviFrames]] `00dc` chunks, each a
    * complete [[plantSolidJpeg]] JPEG at [[plantSolidDims]]) — the video
    * twin of the planted image payloads. Both the header fields and the
    * first decoded frame are oracle-checkable.
    */
  def plantAviMjpeg(id: Long): Array[Byte] = {
    val (w, h) = plantSolidDims(id)
    val frames = plantAviFrames(id)
    val frame = plantSolidJpeg(id)
    val framePadded = frame.length + (frame.length & 1)
    val out = new java.io.ByteArrayOutputStream(512 + frames * (8 + framePadded))
    def wle32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    def wfcc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    val avihSz = 56; val strhSz = 56; val strfSz = 40
    val strlSz = 4 + 8 + strhSz + 8 + strfSz
    val hdrlSz = 4 + 8 + avihSz + 8 + strlSz
    val moviSz = 4 + frames * (8 + framePadded)
    val riffSz = 4 + 8 + hdrlSz + 8 + moviSz
    wfcc("RIFF"); wle32(riffSz); wfcc("AVI ")
    wfcc("LIST"); wle32(hdrlSz); wfcc("hdrl")
    wfcc("avih"); wle32(avihSz)
    wle32(33333); wle32(0); wle32(0); wle32(0) // usec/frame, maxbps, pad, flags
    wle32(frames); wle32(0); wle32(1); wle32(0) // total frames, initial, streams, bufsize
    wle32(w); wle32(h); wle32(0); wle32(0); wle32(0); wle32(0) // dims + reserved
    wfcc("LIST"); wle32(strlSz); wfcc("strl")
    wfcc("strh"); wle32(strhSz)
    wfcc("vids"); wfcc("MJPG")
    (0 until 12).foreach(_ => wle32(0)) // flags..frame box, zero-filled
    wfcc("strf"); wle32(strfSz)
    wle32(strfSz); wle32(w); wle32(h); wle32(1 | (24 << 16)) // biSize..planes=1,bits=24
    wfcc("MJPG"); wle32(w * h * 3); wle32(0); wle32(0); wle32(0); wle32(0)
    wfcc("LIST"); wle32(moviSz); wfcc("movi")
    for (_ <- 0 until frames) {
      wfcc("00dc"); wle32(frame.length)
      out.write(frame, 0, frame.length)
      if ((frame.length & 1) == 1) out.write(0) // word alignment
    }
    out.toByteArray
  }

  /** (doc_id, payload, media_type) of REAL planted PCM WAVs — the audio
    * twin of [[plantImagePayloads]].
    */
  def plantAudioPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantWavPcm(id), "audio/wav")) }
      .toDF("doc_id", "payload", "media_type")
  }

  /** (doc_id, payload, media_type) of REAL planted AVI/MJPEG containers —
    * the video twin of [[plantImagePayloads]].
    */
  def plantVideoPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantAviMjpeg(id), "video/x-msvideo")) }
      .toDF("doc_id", "payload", "media_type")
  }

  /** REAL pixel resize for decodable PNG / JPEG / GIF payloads:
    * aspect-preserving fit into a `maxSide` box (the same floor(dim ×
    * scale) formula as [[planResize]], never upscaled),
    * bilinear-interpolated `drawImage`, re-encoded as PNG (resize
    * normalizes the container — lossless output regardless of input
    * format) — per-partition batches, codec state amortized like every
    * Multimodal operator. Payloads `javax.imageio` cannot decode are
    * DROPPED (a real media pipeline routes undecodable rows to a
    * dead-letter table, not through the resize). Output: (doc_id, width,
    * height, out_width, out_height, payload_out).
    */
  def resizePixels(payloads: DataFrame, maxSide: Int): DataFrame = {
    require(maxSide >= 1, s"maxSide must be >= 1, got $maxSide")
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = decodePixels(bytes)
          if (img == null) None
          else {
            val w = img.getWidth; val h = img.getHeight
            val scale = math.min(1.0, math.min(maxSide.toDouble / w, maxSide.toDouble / h))
            val ow = math.max(1, math.floor(w * scale).toInt)
            val oh = math.max(1, math.floor(h * scale).toInt)
            val out = new java.awt.image.BufferedImage(ow, oh,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, ow, oh, null)
            g.dispose()
            val baos = new java.io.ByteArrayOutputStream(256)
            javax.imageio.ImageIO.write(out, "png", baos)
            Some((id, w, h, ow, oh, baos.toByteArray))
          }
        }
      }
      .toDF("doc_id", "width", "height", "out_width", "out_height", "payload_out")
  }

  /** Resize stub: target-box metadata (aspect-preserving fit) computed as
    * native expressions over the decoded metadata — no data movement, pure
    * projection, exactly how a resize planner would annotate a media table.
    */
  def planResize(meta: Dataset[MediaMeta], maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"), lit(maxSide.toDouble) / col("height"), lit(1.0))
    meta.toDF().select(col("doc_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_width"),
      floor(col("height") * scale).cast("int").as("out_height"))
  }

  // ---------------- EXIF / TIFF metadata ----------------

  /** Parsed EXIF metadata row (nulls = tag absent or payload unparseable —
    * the dead-letter-with-reason shape, not a dropped row).
    */
  final case class ExifInfo(
      doc_id: Long,
      byte_order: Option[String],
      orientation: Option[Int],
      make: Option[String],
      datetime: Option[String],
      px_width: Option[Int],
      px_height: Option[Int])

  /** Strict EXIF walk (TIFF 6.0 + EXIF 2.3, both public specs): JPEG
    * APP1 segment scan for the `Exif\0\0` payload, then the TIFF
    * structure — byte-order mark (`II` little / `MM` big), magic 42,
    * IFD0 entry walk (tag/type/count/value-or-offset, ASCII values >4
    * bytes via the offset area), and the 0x8769 EXIF sub-IFD for pixel
    * dimensions. Extracts Make (0x010F), Orientation (0x0112), DateTime
    * (0x0132), PixelXDimension (0xA002), PixelYDimension (0xA003).
    * Every offset is bounds-checked against the APP1 segment; malformed
    * structure ⇒ None, a missing individual tag ⇒ that field null.
    */
  def parseExif(id: Long, b: Array[Byte]): Option[ExifInfo] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    // APP1 scan: markers until SOS/EOI
    var p = 2
    var tiff = -1
    var tiffEnd = -1
    while (p + 4 <= b.length && tiff < 0) {
      if ((b(p) & 0xFF) != 0xFF) return None
      val marker = b(p + 1) & 0xFF
      if (marker == 0xDA || marker == 0xD9) return None
      val len = be16(b, p + 2)
      if (len < 2 || p + 2 + len > b.length) return None
      if (marker == 0xE1 && len >= 10 &&
          b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
          b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0) {
        tiff = p + 10
        tiffEnd = p + 2 + len
      }
      p += 2 + len
    }
    if (tiff < 0 || tiffEnd - tiff < 8) return None
    val little = b(tiff) match {
      case 'I' if b(tiff + 1) == 'I' => true
      case 'M' if b(tiff + 1) == 'M' => false
      case _ => return None
    }
    def r16(i: Int): Int =
      if (i < tiff || i + 2 > tiffEnd) -1
      else if (little) le16(b, i) else be16(b, i)
    def r32(i: Int): Int =
      if (i < tiff || i + 4 > tiffEnd) -1
      else if (little) le32(b, i) else be32(b, i)
    if (r16(tiff + 2) != 42) return None
    var orientation: Option[Int] = None
    var make: Option[String] = None
    var datetime: Option[String] = None
    var pxW: Option[Int] = None
    var pxH: Option[Int] = None
    var exifIfd = -1
    def ascii(cnt: Int, valOff: Int): Option[String] = {
      val at = if (cnt <= 4) valOff else tiff + r32(valOff)
      if (at < tiff || at + cnt > tiffEnd || cnt < 1) None
      else {
        var end = at + cnt
        while (end > at && b(end - 1) == 0) end -= 1 // strip NUL padding
        Some(new String(b, at, end - at, "US-ASCII"))
      }
    }
    // SHORT (3) reads 2 bytes, LONG (4) reads 4 — both inline for count 1
    def intVal(typ: Int, valOff: Int): Option[Int] = typ match {
      case 3 => val v = r16(valOff); if (v < 0) None else Some(v)
      case 4 => val v = r32(valOff); if (v < 0) None else Some(v)
      case _ => None
    }
    def walk(ifdOff: Int, sub: Boolean): Boolean = {
      val n = r16(ifdOff)
      if (n < 0 || n > 256) return false
      var e = 0
      while (e < n) {
        val ent = ifdOff + 2 + e * 12
        if (ent + 12 > tiffEnd) return false
        val tag = r16(ent)
        val typ = r16(ent + 2)
        val cnt = r32(ent + 4)
        val valOff = ent + 8
        if (!sub) tag match {
          case 0x010F if typ == 2 => make = ascii(cnt, valOff)
          case 0x0112 => orientation = intVal(typ, valOff)
          case 0x0132 if typ == 2 => datetime = ascii(cnt, valOff)
          case 0x8769 if typ == 4 => exifIfd = tiff + r32(valOff)
          case _ => ()
        } else tag match {
          case 0xA002 => pxW = intVal(typ, valOff)
          case 0xA003 => pxH = intVal(typ, valOff)
          case _ => ()
        }
        e += 1
      }
      true
    }
    val ifd0 = tiff + r32(tiff + 4)
    if (!walk(ifd0, sub = false)) return None
    if (exifIfd >= 0 && !walk(exifIfd, sub = true)) return None
    Some(ExifInfo(id, Some(if (little) "II" else "MM"), orientation, make,
      datetime, pxW, pxH))
  }

  /** Batch EXIF extraction — the [[decodeMeta]] mapPartitions contract:
    * scalar metadata out, payload bytes never cross an exchange.
    */
  def extractExif(payloads: DataFrame): Dataset[ExifInfo] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseExif(id, bytes).getOrElse(
            ExifInfo(id, None, None, None, None, None, None))
        }
      }
  }

  /** Planted EXIF field formulas (all doc_id arithmetic, oracle-replayable):
    * byte order alternates II/MM, orientation 1-8, Make and DateTime land
    * in the offset area (len > 4 forces indirect ASCII storage), pixel
    * dims reuse the image plant formulas.
    */
  def plantExifParams(id: Long): (String, Int, String, String, Int, Int) = (
    if (id % 2 == 0) "II" else "MM",
    (1 + id % 8).toInt,
    s"CAM-${id % 5}",
    f"2024:01:${1 + id % 28}%02d ${id % 24}%02d:00:00",
    (4 + id % 13).toInt,
    (4 + (id * 5) % 11).toInt)

  /** A complete JPEG-with-EXIF byte plant: SOI + APP1(Exif/TIFF) + EOI.
    * TIFF block layout (offsets from the TIFF header): IFD0 at 8 with
    * Make(ASCII,indirect) / Orientation(SHORT,inline) /
    * DateTime(ASCII,indirect) / ExifIFD-pointer, sub-IFD at 62 with
    * PixelXDimension(LONG) / PixelYDimension(SHORT — one of each numeric
    * type), data area at 92. Both byte orders are produced (id parity).
    */
  def plantExifJpeg(id: Long): Array[Byte] = {
    val (bo, orient, make, dt, w, h) = plantExifParams(id)
    val little = bo == "II"
    val makeB = make.getBytes("US-ASCII") :+ 0.toByte   // 6 bytes
    val dtB = dt.getBytes("US-ASCII") :+ 0.toByte       // 20 bytes
    val tlen = 92 + makeB.length + dtB.length
    val t = new Array[Byte](tlen)
    def w16(i: Int, v: Int): Unit =
      if (little) { t(i) = (v & 0xFF).toByte; t(i + 1) = ((v >>> 8) & 0xFF).toByte }
      else { t(i) = ((v >>> 8) & 0xFF).toByte; t(i + 1) = (v & 0xFF).toByte }
    def w32(i: Int, v: Int): Unit =
      if (little) { w16(i, v & 0xFFFF); w16(i + 2, (v >>> 16) & 0xFFFF) }
      else { w16(i, (v >>> 16) & 0xFFFF); w16(i + 2, v & 0xFFFF) }
    def entry(at: Int, tag: Int, typ: Int, cnt: Int)(value: Int => Unit): Unit = {
      w16(at, tag); w16(at + 2, typ); w32(at + 4, cnt); value(at + 8)
    }
    t(0) = bo.charAt(0).toByte; t(1) = bo.charAt(1).toByte
    w16(2, 42); w32(4, 8)
    w16(8, 4) // IFD0: 4 entries (ascending tag order per TIFF 6.0)
    entry(10, 0x010F, 2, makeB.length)(w32(_, 92))
    entry(22, 0x0112, 3, 1)(w16(_, orient))
    entry(34, 0x0132, 2, dtB.length)(w32(_, 92 + makeB.length))
    entry(46, 0x8769, 4, 1)(w32(_, 62))
    w32(58, 0) // no next IFD
    w16(62, 2) // EXIF sub-IFD: 2 entries
    entry(64, 0xA002, 4, 1)(w32(_, w))
    entry(76, 0xA003, 3, 1)(w16(_, h))
    w32(88, 0)
    System.arraycopy(makeB, 0, t, 92, makeB.length)
    System.arraycopy(dtB, 0, t, 92 + makeB.length, dtB.length)
    val app1len = 2 + 6 + tlen
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8)                   // SOI
    out.write(0xFF); out.write(0xE1)                   // APP1
    out.write((app1len >>> 8) & 0xFF); out.write(app1len & 0xFF)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(t)
    out.write(0xFF); out.write(0xD9)                   // EOI
    out.toByteArray
  }

  /** (doc_id, payload, media_type) of planted EXIF JPEGs. */
  def plantExifPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantExifJpeg(id), "image/jpeg")) }
      .toDF("doc_id", "payload", "media_type")
  }

  /** Parsed GPS coordinates from the EXIF GPS sub-IFD (tag 0x8825):
    * hemisphere refs plus degrees / minutes / centiseconds as exact
    * integers — the float degree conversion is the CALLER's choice of
    * precision, the parser never rounds.
    */
  final case class GpsInfo(
      doc_id: Long,
      lat_ref: Option[String], lat_d: Option[Int], lat_m: Option[Int],
      lat_s100: Option[Int],
      lon_ref: Option[String], lon_d: Option[Int], lon_m: Option[Int],
      lon_s100: Option[Int])

  /** GPS IFD walk — the TIFF RATIONAL type (5: two u32s, numerator /
    * denominator) that the main [[parseExif]] fields never exercise:
    * GPSLatitude/GPSLongitude are RATIONAL[3] (deg, min, sec) in the
    * offset area, refs are inline 2-byte ASCII. Seconds are returned in
    * exact centiseconds (`num·100 div den`). Same strict bounds checks
    * as [[parseExif]]; missing tags null individually, broken structure
    * ⇒ None.
    */
  def parseGps(id: Long, b: Array[Byte]): Option[GpsInfo] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var p = 2
    var tiff = -1; var tiffEnd = -1
    while (p + 4 <= b.length && tiff < 0) {
      if ((b(p) & 0xFF) != 0xFF) return None
      val marker = b(p + 1) & 0xFF
      if (marker == 0xDA || marker == 0xD9) return None
      val len = be16(b, p + 2)
      if (len < 2 || p + 2 + len > b.length) return None
      if (marker == 0xE1 && len >= 10 &&
          b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
          b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0) {
        tiff = p + 10; tiffEnd = p + 2 + len
      }
      p += 2 + len
    }
    if (tiff < 0 || tiffEnd - tiff < 8) return None
    val little = b(tiff) match {
      case 'I' if b(tiff + 1) == 'I' => true
      case 'M' if b(tiff + 1) == 'M' => false
      case _ => return None
    }
    def r16(i: Int): Int =
      if (i < tiff || i + 2 > tiffEnd) -1
      else if (little) le16(b, i) else be16(b, i)
    def r32(i: Int): Int =
      if (i < tiff || i + 4 > tiffEnd) -1
      else if (little) le32(b, i) else be32(b, i)
    if (r16(tiff + 2) != 42) return None
    var gpsIfd = -1
    def findGps(ifdOff: Int): Boolean = {
      val n = r16(ifdOff)
      if (n < 0 || n > 256) return false
      var e = 0
      while (e < n) {
        val ent = ifdOff + 2 + e * 12
        if (ent + 12 > tiffEnd) return false
        if (r16(ent) == 0x8825 && r16(ent + 2) == 4) gpsIfd = tiff + r32(ent + 8)
        e += 1
      }
      true
    }
    if (!findGps(tiff + r32(tiff + 4))) return None
    if (gpsIfd < 0) return Some(GpsInfo(id, None, None, None, None, None, None, None, None))
    var latRef: Option[String] = None; var lonRef: Option[String] = None
    var lat: Option[(Int, Int, Int)] = None; var lon: Option[(Int, Int, Int)] = None
    def asciiRef(cnt: Int, valOff: Int): Option[String] =
      if (cnt < 1 || cnt > 4) None
      else {
        var end = valOff + cnt
        while (end > valOff && b(end - 1) == 0) end -= 1
        Some(new String(b, valOff, end - valOff, "US-ASCII"))
      }
    // RATIONAL[3]: deg, min, sec — sec scaled to exact centiseconds
    def rational3(valOff: Int): Option[(Int, Int, Int)] = {
      val at = tiff + r32(valOff)
      if (at < tiff || at + 24 > tiffEnd) return None
      def part(j: Int, scale: Int): Option[Int] = {
        val num = r32(at + j * 8); val den = r32(at + j * 8 + 4)
        if (den <= 0 || num < 0) None
        else Some(((num.toLong * scale) / den).toInt)
      }
      for (d <- part(0, 1); m <- part(1, 1); s <- part(2, 100)) yield (d, m, s)
    }
    val n = r16(gpsIfd)
    if (n < 0 || n > 256) return None
    var e = 0
    while (e < n) {
      val ent = gpsIfd + 2 + e * 12
      if (ent + 12 > tiffEnd) return None
      val tag = r16(ent); val typ = r16(ent + 2); val cnt = r32(ent + 4)
      val valOff = ent + 8
      tag match {
        case 0x0001 if typ == 2 => latRef = asciiRef(cnt, valOff)
        case 0x0002 if typ == 5 && cnt == 3 => lat = rational3(valOff)
        case 0x0003 if typ == 2 => lonRef = asciiRef(cnt, valOff)
        case 0x0004 if typ == 5 && cnt == 3 => lon = rational3(valOff)
        case _ => ()
      }
      e += 1
    }
    Some(GpsInfo(id, latRef, lat.map(_._1), lat.map(_._2), lat.map(_._3),
      lonRef, lon.map(_._1), lon.map(_._2), lon.map(_._3)))
  }

  /** Batch GPS extraction (the [[extractExif]] contract). */
  def extractGps(payloads: DataFrame): Dataset[GpsInfo] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseGps(id, bytes).getOrElse(
            GpsInfo(id, None, None, None, None, None, None, None, None))
        }
      }
  }

  /** Planted GPS field formulas: hemisphere by id parity pairs, dms from
    * id arithmetic, seconds with a NON-TRIVIAL denominator (num = s100,
    * den = 100) so the rational division is exercised, not bypassed.
    */
  def plantGpsParams(id: Long): (String, Int, Int, Int, String, Int, Int, Int) = (
    if (id % 2 == 0) "N" else "S",
    (id % 90).toInt, ((id * 7) % 60).toInt, ((id * 13) % 6000).toInt,
    if (id % 4 < 2) "E" else "W",
    (id % 180).toInt, ((id * 11) % 60).toInt, ((id * 17) % 6000).toInt)

  /** A JPEG carrying a TIFF block with ONLY the GPS pointer + sub-IFD —
    * II/MM by id parity like [[plantExifJpeg]]. Layout from the TIFF
    * start: IFD0 (1 entry: 0x8825) at 8, GPS IFD (4 entries) at 26,
    * rational areas at 80 and 104.
    */
  def plantGpsJpeg(id: Long): Array[Byte] = {
    val (laR, laD, laM, laS, loR, loD, loM, loS) = plantGpsParams(id)
    val little = id % 2 == 0
    val tlen = 128
    val t = new Array[Byte](tlen)
    def w16(i: Int, v: Int): Unit =
      if (little) { t(i) = (v & 0xFF).toByte; t(i + 1) = ((v >>> 8) & 0xFF).toByte }
      else { t(i) = ((v >>> 8) & 0xFF).toByte; t(i + 1) = (v & 0xFF).toByte }
    def w32(i: Int, v: Int): Unit =
      if (little) { w16(i, v & 0xFFFF); w16(i + 2, (v >>> 16) & 0xFFFF) }
      else { w16(i, (v >>> 16) & 0xFFFF); w16(i + 2, v & 0xFFFF) }
    def entry(at: Int, tag: Int, typ: Int, cnt: Int)(value: Int => Unit): Unit = {
      w16(at, tag); w16(at + 2, typ); w32(at + 4, cnt); value(at + 8)
    }
    def refBytes(at: Int, s: String): Unit = {
      t(at) = s.charAt(0).toByte; t(at + 1) = 0
    }
    t(0) = (if (little) 'I' else 'M').toByte; t(1) = t(0)
    w16(2, 42); w32(4, 8)
    w16(8, 1) // IFD0: just the GPS pointer
    entry(10, 0x8825, 4, 1)(w32(_, 26))
    w32(22, 0)
    w16(26, 4) // GPS IFD: ref/lat/ref/lon
    entry(28, 0x0001, 2, 2)(refBytes(_, laR))
    entry(40, 0x0002, 5, 3)(w32(_, 80))
    entry(52, 0x0003, 2, 2)(refBytes(_, loR))
    entry(64, 0x0004, 5, 3)(w32(_, 104))
    w32(76, 0)
    // RATIONAL[3]: (d, 1) (m, 1) (s100, 100)
    w32(80, laD); w32(84, 1); w32(88, laM); w32(92, 1); w32(96, laS); w32(100, 100)
    w32(104, loD); w32(108, 1); w32(112, loM); w32(116, 1); w32(120, loS); w32(124, 100)
    val app1len = 2 + 6 + tlen
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8)
    out.write(0xFF); out.write(0xE1)
    out.write((app1len >>> 8) & 0xFF); out.write(app1len & 0xFF)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(t)
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  /** (doc_id, payload, media_type) of the planted GPS JPEGs. */
  def plantGpsPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantGpsJpeg(id), "image/jpeg")) }
      .toDF("doc_id", "payload", "media_type")
  }

  // ---------------- audio silence segmentation ----------------

  /** A detected silent span: frame index range inside the PCM stream. */
  final case class SilenceSegment(
      doc_id: Long, seg_idx: Int, start_frame: Int, n_frames: Int)

  /** Silence segmentation (the energy-gate VAD an audio-curation pipeline
    * runs before transcription or chunking) over REAL 16-bit PCM: a frame
    * is silent when EVERY channel's |sample| ≤ `ampThreshold`; maximal
    * runs of at least `minRun` silent frames become segments, including a
    * trailing run at end-of-stream. Per-partition byte walk over the
    * existing [[parseWav]] container parse — payload bytes never cross an
    * exchange, only (doc_id, seg_idx, start, length) scalars. Non-WAV /
    * malformed payloads yield no rows (dead-letter convention).
    */
  def detectSilence(payloads: DataFrame, ampThreshold: Int,
      minRun: Int): Dataset[SilenceSegment] = {
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseWav(bytes) match {
            case Some(w) if w.bitDepth == 16 =>
              val bytesPerFrame = w.channels * 2
              val nFrames = w.dataLen / bytesPerFrame
              val segs = scala.collection.mutable.ArrayBuffer.empty[SilenceSegment]
              var runStart = -1
              var segIdx = 0
              def flush(end: Int): Unit = {
                if (runStart >= 0 && end - runStart >= minRun) {
                  segs += SilenceSegment(id, segIdx, runStart, end - runStart)
                  segIdx += 1
                }
                runStart = -1
              }
              var i = 0
              while (i < nFrames) {
                var c = 0
                var silent = true
                while (silent && c < w.channels) {
                  val v = le16s(bytes, w.dataOff + i * bytesPerFrame + c * 2)
                  if (math.abs(v) > ampThreshold) silent = false
                  c += 1
                }
                if (silent) { if (runStart < 0) runStart = i }
                else flush(i)
                i += 1
              }
              flush(nFrames)
              segs
            case _ => Nil
          }
        }
      }
  }

  /** Planted silence structure: the PCM alternates loud / silent blocks of
    * `L = 16 + (id % 8)·4` frames, `4 + id % 3` blocks total, starting
    * loud — so the silent segments are exactly the odd blocks, in closed
    * form for the oracle.
    */
  def plantSilenceLayout(id: Long): (Int, Int) =
    ((16 + (id % 8) * 4).toInt, (4 + id % 3).toInt)

  /** A COMPLETE real 16-bit PCM WAV with the [[plantSilenceLayout]]
    * loud/silent block structure: loud frames are a ±(1000 + id % 500)
    * square wave, silent frames sit at ±(id % 3) — far below any sane
    * gate threshold, nonzero for a third of the corpus so the threshold
    * comparison is exercised, not just the zero path.
    */
  def plantSilenceWavPcm(id: Long): Array[Byte] = {
    val (blockLen, nBlocks) = plantSilenceLayout(id)
    val ch = (1 + id % 2).toInt
    val sr = 8000
    val frames = blockLen * nBlocks
    val dataLen = frames * ch * 2
    val b = new Array[Byte](44 + dataLen)
    def wstr(i: Int, s: String): Unit = {
      var j = 0; while (j < s.length) { b(i + j) = s.charAt(j).toByte; j += 1 }
    }
    def wle32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    def wle16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte }
    wstr(0, "RIFF"); wle32(4, 36 + dataLen); wstr(8, "WAVE")
    wstr(12, "fmt "); wle32(16, 16)
    wle16(20, 1); wle16(22, ch); wle32(24, sr)
    wle32(28, sr * ch * 2); wle16(32, ch * 2); wle16(34, 16)
    wstr(36, "data"); wle32(40, dataLen)
    val loud = (1000 + id % 500).toInt
    val quiet = (id % 3).toInt
    var i = 0
    while (i < frames) {
      val silentBlock = (i / blockLen) % 2 == 1
      var c = 0
      while (c < ch) {
        val v =
          if (silentBlock) { if (i % 2 == 0) quiet else -quiet }
          else { if (i % 2 == 0) loud else -loud }
        wle16(44 + (i * ch + c) * 2, v)
        c += 1
      }
      i += 1
    }
    b
  }

  /** (doc_id, payload, media_type) of the planted loud/silent WAVs. */
  def plantSilencePayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantSilenceWavPcm(id), "audio/wav")) }
      .toDF("doc_id", "payload", "media_type")
  }

  // ---------------- scene-cut keyframe selection ----------------

  /** Scene-change keyframe selection over REAL decoded video frames: a
    * frame is a keyframe when it is the first frame or its mean-RGB
    * distance from the PREVIOUS decoded frame exceeds `threshold`
    * (0-255 scale) — the standard shot-boundary heuristic a video
    * curation pipeline uses to pick representative frames for captioning
    * or embedding. Per-partition sequential walk (frame diffs are a
    * per-document chain, inherently local); only (doc_id, frame_idx,
    * n_frames) scalars leave the task — pixels and payloads never cross
    * an exchange. Undecodable frames reset the chain (the next decodable
    * frame re-keys), malformed containers yield no rows.
    */
  def selectKeyframes(payloads: DataFrame, threshold: Double): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames = aviFrames(bytes)
          val n = frames.length
          var prev: Array[Double] = null
          frames.iterator.flatMap { case (idx, fb) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
              catch { case _: java.io.IOException => null }
            if (img == null) { prev = null; Iterator.empty }
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val (sr, sg, sb) = rgbSums(rgbArray(img))
              val np = (w * h).toDouble
              val cur = Array(sr / np, sg / np, sb / np)
              val isKey = prev == null ||
                (math.abs(cur(0) - prev(0)) + math.abs(cur(1) - prev(1)) +
                 math.abs(cur(2) - prev(2))) / 3.0 > threshold
              prev = cur
              if (isKey) Iterator.single((id, idx, n)) else Iterator.empty
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_frames")
  }

  /** Scene structure of the planted multi-scene AVI: frame count and the
    * cut predicate (frame j > 0 starts a new scene iff (id + j) % 3 == 0).
    */
  def plantSceneFrames(id: Long): Int = (2 + id % 5).toInt
  def plantSceneCut(id: Long, j: Int): Boolean = j > 0 && (id + j) % 3 == 0

  /** The planted color of scene `s`: the solid-color formulas shifted by
    * (40, 80, 120) per scene — consecutive scenes stay ≥ 40 apart per
    * channel (mod-256 wrap only widens the gap), far above the JPEG DC
    * quantization band, while within-scene frames are byte-identical.
    */
  def plantSceneColor(id: Long, s: Int): (Int, Int, Int) =
    (((id + 40L * s) % 256).toInt, ((id * 3 + 80L * s) % 256).toInt,
      ((id * 7 + 120L * s) % 256).toInt)

  /** A REAL AVI/MJPEG container with PLANTED SCENE CUTS: frames share
    * [[plantSolidDims]] but the solid color jumps by [[plantSceneColor]]
    * at every [[plantSceneCut]] position, so [[selectKeyframes]]'s
    * decoded-diff walk must recover exactly {0} ∪ {cut frames}.
    */
  def plantSceneAviMjpeg(id: Long): Array[Byte] = {
    val (w, h) = plantSolidDims(id)
    val frames = plantSceneFrames(id)
    // one JPEG encode per SCENE, reused for its frames (same bytes ⇒
    // decoded diff exactly 0 within a scene)
    val sceneJpeg = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    def jpegFor(s: Int): Array[Byte] = sceneJpeg.getOrElseUpdate(s, {
      val (r, g, b) = plantSceneColor(id, s)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val baos = new java.io.ByteArrayOutputStream(512)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(0.9f)
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally { ios.close(); writer.dispose() }
      baos.toByteArray
    })
    var s = 0
    val payloads = (0 until frames).map { j =>
      if (plantSceneCut(id, j)) s += 1
      jpegFor(s)
    }
    aviMjpegContainer(w, h, payloads)
  }

  /** Minimal valid AVI/MJPEG container around pre-encoded JPEG frames —
    * shared by every video plant ([[plantSceneAviMjpeg]],
    * [[plantNearDupVideoAvi]]).
    */
  private def aviMjpegContainer(w: Int, h: Int,
      payloads: Seq[Array[Byte]]): Array[Byte] = {
    val frames = payloads.length
    val out = new java.io.ByteArrayOutputStream(512 +
      payloads.map(f => 8 + f.length + (f.length & 1)).sum)
    def wle32v(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    def wfcc(str: String): Unit = out.write(str.getBytes("US-ASCII"), 0, 4)
    val avihSz = 56; val strhSz = 56; val strfSz = 40
    val strlSz = 4 + 8 + strhSz + 8 + strfSz
    val hdrlSz = 4 + 8 + avihSz + 8 + strlSz
    val moviSz = 4 + payloads.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSz = 4 + 8 + hdrlSz + 8 + moviSz
    wfcc("RIFF"); wle32v(riffSz); wfcc("AVI ")
    wfcc("LIST"); wle32v(hdrlSz); wfcc("hdrl")
    wfcc("avih"); wle32v(avihSz)
    wle32v(33333); wle32v(0); wle32v(0); wle32v(0)
    wle32v(frames); wle32v(0); wle32v(1); wle32v(0)
    wle32v(w); wle32v(h); wle32v(0); wle32v(0); wle32v(0); wle32v(0)
    wfcc("LIST"); wle32v(strlSz); wfcc("strl")
    wfcc("strh"); wle32v(strhSz)
    wfcc("vids"); wfcc("MJPG")
    (0 until 12).foreach(_ => wle32v(0))
    wfcc("strf"); wle32v(strfSz)
    wle32v(strfSz); wle32v(w); wle32v(h); wle32v(1 | (24 << 16))
    wfcc("MJPG"); wle32v(w * h * 3); wle32v(0); wle32v(0); wle32v(0); wle32v(0)
    wfcc("LIST"); wle32v(moviSz); wfcc("movi")
    payloads.foreach { f =>
      wfcc("00dc"); wle32v(f.length)
      out.write(f, 0, f.length)
      if ((f.length & 1) == 1) out.write(0)
    }
    out.toByteArray
  }

  /** (doc_id, payload, media_type) of the planted multi-scene AVIs. */
  def plantSceneVideoPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantSceneAviMjpeg(id), "video/x-msvideo")) }
      .toDF("doc_id", "payload", "media_type")
  }

  // ---------------- video perceptual near-dup ----------------

  /** Keyframe selection ∘ per-keyframe [[dHash64]] in ONE decoded pass —
    * the front half of the video near-dup pipeline: the shot-boundary walk
    * of [[selectKeyframes]] (mean-RGB diff vs the previous decoded frame)
    * picks representative frames, and each keyframe's perceptual hash is
    * computed from the SAME decoded pixels before they're dropped. Only
    * (doc_id, frame_idx, n_frames, dhash) scalars leave the task — pixels
    * and payloads never cross an exchange, exactly the [[imageDHashes]]
    * contract. Undecodable frames reset the chain; malformed containers
    * yield no rows.
    */
  def videoKeyframeDHashes(payloads: DataFrame, threshold: Double): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames = aviFrames(bytes)
          val n = frames.length
          var prev: Array[Double] = null
          frames.iterator.flatMap { case (idx, fb) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
              catch { case _: java.io.IOException => null }
            if (img == null) { prev = null; Iterator.empty }
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val arr = rgbArray(img)
              val (sr, sg, sb) = rgbSums(arr)
              val np = (w * h).toDouble
              val cur = Array(sr / np, sg / np, sb / np)
              val isKey = prev == null ||
                (math.abs(cur(0) - prev(0)) + math.abs(cur(1) - prev(1)) +
                 math.abs(cur(2) - prev(2))) / 3.0 > threshold
              prev = cur
              if (isKey) Iterator.single((id, idx, n, dHash64(arr, w, h)))
              else Iterator.empty
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_frames", "dhash")
  }

  /** The 64-bit dHash keyframe `scene` of planted video `id` decodes to,
    * in closed form: 100 families (7-bit base pattern replicated into
    * segments [0,7)/[13,20)/[27,34)/[41,48) — distinct families are ≥ 4
    * bits apart), a per-SCENE axis in bits [50,52) (scene s flips the low
    * `s % 3` of them), and the per-member near-dup axis in bits [60,62)
    * (member m = (id/nFamilies) % 3 flips the low `m` bits). The family
    * count is the occupancy knob: matched-frame decision volume is
    * quadratic in family SIZE, so the gate derives nFamilies from corpus
    * size (nDocs/50, floor 100 — historic at every oracle scale) and the
    * sf1 bench stays linear. So two keyframes
    * hash within distance d iff |s₁%3 − s₂%3| + |m₁ − m₂| ≤ d for the
    * same family — a DuckDB oracle replays the formula and brute-forces
    * the pair set with bit_count(xor(...)).
    */
  def plantVideoDhashBits(id: Long, scene: Int, nFamilies: Long = 100): Long = {
    val f = id % nFamilies
    val m = (id / nFamilies) % 3
    // family pattern masked below bit 50 (the scene axis): for f < 100 the
    // mask is a no-op (f<<41 < 2^48), so the historic 100-family hashes —
    // and with them every gate oracle at sf0.01/sf0.1 — are bit-unchanged;
    // beyond, the low-13-bits-of-f identity keeps patterns injective and
    // cross-family distance ≥ 3 (three intact shifted copies) > maxDist 2.
    // nFamilies is the OCCUPANCY knob (gate derives it from corpus size, the
    // ivfListsFor convention): matched-frame candidate volume is quadratic
    // in family SIZE, so family count must scale with the corpus.
    ((f ^ (f << 13) ^ (f << 27) ^ (f << 41)) & ((1L << 50) - 1L)) ^
      (((1L << (scene % 3)) - 1L) << 50) ^ (((1L << m) - 1L) << 60)
  }

  /** The mean-gray base of planted scene `s`: cycles {83, 128, 173} so
    * every consecutive-scene mean jump is ≥ 45 gray (vs the byte-identical
    * 0 within a scene) while the gradient span stays inside [3, 253].
    */
  def plantVideoSceneBase(scene: Int): Int = 128 + (scene % 3) * 45 - 45

  /** A 90×80 JPEG whose [[dHash64]] is exactly `bits`: each 9×8 grid cell
    * is a SOLID 10×10 block on the ±10-per-column gradient walk of
    * [[plantDhashPng]], shifted to `baseGray`. dHash box-averages each
    * block back to its planted value (JPEG q0.9 noise on block-constant
    * content averages out well under the ±10 step), and the hash compares
    * ADJACENT CELL DIFFS only — invariant to the base shift, which exists
    * purely so the mean-RGB keyframe walk sees the scene cut.
    */
  private[graft] def dhashGradJpeg(bits: Long, baseGray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(90, 80,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    def fillCell(r: Int, c: Int, gray: Int): Unit = {
      val rgb = (gray << 16) | (gray << 8) | gray
      var y = r * 10
      while (y < r * 10 + 10) {
        var x = c * 10
        while (x < c * 10 + 10) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
    }
    var r = 0
    while (r < 8) {
      var gray = baseGray
      fillCell(r, 0, gray)
      var c = 0
      while (c < 8) {
        gray += (if (((bits >>> (r * 8 + c)) & 1L) == 1L) 10 else -10)
        fillCell(r, c + 1, gray)
        c += 1
      }
      r += 1
    }
    val baos = new java.io.ByteArrayOutputStream(1024)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.9f)
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { ios.close(); writer.dispose() }
    baos.toByteArray
  }

  /** A REAL AVI/MJPEG with PLANTED NEAR-DUP KEYFRAME HASHES: the scene
    * structure of [[plantSceneAviMjpeg]] (frame count [[plantSceneFrames]],
    * cuts [[plantSceneCut]], within-scene frames byte-identical) but every
    * scene's frame is a [[dhashGradJpeg]] carrying
    * [[plantVideoDhashBits]](id, s) at base [[plantVideoSceneBase]](s) —
    * so the keyframe walk recovers {0} ∪ cuts AND each keyframe's dHash
    * replays from the id/scene formula.
    */
  def plantNearDupVideoAvi(id: Long, nFamilies: Long = 100): Array[Byte] = {
    val frames = plantSceneFrames(id)
    val sceneJpeg = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    def jpegFor(s: Int): Array[Byte] = sceneJpeg.getOrElseUpdate(s,
      dhashGradJpeg(plantVideoDhashBits(id, s, nFamilies), plantVideoSceneBase(s)))
    var s = 0
    val payloads = (0 until frames).map { j =>
      if (plantSceneCut(id, j)) s += 1
      jpegFor(s)
    }
    aviMjpegContainer(90, 80, payloads)
  }

  // ---------------- audio fingerprinting (spectral peaks) ----------------

  /** In-place iterative radix-2 FFT (Cooley-Tukey decimation-in-time, the
    * public textbook form): bit-reversal permutation then log₂n butterfly
    * stages over (re, im). Length must be a power of two. Pure-JVM double
    * arithmetic — deterministic across partitions and executors.
    */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"fft length must be a power of two, got $n")
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var k = 0
      while (k < n) {
        var cwr = 1.0; var cwi = 0.0
        var m = 0
        val half = len >> 1
        while (m < half) {
          val ur = re(k + m); val ui = im(k + m)
          val xr = re(k + m + half); val xi = im(k + m + half)
          val vr = xr * cwr - xi * cwi
          val vi = xr * cwi + xi * cwr
          re(k + m) = ur + vr; im(k + m) = ui + vi
          re(k + m + half) = ur - vr; im(k + m + half) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          m += 1
        }
        k += len
      }
      len <<= 1
    }
  }

  /** Per-frame dominant spectral bin of channel 0 — the peak-picking front
    * half of a Wang 2003 ("An Industrial-Strength Audio Search Algorithm",
    * the Shazam constellation paper) fingerprinting pipeline: non-
    * overlapping `frameSize`-sample frames, REAL radix-2 FFT per frame,
    * peak = the magnitude² argmax over bins [1, frameSize/2) with the
    * LOWEST bin pinning ties. Only (doc_id, frame_idx, peak_bin) scalars
    * leave the task — samples never cross an exchange (the [[dHash64]] /
    * [[selectKeyframes]] contract). Non-PCM-16 / malformed payloads are
    * DROPPED (dead-letter); a trailing partial frame is ignored.
    */
  def audioPeakSequence(payloads: DataFrame, frameSize: Int = 256): DataFrame = {
    require(frameSize >= 8 && (frameSize & (frameSize - 1)) == 0,
      s"frameSize must be a power of two >= 8, got $frameSize")
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      payloads.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseWav(bytes) match {
            case Some(w) if w.bitDepth == 16 && w.channels >= 1 =>
              val bytesPerFrame = w.channels * 2
              val nSamples = w.dataLen / bytesPerFrame
              val nFrames = nSamples / frameSize
              (0 until nFrames).iterator.map { f =>
                val re = new Array[Double](frameSize)
                val im = new Array[Double](frameSize)
                var t = 0
                while (t < frameSize) {
                  val off = w.dataOff + (f * frameSize + t) * bytesPerFrame
                  re(t) = le16s(bytes, off).toDouble
                  t += 1
                }
                fft(re, im)
                var peak = 1; var best = -1.0
                var b = 1
                while (b < frameSize / 2) {
                  val mag = re(b) * re(b) + im(b) * im(b)
                  if (mag > best) { best = mag; peak = b }
                  b += 1
                }
                (id, f, peak)
              }
            case _ => Iterator.empty
          }
        }
      }
      .toDF("doc_id", "frame_idx", "peak_bin")
  }

  /** Planted tone structure: `plantToneSegs` tone segments of 4 frames
    * each; segment s of doc id carries a pure sine at FFT bin
    * [[plantToneBin]] — bin-aligned (integer cycles per 256-sample frame),
    * so the real FFT peak recovers the bin EXACTLY. 40 families share the
    * tone sequence; the member axis (id/40 % 3) shifts ONLY segment 0's
    * bin by m — the near-dup structure: same-family members agree on every
    * fingerprint triple not touching segment 0.
    */
  def plantToneSegs(id: Long): Int = (2 + id % 3).toInt
  def plantToneBin(id: Long, seg: Int): Int = {
    val fam = (id % 40).toInt
    val m = ((id / 40) % 3).toInt
    // every bin ENCODES its family (20+fam / 60+fam alternating), so
    // cross-family tone sequences can never alias into a shared triple
    // run — a modular formula (fam·2 + s·23 mod 80) let one family's
    // whole sequence reappear inside another's and produced above-floor
    // cross-family Jaccard. The only residual cross-family collision is
    // the member shift landing on a neighbor family's base bin, worth at
    // most ONE shared (b,b,b) hash ⇒ Jaccard ≤ 1/7 < every sane floor.
    20 + fam + 40 * (seg % 2) + (if (seg == 0) m else 0)
  }

  /** A REAL 16-bit mono PCM WAV of the planted tone sequence: sample t is
    * `round(16000 · sin(2π · bin(seg) · t / 256))` — integer cycles per
    * frame, so every frame of a segment yields the same exact-bin peak.
    */
  def plantToneWavPcm(id: Long): Array[Byte] = {
    val segs = plantToneSegs(id)
    val frames = segs * 4
    val n = frames * 256
    val dataLen = n * 2
    val b = new Array[Byte](44 + dataLen)
    def wstr(i: Int, s: String): Unit = {
      var j = 0; while (j < s.length) { b(i + j) = s.charAt(j).toByte; j += 1 }
    }
    def wle32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    def wle16w(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte }
    wstr(0, "RIFF"); wle32(4, 36 + dataLen); wstr(8, "WAVE")
    wstr(12, "fmt "); wle32(16, 16)
    wle16w(20, 1); wle16w(22, 1); wle32(24, 8000)
    wle32(28, 8000 * 2); wle16w(32, 2); wle16w(34, 16)
    wstr(36, "data"); wle32(40, dataLen)
    var t = 0
    while (t < n) {
      val seg = (t / 256) / 4
      val bin = plantToneBin(id, seg)
      val v = math.round(16000.0 * math.sin(2.0 * math.Pi * bin * t / 256.0)).toInt
      wle16w(44 + t * 2, v)
      t += 1
    }
    b
  }

  /** A CLIP of [[plantToneWavPcm]]: the same tone sequence starting at
    * segment 1 (the member-axis segment 0 dropped) — the retrieval-query
    * plant for [[graft.operators.Dedup.audioMatchOffsets]]: the clip must
    * match its source family at frame offset exactly 4.
    */
  def plantToneClipWavPcm(id: Long): Array[Byte] = {
    val segs = plantToneSegs(id) - 1
    val frames = segs * 4
    val n = frames * 256
    val dataLen = n * 2
    val b = new Array[Byte](44 + dataLen)
    def wstr(i: Int, s: String): Unit = {
      var j = 0; while (j < s.length) { b(i + j) = s.charAt(j).toByte; j += 1 }
    }
    def wle32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    def wle16w(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte }
    wstr(0, "RIFF"); wle32(4, 36 + dataLen); wstr(8, "WAVE")
    wstr(12, "fmt "); wle32(16, 16)
    wle16w(20, 1); wle16w(22, 1); wle32(24, 8000)
    wle32(28, 8000 * 2); wle16w(32, 2); wle16w(34, 16)
    wstr(36, "data"); wle32(40, dataLen)
    var t = 0
    while (t < n) {
      val seg = (t / 256) / 4 + 1
      val bin = plantToneBin(id, seg)
      val v = math.round(16000.0 * math.sin(2.0 * math.Pi * bin * t / 256.0)).toInt
      wle16w(44 + t * 2, v)
      t += 1
    }
    b
  }

  /** (doc_id, payload, media_type) of the planted tone CLIPS for the
    * subset of docs the retrieval gate queries with.
    */
  def plantToneClipPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantToneClipWavPcm(id), "audio/wav")) }
      .toDF("doc_id", "payload", "media_type")
  }

  /** (doc_id, payload, media_type) of the planted tone WAVs. */
  def plantTonePayloads(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id => (id, plantToneWavPcm(id), "audio/wav")) }
      .toDF("doc_id", "payload", "media_type")
  }

  /** (doc_id, payload, media_type) of the planted near-dup-hash AVIs. */
  def plantNearDupVideoPayloads(docs: DataFrame, idCol: String,
      nFamilies: Long = 100): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.SparkUtil.ensureParallelism(
      docs.select(col(idCol).cast("long").as("doc_id"))).as[Long]
      .mapPartitions { it => it.map(id =>
        (id, plantNearDupVideoAvi(id, nFamilies), "video/x-msvideo")) }
      .toDF("doc_id", "payload", "media_type")
  }
}
