package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batches.
  *
  * Header decode is REAL for the common image containers — PNG (IHDR), JPEG
  * (SOF scan), GIF (logical screen descriptor) — parsed directly from the
  * payload bytes per the public format specs, pure JVM. Payloads that are
  * none of these fall back to the **clearly marked deterministic STUB**
  * (`stubDecode`): this container has no pixel codecs, so full decode /
  * feature extraction derives fake but stable values from the payload
  * bytes. Swapping in a real pixel codec means replacing exactly that one
  * function; the `mapPartitions` batch contract stays.
  */
object Multimodal {

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

  /** JPEG: SOI marker, then scan marker segments until a start-of-frame
    * (SOF0-15 minus DHT/JPG/DAC); height/width are big-endian u16 at frame
    * header offsets 3/5.
    */
  private def parseJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xFF) == 0xFF) {
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

  /** REAL header decode: PNG / JPEG / GIF dimensions parsed from the
    * container bytes; anything else falls back to [[stubDecode]].
    */
  def decodeHeader(id: Long, payload: Array[Byte]): MediaMeta =
    parsePng(payload).orElse(parseJpeg(payload)).orElse(parseGif(payload)) match {
      case Some((fmt, w, h)) => MediaMeta(id, payload.length, fmt, w, h, 1)
      case None => stubDecode(id, payload)
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

  /** (doc_id, payload, media_type) of REAL planted container bytes — the
    * gate surface proving [[decodeHeader]] round-trips dimensions from
    * actual format headers.
    */
  def plantImagePayloads(docs: DataFrame, idCol: String, format: String): DataFrame = {
    require(format == "png" || format == "jpeg", s"unsupported plant format $format")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map(id => (id, if (format == "png") plantPng(id) else plantJpeg(id),
          "image/" + format))
      }
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
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pixel codecs would init the decoder once here, per partition
        it.map { case (id, bytes) => decodeHeader(id, bytes) }
      }
  }

  /** Frame sampling stub over the fake "video": emits every k-th frame index
    * as (doc_id, frame_idx) — exercises the explode/generator shape used for
    * frame-level datasets.
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyK: Int): DataFrame =
    meta.toDF().select(col("doc_id"),
      explode(sequence(lit(0), col("frame_count") - 1, lit(everyK))).as("frame_idx"))

  /** Fixed-width media "feature vector" row (8 dims as scalar columns —
    * comparator-friendly and column-pruned like a real feature table).
    */
  final case class MediaFeatures(
      doc_id: Long, f0: Double, f1: Double, f2: Double, f3: Double,
      f4: Double, f5: Double, f6: Double, f7: Double)

  /** ==== STUB ==== deterministic fake feature extraction: 8 doubles derived
    * from the payload length only, so an external oracle can reproduce them
    * from octet_length. A real embedding model would run here (per-partition
    * batch, model loaded once per partition — the `mapPartitions` shape is
    * the real contract).
    */
  def stubFeature(n: Int, j: Int): Double = ((n.toLong * (j + 3)) % 97).toDouble / 97.0

  def extractFeatures(payloads: DataFrame): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real extractors init the model once here, per partition
        it.map { case (id, bytes) =>
          val n = bytes.length
          MediaFeatures(id,
            stubFeature(n, 0), stubFeature(n, 1), stubFeature(n, 2),
            stubFeature(n, 3), stubFeature(n, 4), stubFeature(n, 5),
            stubFeature(n, 6), stubFeature(n, 7))
        }
      }
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
}
