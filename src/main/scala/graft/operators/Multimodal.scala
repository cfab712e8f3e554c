package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side machinery here is real and tested — schema, encoders,
  * `mapPartitions` batch iteration, partition sizing. The pixel/sample
  * decode itself is a **clearly marked deterministic STUB** (`stubDecode`):
  * this container has no image/audio codecs, so the stub derives fake but
  * stable "features" from the payload bytes. Swapping in a real codec means
  * replacing exactly that one function.
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
    * init per batch) needs.
    */
  def decodeMeta(payloads: DataFrame): Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs would init the decoder once here, per partition
        it.map { case (id, bytes) => stubDecode(id, bytes) }
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
