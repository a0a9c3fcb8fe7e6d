package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary payloads with
  * typed metadata, plus decode / feature-extraction / resize /
  * frame-sampling stages.
  *
  * The Spark-side plumbing — schema, typed Dataset API, partition-wise
  * batch processing via mapPartitions — is real and tested. The codec
  * itself is a clearly-marked DETERMINISTIC FAKE (`fakeDecode`): no
  * image/audio libraries exist in this environment, so "decoding"
  * derives features from the raw bytes (a byte-histogram). Swapping in
  * a real codec changes only that one pure function; every plan shape,
  * schema and partitioning property stays identical.
  *
  * At 100 TB: payloads stay in parquet binary columns co-partitioned
  * with their metadata; decode runs as a narrow mapPartitions (no
  * shuffle), so feature extraction scales linearly with executors and
  * the expensive stage can be checkpointed to its own table.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long, payload: Array[Byte], kind: String,
      width: Int, height: Int, duration_ms: Long)

  final case class FeatureRow(doc_id: Long, kind: String, features: Array[Float])

  final case class FrameRow(doc_id: Long, frame_idx: Int, offset_ms: Long)

  /** Wrap a text corpus as fake media rows: payload = utf8 bytes,
    * metadata derived deterministically from the content hash. */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(hash(col("doc_id")), lit(3)) + 1).cast("int")).as("kind"),
        (pmod(hash(col("doc_id"), lit("w")), lit(1920)) + 1).cast("int").as("width"),
        (pmod(hash(col("doc_id"), lit("h")), lit(1080)) + 1).cast("int").as("height"),
        (pmod(hash(col("doc_id"), lit("d")), lit(60000)) + 1000).cast("long").as("duration_ms"))
      .as[MediaRow]
  }

  /** DETERMINISTIC FAKE decoder: an 8-bucket byte histogram, L1
    * normalized. Stands in for image/audio decode + embedding. */
  private[operators] def fakeDecode(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val counts = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      counts(((payload(i) & 0xff) * dim) / 256) += 1f
      i += 1
    }
    val total = math.max(1, payload.length).toFloat
    counts.map(_ / total)
  }

  /** Feature extraction as a partition-wise batch stage — the shape a
    * real codec UDF runs in (one codec init per partition, rows
    * streamed through it). */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // codec init would happen here, once per partition
      rows.map(r => FeatureRow(r.doc_id, r.kind, fakeDecode(r.payload, dim)))
    }
  }

  /** Frame sampling: one row per sampled frame from the duration
    * metadata — a generator (UDTF-shaped) stage, no payload decode. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 5000L): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .flatMap { r =>
        val n = (r.duration_ms / everyMs).toInt + 1
        (0 until n).map(i => FrameRow(r.doc_id, i, i * everyMs))
      }
  }

  /** Resize: pure metadata transform capping the longest edge —
    * payload untouched (a real resize would re-encode in
    * mapPartitions; the plan shape is identical). */
  def resizeMeta(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(r.width, r.height))
      r.copy(width = math.max(1, (r.width * scale).toInt),
        height = math.max(1, (r.height * scale).toInt))
    }
  }
}
