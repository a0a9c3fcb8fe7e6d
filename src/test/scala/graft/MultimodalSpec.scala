package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Tables.load(spark, sf, "documents").limit(50)).cache()

  test("asMedia: payload round-trips the source bytes with typed metadata") {
    val r = media.filter($"doc_id" === media.head().doc_id).head()
    assert(r.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(r.kind))
    assert(r.width >= 1 && r.height >= 1 && r.duration_ms >= 1000)
  }

  test("decodeFeatures: mapPartitions stage emits L1-normalized features") {
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-4)
    }
  }

  test("decodeFeatures is deterministic") {
    val a = Multimodal.decodeFeatures(media).orderBy("doc_id").collect().map(_.features.toSeq)
    val b = Multimodal.decodeFeatures(media.repartition(5)).orderBy("doc_id")
      .collect().map(_.features.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("sampleFrames: one row per 5s of video duration") {
    val vids = media.filter($"kind" === "video").collect()
    val frames = Multimodal.sampleFrames(media).collect()
    val expected = vids.map(v => (v.duration_ms / 5000L).toInt + 1).sum
    assert(frames.length == expected)
    assert(frames.forall(f => f.offset_ms == f.frame_idx * 5000L))
  }

  test("resizeMeta caps the longest edge, preserves payload") {
    val resized = Multimodal.resizeMeta(media, 100).collect()
    assert(resized.forall(r => math.max(r.width, r.height) <= 100))
    val orig = media.collect().map(r => r.doc_id -> r.payload.toSeq).toMap
    assert(resized.forall(r => r.payload.toSeq == orig(r.doc_id)))
  }
}
