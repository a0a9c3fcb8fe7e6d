package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}
import graft.operators.Multimodal.MediaRow

/** The MEDIA curation pipeline — [[Curate]]'s sibling for binary
  * payloads, composing the multimodal operators into the one call a
  * scraped-media corpus runs before training:
  *
  *   decode-validate (kind-appropriate REAL codec walk; undecodable
  *   payloads drop and are counted) →
  *   [per-modality quality gate — `imageSharpness` (blur/flat) /
  *   `audioStats` (clipping) / `videoMotion` (frozen clips), the
  *   media sibling of Curate's rule gate; before dedup so junk never
  *   spends the pigeonhole joins] →
  *   per-modality perceptual dedup (images: DCT pHash pigeonhole;
  *   audio: spectral-envelope hash; video: frame-fingerprint
  *   intersection — min-id survivors via connected components, the
  *   text pipeline's transitive rule) →
  *   [eval-set decontamination — the per-modality perceptual
  *   benchmark-leakage screen (`decontaminateImages`/`Audio`/
  *   `Videos`), the media form of Curate's held-out decontamination
  *   stage; after dedup (fewer to screen) and BEFORE the index write
  *   (a leaked item must never become an index fingerprint)] →
  *   [fingerprint index write — the artifact later batches dedup
  *   against incrementally via `dedupImagesAgainstIndex` /
  *   `dedupAudioAgainstIndex` / `dedupVideosAgainstIndex`]
  *
  * No new distributed logic: every stage is one of the spec-proven /
  * oracle-checked operators (p63/p64/p65 and the index laws), so the
  * 100 TB story is the sum of its stages — narrow decode + hashing,
  * capped pigeonhole joins, edge-local components. Unknown kinds pass
  * through validation untouched (absence of a codec is not evidence
  * of corruption) and skip dedup. */
object CurateMedia {

  /** `indexed*` = fingerprint rows landed per modality index
    * (image: 4 block rows per decodable survivor; audio: 4 block
    * rows; video: distinct (doc, frame-hash) rows), or -1 when no
    * `indexRoot` was given — the card's record of the pipeline's
    * persistent side effects. */
  final case class MediaStats(input: Long, decodable: Long,
      afterDedup: Long, images: Long, audio: Long, video: Long,
      indexedImages: Long = -1L, indexedAudio: Long = -1L,
      indexedVideo: Long = -1L, afterDecon: Long = -1L,
      afterQuality: Long = -1L)

  /** Returns (surviving media rows, stats). `indexRoot`, when set,
    * persists the survivors' fingerprint indexes under
    * `<root>/image_phash`, `<root>/audio_spectral` and
    * `<root>/video_frames` — the incremental-dedup handoff for the
    * next batch, covering every modality the dedup stage covers (a
    * video landed today must not be re-admitted tomorrow any more
    * than an image). `evalMedia`, when set, screens the dedup
    * survivors against the benchmark corpus per modality (the
    * perceptual decontamination stage — images/audio at the run's
    * `maxDist`, videos at its `minFrames`) before anything indexes;
    * the screens REQUIRE maxDist <= 3 (the pigeonhole recall bound —
    * dedup merely documents it, a screen fails loudly), so an
    * evalMedia run with a looser maxDist errors by design.
    * `minSharpness`/`maxClipFrac`/`minMotion`, when set, gate their
    * modality on the quality scores before dedup (null verdicts
    * pass).
    * `stats = false` skips the accounting counts (same contract as
    * [[Curate.run]]); the survivor output and the index writes are
    * identical either way. */
  def run(media: Dataset[MediaRow], maxDist: Int = 3,
      minFrames: Int = 4, maxBucket: Int = 100,
      indexRoot: Option[String] = None,
      evalMedia: Option[Dataset[MediaRow]] = None,
      minSharpness: Option[Double] = None,
      maxClipFrac: Option[Double] = None,
      minMotion: Option[Double] = None,
      stats: Boolean = true): (DataFrame, Option[MediaStats]) = {
    val spark = media.sparkSession
    import spark.implicits._
    Dedup.ensureCheckpointDir(spark)
    def countIf(df: DataFrame): Long = if (stats) df.count() else -1L
    val input = countIf(media.toDF())
    // 1. decode-validate: one narrow pass, kind-appropriate codec walk.
    // CHECKPOINTED (the Curate.run stage discipline): the slice below
    // fans out into 3+ modality pipelines plus the accounting counts,
    // and without truncation every one of them would re-decode the
    // whole corpus from source — the dominant recompute when stats +
    // index + decon all consume it.
    val valid = media.filter(r => r.kind match {
      case "image" => Multimodal.parseBmp(r.payload).isDefined
      case "audio" => Multimodal.parseWav(r.payload).isDefined
      case "video" => Multimodal.parseBmpSequence(r.payload).isDefined
      case _ => true // no codec -> no verdict; kept visible
    }).checkpoint()
    val decodable = countIf(valid.toDF())
    // 1b. optional per-modality quality gate (the media sibling of
    // Curate's rule gate): blur/flat images below `minSharpness`,
    // clipped audio above `maxClipFrac`, frozen clips below
    // `minMotion`. BEFORE dedup — junk must not spend the pigeonhole
    // joins — and gate-less modalities pass untouched. A decodable row
    // the scorer cannot judge (no interior, too few frames) keeps its
    // null verdict and PASSES: absence of a verdict is not evidence of
    // junk, the decode-validate philosophy.
    val gateOn =
      minSharpness.nonEmpty || maxClipFrac.nonEmpty || minMotion.nonEmpty
    def gate(slice: Dataset[MediaRow], scoreOf: Dataset[MediaRow] => DataFrame,
        keep: org.apache.spark.sql.Column): Dataset[MediaRow] = {
      import slice.sparkSession.implicits._
      slice.toDF()
        .join(scoreOf(slice), Seq("doc_id"), "left")
        .filter(keep)
        .select(slice.columns.map(col).toIndexedSeq: _*).as[MediaRow]
    }
    val qImages0 = valid.filter(col("kind") === "image")
    val qAudio0 = valid.filter(col("kind") === "audio")
    val qVideo0 = valid.filter(col("kind") === "video")
    val images = minSharpness match {
      case None => qImages0
      case Some(t) => gate(qImages0, Multimodal.imageSharpness(_),
        col("sharpness").isNull || col("sharpness") >= t)
    }
    val audio = maxClipFrac match {
      case None => qAudio0
      case Some(t) => gate(qAudio0, Multimodal.audioStats(_),
        col("clip_frac").isNull || col("clip_frac") <= t)
    }
    val video = minMotion match {
      case None => qVideo0
      case Some(t) => gate(qVideo0, Multimodal.videoMotion(_),
        col("motion").isNull || col("motion") >= t)
    }
    val other = valid.filter(!col("kind").isin("image", "audio", "video"))
    val afterQuality = if (!gateOn) -1L
      else countIf(images.toDF().unionByName(audio.toDF())
        .unionByName(video.toDF()).unionByName(other.toDF()))
    // 2. per-modality perceptual dedup. The three hash pipelines are
    // independent narrow stages over disjoint slices of ONE corpus;
    // each modality's pairs collapse to min-id survivors through the
    // same components machinery as the text pipeline.
    // each kept* frame has up to four consumers (survivor union, the
    // per-modality count, the index write, the decon screen) — pin it
    // when more than the union will read it, so the hash+components
    // chain runs once per modality, not once per consumer
    val multi = stats || indexRoot.nonEmpty || evalMedia.nonEmpty
    def pin(df: DataFrame): DataFrame = if (multi) df.checkpoint() else df
    val keptImages = pin(Dedup.survivors(images.toDF(),
      Multimodal.nearDupImagesPHash(images, maxDist, maxBucket)))
    val keptAudio = pin(Dedup.survivors(audio.toDF(),
      Multimodal.nearDupAudioSpectral(audio, maxDist, maxBucket)))
    val keptVideo = pin(Dedup.survivors(video.toDF(),
      Multimodal.nearDupVideos(video, minFrames, maxBucket)
        .select(col("d1"), col("d2"))))
    val afterDedup = countIf(keptImages.unionByName(keptAudio)
      .unionByName(keptVideo).unionByName(other.toDF()))
    // 2b. optional eval-set decontamination: survivors only (fewer to
    // screen), and BEFORE the index handoff — a benchmark leak must
    // never become the fingerprint later batches dedup against
    val (finImages, finAudio, finVideo) = evalMedia match {
      case None => (keptImages, keptAudio, keptVideo)
      case Some(ev) =>
        (pin(Multimodal.decontaminateImages(keptImages.as[MediaRow],
          ev.filter(col("kind") === "image"), maxDist, maxBucket)),
         pin(Multimodal.decontaminateAudio(keptAudio.as[MediaRow],
          ev.filter(col("kind") === "audio"), maxDist, maxBucket)),
         pin(Multimodal.decontaminateVideos(keptVideo.as[MediaRow],
          ev.filter(col("kind") === "video"), minFrames, maxBucket)))
    }
    val survivors = finImages.unionByName(finAudio)
      .unionByName(finVideo).unionByName(other.toDF())
    val afterDecon =
      if (evalMedia.isEmpty) -1L else countIf(survivors)
    // 3. optional fingerprint-index handoff (the incremental contract:
    // only SURVIVORS index — a dropped duplicate must never become
    // the fingerprint that shadows a later clean arrival). Index-row
    // accounting reads the landed parquet's footers (metadata-only,
    // never a data scan) so the card reports what actually persisted.
    def landed(path: String): Long =
      if (stats) spark.read.parquet(path).count() else -1L
    val (idxImg, idxAud, idxVid) = indexRoot match {
      case None => (-1L, -1L, -1L)
      case Some(root) =>
        Multimodal.writePHashIndex(finImages.as[MediaRow], s"$root/image_phash")
        Multimodal.writeSpectralIndex(finAudio.as[MediaRow], s"$root/audio_spectral")
        Multimodal.writeFrameIndex(finVideo.as[MediaRow], s"$root/video_frames")
        (landed(s"$root/image_phash"), landed(s"$root/audio_spectral"),
          landed(s"$root/video_frames"))
    }
    val st = if (stats) Some(MediaStats(input, decodable, afterDedup,
      finImages.count(), finAudio.count(), finVideo.count(),
      idxImg, idxAud, idxVid, afterDecon, afterQuality))
    else None
    (survivors, st)
  }

  /** Data card: one row per stage, the [[Curate.dataCard]] shape. The
    * eval_decon row appears only when the run screened against an
    * eval set; the index stages are pure side-effect records
    * (fingerprint rows landed per modality; nothing drops), present
    * only when the run was given an `indexRoot`. */
  def dataCard(spark: org.apache.spark.sql.SparkSession,
      st: MediaStats): DataFrame = {
    import spark.implicits._
    val dedupIn = if (st.afterQuality >= 0L) st.afterQuality else st.decodable
    val stages = Seq(
      ("decode_validate", st.input, st.decodable)) ++
      Seq(("quality_gate", st.decodable, st.afterQuality))
        .filter(_._3 >= 0L) ++
      Seq(("perceptual_dedup", dedupIn, st.afterDedup)) ++
      Seq(("eval_decon", st.afterDedup, st.afterDecon))
        .filter(_._3 >= 0L) ++
      Seq(("index_image_phash", st.indexedImages, st.indexedImages),
        ("index_audio_spectral", st.indexedAudio, st.indexedAudio),
        ("index_video_frames", st.indexedVideo, st.indexedVideo))
        .filter(_._2 >= 0L)
    stages.map { case (n, in, out) =>
        (n, in, out, in - out,
          if (in > 0) math.rint((in - out).toDouble / in * 10000) / 10000 else 0.0)
      }.toDF("stage", "rows_in", "rows_out", "rows_dropped", "drop_frac")
  }
}
