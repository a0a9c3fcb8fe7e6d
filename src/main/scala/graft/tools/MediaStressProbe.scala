package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Scale-stress probe for the round-13 perceptual-dedup operators:
  * times the full hash+pair pipelines over synthetic fixture corpora
  * at growing N, so SCALE.md carries measured curves (the Stress
  * discipline) rather than asymptotic claims. The fixtures are
  * generated on the fly from an id range — the probe measures hash +
  * blocked-join cost, which is the whole operator (no source scan to
  * amortize). min-of-reps, one JVM.
  *
  * Usage: `runMain graft.tools.MediaStressProbe [reps]` — runs the
  * ladder {20k, 100k, 500k} images / spectral audio and
  * {20k, 100k} videos (6 frames each).
  */
object MediaStressProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.Sessions.local(cpus, "media-stress")
    import spark.implicits._

    def ids(n: Long) = spark.range(n).toDF("doc_id")
    def time(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      for (_ <- 1 to reps) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        rows = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }

    for (n <- Seq(20000L, 100000L, 500000L)) {
      val (tp, rp) = time(
        Multimodal.nearDupImagesPHash(
          Multimodal.pHashImageFixtures(ids(n)), maxDist = 0).count())
      println(f"image_phash n=$n%7d  sec=$tp%8.2f  pairs=$rp")
      val (ta, ra) = time(
        Multimodal.nearDupAudioSpectral(
          Multimodal.spectralAudioFixtures(ids(n)), maxDist = 0).count())
      println(f"audio_spectral n=$n%7d  sec=$ta%8.2f  pairs=$ra")
    }
    for (n <- Seq(20000L, 100000L)) {
      val (tv, rv) = time(
        Multimodal.nearDupVideos(Multimodal.videoFixtures(ids(n))).count())
      println(f"video_neardup n=$n%7d  sec=$tv%8.2f  pairs=$rv")
    }
    spark.stop()
  }
}
