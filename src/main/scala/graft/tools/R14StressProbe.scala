package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Multimodal}
import graft.streaming.Ingest

/** Scale-stress probe for the round-14 operators: measured curves for
  * SCALE.md (the Stress/MediaStressProbe discipline — min of reps,
  * one JVM) rather than asymptotic claims.
  *
  * Sections:
  *  1. `dedupVideosAgainstIndex` — a fixed 10k-video batch against a
  *     growing persisted frame-fingerprint index: the claim under test
  *     is that per-batch cost is the batch's decode+hash plus a
  *     fingerprint-keyed join, NOT a function of the old corpus's
  *     pixels (old videos contribute ~16-byte rows).
  *  2. `compactStreamState` — a delta state dir fragmented into 256
  *     per-batch partitions: read cost before/after folding, file and
  *     partition counts, and the compaction's own price.
  *  3. `retrainIvfIndex` — the r14 retrain-and-swap over a 200k×16
  *     index: Lloyd-to-tolerance rounds + rebuild + promote, the
  *     maintenance job the drift signal schedules.
  *
  * Usage: `runMain graft.tools.R14StressProbe [reps]`.
  */
object R14StressProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.Sessions.local(cpus, "r14-stress")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("r14stress").toString

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

    // 1. incremental video dedup: batch fixed at 10k (5k planted dups
    // of indexed videos + 5k fresh textures), index grows 100k -> 500k
    for (n <- Seq(100000L, 500000L)) {
      val idxPath = s"$tmp/vidx$n"
      // index = the EVEN-id fixtures (distinct textures) of [0, 2n)
      Multimodal.writeFrameIndex(
        Multimodal.videoFixtures(
          spark.range(n).select(($"id" * 2).as("doc_id"))), idxPath)
      // batch = 5k odd ids (trimmed+graded twins of indexed evens) +
      // 5k fresh even ids beyond the indexed range
      val batch = Multimodal.videoFixtures(
        spark.range(5000L).select(($"id" * 2 + 1).as("doc_id"))
          .unionByName(spark.range(5000L)
            .select((lit(2L) * n + $"id" * 2).as("doc_id"))))
      val idx = spark.read.parquet(idxPath)
      val (t, kept) = time(
        Multimodal.dedupVideosAgainstIndex(batch, idx).count())
      println(f"video_vs_index idx=$n%7d batch=10000  sec=$t%8.2f  kept=$kept")
    }

    // 2. compactStreamState: 256 batch partitions x 1k rows, written
    // 4 files each (the small-file shape a maxFilesPerTrigger=1 stream
    // leaves); read-cost before, compaction price, read-cost after
    val state = s"$tmp/delta-state"
    for (id <- 0 until 256)
      spark.range(1000L)
        .select(($"id" + id * 1000L).as("doc_id"),
          hash($"id", lit(id)).cast("long").as("fhash"))
        .repartition(4)
        .write.mode("overwrite").parquet(s"$state/batch_id=$id")
    def files(p: String): Long =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        .filter(f => f.toString.endsWith(".parquet")).count()
    val (tBefore, nRows) = time(
      spark.read.parquet(state).filter($"batch_id" < 256).count())
    println(f"state_read_fragmented parts=256 files=${files(state)}%d  sec=$tBefore%8.2f  rows=$nRows")
    val t0 = System.nanoTime()
    val maxId = Ingest.compactStreamState(spark, state)
    val tCompact = (System.nanoTime() - t0) / 1e9
    val (tAfter, nAfter) = time(
      spark.read.parquet(state).filter($"batch_id" < 256).count())
    println(f"state_compacted maxId=$maxId files=${files(state)}%d  compact_sec=$tCompact%8.2f  read_sec=$tAfter%8.2f  rows=$nAfter")

    // 3. retrainIvfIndex over 200k x 16-dim, k=32: the scheduled
    // maintenance job (Lloyd to tol + rebuild + promote)
    val nv = 200000L; val k = 32
    val vecs = spark.range(nv).select($"id".as("vec_id"),
      expr("transform(sequence(0, 15), j -> " +
        "cast(pmod(hash(id, j), 997) as float) / 997.0f)").as("embedding"))
    val seed = vecs.limit(k)
    val ivfPath = s"$tmp/ivf"
    Ann.writeIvfIndex(vecs, seed, ivfPath)
    val t1 = System.nanoTime()
    val cents = Ann.retrainIvfIndex(spark, ivfPath, k)
    val tRetrain = (System.nanoTime() - t1) / 1e9
    println(f"ivf_retrain n=$nv k=$k  sec=$tRetrain%8.2f  cents=${cents.count()}")

    spark.stop()
  }
}
