package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Multimodal
import graft.streaming.Ingest

/** Driver-side job-structure profile for the STREAMING operators and the
  * media pipeline — the one operator family round 14 never measured
  * (VERDICT r14 "Next round" item 4). Same listener + report shape as
  * [[JobProfile]], but each scenario drives a foreachBatch stream (or a
  * maintenance call) end-to-end over deterministic fixtures in a temp
  * dir, so the numbers are the per-batch orchestration cost a
  * production ingest pays: jobs, stages, executor task time, wall.
  *
  * Streams are stateful (checkpoints, persisted indexes), so each
  * scenario runs ONCE, cold, in submission order — per-batch job
  * structure is deterministic; wall carries the usual microVM load
  * noise and the first scenario absorbs JVM warmup (reported, so read
  * job/stage counts as the signal, like JOBCOUNTS.md).
  *
  *   runMain graft.tools.StreamProfile [sfDir]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = graft.Sessions.local(cpus, appName = "streamprofile")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("streamprofile").toString

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var jobs = Vector.empty[(Int, Double)]
    @volatile var taskTimeMs = 0L
    @volatile var stages = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(je.jobId)
        if (t0 != 0L) jobs :+= (je.jobId, (System.nanoTime() - t0) / 1e9)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(name: String)(body: => Unit): Unit = {
      spark.catalog.clearCache()
      jobs = Vector.empty; taskTimeMs = 0L; stages = 0
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"$name%-34s wall=${wall}%6.2f s  jobs=${jobs.size}%3d  " +
        f"stages=$stages%4d  taskTime=${taskTimeMs / 1000.0}%7.2f s")
      val slow = jobs.sortBy(-_._2).take(6)
      println("   slowest jobs: " +
        slow.map { case (id, s) => f"#$id:${s}%.2f" }.mkString("  "))
    }

    // ── fixtures: the sf docs split into 2 micro-batch files ──
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val docsU = docs.withColumn("url",
      concat(lit("https://ex.com/p/"), (col("doc_id") % 4000).cast("string")))
    def twoBatches(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
      df.filter(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(dir)
      df.filter(col("doc_id") % 2 =!= 0).coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")

    // 1. jsonl ingest: the docs as JSON lines, one bad line planted
    locally {
      val src = s"$tmp/jsonl-src"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
      val lines = docs.toJSON.collect()
      java.nio.file.Files.write(java.nio.file.Paths.get(src, "b1.json"),
        (lines.take(lines.length / 2) :+ "{not json").mkString("\n").getBytes)
      java.nio.file.Files.write(java.nio.file.Paths.get(src, "b2.json"),
        lines.drop(lines.length / 2).mkString("\n").getBytes)
      measure("jsonlIngestStream (2 batches)") {
        Ingest.jsonlIngestStream(spark, docs.schema, src,
          s"$tmp/jsonl-good", s"$tmp/jsonl-bad", s"$tmp/jsonl-ck")
      }
    }

    // 2. partitioned CDC upsert: create+update envelopes over 5k keys
    locally {
      val rowSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType)))
      val src = s"$tmp/cdc-src"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
      def env(op: String, id: Long, lsn: Long): String =
        s"""{"payload":{"op":"$op","before":null,"after":{"id":$id,"v":"v$lsn"},""" +
          s""""source":{"lsn":$lsn},"ts_ms":${1700000000000L + lsn}}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(src, "b1.json"),
        (1L to 5000L).map(i => env("c", i, i)).mkString("\n").getBytes)
      java.nio.file.Files.write(java.nio.file.Paths.get(src, "b2.json"),
        (1L to 1000L).map(i => env("u", i * 5, 10000 + i)).mkString("\n").getBytes)
      measure("cdcUpsertStreamPartitioned (2 b.)") {
        Ingest.cdcUpsertStreamPartitioned(spark, rowSchema, "id", src,
          s"$tmp/cdc-out", s"$tmp/cdc-ck", nBuckets = 8)
      }
    }

    // 3. URL dedup ingest (first-arrived-wins, persisted norm_url index)
    locally {
      val src = s"$tmp/url-src"
      twoBatches(docsU, src)
      measure("urlDedupIngestStream (2 batches)") {
        Ingest.urlDedupIngestStream(spark, docsU.schema, src,
          s"$tmp/url-corpus", s"$tmp/url-idx", s"$tmp/url-ck")
      }
    }

    // 4. near-dup dedup ingest (minhash/LSH band index across batches)
    locally {
      val src = s"$tmp/dedup-src"
      twoBatches(docs, src)
      measure("dedupIngestStream (2 batches)") {
        Ingest.dedupIngestStream(spark, docs.schema, src,
          s"$tmp/dedup-corpus", s"$tmp/dedup-idx", s"$tmp/dedup-ck")
      }
    }

    // 5. full curate ingest (gate -> dedup -> index -> budget state)
    locally {
      val src = s"$tmp/curate-src"
      twoBatches(docs, src)
      measure("curateIngestStream (2 batches)") {
        Ingest.curateIngestStream(spark, docs.schema, src,
          s"$tmp/curate-out", s"$tmp/curate-idx", s"$tmp/curate-state",
          s"$tmp/curate-ck", budgetTokens = 100000000L)
      }
    }

    // 6. semantic decontamination stream (frozen eval vectors)
    locally {
      val src = s"$tmp/sem-src"
      emb.filter(col("vec_id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(src)
      emb.filter(col("vec_id") % 2 =!= 0).coalesce(1)
        .write.mode("append").parquet(src)
      val eval = emb.filter(col("vec_id") < 100)
        .select((col("vec_id") + 900000).as("vec_id"), col("embedding"))
      measure("semDeconStream (2 batches)") {
        Ingest.semDeconStream(spark, emb.schema, src, s"$tmp/sem-out",
          eval, s"$tmp/sem-ck")
      }
    }

    // 7. media decontamination stream (frozen pHash index, 500 images)
    locally {
      val src = s"$tmp/mdc-src"
      val evIdx = s"$tmp/mdc-evidx"
      Multimodal.writePHashIndex(
        Multimodal.imageFixtures(spark.range(50).select(($"id" + 10000).as("doc_id"))),
        evIdx)
      val b1 = Multimodal.imageFixtures(spark.range(250).select($"id".as("doc_id")))
      val b2 = Multimodal.imageFixtures(
        spark.range(250).select(($"id" + 250).as("doc_id")))
      b1.toDF().coalesce(1).write.mode("append").parquet(src)
      b2.toDF().coalesce(1).write.mode("append").parquet(src)
      val ev = spark.read.parquet(evIdx)
      measure("mediaDeconStream (2 batches)") {
        Ingest.mediaDeconStream(spark, b1.toDF().schema, src, s"$tmp/mdc-out",
          ds => Multimodal.decontaminateImagesAgainstIndex(ds, ev),
          s"$tmp/mdc-ck")
      }
    }

    // 8. stream-state maintenance: compact a 6-partition delta dir,
    //    vacuum a 6-partition snapshot dir
    locally {
      val st = s"$tmp/maint-state"
      (0L to 5L).foreach { id =>
        docs.filter(col("doc_id") % 6 === id).select("doc_id", "n_chars")
          .write.mode("overwrite").parquet(s"$st/batch_id=$id")
      }
      measure("compactStreamState (6 parts)") {
        Ingest.compactStreamState(spark, st); ()
      }
      val sn = s"$tmp/maint-snap"
      (0L to 5L).foreach { id =>
        docs.limit(100).select("doc_id").write.mode("overwrite")
          .parquet(s"$sn/batch_id=$id")
      }
      measure("vacuumStreamSnapshots (6 parts)") {
        Ingest.vacuumStreamSnapshots(spark, sn); ()
      }
    }

    // 9. CurateMedia end-to-end (300 mixed media rows, stats + indexes)
    locally {
      val media = Multimodal.imageFixtures(
          spark.range(100).select($"id".as("doc_id")))
        .unionByName(Multimodal.audioFixtures(
          spark.range(100).select(($"id" + 1000).as("doc_id"))))
        .unionByName(Multimodal.videoFixtures(
          spark.range(100).select(($"id" + 2000).as("doc_id"))))
      measure("CurateMedia.run (300 rows, stats)") {
        val (out, st) = graft.pipelines.CurateMedia.run(media,
          indexRoot = Some(s"$tmp/cm-idx"))
        out.write.format("noop").mode("overwrite").save()
        assert(st.nonEmpty)
      }
    }

    spark.stop()
  }
}
