package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** A/B: stock Dataset.checkpoint() (plan computed twice: eager count +
  * checkpoint-file write job) vs persist-first pinnedCheckpoint.
  * Usage: CheckpointProbe [sfDir] [reps] */
object CheckpointProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32), "cpprobe")
    Dedup.ensureCheckpointDir(spark)
    @volatile var taskTimeMs = 0L
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
      }
    })
    val docs = Tables.load(spark, sfDir, "documents")
    def pairs: DataFrame = Dedup.lshCandidates(Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.shingleHashes(docs), hashed = true)),
      dedup = false)
    def run(label: String)(f: DataFrame => DataFrame): Unit = {
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        taskTimeMs = 0L; stages = 0
        val t0 = System.nanoTime()
        val cp = f(pairs.select(col("d1"), col("d2")))
        val n = cp.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        println(f"$label%-22s rep$i wall=${wall}%6.2f s stages=$stages%3d taskTime=${taskTimeMs / 1000.0}%7.2f s rows=$n")
      }
    }
    // persist-first variant, kept LOCAL to this probe: measured and
    // REJECTED for the library (OPTIMIZATION_r14.md "tried and
    // rejected") — the cached subtree plans without AQE
    // (canChangeCachedPlanOutputPartitioning=false), costing far more
    // than the stock write job's final-stage recompute, which reuses
    // the count job's shuffle outputs.
    def pinned(df: DataFrame): DataFrame = {
      val p = df.persist(); val cp = p.checkpoint()
      p.unpersist(blocking = false); cp
    }
    run("stock_checkpoint")(df => df.checkpoint())
    run("pinned_checkpoint")(df => pinned(df))
    run("stock_checkpoint")(df => df.checkpoint())
    run("pinned_checkpoint")(df => pinned(df))
    spark.stop()
  }
}
