package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Dev probe (r11): the blkb file-pruning A/B for the NARROW-batch
  * incremental-ER shape — a big seeded index, then small batches each
  * touching ONE block (the real "handful of new records" increment),
  * timed on the bucketed layout vs a content-identical legacy flat
  * layout. The wide-batch shape (batch touches every bucket) prunes
  * nothing by construction — SCALE.md quotes both.
  *
  *   runMain graft.tools.ErPruneProbe [nRows] [reps]
  */
object ErPruneProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(900000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local(32, "er-prune-probe")
    import spark.implicits._
    val people = spark.range(n).select(col("id").as("pid"),
      concat(lit("blk"), (col("id") / 100).cast("long").cast("string")).as("blk"),
      concat(lit("p"), expr("repeat('x', cast(id % 100 as int))")).as("nm"))
      .localCheckpoint(true)
    def batch(i: Int) = Seq((n + i, s"blk$i", "p" + "x" * (i % 100)))
      .toDF("pid", "blk", "nm")
    def timeSteps(path: String): Double = {
      val t0 = System.nanoTime()
      (1 to reps).foreach { i =>
        Quality.resolveEntitiesIncremental(batch(i), col("pid"),
          col("blk"), col("nm"), path).count()
        ()
      }
      (System.nanoTime() - t0) / 1e9 / reps
    }
    // bucketed layout (the default writer)
    val bp = java.nio.file.Files.createTempDirectory("erp-bucketed").toString
    Quality.writeEntityIndex(people, col("pid"), col("blk"), col("nm"), bp)
    val tb = timeSteps(bp)
    // legacy flat layout, content-identical: step 0 = the same rows
    // (bucketed read back, flattened), no meta marker
    val lp = java.nio.file.Files.createTempDirectory("erp-flat").toString
    spark.read.parquet(s"$bp/rows/step=0").drop("blkb")
      .write.mode("overwrite").parquet(s"$lp/rows/step=0")
    spark.range(0).select(col("id").as("src"), col("id").as("dst"))
      .write.mode("overwrite").parquet(s"$lp/remap/step=0")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$lp/commits"))
    fs.create(new org.apache.hadoop.fs.Path(s"$lp/commits/0.base"), true).close()
    val tf = timeSteps(lp)
    println(f"""{"metric":"er_prune","n":$n,"reps":$reps,""" +
      f""""bucketed_step_sec":$tb%.2f,"flat_step_sec":$tf%.2f}""")
    spark.stop()
  }
}
