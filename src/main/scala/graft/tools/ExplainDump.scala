package graft.tools

import java.nio.file.{Files, Paths}
import graft.SparkEntry

/** Writes `.explain("formatted")` output for the named queries to
  * `<outDir>/<query>_<suffix>.txt` — the r14 optimization round's
  * plan-evidence artifacts (the _before/_after files under plans/r14).
  * Runs each query first so AQE-final executed-plan counts (job/stage
  * structure) can be captured alongside; iterative queries truncate at
  * their localCheckpoint/checkpoint, which is exactly why the files
  * carry the executed-plan fingerprint line too.
  *
  *   runMain graft.tools.ExplainDump <q1,q2,...> <outDir> <suffix> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainDump <q1,q2,...> <outDir> <suffix> [sfDir]")
    val names = args(0).split(',').toSeq
    val outDir = args(1)
    val suffix = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = graft.Sessions.local(8, "explaindump")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val executed = df.queryExecution.executedPlan.toString
      def n(pat: String) = pat.r.findAllIn(executed).size
      val fp = s"executed-plan fingerprint: Exchange=${n("Exchange")} " +
        s"WholeStageCodegen=${"\\*\\((\\d+)\\)".r.findAllMatchIn(executed).map(_.group(1)).toSet.size} " +
        s"BHJ=${n("BroadcastHashJoin")} SMJ=${n("SortMergeJoin")} " +
        s"SHJ=${n("ShuffledHashJoin")} BNLJ=${n("BroadcastNestedLoopJoin")} " +
        s"Scan=${n("Scan parquet")} Reused=${n("ReusedExchange")}"
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
        s"// $name @ $sfDir ($suffix)\n// $fp\n\n$formatted\n\n" +
          s"== AQE-final executed plan (checkpoint-truncated for iterative queries) ==\n$executed\n")
      spark.catalog.clearCache()
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
