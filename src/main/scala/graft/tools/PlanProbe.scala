package graft.tools

import graft.SparkEntry

/** Dev tool: run one declared query and print its finalized physical
  * plan plus scan/exchange/reuse counts — the quick check that a
  * multi-consumer plan actually collapses its repeated subtrees
  * (ReusedExchange) instead of recomputing them.
  *
  *   runMain graft.tools.PlanProbe <queryName> [sfDir] [--full]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanProbe <queryName> [sfDir] [--full]")
    val name = args(0)
    val sf = args.drop(1).find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local(8, "planprobe")
    try {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      def n(pat: String) = pat.r.findAllIn(plan).size
      println(s"$name: FileScan=${n("FileScan")}" +
        s" Exchange=${n("Exchange hashpartitioning")}" +
        s" ReusedExchange=${n("ReusedExchange")}" +
        s" BroadcastExchange=${n("BroadcastExchange")}" +
        s" WholeStageCodegen=${n("WholeStageCodegen")}")
      if (args.contains("--full")) println(plan)
    } finally spark.stop()
  }
}
