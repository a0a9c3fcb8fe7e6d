package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Deterministic (sorted) order + one discarded warmup so the
    // first-measured query does not absorb JVM/codegen warmup, and a
    // cache clear per query AND per run so persisted intermediates
    // never leak into later measurements. Each query is measured as the
    // MIN of two cold runs: single-run timings on these small fixtures
    // carry up to ±50% GC/JIT noise, and the min of independent cold
    // runs estimates the true cost without any cache warming
    // (clearCache between runs).
    val runs = 2
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    try { ordered.head._2(spark, sfDir).count() } catch { case _: Throwable => () }
    spark.catalog.clearCache()
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val results = ordered.map { case (name, fn) =>
      val dts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => failed += name }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      name -> dts.min
    }
    // A throwing query contributes NOTHING to the total or the map: a
    // fast failure must not lower the headline number. Its name lands
    // in the "errors" list instead.
    val ok = results.filterNot { case (name, _) => failed.contains(name) }
    val total = ok.map(_._2).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sfLabel = new java.io.File(sfDir).getName

    // Full-precision detail goes to a file (and an early stdout line);
    // the FINAL stdout line is kept compact because the round driver
    // captures only the last ~2000 chars of output — a full-precision
    // 75-query line overflows that window and the driver records
    // parsed:null. The compact line self-truncates to the slowest
    // queries if the full 2dp map would still overflow.
    def fmt2(v: Double) = f"$v%.2f"
    val fullQs = ok.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","per_query":"min of $runs cold runs","errors":$errs,"queries":$fullQs,"sf":"$sfDir"}"""
    println(fullLine)
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      try w.println(fullLine) finally w.close()
    } catch { case _: Throwable => () }

    def compactLine(qs: Seq[(String, Double)], omitted: Int): String = {
      val m = qs.map { case (k, v) => s""""$k":${fmt2(v)}""" }.mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","n":${ok.size},"runs":$runs,"errors":$errs$om,"queries":$m,"sf":"$sfLabel"}"""
    }
    // Budget under 2000 minus the trailing sbt status line (~80 chars)
    // so the complete JSON line fits in the captured tail.
    val budget = 1800
    var line = compactLine(ok, 0)
    if (line.length > budget) {
      val bySlow = ok.sortBy(-_._2)
      var k = ok.size
      while (k > 1 && { line = compactLine(bySlow.take(k).sortBy(_._1), ok.size - k); line.length > budget }) k -= 1
    }
    println(line)
    spark.stop()
  }
}
