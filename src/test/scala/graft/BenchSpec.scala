package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compact bench line is the round driver's ONLY data channel (a
  * malformed or oversized line cost round 3 its numbers), so its
  * renderer is spec-tested as a pure function — no SparkSession. */
class BenchSpec extends AnyFunSuite {

  private def parseable(line: String): Boolean =
    line.startsWith("""{"metric":"total"""") && line.endsWith("}") &&
      line.count(_ == '{') == line.count(_ == '}')

  test("normal run: every query present, valid shape, under budget") {
    val qs = (1 to 80).map(i => f"q$i%02d_name" -> i * 0.1)
    val line = Bench.compactLine(qs, Nil, qs.map(_._2).sum, 2, "sf0.1")
    assert(line.length <= 1800 && parseable(line))
    assert(line.contains(""""errors":[]"""))
    assert(!line.contains("queries_omitted"))
    assert(qs.forall { case (k, _) => line.contains(s""""$k":""") })
  }

  test("oversized map truncates to the slowest queries with an omission marker") {
    val qs = (1 to 200).map(i => f"very_long_query_name_number_$i%03d" -> i * 0.01)
    val line = Bench.compactLine(qs, Nil, 3.0, 2, "sf0.1")
    assert(line.length <= 1800 && parseable(line))
    assert(line.contains("queries_omitted"))
    // the slowest query survives truncation; the fastest is dropped
    assert(line.contains("very_long_query_name_number_200"))
    assert(!line.contains("very_long_query_name_number_001\""))
  }

  test("catastrophic run: all queries failing still yields a parseable line") {
    val errs = (1 to 120).map(i => f"exploding_query_with_a_long_name_$i%03d")
    val line = Bench.compactLine(Nil, errs, 0.0, 2, "sf0.1")
    assert(line.length <= 1800 && parseable(line))
    assert(line.contains("errors_omitted"))
    assert(line.contains(""""queries":{}"""))
    assert(line.contains(""""n":0"""))
  }

  test("episodeMultiplier: uniform inflation reads as the median ratio; a single spike does not move it") {
    val floors = (1 to 20).map(i => f"q$i%02d" -> 1.0).toMap
    // uniform 1.6x episode: median = 1.6 (machine weather signature)
    val uniform = (1 to 20).map(i => f"q$i%02d" -> 1.6)
    assert(Bench.episodeMultiplier(uniform, floors).contains(1.6))
    // one real 8x regression on an otherwise-idle run: median stays ~1
    val spike = (1 to 19).map(i => f"q$i%02d" -> 1.0) :+ ("q20" -> 8.0)
    assert(Bench.episodeMultiplier(spike, floors).contains(1.0))
    // even-count median averages the middle pair
    val even = Seq("q01" -> 1.0, "q02" -> 1.0, "q03" -> 1.0, "q04" -> 1.0,
      "q05" -> 2.0, "q06" -> 2.0, "q07" -> 2.0, "q08" -> 2.0)
    assert(Bench.episodeMultiplier(even, floors).contains(1.5))
  }

  test("episodeMultiplier omitted with no floors, sub-0.01s floors, or a small SPARK_GRAFT_ONLY overlap") {
    val ok = (1 to 20).map(i => f"q$i%02d" -> 1.0)
    assert(Bench.episodeMultiplier(ok, Map.empty).isEmpty)
    // scheduler-jitter floors below 10ms never enter the ratio pool
    val tiny = (1 to 20).map(i => f"q$i%02d" -> 0.001).toMap
    assert(Bench.episodeMultiplier(ok, tiny).isEmpty)
    // 7 overlapping queries: too few to call host weather
    val seven = (1 to 7).map(i => f"q$i%02d" -> 1.0).toMap
    assert(Bench.episodeMultiplier(ok, seven).isEmpty)
  }

  test("loadFloors: pulls query floors out of the committed artifact shape; missing file is empty") {
    val f = java.io.File.createTempFile("floors", ".json")
    val w = new java.io.PrintWriter(f)
    try w.println(
      """{
        | "note": "per-query idle floor",
        | "n_queries": 2,
        | "total_floor_sec": 3.1,
        | "queries": {
        |  "p01_minhash_bands": {"sec": 1.85, "src": "BENCH_DETAIL"},
        |  "q01_agg": {"sec": 1.25, "src": "BENCH_r04"}
        | }
        |}""".stripMargin) finally w.close()
    val m = Bench.loadFloors(f.getAbsolutePath)
    assert(m("p01_minhash_bands") == 1.85 && m("q01_agg") == 1.25)
    // top-level scalars don't match the {"sec": N} object shape
    assert(!m.contains("n_queries") && !m.contains("total_floor_sec"))
    assert(Bench.loadFloors("/nonexistent/floors.json").isEmpty)
    f.delete()
  }

  test("loadFloors survives key reorder / extra keys; non-query-shaped keys rejected") {
    // r12 advisor: the old parse anchored on "sec" being the FIRST key
    // and a format tweak silently returned an empty map. r13 advisor:
    // keys are anchored to the query-name shape (q/r/p + digit), so a
    // future non-floor flat object carrying a "sec" pair (a load-stats
    // blob, say) is never silently imported as a floor.
    val f = java.io.File.createTempFile("floors2", ".json")
    val w = new java.io.PrintWriter(f)
    try w.println(
      """{"queries": {
        |  "q1_agg": {"src": "BENCH_r12", "sec": 0.42},
        |  "p66_image_phash_dist": {"reps": 4, "sec": 1.5, "src": "quiet"}
        | },
        | "load_stats": {"reps": 4, "sec": 99.0}
        |}""".stripMargin) finally w.close()
    val m = Bench.loadFloors(f.getAbsolutePath)
    assert(m == Map("q1_agg" -> 0.42, "p66_image_phash_dist" -> 1.5))
    f.delete()
  }

  test("episodeVictim: flags only no-quiet-rep rows at >= 2x a committed floor") {
    // the self-adjudication rule (r12 verdict ask #4): gated=false AND
    // min >= 2x floor -> victim; a quiet rep, a sane ratio, or a
    // missing/degenerate floor all mean the number stands on its own
    assert(Bench.episodeVictim(gated = false, sec = 4.0, floor = Some(1.0)))
    assert(!Bench.episodeVictim(gated = true, sec = 4.0, floor = Some(1.0)))
    assert(!Bench.episodeVictim(gated = false, sec = 1.9, floor = Some(1.0)))
    assert(!Bench.episodeVictim(gated = false, sec = 4.0, floor = None))
    assert(!Bench.episodeVictim(gated = false, sec = 4.0, floor = Some(0.001)))
  }

  test("decimal rendering is locale-independent") {
    val dflt = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.compactLine(Seq("q" -> 1.25), Nil, 1.25, 2, "sf0.1")
      assert(line.contains(""""q":1.25""") && !line.contains("1,25"))
    } finally java.util.Locale.setDefault(dflt)
  }
}
