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

  test("decimal rendering is locale-independent") {
    val dflt = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.compactLine(Seq("q" -> 1.25), Nil, 1.25, 2, "sf0.1")
      assert(line.contains(""""q":1.25""") && !line.contains("1,25"))
    } finally java.util.Locale.setDefault(dflt)
  }
}
