package graft

import scala.io.Source
import graft.tools.Golden

/** Offline value-regression gate: every query's canonical digest at
  * sf0.001 must match the committed golden (regenerate intentionally
  * with `runMain graft.tools.Golden` after a semantic change). */
class GoldenSpec extends SparkSpec {

  test("every query matches its committed golden digest") {
    val src = Source.fromResource("goldens-sf0.001.txt")
    val goldens =
      try src.getLines().map { l =>
        val Array(n, h) = l.split(" ", 2); n -> h
      }.toMap
      finally src.close()
    assert(goldens.keySet == SparkEntry.queries.keySet,
      s"golden file out of sync: ${goldens.keySet.diff(SparkEntry.queries.keySet)} vs ${SparkEntry.queries.keySet.diff(goldens.keySet)}")
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val got = Golden.digest(fn(spark, sf))
      if (got == goldens(name)) None else Some(s"$name: $got != ${goldens(name)}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("the 17-stage curate pipeline's packed output matches its end-to-end golden") {
    // per-stage oracles can't catch a stage-ORDERING or seed
    // regression in the composition; this one digest can
    val src = Source.fromResource("golden-curate-sf0.001.txt")
    val want = try src.getLines().next().trim finally src.close()
    val got = Golden.curateDigest(spark, sf)
    assert(got == want,
      s"curate packed digest $got != $want — if the change is " +
        "intentional, regenerate with `runMain graft.tools.Golden`")
  }

  test("the media curation pipeline's survivors match their end-to-end golden") {
    val src = Source.fromResource("golden-curate-media-sf0.001.txt")
    val want = try src.getLines().next().trim finally src.close()
    val got = Golden.curateMediaDigest(spark, sf)
    assert(got == want,
      s"curate-media digest $got != $want — if the change is " +
        "intentional, regenerate with `runMain graft.tools.Golden`")
  }
}
