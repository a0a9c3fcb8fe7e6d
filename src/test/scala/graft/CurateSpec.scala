package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Curate
import graft.sources.Tables

/** End-to-end curation composition: the full gate → dedup → prune →
  * resample → pack flow over the fixture corpus, with per-stage row
  * accounting. */
class CurateSpec extends SparkSpec {

  test("curate runs end-to-end with consistent stage accounting") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source")
    val (packed, stats) = Curate.run(docs)
    // filtering stages only ever shrink the corpus
    assert(stats.input >= stats.afterGate)
    assert(stats.afterGate >= stats.afterDedup)
    assert(stats.afterDedup >= stats.afterPrune)
    assert(stats.afterPrune > 0, stats.toString)
    // resampling can grow or shrink but never beyond maxCopies x
    assert(stats.resampledCopies <= stats.afterPrune * 8)
    assert(stats.chunks >= stats.resampledCopies) // >= 1 chunk per doc
    assert(stats.shards >= 4)
    // the packed stream is dense: within every shard, tok_start values
    // are contiguous (no gaps — each chunk starts where the last ended)
    val rows = packed.groupBy("shard")
      .agg(min("tok_start").as("mn"), count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("mn") == 0L))
    // deterministic end to end: same input, same packed output
    val (packed2, stats2) = Curate.run(docs)
    assert(stats2 == stats)
    assert(packed.exceptAll(packed2).isEmpty && packed2.exceptAll(packed).isEmpty)
  }
}
