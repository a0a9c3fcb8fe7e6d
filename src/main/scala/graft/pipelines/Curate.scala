package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.{Dedup, Mix}

/** The whole training-data curation pipeline as ONE call — the
  * composition a user of the reference's medallion flow would run to
  * turn a raw document corpus into packed training sequences:
  *
  *   quality gate → near-dup dedup (LSH + components survivors) →
  *   per-domain score pruning → temperature-mixture resampling →
  *   chunk → pack.
  *
  * Every stage is one of the library's oracle-checked/spec-proven
  * operators with its own scale design (see SCALE.md); this object
  * adds only composition and per-stage row accounting — no new
  * distributed logic, so the 100 TB story is exactly the sum of its
  * stages. The per-stage counts exist because a curation run that
  * cannot say "gate dropped 12%, dedup 7%, prune 25%" is not
  * auditable; each count is one cheap job over an already-needed
  * frame. */
object Curate {

  final case class Stats(input: Long, afterGate: Long, afterDedup: Long,
      afterPrune: Long, resampledCopies: Long, chunks: Long, shards: Int)

  /** Returns (packed sequences, per-stage stats). `docs` must carry
    * doc_id, text, lang, source. Copies from resampling get a
    * synthetic unique stream id (doc_id * maxCopies + copy - 1) so
    * packing sees distinct documents. */
  def run(docs: DataFrame, jaccardThreshold: Double = 0.5,
      pruneP: Double = 0.25, tau: Double = 0.7, maxCopies: Int = 8,
      chunkTokens: Int = 32, overlap: Int = 8, ctxTokens: Int = 64,
      rowsPerShard: Long = 4000000L, minShards: Int = 4): (DataFrame, Stats) = {
    val input = docs.count()
    val gated = docs.join(
      TextAnalysis.qualityGate(docs).filter(col("kept")).select("doc_id"), "doc_id")
    val afterGate = gated.count()
    val deduped = Dedup.dedupCorpus(gated, jaccardThreshold)
    val afterDedup = deduped.count()
    // The multi-consumer frames are CHECKPOINTED (dedupCorpus's
    // components() has already set the checkpoint dir): pruned feeds
    // four consumers and chunks two, and without truncation every
    // stage count would re-run the whole upstream pipeline; a durable
    // checkpoint (unlike persist) pins no executor memory and leaves
    // nothing for the caller to unpersist — at 100 TB these are the
    // natural between-stage tables anyway.
    val pruned = deduped.join(
      TextAnalysis.qualityPrune(deduped, pruneP).select("doc_id"), "doc_id")
      .checkpoint()
    val afterPrune = pruned.count()
    val weights = Mix.temperatureWeights(pruned, Seq("lang", "source"), tau)
      .select(col("lang"), col("source"), col("weight"))
    val resampled = Mix.resampleByWeight(pruned.select("lang", "source", "doc_id"),
        weights, Seq("lang", "source"), maxCopies = maxCopies)
      .join(pruned.select("doc_id", "text"), "doc_id")
      .select((col("doc_id") * maxCopies + col("copy") - 1).as("doc_id"),
        col("text"))
    val resampledCopies = resampled.count()
    val chunks = TextAnalysis.chunk(resampled, chunkTokens, overlap).checkpoint()
    val nChunks = chunks.count()
    val shards = Mix.deriveShards(nChunks, rowsPerShard, minShards)
    val packed = TextAnalysis.packSequences(chunks, ctxTokens, shards)
    (packed, Stats(input, afterGate, afterDedup, afterPrune,
      resampledCopies, nChunks, shards))
  }
}
