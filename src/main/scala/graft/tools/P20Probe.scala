package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch profiling harness for the p20/p48 dedup-corpus pipeline
  * (stage timings). Not part of the library surface; results recorded
  * in SCALE.md. Usage: `P20Probe <sfDir> [reps]`. */
object P20Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = graft.Sessions.local(cpus, appName = "p20probe")
    def timed(label: String)(f: => Long): Unit = {
      val ds = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        val d = (System.nanoTime() - t0) / 1e9
        (d, n)
      }
      println(f"$label%-28s min=${ds.map(_._1).min}%.3f s  rows=${ds.head._2}")
    }
    val docs = Tables.load(spark, sfDir, "documents")

    timed("lazy_dedupCorpus") {
      val sh = Dedup.shingleHashes(docs)
      val bands = Dedup.lshBands(Dedup.minhashSignatures(sh, hashed = true))
      Dedup.ensureCheckpointDir(spark)
      val verified = Dedup.jaccardPairs(sh, Some(Dedup.lshCandidates(bands, 100)))
        .filter(col("jaccard") >= 0.5)
        .select(col("d1"), col("d2")).checkpoint()
      val comp = Dedup.components(verified, 20)
      docs.join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .filter(col("comp").isNull || col("comp") === col("doc_id"))
        .drop("comp").count()
    }
    timed("full_dedupCorpus") { Dedup.dedupCorpus(docs).count() }
    // lazy variant: no shingle persist — the Fanout exchange at the
    // shingle base is a ReuseExchange sharing point for all consumers
    timed("full_again") { Dedup.dedupCorpus(docs).count() }
    timed("lazy_again") {
      val sh = Dedup.shingleHashes(docs)
      val bands = Dedup.lshBands(Dedup.minhashSignatures(sh, hashed = true))
      Dedup.ensureCheckpointDir(spark)
      val verified = Dedup.jaccardPairs(sh, Some(Dedup.lshCandidates(bands, 100)))
        .filter(col("jaccard") >= 0.5)
        .select(col("d1"), col("d2")).checkpoint()
      val comp = Dedup.components(verified, 20)
      docs.join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .filter(col("comp").isNull || col("comp") === col("doc_id"))
        .drop("comp").count()
    }
    timed("shingles_persist") {
      val sh = Dedup.shingleHashes(docs).persist()
      val n = sh.count(); sh.unpersist(); n
    }
    // inline no-Fanout shingle chain (A/B: is the fan-out exchange a
    // cost or a win for the cache build at this input size?)
    timed("shingles_persist_nofan") {
      val sh = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
        .where(size(col("t")) >= 3)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2])))")).as("shingle"))
        .select(col("doc_id"),
          conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("shingle"))
        .persist()
      val n = sh.count(); sh.unpersist(); n
    }
    timed("sig_bands") {
      val sh = Dedup.shingleHashes(docs).persist()
      sh.count()
      val n = Dedup.lshBands(Dedup.minhashSignatures(sh, hashed = true)).count()
      sh.unpersist(); n
    }
    timed("verified_pairs") {
      val sh = Dedup.shingleHashes(docs).persist()
      sh.count()
      val bands = Dedup.lshBands(Dedup.minhashSignatures(sh, hashed = true))
      val n = Dedup.jaccardPairs(sh, Some(Dedup.lshCandidates(bands, 100)))
        .filter(col("jaccard") >= 0.5).count()
      sh.unpersist(); n
    }
    timed("verified_checkpoint") {
      val sh = Dedup.shingleHashes(docs).persist()
      sh.count()
      val bands = Dedup.lshBands(Dedup.minhashSignatures(sh, hashed = true))
      Dedup.ensureCheckpointDir(spark)
      val v = Dedup.jaccardPairs(sh, Some(Dedup.lshCandidates(bands, 100)))
        .filter(col("jaccard") >= 0.5)
        .select(col("d1"), col("d2")).checkpoint()
      val n = v.count(); sh.unpersist(); n
    }
    timed("components_only") {
      val sh = Dedup.shingleHashes(docs).persist()
      sh.count()
      val bands = Dedup.lshBands(Dedup.minhashSignatures(sh, hashed = true))
      Dedup.ensureCheckpointDir(spark)
      val v = Dedup.jaccardPairs(sh, Some(Dedup.lshCandidates(bands, 100)))
        .filter(col("jaccard") >= 0.5)
        .select(col("d1"), col("d2")).checkpoint()
      v.count()
      val t0 = System.nanoTime()
      val n = Dedup.components(v, 20).count()
      println(f"  (components alone: ${(System.nanoTime() - t0) / 1e9}%.3f s)")
      sh.unpersist(); n
    }
    spark.stop()
  }
}
