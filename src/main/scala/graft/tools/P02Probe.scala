package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch profiling harness for the p02 pipeline (stage timings +
  * band-key-representation variants). Not part of the library surface;
  * results recorded in SCALE.md. Usage: `P02Probe <sfDir> [reps]`. */
object P02Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = graft.Sessions.local(cpus, appName = "p02probe")
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

    // full current p02
    timed("p02_current") {
      val byDoc = Dedup.docSignatures(Dedup.shingleHashes(docs)).persist()
      val bands = Dedup.lshBands(byDoc).persist()
      byDoc.count(); bands.count()
      val n = Dedup.jaccardVerify(byDoc, Dedup.lshCandidates(bands))
        .select(col("d1"), col("d2"), round(col("jaccard"), 3).as("jaccard"))
        .orderBy(col("jaccard").desc, col("d1"), col("d2"))
        .limit(100).count()
      byDoc.unpersist(); bands.unpersist()
      n
    }
    // the NEW p02 shape end-to-end: byDoc cached alone, bands recompute
    // from the cache as a narrow map
    timed("p02_byDocOnlyCache") {
      val byDoc = Dedup.docSignatures(Dedup.shingleHashes(docs)).persist()
      byDoc.count()
      val n = Dedup.jaccardVerify(byDoc, Dedup.lshCandidates(Dedup.lshBands(byDoc)))
        .select(col("d1"), col("d2"), round(col("jaccard"), 3).as("jaccard"))
        .orderBy(col("jaccard").desc, col("d1"), col("d2"))
        .limit(100).count()
      byDoc.unpersist()
      n
    }
    // fully lazy: no persist anywhere — does ReusedExchange serve the
    // three byDoc consumers inside the single action?
    timed("p02_lazy") {
      val byDoc = Dedup.docSignatures(Dedup.shingleHashes(docs))
      Dedup.jaccardVerify(byDoc, Dedup.lshCandidates(Dedup.lshBands(byDoc)))
        .select(col("d1"), col("d2"), round(col("jaccard"), 3).as("jaccard"))
        .orderBy(col("jaccard").desc, col("d1"), col("d2"))
        .limit(100).count()
    }
    // stage: fused aggregation alone
    timed("byDoc_agg") {
      Dedup.docSignatures(Dedup.shingleHashes(docs)).count()
    }
    // stage: bands + cap + self-join candidates (from cached byDoc)
    val byDocC = Dedup.docSignatures(Dedup.shingleHashes(docs)).cache()
    byDocC.count()
    timed("cand_from_cached_byDoc") {
      Dedup.lshCandidates(Dedup.lshBands(byDocC)).count()
    }
    timed("verify_from_cached") {
      val bands = Dedup.lshBands(byDocC)
      Dedup.jaccardVerify(byDocC, Dedup.lshCandidates(bands))
        .select(col("d1"), col("d2"), round(col("jaccard"), 3).as("jaccard"))
        .orderBy(col("jaccard").desc, col("d1"), col("d2"))
        .limit(100).count()
    }
    // variant: band key as one packed LONG (band in high bits, 60-bit
    // md5 prefix low) — joins/caps on a single 8-byte column instead of
    // (int, 32-char string)
    def lshBandsLong(sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val entries = (0 until 4).map { b =>
        val cols = (b * 4 until (b + 1) * 4).map(j => col(s"h$j"))
        (conv(substring(md5(concat_ws(",", cols: _*)), 1, 15), 16, 10).cast("long")
          + lit(b.toLong << 60)).as(s"bk$b")
      }
      sig.select(col("doc_id"), explode(array(entries: _*)).as("bk"))
    }
    timed("cand_longkey") {
      val bands = lshBandsLong(byDocC)
      val capped = {
        val dfR = bands.repartition(col("bk"))
        val small = dfR.groupBy(col("bk")).agg(count(lit(1)).as("bc"))
          .filter(col("bc") <= 100).select("bk")
        dfR.join(small.hint("shuffle_hash"), Seq("bk"))
      }
      capped.as("x").join(capped.as("y"),
          col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct().count()
    }
    timed("verify_longkey") {
      val bands = lshBandsLong(byDocC)
      val capped = {
        val dfR = bands.repartition(col("bk"))
        val small = dfR.groupBy(col("bk")).agg(count(lit(1)).as("bc"))
          .filter(col("bc") <= 100).select("bk")
        dfR.join(small.hint("shuffle_hash"), Seq("bk"))
      }
      val cand = capped.as("x").join(capped.as("y"),
          col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
      Dedup.jaccardVerify(byDocC, cand)
        .select(col("d1"), col("d2"), round(col("jaccard"), 3).as("jaccard"))
        .orderBy(col("jaccard").desc, col("d1"), col("d2"))
        .limit(100).count()
    }
    spark.stop()
  }
}
