package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Joins}

/** Same-JVM interleaved A/B for the contaminationBloom membership
  * probe: the codegen'd `BloomFilterMightContain` expression vs the
  * broadcast-closure UDF it replaced. Cross-JVM stress runs on this
  * host are poisoned by neighbor-load episodes (see SCALE.md
  * "Host-level bench noise"); alternating the two variants inside one
  * session, same corpus, same sketch, min-of-reps, is the only
  * protocol that isolates the probe cost.
  *
  * Usage: `runMain graft.tools.BdeconProbe <nDocs> [reps]` over the
  * cached Stress corpus at /tmp/graft-stress/n<N>.
  */
object BdeconProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.Sessions.local(cpus, "bdecon-probe")
    val docs = spark.read.parquet(s"/tmp/graft-stress/n$n/documents.parquet")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val eval = docs.filter(col("doc_id") % 10 === 0)

    val evalSh = Dedup.shingleHashes(eval).select(col("shingle")).distinct()
    val nEval = math.max(1L, evalSh.count())
    val bytes = Joins.bloomBytes(evalSh, "shingle", nEval, 0.01)
    val bf = evalSh.stat.bloomFilter("shingle", nEval, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val udfProbe = udf((s: Long) => bfB.value.mightContainLong(s))

    def run(probe: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      Dedup.shingleHashes(train)
        .groupBy("doc_id")
        .agg(sum(when(probe, 1L).otherwise(0L)).as("n_flagged"))
        .write.mode("overwrite").parquet(s"/tmp/graft-stress/n$n/out_bprobe.parquet")
      (System.nanoTime() - t0) / 1e9
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // warm both once, then alternate
    run(Joins.mightContainHash(spark, bytes, col("shingle")))
    run(udfProbe(col("shingle")))
    val pairs = (1 to reps).map { i =>
      val load = osBean.getSystemLoadAverage
      val e = run(Joins.mightContainHash(spark, bytes, col("shingle")))
      val u = run(udfProbe(col("shingle")))
      System.err.println(f"[bprobe] rep $i expr $e%.2f udf $u%.2f load $load%.2f")
      (e, u)
    }
    println(f"""{"metric":"bdecon_probe","n":$n,"expr_min":${pairs.map(_._1).min}%.2f,"udf_min":${pairs.map(_._2).min}%.2f}""")
    spark.stop()
  }
}
