package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch profiling harness for the p62 fingerprint-pairs pipeline
  * (stage timings). Not part of the library surface; results recorded
  * in SCALE.md. Usage: `P62Probe <sfDir> [reps]`. */
object P62Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = graft.Sessions.local(cpus, appName = "p62probe")
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

    timed("full_current") {
      Dedup.fingerprintPairs(docs).count()
    }
    timed("winnow_only") {
      Dedup.winnowedFingerprints(docs).count()
    }
    // floor: just the per-char md5 array, no winnow selection
    timed("md5_array_only") {
      docs.select(col("doc_id"), col("text").as("t"))
        .where(length(col("t")) >= 5)
        .select(col("doc_id"),
          expr("size(transform(sequence(1, length(t)-4), i -> md5(substring(t, i, 5))))").as("n"))
        .agg(sum("n")).collect().head.getLong(0)
    }
    // long-hash variant: md5 -> 60-bit long BEFORE the window-min, so
    // the winnow compares/distincts longs instead of 32-char strings
    timed("winnow_long") {
      docs.select(col("doc_id"), col("text").as("t"))
        .where(length(col("t")) >= 5)
        .select(col("doc_id"),
          expr("transform(sequence(1, length(t)-4), i -> cast(conv(substring(md5(substring(t, i, 5)), 1, 15), 16, 10) as bigint))").as("hs"))
        .select(col("doc_id"),
          explode(expr(
            "array_distinct(transform(sequence(1, size(hs)), j -> array_min(slice(hs, j, 4))))"))
            .as("fp"))
        .count()
    }
    // allocation-free window-min: 4 clamped element_ats per position
    // (duplicated tail elements never change a min)
    timed("winnow_least4") {
      docs.select(col("doc_id"), col("text").as("t"))
        .where(length(col("t")) >= 5)
        .select(col("doc_id"),
          expr("transform(sequence(1, length(t)-4), i -> md5(substring(t, i, 5)))").as("hs"))
        .select(col("doc_id"),
          explode(expr(
            """array_distinct(transform(hs, (x, i) ->
              |  least(x, element_at(hs, least(i + 2, size(hs))),
              |           element_at(hs, least(i + 3, size(hs))),
              |           element_at(hs, least(i + 4, size(hs))))))""".stripMargin))
            .as("fp"))
        .count()
    }
    // sparse-table window-min: m2[i]=min(h[i],h[i+1]), m4[i]=min(m2[i],m2[i+2])
    timed("winnow_sparse") {
      docs.select(col("doc_id"), col("text").as("t"))
        .where(length(col("t")) >= 5)
        .select(col("doc_id"),
          expr("transform(sequence(1, length(t)-4), i -> md5(substring(t, i, 5)))").as("hs"))
        .select(col("doc_id"),
          expr("transform(hs, (x, i) -> least(x, element_at(hs, least(i + 2, size(hs)))))").as("m2"))
        .select(col("doc_id"),
          explode(expr(
            "array_distinct(transform(m2, (x, i) -> least(x, element_at(m2, least(i + 3, size(m2))))))"))
            .as("fp"))
        .count()
    }
    // fan-out: hash-repartition docs across all cores BEFORE the
    // heavy narrow map (the 594KB parquet is one split -> one task)
    timed("winnow_sparse_fanout") {
      val d32 = docs.repartition(32, col("doc_id"))
      d32.select(col("doc_id"), col("text").as("t"))
        .where(length(col("t")) >= 5)
        .select(col("doc_id"),
          expr("transform(sequence(1, length(t)-4), i -> md5(substring(t, i, 5)))").as("hs"))
        .select(col("doc_id"),
          expr("transform(hs, (x, i) -> least(x, element_at(hs, least(i + 2, size(hs)))))").as("m2"))
        .select(col("doc_id"),
          explode(expr(
            "array_distinct(transform(m2, (x, i) -> least(x, element_at(m2, least(i + 3, size(m2))))))"))
            .as("fp"))
        .count()
    }
    timed("full_sparse_fanout") {
      val d32 = docs.repartition(32, col("doc_id"))
      val fps = d32.select(col("doc_id"), col("text").as("t"))
        .where(length(col("t")) >= 5)
        .select(col("doc_id"),
          expr("transform(sequence(1, length(t)-4), i -> md5(substring(t, i, 5)))").as("hs"))
        .select(col("doc_id"),
          expr("transform(hs, (x, i) -> least(x, element_at(hs, least(i + 2, size(hs)))))").as("m2"))
        .select(col("doc_id"),
          explode(expr(
            "array_distinct(transform(m2, (x, i) -> least(x, element_at(m2, least(i + 3, size(m2))))))"))
            .as("fp"))
        .repartition(col("fp"))
      val f = fps
        .withColumn("df", count(lit(1)).over(Window.partitionBy("fp")))
        .filter(col("df") <= 20).drop("df")
      f.select(col("fp"), col("doc_id").as("d1"))
        .join(f.select(col("fp"), col("doc_id").as("d2")), "fp")
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2")
        .agg(count(lit(1)).cast("long").as("shared"))
        .filter(col("shared") >= 3).count()
    }
    // xxhash64 variant (engine-specific; for a measurement bound only)
    timed("winnow_xxh") {
      docs.select(col("doc_id"), col("text").as("t"))
        .where(length(col("t")) >= 5)
        .select(col("doc_id"),
          expr("transform(sequence(1, length(t)-4), i -> xxhash64(substring(t, i, 5)))").as("hs"))
        .select(col("doc_id"),
          explode(expr(
            "array_distinct(transform(sequence(1, size(hs)), j -> array_min(slice(hs, j, 4))))"))
            .as("fp"))
        .count()
    }
    timed("winnow_repart") {
      Dedup.winnowedFingerprints(docs).repartition(col("fp")).count()
    }
    timed("winnow_df_window") {
      val fps = Dedup.winnowedFingerprints(docs).repartition(col("fp"))
      fps.withColumn("df", count(lit(1)).over(Window.partitionBy("fp")))
        .filter(col("df") <= 20).count()
    }
    timed("join_from_cached") {
      val fps = Dedup.winnowedFingerprints(docs).repartition(col("fp"))
      val f = fps
        .withColumn("df", count(lit(1)).over(Window.partitionBy("fp")))
        .filter(col("df") <= 20).drop("df").persist()
      f.count()
      val n = f.select(col("fp"), col("doc_id").as("d1"))
        .join(f.select(col("fp"), col("doc_id").as("d2")), "fp")
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2")
        .agg(count(lit(1)).cast("long").as("shared"))
        .filter(col("shared") >= 3).count()
      f.unpersist()
      n
    }
    // groupBy(fp).collect_list alternative: one aggregation instead of
    // window + self-join; pairs generated from the per-fp doc array.
    timed("agg_pairs") {
      val fps = Dedup.winnowedFingerprints(docs)
      val grouped = fps.groupBy("fp")
        .agg(collect_list("doc_id").as("ds"))
        .filter(size(col("ds")) <= 20 && size(col("ds")) >= 2)
      val n = grouped
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(least(x, y) as d1, greatest(x, y) as d2))))"))
          .as("p"))
        .select(col("p.d1"), col("p.d2"))
        .filter(col("d1") =!= col("d2"))
        .groupBy("d1", "d2")
        .agg(count(lit(1)).cast("long").as("shared"))
        .filter(col("shared") >= 3).count()
      n
    }
    spark.stop()
  }
}
