package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Adaptive fan-out for CPU-heavy narrow maps.
  *
  * A narrow transform runs at the parallelism of its INPUT stage, and
  * Spark never re-splits a narrow stage: a compressed scan that plans
  * to fewer splits than the cluster has cores serializes every
  * downstream per-row computation until the first exchange. That is
  * exactly the shape of this engine's hashing/tokenizing primitives —
  * per-character md5 chains cost ~1000x the scan that feeds them, and
  * text compresses well, so "small scan, huge map" is common at every
  * scale (locally: one 594 KB parquet split ran the p62 winnowing
  * chain on 1 of 32 cores — 2.9 s of a 4.2 s query; with fan-out the
  * same chain is 0.4 s).
  *
  * `Fanout(df, key)` hash-repartitions to the session default
  * parallelism ONLY when the incoming plan has fewer partitions —
  * checking first keeps the operator honest at scale: a 100 TB scan
  * already carries thousands of splits, so the fan-out is a no-op and
  * the corpus text is never shuffled. When it does fire, the shuffle
  * moves only the pre-explode doc rows (the cheapest point in the
  * pipeline to move them), keyed by the id column so the exchange is
  * deterministic (round-robin repartition sorts rows to stay
  * deterministic — a pure waste here). The explicit partition count
  * makes the exchange REPARTITION_BY_NUM, which AQE must not coalesce
  * — without it AQE would see 594 KB and fold the exchange back to
  * one partition, silently undoing the fan-out.
  *
  * Only SHUFFLE-FREE plans are candidates: a frame downstream of any
  * Exchange already runs at shuffle/broadcast-stage parallelism, and —
  * the sharper reason — probing `.rdd` on an exchange-bearing plan
  * under AQE MATERIALIZES the exchange's query stages (adaptive
  * execution runs shuffle jobs eagerly to re-plan), so the "check"
  * would silently execute half the query at operator-construction
  * time. On an exchange-free narrow plan `.rdd` is pure planning.
  *
  * Streaming frames pass through untouched (their parallelism is the
  * source's; `.rdd` is undefined on them), as do frames already wide
  * enough. */
object Fanout {

  /** Whether `df`'s (pre-adaptive) physical plan carries an Exchange —
    * i.e. whether multiple consumers of `df` inside ONE action can be
    * served from a single execution via ReuseExchange. Callers use
    * this to pick between a lazy multi-reference plan (sharing point
    * exists — e.g. this object's own repartition fired) and an
    * explicit persist (wide narrow-from-scan plan: each reference
    * would re-run the whole subtree). Pure planning — never executes. */
  def hasExchange(df: DataFrame): Boolean =
    !df.isStreaming && df.queryExecution.sparkPlan.find(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]).isDefined

  def apply(df: DataFrame, key: String): DataFrame = {
    if (df.isStreaming) return df
    val shuffled = df.queryExecution.sparkPlan.find(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]).isDefined
    if (shuffled) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(key))
    else df
  }
}
