package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable window operators W1-W5 (SURVEY §2.5) — the library surface
  * behind queries q19/q20/q21/q27/r36/r37. All are single-shuffle
  * key-partitioned windows; the partition key is the scale unit.
  */
object Windows {

  /** W1: keep the first row per key (dedup survivor). */
  def keepFirst(df: DataFrame, key: Column, order: Column*): DataFrame =
    df.withColumn("_rn", row_number().over(Window.partitionBy(key).orderBy(order: _*)))
      .filter(col("_rn") === 1)
      .drop("_rn")

  /** W2: SCD Type 2 validity intervals from a change history — each
    * row becomes a version with [valid_from, valid_to) and an
    * is_current flag (README.md:27 "Implement SCD Type 2"). */
  def scd2(history: DataFrame, key: String, ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
    history
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** W2 lookup: join facts to the dimension version valid at fact time
    * (the as-of join of r37). */
  def asOf(facts: DataFrame, dim: DataFrame, key: String, factTs: String): DataFrame =
    facts.join(dim,
      facts(key) === dim(key) &&
        facts(factTs) >= dim("valid_from") &&
        (dim("valid_to").isNull || facts(factTs) < dim("valid_to")))

  /** W3: top-n rows per group. */
  def topNPerGroup(df: DataFrame, n: Int, key: Column, order: Column*): DataFrame =
    df.withColumn("_rn", row_number().over(Window.partitionBy(key).orderBy(order: _*)))
      .filter(col("_rn") <= n)
      .drop("_rn")

  /** W4: running sum over an explicit row frame per key. */
  def runningSum(df: DataFrame, value: Column, out: String,
      key: Column, order: Column*): DataFrame =
    df.withColumn(out, sum(value).over(
      Window.partitionBy(key).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** T7 batch form: sessionize by inactivity gap (gaps-and-islands).
    * A row starts a new session when it is the key's first event or
    * arrives >= `gap` after the previous one — the same boundary rule
    * as Structured Streaming's `session_window` (window end = last
    * event + gap), so the streaming form merges identically
    * (StreamingSpec T7s). One key-partitioned window, one shuffle;
    * the session id is a running sum of boundary flags. */
  def sessionize(df: DataFrame, key: Column, ts: Column, gap: String,
      order: Column*): DataFrame = {
    val w = Window.partitionBy(key).orderBy((ts +: order): _*)
    df.withColumn("_prev", lag(ts, 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || ts >= col("_prev") + expr(s"INTERVAL $gap"), 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev", "_new")
  }

  /** W5: previous value per key (circular-transfer lookback). */
  def lagPerKey(df: DataFrame, value: Column, out: String,
      key: Column, order: Column*): DataFrame =
    df.withColumn(out, lag(value, 1).over(
      Window.partitionBy(key).orderBy(order: _*)))
}
