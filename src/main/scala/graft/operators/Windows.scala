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

  /** Unkeyed point-in-interval join (`point BETWEEN lo AND hi`,
    * closed on both ends) via bin bucketing — the equi-join form of a
    * theta join Spark would otherwise plan as a broadcast-nested-loop
    * (O(points x intervals) compares, and an OOM broadcast once the
    * interval side outgrows the broadcast threshold). Each interval
    * explodes to the bins it covers, each point maps to exactly ONE
    * bin, and the join becomes a shuffled equi-join on the bin id with
    * a residual BETWEEN filter: compares drop from |P| x |I| to
    * sum over bins of |P_b| x |I_b|, and both sides partition on the
    * bin key — the IP-to-geo / price-band / time-overlap shape at
    * 100 TB. No dedup pass is needed: a point lives in one bin, so a
    * (point, interval) pair can only meet once.
    *
    * `binWidth` trades fan-out for selectivity: intervals replicate
    * ceil(width / binWidth) + 1 times, points never replicate. Size it
    * to the TYPICAL interval width; a mis-set width on a huge interval
    * would silently materialize millions of replicas per row, so any
    * interval spanning more than `maxFanout` bins fails the job with a
    * plan-side `raise_error` (the fail-loudly discipline of
    * [[graft.operators.Dedup.components]]) instead of quietly eating
    * the cluster. Empty (`lo > hi`) and null-bounded intervals match
    * nothing, exactly as SQL BETWEEN in an inner join; null points
    * likewise drop. Both input frames keep all their columns in the
    * output (the `_bin` key is internal).
    *
    * Industry analog (the reference's dimensional-model layer is a
    * roadmap item, README.md:24-28): warehouse marts model band
    * lookups as scalar CASE chains (amount-tier buckets over a
    * transactions fact); this is the same banding as DATA — an
    * interval TABLE — at join scale. */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, maxFanout: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxFanout >= 1, s"maxFanout must be >= 1, got $maxFanout")
    def bin(c: Column) = floor(c.cast("double") / binWidth).cast("long")
    val lob = bin(col(loCol))
    val hib = bin(col(hiCol))
    val msg = concat(lit("rangeJoinBinned: interval ["), col(loCol),
      lit(", "), col(hiCol),
      lit(s"] spans more than maxFanout=$maxFanout bins at " +
        s"binWidth=$binWidth; raise binWidth or maxFanout"))
    val hiGuard = when(hib - lob >= maxFanout,
      raise_error(msg).cast("long")).otherwise(hib)
    val bi = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_bin", explode(sequence(lob, hiGuard)))
    val bp = points.withColumn("_bin", bin(col(pointCol)))
    bp.join(bi, Seq("_bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Unkeyed interval-OVERLAP join (`a.lo <= b.hi AND b.lo <= a.hi`,
    * closed bounds) via the same bin bucketing as [[rangeJoinBinned]].
    * Both sides explode to the bins they cover, meet on the bin id,
    * and keep the residual overlap predicate — but an overlapping pair
    * shares EVERY bin its intersection covers, so each pair is KEPT
    * only in the intersection's FIRST bin (`bin == floor(max(lo_a,
    * lo_b) / binWidth)`): a pure per-row predicate that replaces the
    * quadratic-sized `distinct` a naive binned overlap join needs.
    * Same fan-out economics and `maxFanout` fail-loudly guard as
    * [[rangeJoinBinned]]; empty and null intervals match nothing. The
    * left frame's columns keep their names; both frames must not share
    * column names (alias before calling, as with any self-join). */
  def overlapJoinBinned(left: DataFrame, lloCol: String, lhiCol: String,
      right: DataFrame, rloCol: String, rhiCol: String,
      binWidth: Double, maxFanout: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxFanout >= 1, s"maxFanout must be >= 1, got $maxFanout")
    def bin(c: Column) = floor(c.cast("double") / binWidth).cast("long")
    def binned(df: DataFrame, loCol: String, hiCol: String): DataFrame = {
      val lob = bin(col(loCol))
      val hib = bin(col(hiCol))
      val msg = concat(lit("overlapJoinBinned: interval ["), col(loCol),
        lit(", "), col(hiCol),
        lit(s"] spans more than maxFanout=$maxFanout bins at " +
          s"binWidth=$binWidth; raise binWidth or maxFanout"))
      val hiGuard = when(hib - lob >= maxFanout,
        raise_error(msg).cast("long")).otherwise(hib)
      df.filter(col(loCol) <= col(hiCol))
        .withColumn("_bin", explode(sequence(lob, hiGuard)))
    }
    binned(left, lloCol, lhiCol)
      .join(binned(right, rloCol, rhiCol), Seq("_bin"))
      .where(col(lloCol) <= col(rhiCol) && col(rloCol) <= col(lhiCol) &&
        col("_bin") === bin(greatest(col(lloCol), col(rloCol))))
      .drop("_bin")
  }

  /** W3 at scale: top-k rows per group via the bounded
    * [[graft.functions.TopKAggregator]] instead of a window —
    * row-identical to [[topNPerGroup]] ordered by `ord` DESC with `id`
    * as tie-break, but partial-aggregable: map-side combine caps every
    * group's shuffle contribution at k pairs PER PARTITION, where the
    * window form moves and sorts every row of every group (a hot key
    * with 10^6 rows costs the window a 10^6-row sort on one task; it
    * costs this plan k rows per upstream partition). Null `ord` rows
    * are excluded (the window form ranks them last — past k they never
    * surface anyway; a group that is ALL nulls disappears here).
    * Output: key, id, ord (double), rn (1-based, 1 = largest). */
  def topKPerGroupAgg(df: DataFrame, k: Int, key: String, ord: String,
      id: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(k))
    df.filter(col(ord).isNotNull)
      .groupBy(col(key))
      .agg(topk(col(ord).cast("double"), col(id).cast("long")).as("_top"))
      .select(col(key), posexplode(col("_top")).as(Seq("_i", "_t")))
      .select(col(key), col("_t._2").as(id), col("_t._1").as(ord),
        (col("_i") + 1).cast("int").as("rn"))
  }

  /** W5: previous value per key (circular-transfer lookback). */
  def lagPerKey(df: DataFrame, value: Column, out: String,
      key: Column, order: Column*): DataFrame =
    df.withColumn(out, lag(value, 1).over(
      Window.partitionBy(key).orderBy(order: _*)))
}
