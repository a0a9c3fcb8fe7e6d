package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics over an event stream — the funnel and
  * cohort-retention primitives every product/finance warehouse runs on
  * its events table. Reference analog: the reference declares its
  * analytics layer as dashboards over the landed event/transaction
  * feeds ("Customer acquisition trends", "Daily transaction volumes" —
  * README.md:34-40); funnels and cohort retention are the standard BI
  * queries behind exactly those panels.
  * Both are pure declarative plans over (user, type, ts) triples: no
  * sessionization state, no window over the raw corpus.
  */
object Behavior {

  /** Ordered funnel: per user the FIRST time of each step, where step
    * k counts only when it happens strictly AFTER the user's step-k−1
    * time (the classic strict-ordering product funnel — a purchase
    * before the first view does not convert a view→purchase funnel),
    * optionally within an interval of the user's step-1 time.
    *
    * Mechanics: step 1 is one user-keyed min; each later step is one
    * join of the USERS-SIZED state frame onto that step's events plus
    * another user-keyed min — k−1 joins total, all on the user key,
    * every frame ≤ users rows after the first aggregation. No window
    * over raw events, so a million-event user costs map-side combine.
    * Ties (step k exactly at step k−1's timestamp) do NOT advance —
    * strict `>` — and a user missing step j has null from j on (the
    * join is left).
    * Output: userCol, t1..tk (timestamps, nullable from the first
    * missed step). */
  def funnelUsers(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", within: Option[String] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("t"))
    var state = e.filter(col("et") === steps.head)
      .groupBy("u").agg(min(col("t")).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val k = i + 1
      val cap = within.map(w => col("t") <= col("t1") + expr(s"INTERVAL $w"))
        .getOrElse(lit(true))
      val carry = if (i == 1) state.select(col("u"), col("t1"))
        else state.select(col("u"), col("t1"), col(s"t$i"))
      val nxt = carry
        .join(e.filter(col("et") === s), Seq("u"))
        .filter(col("t") > col(s"t$i") && cap)
        .groupBy("u").agg(min(col("t")).as(s"t$k"))
      state = state.join(nxt.select(col("u"), col(s"t$k")), Seq("u"), "left")
    }
    state.withColumnRenamed("u", userCol)
  }

  /** The zero-user funnel state frame (userCol, t1..tk) — seed a
    * [[funnelUsersStep]] chain from nothing (the first step then
    * equals [[funnelUsers]] of its batch). Column types DERIVE from
    * the events frame (a hardcoded bigint/timestamp seed would make
    * the first batch's full-outer join insert a failing ANSI cast for
    * string user ids or epoch-long timestamps — the r10 review
    * finding). */
  def emptyFunnelState(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    val cols = col(userCol) +:
      steps.indices.map(i => col(tsCol).as(s"t${i + 1}"))
    events.select(cols: _*).limit(0)
  }

  /** The zero-user last-event state frame (u, t, f) — the
    * [[lastEvents]] layout, types derived from the events frame (the
    * [[emptyFunnelState]] argument). Seeds a [[lastEventsStep]] /
    * [[transitionBridgePairs]] chain. */
  def emptyLastEvents(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame =
    events.select(col(userCol).as("u"), col(typeCol).as("f"),
      col(tsCol).as("t")).limit(0)

  /** Fold a NEW batch of events into a prior funnel state — the
    * incremental form of [[funnelUsers]], whose state is one
    * USERS-SIZED row (u, t1..tk) per user ever seen (the sufficient
    * statistic, because step times only ever DECREASE via min and new
    * events can only fill later steps). Requires batches in event-time
    * order per user — each user's events in a later batch at-or-after
    * all their events in earlier batches, the natural shape of
    * time-ordered ingest. (Out-of-order delivery could lower a step-k
    * time retroactively, re-qualifying step-k+1 events that earlier
    * batches already discarded — state alone cannot recover those;
    * replay from the raw events instead.) Under that contract,
    * chaining steps over any batch split equals [[funnelUsers]] of
    * the union, bit for bit (BehaviorSpec law; StreamingSpec SCFN
    * across restarts).
    *
    * Mechanics per step: the same users-keyed joins as
    * [[funnelUsers]], against the UPDATED previous-step time, with
    * each new candidate min-folded into the carried time (`least`
    * skips nulls, so an unset state time just adopts the batch's
    * min). Nothing event-sized survives the first aggregation. */
  def funnelUsersStep(state: DataFrame, events: DataFrame,
      steps: Seq[String], userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      within: Option[String] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).as("t"))
    val b1 = e.filter(col("et") === steps.head)
      .groupBy("u").agg(min(col("t")).as("bt1"))
    val st = state.select(col(userCol).as("u") +:
      steps.indices.map(i => col(s"t${i + 1}")): _*)
    var cur = st.join(b1, Seq("u"), "full_outer")
      .withColumn("t1", least(col("t1"), col("bt1")))
      .drop("bt1")
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val k = i + 1
      val cap = within.map(w => col("t") <= col("t1") + expr(s"INTERVAL $w"))
        .getOrElse(lit(true))
      val carry = if (i == 1) cur.select(col("u"), col("t1"))
        else cur.select(col("u"), col("t1"), col(s"t$i"))
      val nxt = carry
        .join(e.filter(col("et") === s), Seq("u"))
        .filter(col("t") > col(s"t$i") && cap)
        .groupBy("u").agg(min(col("t")).as(s"bt$k"))
      cur = cur.join(nxt, Seq("u"), "left")
        .withColumn(s"t$k", least(col(s"t$k"), col(s"bt$k")))
        .drop(s"bt$k")
    }
    cur.withColumnRenamed("u", userCol)
  }

  /** Funnel summary: per step the user count still converting and the
    * 6dp fraction of step-1 users (the number a dashboard shows).
    * Output: step (1-based), name, n_users, frac (ordered by step). */
  def funnelCounts(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", within: Option[String] = None): DataFrame =
    funnelCountsFromUsers(
      funnelUsers(events, steps, userCol, typeCol, tsCol, within), steps)

  /** [[funnelCounts]] from an already-computed [[funnelUsers]] /
    * [[funnelUsersStep]] state frame — the read side of the streamed
    * ingest ([[graft.streaming.Ingest.funnelIngestStream]]). */
  def funnelCountsFromUsers(fu: DataFrame, steps: Seq[String]): DataFrame = {
    val aggs = steps.indices.map(i =>
      sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
        .cast("long").as(s"n${i + 1}"))
    val one = fu.agg(aggs.head, aggs.tail: _*)
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("name"),
        col(s"n${i + 1}").as("n_users"),
        when(col("n1") > 0,
          round(col(s"n${i + 1}").cast("double") / col("n1"), 6)).as("frac"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy("step")
  }

  /** First-order event-transition matrix: adjacent (from, to) pairs of
    * each user's time-ordered event stream, counted globally, with
    * 6dp row-normalized probabilities — the Markov summary behind
    * next-action analyses and anomalous-flow screens (a transition
    * that never happens organically lighting up is a bot signature).
    *
    * Ordering is (ts, type) within user — a DETERMINISTIC total order
    * for the pair multiset: same-ts ties break by type, and exact
    * (ts, type) duplicates are interchangeable (adjacent equal
    * elements produce the same pairs in any order), so both engines
    * count identical transitions. The window is USER-partitioned
    * (never global): a power user costs one sorted partition, the
    * corpus never single-reducers — but a BOT user (≥100× median) is
    * still one task-sized sort; use [[transitionMatrixBucketed]] for
    * that shape.
    * Output: from_type, to_type, n, p (ordered). */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame =
    transitionsFromPairs(transitionPairs(events, userCol, typeCol, tsCol))

  /** The raw (from_type, to_type, n) transition counts of
    * [[transitionMatrix]] — ADDITIVE over batches that partition each
    * user's (ts, type)-ordered stream into contiguous runs, PROVIDED
    * the boundary pair between consecutive batches is counted
    * separately ([[transitionBridgePairs]]); the streamed ingest
    * ([[graft.streaming.Ingest.transitionIngestStream]]) lands both
    * and sums at read. Output: from_type, to_type, n. */
  def transitionPairs(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("t"), col("f"))
    events.select(col(userCol).as("u"), col(typeCol).as("f"),
        col(tsCol).as("t"))
      .withColumn("to_type", lead(col("f"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("f").as("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** Row-normalize summed pair counts into the [[transitionMatrix]]
    * output — the read side of the streamed ingest. Input rows with
    * the same (from_type, to_type) are summed first, so landed
    * per-batch counts feed in directly. */
  def transitionsFromPairs(pairs: DataFrame): DataFrame = {
    val p = pairs.groupBy("from_type", "to_type")
      .agg(sum("n").cast("long").as("n"))
    val tot = p.groupBy("from_type").agg(sum("n").as("tn"))
    p.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("tn"), 6).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** [[transitionMatrix]] with the hot-user-safe bucketed pair count —
    * same output, same oracle. */
  def transitionMatrixBucketed(events: DataFrame, bucket: Column,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame =
    transitionsFromPairs(
      transitionPairsBucketed(events, bucket, userCol, typeCol, tsCol))

  /** [[transitionPairs]] with the per-user window SALTED by a time
    * grid — the hot-user shape at 100 TB: the plain form sorts each
    * user's whole stream in ONE task, so a bot with 10⁸ events lands a
    * task-sized sort (SCALE.md transhot row). `bucket` must be a
    * MONOTONE NON-DECREASING function of the timestamp column alone
    * (`date_trunc("hour", ts)`, `floor(unix_micros(ts) / 3600e6)`, …),
    * so each user's stream splits into contiguous runs of the
    * (ts, type) total order — equal-ts ties share a bucket by
    * construction and can never straddle a boundary. Within-run pairs
    * come from a (user, bucket)-partitioned window whose partitions
    * are bounded by the grid cell's event count (pick the grid so
    * peak-rate × cell-width fits a task); run-boundary pairs come from
    * per-(user, bucket) first/last summaries — plain partial-
    * aggregable min_by/max_by, no window over raw events — chained per
    * user across consecutive non-empty buckets (the
    * [[transitionBridgePairs]] boundary machinery, batch-side; that
    * per-user window runs over grid-cells-per-user rows, not events).
    * Bucketed == plain, bit for bit (BehaviorSpec law, hot user
    * planted). Output: from_type, to_type, n. */
  def transitionPairsBucketed(events: DataFrame, bucket: Column,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val e = events.select(col(userCol).as("u"), col(typeCol).as("f"),
      col(tsCol).as("t"), bucket.as("bk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u", "bk").orderBy(col("t"), col("f"))
    val inner = e.withColumn("to_type", lead(col("f"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("f").as("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
    // (t, f)-first and -last per (user, bucket): ties are exact
    // duplicates under the pair order, so min_by/max_by on the struct
    // are deterministic
    val ends = e.groupBy("u", "bk").agg(
      min_by(col("f"), struct(col("t"), col("f"))).as("first_f"),
      max_by(col("f"), struct(col("t"), col("f"))).as("last_f"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("bk")
    val bridges = ends
      .withColumn("next_first", lead(col("first_f"), 1).over(wb))
      .filter(col("next_first").isNotNull)
      .groupBy(col("last_f").as("from_type"),
        col("next_first").as("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
    inner.unionByName(bridges)
      .groupBy("from_type", "to_type").agg(sum("n").cast("long").as("n"))
  }

  /** Per-user LAST event (by the shared (ts, type) total order) — the
    * one-row-per-user state a streamed transition count carries across
    * batch boundaries. Output: u, t, f. */
  def lastEvents(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("t").desc, col("f").desc)
    events.select(col(userCol).as("u"), col(typeCol).as("f"),
        col(tsCol).as("t"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** The boundary transitions between a prior per-user last-event
    * state ([[lastEvents]] layout: u, t, f) and a new batch: one
    * (prior last → batch first) pair per user present in both.
    * Requires the [[funnelUsersStep]] arrival contract — each user's
    * batch events sort at-or-after their prior events under
    * (ts, type) — so the bridge really is the adjacent pair of the
    * merged stream. Output: from_type, to_type, n. */
  def transitionBridgePairs(last: DataFrame, events: DataFrame,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("t"), col("f"))
    val firsts = events.select(col(userCol).as("u"), col(typeCol).as("f"),
        col(tsCol).as("t"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("u"), col("f").as("_bf"))
    last.select(col("u"), col("f").as("_lf"))
      .join(firsts, Seq("u"))
      .groupBy(col("_lf").as("from_type"), col("_bf").as("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** Fold a new batch into the per-user last-event state: the later
    * of the two under the shared (ts, type) order (under the arrival
    * contract that is simply the batch's last where present). */
  def lastEventsStep(last: DataFrame, events: DataFrame,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val b = lastEvents(events, userCol, typeCol, tsCol)
      .select(col("u"), col("t").as("_bt"), col("f").as("_bf"))
    last.join(b, Seq("u"), "full_outer")
      .select(col("u"),
        when(col("t").isNull, col("_bt"))
          .when(col("_bt").isNull, col("t"))
          .when(col("_bt") > col("t") ||
            (col("_bt") === col("t") && col("_bf") >= col("f")), col("_bt"))
          .otherwise(col("t")).as("t"),
        when(col("t").isNull, col("_bf"))
          .when(col("_bt").isNull, col("f"))
          .when(col("_bt") > col("t") ||
            (col("_bt") === col("t") && col("_bf") >= col("f")), col("_bf"))
          .otherwise(col("f")).as("f"))
  }

  /** Cohort retention: users grouped by the period of their FIRST
    * event (the cohort), counted as retained in each later period
    * they are active in. `period` is a `date_trunc` unit ("week",
    * "month", "day" — ISO weeks, so both engines agree on the
    * boundary). Retention is 6dp of the cohort's size (its k=0 count
    * — every user is active in their own first period by
    * construction, so k=0 is the denominator row).
    *
    * Shape: one user-keyed min (cohort assignment), one distinct over
    * (user, period) — both partial-aggregable — then a users-sized
    * join and a (cohort, k)-keyed count. Nothing event-sized past the
    * first two aggregations.
    * Output: cohort (date), k (periods since cohort), n_active,
    * retention (ordered by cohort, k). */
  def cohortRetention(events: DataFrame, period: String = "week",
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    retentionFromCells(activityCells(events, period, userCol, tsCol), period)

  /** The distinct (u, bucket) activity cells of an event frame — the
    * SUFFICIENT STATISTIC for cohort retention (cohort = each user's
    * MIN bucket, because `date_trunc` is monotone, so the trunc of the
    * first event is the min of the truncs), and a set, hence additive-
    * by-union over ANY batch split — what makes the streamed form
    * ([[graft.streaming.Ingest.retentionCellsStream]]) exact with
    * per-batch state ≤ users × periods cells. */
  def activityCells(events: DataFrame, period: String = "week",
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    periodDays(period) // validate early
    events.select(col(userCol).as("u"),
      to_date(date_trunc(period, col(tsCol))).as("bucket")).distinct()
  }

  private def periodDays(period: String): Int = period.toLowerCase match {
    case "week" => 7
    case "day" => 1
    case other => throw new IllegalArgumentException(
      s"period must be week or day (month is not fixed-width), got $other")
  }

  /** [[cohortRetention]] from (possibly duplicated) landed
    * [[activityCells]] — the read side of the streamed ingest. */
  def retentionFromCells(cells: DataFrame,
      period: String = "week"): DataFrame = {
    val perDays = periodDays(period)
    val active = cells.select(col("u"), col("bucket")).distinct()
    val cohorts = active.groupBy("u").agg(min(col("bucket")).as("cohort"))
    val counts = cohorts.join(active, Seq("u"))
      .select(col("cohort"),
        (datediff(col("bucket"), col("cohort")) / perDays).cast("int").as("k"))
      .groupBy("cohort", "k").agg(count(lit(1)).cast("long").as("n_active"))
    val base = counts.filter(col("k") === 0)
      .select(col("cohort"), col("n_active").as("n_cohort"))
    counts.join(base, Seq("cohort"))
      .select(col("cohort"), col("k"), col("n_active"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
      .orderBy("cohort", "k")
  }
}
