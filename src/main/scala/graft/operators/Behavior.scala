package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral event analytics over an event stream — the funnel and
  * cohort-retention primitives every product/finance warehouse runs on
  * its events table (reference analog: the events feed the reference's
  * warehouse lands; these are the queries its BI layer asks of it).
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

  /** Funnel summary: per step the user count still converting and the
    * 6dp fraction of step-1 users (the number a dashboard shows).
    * Output: step (1-based), name, n_users, frac (ordered by step). */
  def funnelCounts(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", within: Option[String] = None): DataFrame = {
    val fu = funnelUsers(events, steps, userCol, typeCol, tsCol, within)
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
    * corpus never single-reducers.
    * Output: from_type, to_type, n, p (ordered). */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("t"), col("f"))
    val pairs = events.select(col(userCol).as("u"), col(typeCol).as("f"),
        col(tsCol).as("t"))
      .withColumn("to_type", lead(col("f"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("f").as("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
    val tot = pairs.groupBy("from_type").agg(sum("n").as("tn"))
    pairs.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("tn"), 6).as("p"))
      .orderBy("from_type", "to_type")
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
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val perDays = period.toLowerCase match {
      case "week" => 7
      case "day" => 1
      case other => throw new IllegalArgumentException(
        s"period must be week or day (month is not fixed-width), got $other")
    }
    val e = events.select(col(userCol).as("u"), col(tsCol).as("t"))
    val cohorts = e.groupBy("u")
      .agg(to_date(date_trunc(period, min(col("t")))).as("cohort"))
    val active = e.select(col("u"),
      to_date(date_trunc(period, col("t"))).as("bucket")).distinct()
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
