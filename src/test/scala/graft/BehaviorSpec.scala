package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel strict ordering: out-of-order steps do not convert; missing first step excludes") {
    val e = Seq(
      // u1: clean view -> click -> purchase
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2: purchase BEFORE the click — purchase must not count
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:30:00")),
      (2L, "click", ts("2024-01-01 11:00:00")),
      // u3: clicks and purchases but never views — not in the funnel
      (3L, "click", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-01 11:00:00")),
      // u4: click ties the first-view timestamp exactly — strict >
      (4L, "view", ts("2024-01-01 10:00:00")),
      (4L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val counts = Behavior.funnelCounts(e, Seq("view", "click", "purchase"))
      .select("step", "n_users").as[(Int, Long)].collect().toMap
    assert(counts == Map(1 -> 3L, 2 -> 2L, 3 -> 1L), counts.toString)
    val fu = Behavior.funnelUsers(e, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (1 to 3).map(i => !r.isNullAt(i))).toMap
    assert(fu(1L) == Seq(true, true, true))
    assert(fu(2L) == Seq(true, true, false)) // click counts, early purchase doesn't
    assert(!fu.contains(3L))
    assert(fu(4L) == Seq(true, false, false)) // tie does not advance
  }

  test("funnel within-window: a step past the window of the FIRST step does not convert") {
    val e = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-05 10:00:00")),   // inside 7 days
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-09 10:00:00"))    // outside
    ).toDF("user_id", "event_type", "ts")
    val counts = Behavior.funnelCounts(e, Seq("view", "click"),
        within = Some("7 DAYS"))
      .select("step", "n_users").as[(Int, Long)].collect().toMap
    assert(counts == Map(1 -> 2L, 2 -> 1L), counts.toString)
    // and the frac column reads off step 1
    val frac = Behavior.funnelCounts(e, Seq("view", "click"),
        within = Some("7 DAYS"))
      .filter(col("step") === 2).select("frac").as[Double].head()
    assert(frac == 0.5)
  }

  test("cohort retention: week boundaries, dedup within period, fractions of the k=0 base") {
    // cohort week of 2024-01-01 (a Monday): u1 active weeks 0,1,2;
    // u2 active weeks 0,2 (twice in week 0 — counted once);
    // u3 cohorts a week later, active weeks 0,1 of ITS cohort.
    val e = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-08 09:00:00")),
      (1L, ts("2024-01-15 09:00:00")),
      (2L, ts("2024-01-02 09:00:00")), (2L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-17 09:00:00")),
      (3L, ts("2024-01-10 09:00:00")), (3L, ts("2024-01-16 09:00:00"))
    ).toDF("user_id", "ts")
    val rows = Behavior.cohortRetention(e, "week")
      .as[(java.sql.Date, Int, Long, Double)].collect()
      .map(t => (t._1.toString, t._2) -> (t._3, t._4)).toMap
    assert(rows(("2024-01-01", 0)) == (2L, 1.0))
    assert(rows(("2024-01-01", 1)) == (1L, 0.5))
    assert(rows(("2024-01-01", 2)) == (2L, 1.0))
    assert(rows(("2024-01-08", 0)) == (1L, 1.0))
    assert(rows(("2024-01-08", 1)) == (1L, 1.0))
    assert(rows.size == 5)
  }

  test("transitionMatrix: per-user adjacency, deterministic tie order, row-normalized") {
    val e = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "b", ts("2024-01-01 11:00:00")),
      (1L, "a", ts("2024-01-01 12:00:00")),
      // u2: same-ts tie — (ts, type) order makes it a THEN b
      (2L, "b", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 10:00:00")),
      // u3: single event — no transition
      (3L, "a", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val m = Behavior.transitionMatrix(e)
      .as[(String, String, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // u1: a->b, b->a; u2 (tie sorted a,b): a->b
    assert(m == Map(("a", "b") -> (2L, 1.0), ("b", "a") -> (1L, 1.0)), m.toString)
    // transitions never cross users: u3 contributed nothing
    val total = m.values.map(_._1).sum
    assert(total == 3L)
  }

  test("funnel parameter validation") {
    val e = Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] { Behavior.funnelUsers(e, Seq("a")) }
    intercept[IllegalArgumentException] { Behavior.funnelUsers(e, Seq("a", "a")) }
    intercept[IllegalArgumentException] { Behavior.cohortRetention(e, "month") }
  }
}
