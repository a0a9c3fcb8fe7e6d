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

  test("transitionPairsBucketed == transitionPairs: hot user, ties, single-event cells") {
    // A planted bot user (u0: 400 events = 100x the others) plus the
    // shapes the bridge machinery must get right: equal-ts ties (same
    // bucket by construction), a grid cell holding a SINGLE event (the
    // bridge must chain through it: last(b1)->only(b2), only(b2)->
    // first(b3)), and users whose streams span many cells.
    val types = Array("a", "b", "c", "d")
    val hot = (0 until 400).map(i => (0L, types(i % 4),
      ts(f"2024-01-0${1 + i / 100}%d ${i % 24}%02d:${i % 60}%02d:00")))
    val cold = (1L to 4L).flatMap(u => (0 until 4).map(i =>
      (u, types((i + u.toInt) % 4), ts(f"2024-01-0${1 + i}%d 10:00:00"))))
    val ties = Seq((9L, "b", ts("2024-01-02 10:00:00")),
      (9L, "a", ts("2024-01-02 10:00:00")),
      (9L, "c", ts("2024-01-03 00:00:00"))) // single-event day cell
    val e = (hot ++ cold ++ ties).toDF("user_id", "event_type", "ts")
    val plain = Behavior.transitionPairs(e)
      .collect().map(_.toSeq).toSet
    val bucketed = Behavior.transitionPairsBucketed(e,
        date_trunc("day", col("ts")))
      .collect().map(_.toSeq).toSet
    assert(bucketed == plain)
    // and the matrix wrapper matches the plain matrix row for row
    assert(Behavior.transitionMatrixBucketed(e, date_trunc("day", col("ts")))
      .collect().map(_.toSeq).toSeq ==
      Behavior.transitionMatrix(e).collect().map(_.toSeq).toSeq)
    // degenerate grid = one bucket for everything: still equal (pure
    // fallback to the plain per-user window)
    assert(Behavior.transitionPairsBucketed(e, lit(0))
      .collect().map(_.toSeq).toSet == plain)
  }

  test("funnel parameter validation") {
    val e = Seq((1L, "a", ts("2024-01-01 00:00:00"))).toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] { Behavior.funnelUsers(e, Seq("a")) }
    intercept[IllegalArgumentException] { Behavior.funnelUsers(e, Seq("a", "a")) }
    intercept[IllegalArgumentException] { Behavior.cohortRetention(e, "month") }
  }

  test("funnelUsersStep: string user ids — seed types derive from the events frame") {
    // the r10 review finding: a hardcoded bigint/timestamp seed made
    // the first batch's full-outer join insert a failing ANSI cast
    // for string ids; the seed now derives its types from the frame
    val steps = Seq("view", "click")
    val b1 = Seq(("ua", "view", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val b2 = Seq(("ua", "click", ts("2024-01-02 10:00:00")),
      ("ub", "view", ts("2024-01-02 11:00:00")))
      .toDF("user_id", "event_type", "ts")
    val folded = Seq(b1, b2).foldLeft(Behavior.emptyFunnelState(b1, steps)) {
      (st, b) => Behavior.funnelUsersStep(st, b, steps)
    }
    val oneShot = Behavior.funnelUsers(b1.unionByName(b2), steps)
    assert(folded.collect().map(_.toSeq).toSet ==
      oneShot.collect().map(_.toSeq).toSet)
    // and the transition state fold accepts string ids the same way
    val pairs = Behavior.transitionPairs(b2)
      .unionByName(Behavior.transitionBridgePairs(
        Behavior.lastEventsStep(Behavior.emptyLastEvents(b1), b1), b2))
    assert(Behavior.transitionsFromPairs(pairs).collect().map(_.toSeq).toSeq ==
      Behavior.transitionMatrix(b1.unionByName(b2)).collect().map(_.toSeq).toSeq)
  }

  test("funnelUsersStep: chained time-ordered batches == funnelUsers of the union") {
    val steps = Seq("view", "click", "purchase")
    // time-ordered batches (the arrival contract); conversions that
    // SPAN batches: u1 views in b1, clicks in b2, purchases in b3;
    // u2's early purchase (b1) must not convert but its late one (b3)
    // must; u3 appears first in b2; u4's tie stays non-advancing.
    val b1 = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:30:00")),
      (4L, "view", ts("2024-01-01 11:00:00")),
      (4L, "click", ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val b2 = Seq(
      (1L, "click", ts("2024-01-02 09:00:00")),
      (2L, "click", ts("2024-01-02 10:00:00")),
      (3L, "view", ts("2024-01-02 11:00:00")),
      (3L, "click", ts("2024-01-02 12:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val b3 = Seq(
      (1L, "purchase", ts("2024-01-03 09:00:00")),
      (2L, "purchase", ts("2024-01-03 10:00:00")),
      (3L, "purchase", ts("2024-01-20 10:00:00")) // outside 7-day cap
    ).toDF("user_id", "event_type", "ts")
    Seq(None, Some("7 DAYS")).foreach { within =>
      val folded = Seq(b1, b2, b3).foldLeft(
        Behavior.emptyFunnelState(b1, steps)) { (st, b) =>
        Behavior.funnelUsersStep(st, b, steps, within = within)
      }
      val oneShot = Behavior.funnelUsers(b1.unionByName(b2).unionByName(b3),
        steps, within = within)
      assert(folded.collect().map(_.toSeq).toSet ==
        oneShot.collect().map(_.toSeq).toSet, s"within=$within")
      // and the summary reads off the folded state identically
      assert(Behavior.funnelCountsFromUsers(folded, steps)
        .collect().map(_.toSeq).toSeq ==
        Behavior.funnelCounts(b1.unionByName(b2).unionByName(b3), steps,
          within = within).collect().map(_.toSeq).toSeq)
    }
  }

  test("transition pair fold: per-batch pairs + bridges == transitionPairs of the union") {
    // batches split each user's (ts, type)-ordered stream; u1 spans
    // all three batches, u2 only the outer two (bridge over an absent
    // middle), u3 lives in one batch only.
    val b1 = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "b", ts("2024-01-01 11:00:00")),
      (2L, "a", ts("2024-01-01 10:00:00")),
      (3L, "a", ts("2024-01-01 10:00:00")),
      (3L, "b", ts("2024-01-01 10:30:00")),
      (3L, "a", ts("2024-01-01 10:45:00"))
    ).toDF("user_id", "event_type", "ts")
    val b2 = Seq(
      (1L, "c", ts("2024-01-02 10:00:00")),
      (1L, "a", ts("2024-01-02 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val b3 = Seq(
      (1L, "b", ts("2024-01-03 10:00:00")),
      (2L, "b", ts("2024-01-03 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val empty = Behavior.emptyLastEvents(b1)
    val (pairsAcc, lastFinal) = Seq(b1, b2, b3)
      .foldLeft((Seq.empty[org.apache.spark.sql.DataFrame], empty)) {
        case ((acc, last), b) =>
          val p = Behavior.transitionPairs(b)
            .unionByName(Behavior.transitionBridgePairs(last, b))
          (acc :+ p, Behavior.lastEventsStep(last, b))
      }
    val summed = Behavior.transitionsFromPairs(
      pairsAcc.reduce(_ unionByName _))
    val oneShot = Behavior.transitionMatrix(
      b1.unionByName(b2).unionByName(b3))
    assert(summed.collect().map(_.toSeq).toSeq ==
      oneShot.collect().map(_.toSeq).toSeq)
    // the carried state is each user's true last event
    val lastMap = lastFinal.collect()
      .map(r => r.getLong(0) -> (r.getTimestamp(1), r.getString(2))).toMap
    assert(lastMap == Map(
      1L -> (ts("2024-01-03 10:00:00"), "b"),
      2L -> (ts("2024-01-03 10:00:00"), "b"),
      3L -> (ts("2024-01-01 10:45:00"), "a")), lastMap.toString)
  }
}
