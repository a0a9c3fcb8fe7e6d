package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.Tables
import graft.operators.Dedup

/** Algebraic laws (SURVEY §5.2.3) on fixture data + generated frames:
  * plan rewrites the optimizer is allowed to do must not change
  * results, and the set/dedup operators obey their algebra. */
class LawsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val customer = Tables.load(spark, sf, "customer").cache()
  private lazy val orders = Tables.load(spark, sf, "orders").cache()

  /** Draw n deterministic samples from a ScalaCheck generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("filter-project commutation: select(c).filter(p) == filter(p).select(c)") {
    for (threshold <- samples(Gen.choose(-1000.0, 9000.0), 5)) {
      val a = customer.select("c_custkey", "c_acctbal")
        .filter(col("c_acctbal") > threshold)
      val b = customer.filter(col("c_acctbal") > threshold)
        .select("c_custkey", "c_acctbal")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
  }

  test("sessionize: gap rule holds at every boundary and rows are preserved") {
    import org.apache.spark.sql.expressions.Window
    val events = Tables.load(spark, sf, "events")
    val s = graft.operators.Windows.sessionize(
      events, col("user_id"), col("ts"), "1 HOUR", col("event_id"))
    assert(s.count() == events.count())
    // Re-derive each row's predecessor: the session id increments
    // exactly when the inactivity gap is >= 1 hour — no more, no less.
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val violations = s
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("prev_sid", lag("session_id", 1).over(w))
      .filter(col("prev").isNotNull)
      .filter(
        (col("ts") >= col("prev") + expr("INTERVAL 1 HOUR")) =!=
          (col("session_id") === col("prev_sid") + 1))
      .count()
    assert(violations == 0)
  }

  test("dedup idempotence: exactKeepFirst(exactKeepFirst(x)) == exactKeepFirst(x)") {
    val docs = Tables.load(spark, sf, "documents")
    val once = Dedup.exactKeepFirst(docs)
    val twice = Dedup.exactKeepFirst(once)
    assert(once.count() == twice.count())
    assert(once.exceptAll(twice).isEmpty)
  }

  test("set algebra: |A ∩ B| + |A \\ B| == |A| for key sets") {
    val a = customer.select($"c_custkey".as("k")).distinct()
    val b = orders.select($"o_custkey".as("k")).distinct()
    val n = a.intersect(b).count() + a.except(b).count()
    assert(n == a.count())
  }

  test("union cardinality: |A ∪ B| == |A| + |B| - |A ∩ B| for key sets") {
    val a = customer.filter($"c_acctbal" > 0).select($"c_custkey".as("k")).distinct()
    val b = orders.select($"o_custkey".as("k")).distinct()
    val u = a.unionByName(b).distinct().count()
    assert(u == a.count() + b.count() - a.intersect(b).count())
  }

  test("SCD2 intervals from LEAD are disjoint and cover each key's history") {
    // validity intervals per user over events (Q21 shape): for each
    // user ordered by (vf, id): vt == next vf, last vt is null
    val ev = Tables.load(spark, sf, "events")
    val iv = ev.select($"user_id", $"event_id", $"ts".as("vf"),
      lead($"ts", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")).as("vt"))
    val bad = iv.filter($"vt".isNotNull && $"vt" < $"vf").count()
    assert(bad == 0)
    val openEnded = iv.filter($"vt".isNull).groupBy("user_id").count()
      .filter($"count" =!= 1).count()
    assert(openEnded == 0)
  }

  test("ledger aggregation equals sequential replay (A5)") {
    // signed groupBy-sum must equal the last running-total value per
    // key (tolerance: the two plans sum in different orders)
    val ev = Tables.load(spark, sf, "events")
    val signed = ev.withColumn("delta",
      when($"event_type" === "purchase", $"value").otherwise(0.0))
    val grouped = signed.groupBy("user_id").agg(sum("delta").as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val replay = signed.withColumn("run", sum("delta").over(w))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy($"ts".desc, $"event_id".desc)))
      .filter($"rn" === 1)
      .select($"user_id", $"run")
    val joined = grouped.join(replay, "user_id")
    assert(joined.count() == grouped.count())
    val maxDiff = joined.agg(max(abs($"total" - $"run"))).head().getDouble(0)
    assert(maxDiff < 1e-6)
  }

  test("corpusDiff: set-arithmetic laws on planted snapshots") {
    import graft.operators.Quality
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, null: String))
      .toDF("doc_id", "text")
    val b = Seq((2L, "two"), (3L, "THREE"), (5L, "five"), (4L, null: String))
      .toDF("doc_id", "text")
    val got = Quality.corpusDiff(a, b)
      .as[(Long, String)].collect().toMap
    // added = B \ A keys, removed = A \ B keys, changed = hash mismatch;
    // unchanged docs (2, and the null-text 4) emit nothing
    assert(got == Map(1L -> "removed", 3L -> "changed", 5L -> "added"))
    // identity: diff(A, A) is empty
    assert(Quality.corpusDiff(a, a).isEmpty)
    // antisymmetry: swapping snapshots swaps added <-> removed
    val rev = Quality.corpusDiff(b, a).as[(Long, String)].collect().toMap
    assert(rev == Map(1L -> "added", 3L -> "changed", 5L -> "removed"))
  }

  test("transitionPairsBucketed == transitionPairs over random skewed streams and random grids") {
    import graft.operators.Behavior
    // Random event streams with a planted hot user (60% of rows), a
    // tiny ts range (forces same-ts ties, which must never straddle a
    // bucket), and TWO grids per draw — the calendar one and a random
    // coarse modulus — both monotone in ts, the only contract.
    val genEvents: Gen[List[(Long, String, Int)]] = for {
      n <- Gen.choose(30, 150)
      evs <- Gen.listOfN(n, for {
        u <- Gen.frequency((6, Gen.const(0L)), (4, Gen.choose(1L, 5L)))
        t <- Gen.oneOf("a", "b", "c")
        s <- Gen.choose(0, 5000)
      } yield (u, t, s))
    } yield evs
    for ((evs, i) <- samples(genEvents, 6).zipWithIndex) {
      val df = evs.toDF("user_id", "event_type", "secs")
        .withColumn("ts", timestamp_seconds(col("secs"))).drop("secs")
      val plain = Behavior.transitionPairs(df).collect().map(_.toSeq).toSet
      val grids = Seq(
        date_trunc("hour", col("ts")),
        floor(unix_timestamp(col("ts")) / lit(97 + i * 13)))
      grids.foreach { g =>
        val bucketed = Behavior.transitionPairsBucketed(df, g)
          .collect().map(_.toSeq).toSet
        assert(bucketed == plain, s"draw $i grid $g")
      }
    }
  }

  test("urlHost + hostPrior: host grouping, mean math, non-URL visibility") {
    import graft.operators.Quality
    val docs = Seq(
      (1L, "https://Spam.Example.com/a/1"),
      (2L, "https://spam.example.com/b/2?q=x"),
      (3L, "http://good.org:8080/page#frag"),
      (4L, "not a url at all")).toDF("doc_id", "url")
    val scores = Seq((1L, 0.2), (2L, 0.4), (3L, 0.9), (4L, 0.5))
      .toDF("doc_id", "score")
    val got = Quality.hostPrior(docs, scores).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3), r.getDouble(4))))
      .toMap
    // case-insensitive host grouping; query/fragment never leak in
    assert(got(1L) == (("spam.example.com", 2L, 0.3)))
    assert(got(2L)._1 == "spam.example.com")
    // port stays inside the host (documented contract)
    assert(got(3L) == (("good.org:8080", 1L, 0.9)))
    // a non-URL groups under '' instead of vanishing or erroring
    assert(got(4L) == (("", 1L, 0.5)))
  }
}
