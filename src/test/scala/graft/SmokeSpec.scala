package graft

import graft.sources.Tables

/** t1 smoke (SURVEY §5.2.1): every fixture table loads with the
  * expected schema, the flagship query returns rows, and every declared
  * query at least executes at sf0.001. */
class SmokeSpec extends SparkSpec {

  test("all fixture tables load and are non-empty") {
    for (name <- Tables.all) {
      val df = Tables.load(spark, sf, name)
      assert(df.count() > 0, s"$name is empty")
    }
  }

  test("events ns-timestamp shim yields TimestampType") {
    import org.apache.spark.sql.types.TimestampType
    val ev = Tables.load(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.filter(ev("ts").isNull).count() == 0)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("every query has an oracle or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // r39/r47: sketch internals (HLL, approx-percentile) differ across
    // engines; r45: seeded RNG sampling is engine-specific — all three
    // are rows-only checks.
    assert(noOracle == Set("r39_approx_distinct", "r45_sample_seeded",
      "r47_approx_percentiles"), s"missing oracles: $noOracle")
  }

  test("approx percentile tracks the exact percentile (r47's accuracy bound)") {
    val rows = SparkEntry.queries("r47_approx_percentiles")(spark, sf).collect()
    rows.foreach { r =>
      val (ap, ex) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(ap - ex) <= math.max(1.0, ex * 0.05), s"$ap vs $ex")
    }
  }

  test("no query function leaks persisted RDDs (scoped caching)") {
    // q11/p02 cache intermediates; withCached must release them before
    // returning, so callers beyond Verify/Bench (which clearCache()
    // defensively) never accumulate pinned blocks.
    for (name <- Seq("q11_self_join_circular", "p02_minhash_lsh_pairs")) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(name)(spark, sf).count()
      assert(spark.sparkContext.getPersistentRDDs.keySet == before,
        s"$name left persisted RDDs behind")
    }
  }

  test("seeded sample is deterministic and inside 4-sigma binomial bounds") {
    val c = Tables.load(spark, sf, "customer")
    val a = SparkEntry.queries("r45_sample_seeded")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("r45_sample_seeded")(spark, sf).collect().toSeq
    assert(a == b)
    // k ~ Binomial(n, 0.2): |k - np| <= 4*sqrt(np(1-p)) — a quantitative
    // gate for the no-oracle entry (P(outside) < 1e-4, and the seed is
    // fixed so the draw never varies run to run anyway)
    val n = c.count().toDouble
    val sigma = math.sqrt(n * 0.2 * 0.8)
    assert(math.abs(a.length - n * 0.2) <= 4 * sigma,
      s"sampled ${a.length} of $n (expected ${n * 0.2} +- ${4 * sigma})")
  }

  test("approx_percentile p50 sits at rank 0.5 within tolerance (r47)") {
    // Rank-tolerance contract of the sketch: the fraction of values on
    // either side of the reported p50 brackets 0.5. Value tolerance
    // (test above) can mask a sketch that returns a near-by value from
    // the wrong rank; this pins the rank itself.
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sf, "lineitem")
    val approx = SparkEntry.queries("r47_approx_percentiles")(spark, sf)
      .select("l_returnflag", "p50_approx").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((flag, p50) <- approx) {
      val g = li.filter(col("l_returnflag") === flag)
      val n = g.count().toDouble
      val below = g.filter(col("l_quantity") < p50).count() / n
      val atOrBelow = g.filter(col("l_quantity") <= p50).count() / n
      // discrete data: the interval [below, atOrBelow] must cover 0.5
      // up to the sketch's rank error (1/accuracy) + one row of slack
      val tol = 1.0 / 10000 + 1.0 / n
      assert(below <= 0.5 + tol && atOrBelow >= 0.5 - tol,
        s"$flag: p50=$p50 ranks [$below, $atOrBelow]")
    }
  }

  test("HLL approx distinct within 5% of exact (r39's error bound)") {
    val r = SparkEntry.queries("r39_approx_distinct")(spark, sf).head()
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    // Spark's default rsd = 0.05; 5% is the documented contract for the
    // no-oracle entry (the sketch is engine-specific, the bound is not)
    assert(math.abs(approx - exact) <= math.max(1.0, exact * 0.05),
      s"approx $approx vs exact $exact")
  }
}
