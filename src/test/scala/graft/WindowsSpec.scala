package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.sources.Tables

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = Tables.load(spark, sf, "events")

  test("keepFirst matches q27 dedup semantics") {
    val docs = Tables.load(spark, sf, "documents")
    val viaOp = Windows.keepFirst(docs.withColumn("h", md5($"text")), $"h", $"doc_id")
      .select("doc_id")
    val viaQuery = SparkEntry.queries("q27_dedup_hash")(spark, sf)
    assert(viaOp.exceptAll(viaQuery).isEmpty && viaQuery.exceptAll(viaOp).isEmpty)
  }

  test("scd2 versions partition each key's timeline") {
    val dim = Windows.scd2(ev.select($"user_id", $"event_id", $"ts"),
      "user_id", "ts", "event_id")
    // one open-ended version per key; no inverted intervals
    assert(dim.filter($"is_current").groupBy("user_id").count()
      .filter($"count" =!= 1).count() == 0)
    assert(dim.filter($"valid_to".isNotNull && $"valid_to" < $"valid_from").count() == 0)
  }

  test("asOf lookup matches the r37 query") {
    val su = Windows.scd2(
      ev.filter($"event_type" === "signup").select($"user_id", $"event_id".as("s_id"), $"ts"),
      "user_id", "ts", "s_id")
      .select($"user_id", $"s_id", $"valid_from", $"valid_to")
    val pu = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id", $"ts".as("p_ts"))
    val viaOp = Windows.asOf(
        pu.withColumnRenamed("p_user", "user_id").withColumnRenamed("p_ts", "fts"),
        su, "user_id", "fts")
      .select($"event_id", $"s_id")
    val viaQuery = SparkEntry.queries("r37_asof_join")(spark, sf)
    assert(viaOp.exceptAll(viaQuery).isEmpty && viaQuery.exceptAll(viaOp).isEmpty)
  }

  test("topNPerGroup and runningSum match their query forms") {
    val o = Tables.load(spark, sf, "orders")
    val top3 = Windows.topNPerGroup(o, 3, $"o_custkey", $"o_orderdate", $"o_orderkey")
      .select("o_custkey", "o_orderkey")
    val q19 = SparkEntry.queries("q19_rank_per_group")(spark, sf)
      .select("o_custkey", "o_orderkey")
    assert(top3.exceptAll(q19).isEmpty && q19.exceptAll(top3).isEmpty)

    val run = Windows.runningSum(o, $"o_totalprice", "run_tot",
      $"o_custkey", $"o_orderdate", $"o_orderkey")
      .select($"o_custkey", $"o_orderkey", round($"run_tot", 2).as("run_tot"))
    val q20 = SparkEntry.queries("q20_running_total")(spark, sf)
    assert(run.exceptAll(q20).isEmpty && q20.exceptAll(run).isEmpty)
  }

  test("rangeJoinBinned == the naive BETWEEN theta join, at several bin widths") {
    val cust = Tables.load(spark, sf, "customer").select($"c_custkey", $"c_acctbal")
    val bands = Tables.load(spark, sf, "supplier")
      .select($"s_suppkey", $"s_acctbal".as("lo"), ($"s_acctbal" + 700.0).as("hi"))
    val naive = cust.join(bands,
        $"c_acctbal" >= $"lo" && $"c_acctbal" <= $"hi")
      .select("c_custkey", "s_suppkey")
    for (w <- Seq(100.0, 700.0, 5000.0)) {
      val binned = Windows.rangeJoinBinned(cust, "c_acctbal", bands,
          "lo", "hi", binWidth = w)
        .select("c_custkey", "s_suppkey")
      assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
        s"binWidth=$w diverges from the naive theta join")
    }
  }

  test("rangeJoinBinned edge semantics: closed bounds, empty intervals, nulls") {
    val pts = Seq((1L, 10.0), (2L, 20.0), (3L, -5.0))
      .toDF("pid", "v")
      .unionByName(Seq((4L, Option.empty[Double])).toDF("pid", "v"))
    val iv = Seq((10L, 10.0, 20.0), (11L, 25.0, 5.0), (12L, -10.0, -1.0))
      .toDF("iid", "lo", "hi")
      .unionByName(Seq((13L, Option.empty[Double], Some(50.0))).toDF("iid", "lo", "hi"))
    val got = Windows.rangeJoinBinned(pts, "v", iv, "lo", "hi", binWidth = 7.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // closed on both ends (10 and 20 both match [10,20]); the inverted
    // interval 11 and the null-bounded 13 match nothing; null point drops
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 12L)))
  }

  test("overlapJoinBinned == the naive overlap theta join, with no pair duplicated") {
    val cust = Tables.load(spark, sf, "customer")
      .select($"c_custkey", $"c_acctbal".as("clo"), ($"c_acctbal" + 500.0).as("chi"))
    val supp = Tables.load(spark, sf, "supplier")
      .select($"s_suppkey", $"s_acctbal".as("slo"), ($"s_acctbal" + 800.0).as("shi"))
    val naive = cust.join(supp, $"clo" <= $"shi" && $"slo" <= $"chi")
      .select("c_custkey", "s_suppkey")
    for (w <- Seq(130.0, 800.0, 4000.0)) {
      val binned = Windows.overlapJoinBinned(cust, "clo", "chi",
          supp, "slo", "shi", binWidth = w)
        .select("c_custkey", "s_suppkey")
      // exceptAll is multiset difference, so equality both ways also
      // proves the first-bin rule emitted every pair exactly once
      assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
        s"binWidth=$w diverges from the naive overlap join")
    }
  }

  test("overlapJoinBinned edge semantics: touching endpoints, empty and null intervals") {
    val a = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0), (3L, 8.0, 3.0))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 10.0, 15.0), (11L, 31.0, 40.0))
      .toDF("bid", "blo", "bhi")
      .unionByName(Seq((12L, Option.empty[Double], Some(9.0))).toDF("bid", "blo", "bhi"))
    val got = Windows.overlapJoinBinned(a, "alo", "ahi", b, "blo", "bhi",
        binWidth = 6.0)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    // [0,10] touches [10,15] at a point (closed bounds -> match);
    // [20,30] misses [31,40]; inverted a3 and null-bounded b12 drop
    assert(got == Set((1L, 10L)))
  }

  test("rangeJoinBinned fails loudly when an interval overruns maxFanout") {
    val pts = Seq((1L, 10.0)).toDF("pid", "v")
    val iv = Seq((10L, 0.0, 1e7)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      Windows.rangeJoinBinned(pts, "v", iv, "lo", "hi",
        binWidth = 1.0, maxFanout = 100).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("rangeJoinBinned"))))
  }

  test("topKPerGroupAgg == the window form, and partial-aggregates before the shuffle") {
    val o = Tables.load(spark, sf, "orders")
    val agg = Windows.topKPerGroupAgg(o, 3, "o_custkey", "o_totalprice", "o_orderkey")
    val win = Windows.topNPerGroup(
        o.select($"o_custkey", $"o_orderkey", $"o_totalprice"),
        3, $"o_custkey", $"o_totalprice".desc, $"o_orderkey")
    val a = agg.select("o_custkey", "o_orderkey")
    val w = win.select("o_custkey", "o_orderkey")
    assert(a.exceptAll(w).isEmpty && w.exceptAll(a).isEmpty)
    // the scale property: a partial ObjectHashAggregate runs BEFORE the
    // exchange, so a hot key can never dominate the shuffle
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_"),
      plan.linesIterator.take(30).mkString("\n"))
  }

  test("lagPerKey matches r36") {
    val viaOp = Windows.lagPerKey(ev, $"event_type", "prev_type",
      $"user_id", $"ts", $"event_id")
      .select("user_id", "event_id", "prev_type")
    val r36 = SparkEntry.queries("r36_lag")(spark, sf)
    assert(viaOp.exceptAll(r36).isEmpty && r36.exceptAll(viaOp).isEmpty)
  }
}
