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

  test("lagPerKey matches r36") {
    val viaOp = Windows.lagPerKey(ev, $"event_type", "prev_type",
      $"user_id", $"ts", $"event_id")
      .select("user_id", "event_id", "prev_type")
    val r36 = SparkEntry.queries("r36_lag")(spark, sf)
    assert(viaOp.exceptAll(r36).isEmpty && r36.exceptAll(viaOp).isEmpty)
  }
}
