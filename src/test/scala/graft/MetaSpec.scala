package graft

import graft.sources.Meta

class MetaSpec extends SparkSpec {

  test("P11: classifier accepts queries, rejects commands and garbage") {
    assert(Meta.isSelectStatement(spark, "SELECT 1"))
    assert(Meta.isSelectStatement(spark, "WITH t AS (SELECT 1 AS x) SELECT x FROM t"))
    assert(!Meta.isSelectStatement(spark, "DROP TABLE t"))
    assert(!Meta.isSelectStatement(spark, "CREATE TABLE t (x INT) USING parquet"))
    assert(!Meta.isSelectStatement(spark, "INSERT INTO t VALUES (1)"))
    assert(!Meta.isSelectStatement(spark, "not sql at all ;;;"))
  }

  test("S5: table size reports real bytes and 0 for missing paths") {
    val sz = Meta.tableSizeBytes(spark, s"$sf/lineitem.parquet")
    assert(sz > 10000)
    assert(Meta.tableSizeBytes(spark, "/tmp/definitely-not-here-xyz") == 0L)
  }

  test("S6: info surfaces engine metadata") {
    val i = Meta.info(spark)
    assert(i("spark_version").startsWith("4."))
    assert(i("engine") == "graft")
  }

  test("profile: approx distincts land within 2-sigma of exact; nulls and empty frames behave") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val exact = Meta.profile(o).select("col", "n_distinct").as[(String, Long)]
      .collect().toMap
    val approx = Meta.profile(o, exact = false)
      .select("col", "n_distinct").as[(String, Long)].collect().toMap
    assert(exact.keySet == approx.keySet)
    // approx_count_distinct's default rsd is 5% (one sigma); gate at
    // 2 sigma — deterministic for a fixed table, so this never flakes
    for ((c, e) <- exact)
      assert(math.abs(approx(c) - e) <= math.max(1L, (0.10 * e).toLong),
        s"$c: approx ${approx(c)} vs exact $e")

    // nulls count into n/n_null but not distincts or extremes
    val withNulls = Seq((Some(1.0), Some("a")), (None, Some("b")), (Some(3.0), None))
      .toDF("x", "s")
    val p = Meta.profile(withNulls).collect().map(r =>
      r.getString(0) -> r).toMap
    assert(p("x").getLong(1) == 3 && p("x").getLong(2) == 1 && p("x").getLong(3) == 2)
    assert(p("x").getDouble(4) == 1.0 && p("x").getDouble(5) == 3.0)
    assert(p("s").getLong(2) == 1 && p("s").getString(6) == "a" && p("s").getString(7) == "b")

    // an empty frame still emits one row per column, zero counts, null extremes
    val empty = Meta.profile(withNulls.filter(lit(false))).collect()
    assert(empty.length == 2 && empty.forall(r => r.getLong(1) == 0 && r.isNullAt(4)))
  }
}
