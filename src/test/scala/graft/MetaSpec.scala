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
}
