package graft

import graft.queries.GoldMart

/** The gold-mart packaging contract: every panel the reference's
  * README declares resolves to registered oracle-checked queries and
  * produces rows on the test corpus — the mart must never drift from
  * the query registry it names. */
class GoldMartSpec extends SparkSpec {

  test("the five declared dashboards resolve and produce rows") {
    assert(GoldMart.panels.keySet == Set(
      "daily_transaction_volumes", "customer_acquisition_trends",
      "account_balance_distribution", "fraud_detection_alerts",
      "data_quality_metrics"))
    for ((panel, frames) <- GoldMart.all(spark, sf); (q, df) <- frames)
      assert(df.count() > 0, s"$panel/$q returned no rows")
  }

  test("every panel query is a registry entry with an oracle (the mart names green queries, never private plans)") {
    val named = GoldMart.panels.values.flatten.toSet
    assert(named.subsetOf(SparkEntry.queries.keySet))
    assert(named.subsetOf(SparkEntry.oracleSql.keySet),
      "a panel query without an oracle would dodge the correctness gate")
  }

  test("unknown panel fails loudly") {
    val e = intercept[IllegalArgumentException] {
      GoldMart.panel(spark, sf, "nope")
    }
    assert(e.getMessage.contains("unknown panel"))
  }
}
