package graft

import org.apache.spark.sql.functions._
import graft.functions.LedgerAggregator
import graft.functions.LedgerAggregator.Tx

class LedgerAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator ledger equals the declarative sum(when) form") {
    val txs = Seq(
      (1L, Tx("Deposit", BigDecimal("100.00"))),
      (1L, Tx("Withdrawal", BigDecimal("30.00"))),
      (1L, Tx("Refund", BigDecimal("5.50"))),
      (2L, Tx("Payment", BigDecimal("20.00"))),
      (2L, Tx("Deposit", BigDecimal("80.00"))))
    val ds = txs.toDF("account_id", "tx").as[(Long, Tx)]

    val typed = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(LedgerAggregator.netSum.toColumn.name("net"))
      .collect().toMap

    assert(typed(1L) == BigDecimal("75.50"))
    assert(typed(2L) == BigDecimal("60.00"))

    // same numbers from the declarative engine form (q30 shape)
    val flat = txs.map { case (a, t) => (a, t.transaction_type, t.amount) }
      .toDF("account_id", "transaction_type", "amount")
    val decl = flat.groupBy("account_id")
      .agg(sum(when(col("transaction_type").isin("Deposit", "Refund"), col("amount"))
        .otherwise(-col("amount"))).as("net"))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(decl(1L) == typed(1L) && decl(2L) == typed(2L))
  }
}
