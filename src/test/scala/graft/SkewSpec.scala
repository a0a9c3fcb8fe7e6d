package graft

import org.apache.spark.sql.functions._
import graft.gen.DataGen
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted sum equals direct groupBy sum on decimal amounts") {
    val tx = DataGen.transactions(spark, 100, 20000)  // 100 accounts -> hot keys
    val direct = tx.groupBy("account_id").agg(sum("amount").as("total"))
    val salted = Skew.saltedSum(tx, "account_id", "amount")
    assert(salted.count() == direct.count())
    assert(direct.join(salted, "account_id")
      .filter(direct("total") =!= salted("total")).count() == 0)
  }

  test("salted count equals direct count") {
    val tx = DataGen.transactions(spark, 10, 5000)
    val direct = tx.groupBy("account_id").count()
    val salted = Skew.saltedCount(tx, "account_id")
    assert(direct.join(salted, "account_id")
      .filter(col("count") =!= col("n")).count() == 0)
  }

  test("salted join equals plain join on a skewed fact table") {
    // 10 accounts over 20k rows -> every key is hot
    val tx = DataGen.transactions(spark, 10, 20000)
      .select("transaction_id", "account_id", "amount")
    val accts = DataGen.accounts(spark, 10, 10)
      .select("account_id", "account_type")
    val plain = tx.join(accts, "account_id")
      .select("transaction_id", "account_type")
    val salted = Skew.saltedJoin(tx, accts, "account_id")
      .select("transaction_id", "account_type")
    assert(salted.count() == plain.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}
