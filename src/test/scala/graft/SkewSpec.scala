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

  test("tokenBudgetSample splits a hot domain across md5-prefix buckets") {
    import spark.implicits._
    // one domain holds ~all rows — the lang=en case: a naive
    // Window.partitionBy(domain) would put all 2000 docs in ONE task
    val docs = (1 to 2000).map(i => (i.toLong, "t " * (i % 7 + 1), "en"))
      .toDF("doc_id", "text", "lang")
    val bucketed = graft.functions.TextAnalysis
      .tokenBudgetSample(docs, budgetTokens = 3000L, buckets = 8)
    // buckets = 1 IS the single-window semantics; the bucketed form
    // must be row-identical (buckets partition the h-order contiguously)
    val single = graft.functions.TextAnalysis
      .tokenBudgetSample(docs, budgetTokens = 3000L, buckets = 1)
    assert(bucketed.exceptAll(single).isEmpty && single.exceptAll(bucketed).isEmpty)
    assert(bucketed.count() > 0)
    // plan: no window may partition by domain alone with the per-row
    // sort key — the heavy cumulative window must carry bkt in its
    // partition spec (a window partition is one unsplittable task)
    val plan = bucketed.queryExecution.optimizedPlan.toString
    assert(!"windowspecdefinition\\(domain#\\d+, h#".r.findFirstIn(plan).isDefined,
      "found a window partitioned by domain alone over per-row data")
    assert("windowspecdefinition\\(domain#\\d+, bkt#".r.findFirstIn(plan).isDefined,
      "expected the cumulative window to partition by (domain, bkt)")
    // the hot domain really lands in >1 bucket at this scale
    val nBkt = docs.select(expr(
      "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) * 8) DIV 4294967296"))
      .distinct().count()
    assert(nBkt > 1)
  }

  test("stratifiedHead equals the naive per-stratum window, bucket count free") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one stratum holds ~all rows — the shape where the naive window
    // serializes the corpus onto one reducer
    val df = ((1L to 1900L).map(i => (i, "hot")) ++
      (1901L to 2000L).map(i => (i, "cold"))).toDF("k", "s")
    def naive(frac: Double) = {
      val w = Window.partitionBy("s")
      df.withColumn("rn", row_number().over(
          w.orderBy(md5($"k".cast("string")), $"k")))
        .withColumn("n", count(lit(1)).over(w))
        .filter($"rn" <= ceil($"n" * lit(frac)))
        .select("k", "s")
    }
    for (frac <- Seq(0.1, 0.33, 1.0); b <- Seq(1, 8, 256)) {
      val fast = graft.operators.Skew.stratifiedHead(df, "s", "k", frac, buckets = b)
        .select("k", "s")
      assert(fast.exceptAll(naive(frac)).isEmpty &&
        naive(frac).exceptAll(fast).isEmpty, s"frac=$frac buckets=$b")
    }
    // plan: the per-row window must carry the bucket in its partition
    // spec; no window may partition by the stratum alone over row data
    val plan = graft.operators.Skew.stratifiedHead(df, "s", "k", 0.1)
      .queryExecution.optimizedPlan.toString
    assert("windowspecdefinition\\(s#\\d+, __bkt#".r.findFirstIn(plan).isDefined, plan.take(400))
    assert(!"windowspecdefinition\\(s#\\d+, __h#".r.findFirstIn(plan).isDefined)
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
