package graft

import org.apache.spark.sql.functions._
import graft.gen.DataGen
import graft.operators.Quality

/** X6 generator: deterministic, partition-invariant, and the injected
  * defect rates land near their BASELINE.md targets; the Quality
  * detectors find exactly what was planted (SURVEY §5.2.5). */
class DataGenSpec extends SparkSpec {

  private val N = 20000L
  private lazy val cust = DataGen.customers(spark, N).cache()
  private lazy val acct = DataGen.accounts(spark, N, N).cache()
  private lazy val tx = DataGen.transactions(spark, N, N).cache()

  private def rate(n: Long, of: Long): Double = n.toDouble / of

  test("generator is deterministic and partition-invariant") {
    val a = DataGen.customers(spark, 1000).orderBy("customer_id").collect()
    val b = DataGen.customers(spark, 1000).repartition(7).orderBy("customer_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("null rates near 30% phone / 20% address") {
    val r = Quality.nullRates(cust, Seq("phone", "address")).collect().head
    assert(math.abs(r.getAs[Double]("null_rate_phone") - 0.30) < 0.02)
    assert(math.abs(r.getAs[Double]("null_rate_address") - 0.20) < 0.02)
  }

  test("~8% leet-map + ~4% beyond-map duplicates planted; each stage finds its class") {
    val total = cust.count()
    val c1 = cust.filter(col("customer_id") >= N && col("customer_id") < 2 * N).count()
    val c2 = cust.filter(col("customer_id") >= 2 * N).count()
    assert(math.abs(rate(c1, N) - 0.08) < 0.01)
    assert(math.abs(rate(c2, N) - 0.04) < 0.01)
    // stage 1 (translate-normalize key) catches every leet-map dup...
    val found = Quality.fuzzyDuplicateCustomers(cust)
      .agg(sum(col("n") - 1)).collect().head.getLong(0)
    assert(found >= c1)
    val survivors = Quality.dedupCustomersKeepFirst(cust).count()
    assert(survivors == total - found)
    // ...but by construction cannot see the domain-rewrite class,
    assert(found < c1 + c2)
    // which the blocked levenshtein pass (stage 2) fully recovers.
    val normLocal = regexp_extract(
      translate(lower(col("email")), "43", "ae"), "^([^@]+)", 1)
    val pairs = Quality.fuzzyDuplicatesBlocked(cust, col("customer_id"),
      lower(col("full_name")), normLocal, maxDist = 2)
    val recovered = pairs.select(col("id2").as("customer_id"))
      .union(pairs.select(col("id1").as("customer_id"))).distinct()
    val missed = cust.filter(col("customer_id") >= 2 * N)
      .join(recovered, Seq("customer_id"), "left_anti").count()
    assert(missed == 0)
  }

  test("fixed-cardinality block key silently zeroes recall at scale; proportional key recovers") {
    import spark.implicits._
    // A corpus large enough that EVERY block of a fixed-cardinality key
    // (2 nations x 5 segments = 10 blocks, ever) overflows maxBlock:
    // the cap then drops all blocks and blocked dedup returns ZERO
    // pairs with no error — the silent-zero-recall hazard of p15's
    // round-2 key. A corpus-PROPORTIONAL key (nation x name-prefix)
    // keeps block size bounded at any corpus size and recovers the
    // planted duplicate.
    val segs = Seq("AUTO", "BLDG", "FURN", "HSHD", "MACH")
    val base = (0 until 3000).map { i =>
      (i.toLong, (i % 2).toLong, segs(i % 5), f"Customer#$i%09d")
    }
    val planted = Seq((900001L, 0L, "AUTO", "Customer#000000100"))  // dup of id 100
    val cust = (base ++ planted).toDF("id", "nation", "segment", "name")
    val fixedKey = concat_ws(":", col("nation"), col("segment"))
    val propKey = concat_ws(":", col("nation"),
      expr("substring(name, 1, length(name) - 2)"))
    val fixed = Quality.fuzzyDuplicatesBlocked(cust, col("id"), fixedKey,
      col("name"), maxDist = 1, maxBlock = 100)
    assert(fixed.count() == 0)  // every 300-row block dropped: zero recall
    val prop = Quality.fuzzyDuplicatesBlocked(cust, col("id"), propKey,
      col("name"), maxDist = 1, maxBlock = 100)
    val found = prop.select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(found.contains((100L, 900001L)))
  }

  test("~2% negative balances detected") {
    val neg = Quality.negativeBalances(acct).count()
    assert(math.abs(rate(neg, N) - 0.02) < 0.01)
  }

  test("transaction type mix matches .35/.30/.25/.08/.02") {
    val m = tx.groupBy("transaction_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(rate(m("Deposit"), N) - 0.35) < 0.02)
    assert(math.abs(rate(m("Withdrawal"), N) - 0.30) < 0.02)
    assert(math.abs(rate(m("Transfer"), N) - 0.25) < 0.03)
    assert(math.abs(rate(m("Payment"), N) - 0.08) < 0.01)
    assert(math.abs(rate(m("Refund"), N) - 0.02) < 0.01)
  }

  test("~2% circular transfer pairs planted and detected by self-join") {
    val pairs = Quality.circularTransfers(tx).count()
    // ~2% of id-pairs are circular -> pairs ≈ 0.02 * N/2
    assert(math.abs(rate(pairs, N / 2) - 0.02) < 0.01)
  }

  test("future-dated and late rates near 1% / 5%, found by the detectors") {
    val future = tx.filter(col("transaction_date") > col("created_at")).count()
    assert(math.abs(rate(future, N) - 0.01) < 0.005)
    val late = Quality.lateArrivals(tx, 4).count()
    assert(math.abs(rate(late, N) - 0.05) < 0.01)
  }

  test("orphan detector: clean FK graph has none; corrupted rows surface") {
    assert(Quality.orphans(acct, cust, "customer_id").count() == 0)
    val corrupted = acct.withColumn("customer_id",
      when(col("account_id") < 10, col("customer_id") + lit(10 * N))
        .otherwise(col("customer_id")))
    assert(Quality.orphans(corrupted, cust, "customer_id").count() == 10)
  }

  test("inactive-account transactions detected via semi-join") {
    val n = Quality.inactiveAccountTx(tx, acct).count()
    // ~13% of accounts are not active; tx spread uniformly
    assert(math.abs(rate(n, N) - 0.13) < 0.03)
  }

  test("quality report aggregates all detectors") {
    val r = Quality.report(cust, acct, tx, "2024-01-31 00:00:00").collect().head
    assert(r.getAs[Long]("n_customers") == cust.count())
    assert(r.getAs[Long]("n_negative_balance") > 0)
    assert(r.getAs[Long]("n_circular_pairs") > 0)
  }
}
