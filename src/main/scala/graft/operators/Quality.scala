package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Silver-layer data-quality detectors for the reference's ten injected
  * issue classes (polished_transactions.py:27-40, quality report
  * :448-521). Each detector is a declarative plan — a filter, an
  * anti-join, or a self-join — so Catalyst pushes predicates into the
  * scan and AQE sizes the shuffles; nothing here is row-at-a-time.
  */
object Quality {

  /** Null-rate profile for the given columns (issue #2/#3). */
  def nullRates(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      cols.map(c => round(avg(when(col(c).isNull, 1.0).otherwise(0.0)), 4)
        .as(s"null_rate_$c")): _*)

  /** Fuzzy duplicate customers (issue #1): normalize the leet-typo map
    * (4->a, 3->e) and group — pairs beyond the normalization key fall
    * back to a blocked levenshtein pass. Returns (dup_key, ids, n). */
  def fuzzyDuplicateCustomers(customers: DataFrame): DataFrame =
    customers
      .withColumn("norm_email", translate(lower(col("email")), "43", "ae"))
      .groupBy("norm_email")
      .agg(sort_array(collect_list("customer_id")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Keep-first survivor set after fuzzy dedup (W1). */
  def dedupCustomersKeepFirst(customers: DataFrame): DataFrame =
    customers
      .withColumn("norm_email", translate(lower(col("email")), "43", "ae"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("norm_email").orderBy("customer_id")))
      .filter(col("rn") === 1)
      .drop("rn", "norm_email")

  /** Negative balances (issue #4). */
  def negativeBalances(accounts: DataFrame): DataFrame =
    accounts.filter(col("balance") < 0)

  /** Orphaned child rows (issue #10): anti-join against the parent. */
  def orphans(child: DataFrame, parent: DataFrame, key: String): DataFrame =
    child.join(parent, Seq(key), "left_anti")

  /** Circular transfers (issue #8): A->B and B->A on the same day
    * (J4 self-join: equi keys + theta residual). */
  def circularTransfers(tx: DataFrame): DataFrame = {
    val t = tx.filter(col("transaction_type") === "Transfer" &&
      col("related_account_id").isNotNull)
    val a = t.select(col("transaction_id").as("t1"), col("account_id").as("src1"),
      col("related_account_id").as("dst1"), col("transaction_date").as("d1"))
    val b = t.select(col("transaction_id").as("t2"), col("account_id").as("src2"),
      col("related_account_id").as("dst2"), col("transaction_date").as("d2"))
    a.join(b,
        col("src1") === col("dst2") && col("dst1") === col("src2") &&
        col("t1") < col("t2") &&
        to_date(col("d1")) === to_date(col("d2")))
      .select(col("t1"), col("t2"), col("src1").as("acct_a"), col("dst1").as("acct_b"))
  }

  /** Future-dated transactions vs a fixed clock (issue #6). */
  def futureDated(tx: DataFrame, now: String): DataFrame =
    tx.filter(col("transaction_date") > lit(now).cast("timestamp"))

  /** Late arrivals: event time more than `days` before ingest time
    * (issue #5 — reference injects 5-30 day lateness). */
  def lateArrivals(tx: DataFrame, days: Int): DataFrame =
    tx.filter(col("transaction_date") <
      col("created_at") - expr(s"INTERVAL $days DAYS"))

  /** Transactions on non-active accounts (issue #7): semi-join against
    * the inactive dimension (broadcast when small). */
  def inactiveAccountTx(tx: DataFrame, accounts: DataFrame): DataFrame =
    tx.join(accounts.filter(col("status") =!= "active").select("account_id"),
      Seq("account_id"), "left_semi")

  /** One-row quality report mirroring the reference's validation
    * aggregates (polished_transactions.py:448-502). */
  def report(customers: DataFrame, accounts: DataFrame, tx: DataFrame,
      now: String): DataFrame = {
    val dupCount = fuzzyDuplicateCustomers(customers)
      .agg(coalesce(sum(col("n") - 1), lit(0)).as("v")).select(col("v"))
    val vals = Seq(
      customers.count(),
      dupCount.first().getLong(0),
      customers.filter(col("phone").isNull).count(),
      accounts.filter(col("balance") < 0).count(),
      futureDated(tx, now).count(),
      circularTransfers(tx).count())
    val spark = customers.sparkSession
    import spark.implicits._
    Seq((vals(0), vals(1), vals(2), vals(3), vals(4), vals(5)))
      .toDF("n_customers", "n_fuzzy_dups", "n_null_phone",
        "n_negative_balance", "n_future_dated", "n_circular_pairs")
  }
}
