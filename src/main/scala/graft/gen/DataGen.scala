package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, distributed synthetic-data generator reproducing the
  * reference's banking OLTP shape and its injected data-quality issues
  * (SURVEY X6; rates from BASELINE.md):
  *
  *  - ~8% near-duplicate customers (re-emitted with email typos),
  *    oltp_seeder.py:115-126
  *  - ~30% null phone / ~20% null address, oltp_seeder.py:128-130
  *  - ~5% email typos (a->4, e->3), oltp_seeder.py:131-132
  *  - ~1% invalid date_of_birth, oltp_seeder.py:133-134
  *  - ~2% negative balances, oltp_seeder.py:278-283
  *  - tx type mix .35/.30/.25/.08/.02, status 90/7/3, oltp_seeder.py:382-390
  *  - ~5% late (5-30 d) and ~1% future-dated transactions,
  *    polished_transactions.py:377-390
  *  - ~2% circular A->B->A transfer pairs, polished_transactions.py:364-375
  *
  * Unlike the reference's Faker loops (driver-side, one row at a time,
  * and capped at 500 rows by an attempts bug — database_seeder.py:104),
  * every column is a pure function of (seed, id) via murmur3 hashing
  * over `spark.range`, so output is identical for any partition count
  * or cluster size — the property that makes the generator usable as a
  * distributed fixture at any scale.
  */
object DataGen {

  /** Uniform [0,1) double as a pure function of (id, seed, salt). */
  private def u(id: Column, seed: Long, salt: String): Column =
    pmod(hash(id, lit(seed), lit(salt)), lit(1000000)).cast("double") / 1000000.0

  /** 2024-01-01 00:00:00 UTC. */
  private val Epoch0 = 1704067200L

  private def tsAt(offsetSecs: Column): Column =
    timestamp_seconds(lit(Epoch0) + offsetSecs.cast("long"))

  def customers(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val ids = spark.range(n).toDF("customer_id")
    val id = col("customer_id")
    val base = ids.select(
      id,
      concat(lit("Customer "), id).as("full_name"),
      concat(lit("user"), id, lit("@example.com")).as("email"),
      when(u(id, seed, "phone") < 0.30, lit(null).cast("string"))
        .otherwise(concat(lit("+1-555-"),
          lpad(pmod(hash(id, lit(seed)), lit(10000)).cast("string"), 4, "0"))).as("phone"),
      when(u(id, seed, "addr") < 0.20, lit(null).cast("string"))
        .otherwise(concat(lit("No. "), id, lit(" Example Street"))).as("address"),
      when(u(id, seed, "dob") < 0.01, to_date(lit("2021-01-01")))  // impossible: age ~3
        .otherwise(date_sub(to_date(lit("2000-01-01")),
          (u(id, seed, "dobd") * 365 * 50).cast("int"))).as("date_of_birth"),
      tsAt(u(id, seed, "cts") * 86400 * 30).as("created_at"))
      .withColumn("updated_at", col("created_at"))
    // ~5% email typos on originals
    val typod = base.withColumn("email",
      when(u(id, seed, "typo") < 0.05, translate(col("email"), "ae", "43"))
        .otherwise(col("email")))
    // ~8% near-duplicates: the same customer re-emitted under a new
    // surrogate id with a typo'd email — the fuzzy-dedup target.
    val dups = typod.filter(u(id, seed, "dup") < 0.08)
      .withColumn("customer_id", id + n)
      .withColumn("email", translate(col("email"), "ae", "43"))
    // ~4% second dup class: same person, email rewritten BEYOND the
    // leet map — a dropped character in the local part plus a domain
    // swap (the reference's '@gmail.com'→'@yahoo.com' rewrite,
    // polished_transactions.py:106). The translate-normalize key
    // cannot recover these; only the blocked levenshtein pass
    // (Quality.fuzzyDuplicatesBlocked) does.
    val dups2 = typod.filter(u(id, seed, "dup2") < 0.04)
      .withColumn("customer_id", id + 2 * n)
      .withColumn("email",
        concat(regexp_replace(regexp_extract(col("email"), "^([^@]+)", 1),
          "^(.{2}).", "$1"), lit("@sample.org")))
    typod.unionByName(dups).unionByName(dups2)
  }

  /** Deterministic snapshot of the generated OLTP corpus as parquet
    * (written once, skipped when present) — the oracle-checkable form:
    * DuckDB reads the same files the report queries read. */
  def materializeQualityCorpus(spark: SparkSession,
      dir: String = qualityCorpusDir,
      nCustomers: Long = 2000, nAccounts: Long = 3000, nTx: Long = 10000): Unit = {
    import java.nio.file.{Files, Paths}
    val tables = Seq("customers", "accounts", "transactions")
    if (tables.forall(t => Files.exists(Paths.get(s"$dir/$t.parquet")))) return
    customers(spark, nCustomers).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/customers.parquet")
    accounts(spark, nCustomers, nAccounts).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/accounts.parquet")
    transactions(spark, nAccounts, nTx).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/transactions.parquet")
  }

  def qualityCorpusDir: String =
    sys.env.getOrElse("GRAFT_QUALITY_DIR", "/root/repo/fixtures/quality")

  def accounts(spark: SparkSession, nCustomers: Long, n: Long, seed: Long = 42L): DataFrame = {
    val ids = spark.range(n).toDF("account_id")
    val id = col("account_id")
    ids.select(
      id,
      pmod(hash(id, lit(seed), lit("cust")), lit(nCustomers)).as("customer_id"),
      format_string("ACC-%08d", id).as("account_number"),
      element_at(array(lit("Savings"), lit("Checking"), lit("Investment"), lit("Credit")),
        (pmod(hash(id, lit(seed), lit("atype")), lit(4)) + 1).cast("int")).as("account_type"),
      when(u(id, seed, "neg") < 0.02,
        round(-u(id, seed, "negamt") * 500 - 0.01, 2).cast("decimal(15,2)"))
        .otherwise(round(u(id, seed, "bal") * 10000, 2).cast("decimal(15,2)")).as("balance"),
      lit("USD").as("currency"),
      when(u(id, seed, "status") < 0.87, "active")
        .when(u(id, seed, "status") < 0.95, "inactive")
        .otherwise("closed").as("status"),
      tsAt(u(id, seed, "ots") * 86400 * 30).as("opened_at"))
      .withColumn("created_at", col("opened_at"))
      .withColumn("updated_at", col("opened_at"))
  }

  def transactions(spark: SparkSession, nAccounts: Long, n: Long, seed: Long = 42L): DataFrame = {
    val ids = spark.range(n).toDF("transaction_id")
    val id = col("transaction_id")
    // Consecutive ids (2k, 2k+1) form a pair; ~2% of pairs are circular
    // transfers: A->B on the even id, B->A on the odd id, same day —
    // the exact pattern the J4 self-join flags.
    val pairId = expr("transaction_id DIV 2")
    val isCirc = u(pairId, seed, "circ") < 0.02
    val acctA = pmod(hash(pairId, lit(seed), lit("circA")), lit(nAccounts))
    val acctB = pmod(hash(pairId, lit(seed), lit("circB")), lit(nAccounts))
    val isEven = pmod(id, lit(2)) === 0
    val tu = u(id, seed, "ttype")
    val su = u(id, seed, "tstat")
    val baseSec = u(id, seed, "tts") * 86400 * 30
    val pairSec = u(pairId, seed, "ptts") * 86400 * 30
    ids.select(
      id,
      when(isCirc, when(isEven, acctA).otherwise(acctB))
        .otherwise(pmod(hash(id, lit(seed), lit("acct")), lit(nAccounts))).as("account_id"),
      when(isCirc, "Transfer")
        .when(tu < 0.35, "Deposit").when(tu < 0.65, "Withdrawal")
        .when(tu < 0.90, "Transfer").when(tu < 0.98, "Payment")
        .otherwise("Refund").as("transaction_type"),
      round(u(id, seed, "amt") * 2000 + 1, 2).cast("decimal(15,2)").as("amount"),
      lit("USD").as("currency"),
      // circular pairs share a day; ~5% late by 5-30 days; ~1% future
      when(isCirc, tsAt(pairSec))
        .when(u(id, seed, "late") < 0.05,
          tsAt(baseSec - (u(id, seed, "lated") * 25 + 5).cast("int") * 86400))
        .when(u(id, seed, "future") < 0.01, tsAt(baseSec + lit(3 * 86400)))
        .otherwise(tsAt(baseSec)).as("transaction_date"),
      concat(lit("tx "), id).as("description"),
      when(isCirc, when(isEven, acctB).otherwise(acctA))
        .when(tu >= 0.65 && tu < 0.90,
          pmod(hash(id, lit(seed), lit("rel")), lit(nAccounts)))
        .otherwise(lit(null).cast("long")).as("related_account_id"),
      when(su < 0.90, "completed").when(su < 0.97, "pending")
        .otherwise("failed").as("status"),
      // created_at models INGEST time: always the unshifted base, so a
      // late arrival is transaction_date << created_at and a
      // future-dated row is transaction_date > created_at — exactly
      // what the reference's validation queries measure.
      when(isCirc, tsAt(pairSec)).otherwise(tsAt(baseSec)).as("created_at"))
      .withColumn("updated_at", col("created_at"))
  }

  /** Shared boilerplate paragraph planted on ~10% of documents — the
    * [[graft.operators.Dedup.stripBoilerplate]] target. */
  val BoilerPara: String =
    "subscribe to our newsletter for updates and follow us on social media"

  /** Deterministic LLM-corpus generator with the same schema as the
    * driver's `documents` table (doc_id, text, lang, source, n_chars)
    * and PLANTED curation structure, so the dedup/curation stack can
    * be exercised — and its recall asserted — at ANY scale:
    *
    *  - ~4% exact duplicates and ~4% near-duplicates (one word
    *    substituted): both copy the base text of a hash-picked other
    *    id (`ck`). Text is a pure function of `ck`, so same-ck docs
    *    are bit-identical; a near-dup shares all but one of its
    *    20-79 words (Jaccard >> 0.5).
    *  - ~10% of content keys carry a shared boilerplate paragraph
    *    prepended as its own `\n\n` segment (a function of `ck`, so
    *    dup groups stay internally identical).
    *  - Zipf-ish vocabulary (u^2.5 over 5000 stems) so shingle/token
    *    frequencies are skewed like real text, not uniform.
    *
    * Like the OLTP generators, every column is a pure function of
    * (seed, id) via murmur3 over `spark.range` — identical output for
    * any partition count or cluster size, no data ever funnelled
    * through the driver. This powers `tools.Stress` (gate-scale ×10,
    * ×100 runs of the heavy operators); the driver's oracle queries
    * keep reading the driver's own parquet, never this. */
  def documents(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val ids = spark.range(n).toDF("doc_id")
    val id = col("doc_id")
    val du = u(id, seed, "dup")
    // content key: exact dups (du<.04) and near-dups (.04<=du<.08)
    // both read another id's base text
    val ck = when(du < 0.08, pmod(hash(id, lit(seed), lit("pick")), lit(n)).cast("long"))
      .otherwise(id)
    val withCk = ids.select(id, ck.as("ck"), du.as("du"))
    val ckc = col("ck")
    val nWords = (pmod(hash(ckc, lit(seed), lit("len")), lit(60)) + lit(20)).cast("int")
    // zipf-ish stem id: pow(u, 2.5) concentrates mass on small ids
    val words = transform(sequence(lit(0), nWords - 1), i =>
      concat(lit("w"), floor(pow(
        pmod(hash(ckc, lit(seed), lit("w"), i), lit(1000000)).cast("double") / 1000000.0,
        lit(2.5)) * 5000).cast("long")))
    // near-dup: one hash-picked position rewritten to a word unique to
    // THIS doc (function of id, not ck — the copy must differ)
    val ndPos = pmod(hash(id, lit(seed), lit("ndpos")), nWords)
    val wordsNd = when(col("du") >= 0.04 && col("du") < 0.08,
        transform(words, (x, i) =>
          when(i === ndPos, concat(lit("nd"), id)).otherwise(x)))
      .otherwise(words)
    val body = array_join(wordsNd, " ")
    val text = when(u(ckc, seed, "bp") < 0.10,
      concat(lit(BoilerPara), lit("\n\n"), body)).otherwise(body)
    withCk.select(
      id,
      text.as("text"),
      when(u(ckc, seed, "lang") < 0.44, "en")
        .when(u(ckc, seed, "lang") < 0.57, "fr")
        .when(u(ckc, seed, "lang") < 0.715, "es")
        .when(u(ckc, seed, "lang") < 0.855, "de")
        .otherwise("zh").as("lang"),
      concat(lit("src"), pmod(hash(id, lit(seed), lit("src")), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")))
  }

  /** Deterministic embedding generator matching the driver's
    * `embeddings` schema (vec_id, embedding float[dim], label), with
    * ~5% planted near-duplicate vectors: a dup copies a hash-picked
    * other id's base vector and perturbs ONE coordinate by +0.01 —
    * cosine ≈ 0.999, the [[graft.operators.Ann]] near-dup target.
    * Pure function of (seed, id); partition-invariant. */
  def embeddings(spark: SparkSession, n: Long, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val ids = spark.range(n).toDF("vec_id")
    val id = col("vec_id")
    val du = u(id, seed, "vdup")
    val ck = when(du < 0.05, pmod(hash(id, lit(seed), lit("vpick")), lit(n)).cast("long"))
      .otherwise(id)
    val withCk = ids.select(id, ck.as("ck"), du.as("du"))
    val ckc = col("ck")
    val base = transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(hash(ckc, lit(seed), lit("e"), i), lit(2000001)).cast("double")
        / 1000000.0 - 1.0) * 0.2)
    val pPos = pmod(hash(id, lit(seed), lit("vpos")), lit(dim))
    val emb = when(col("du") < 0.05,
        transform(base, (x, i) => when(i === pPos, x + 0.01).otherwise(x)))
      .otherwise(base)
    withCk.select(
      id,
      emb.cast("array<float>").as("embedding"),
      pmod(hash(ckc, lit(seed), lit("lbl")), lit(8)).cast("int").as("label"))
  }
}
