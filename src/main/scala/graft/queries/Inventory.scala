package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** One declared query: a Spark DataFrame program + (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables.
  *
  * Determinism contract (SURVEY.md §2.11): every query has an explicit
  * total-order ORDER BY, rounds derived doubles before ordering/output,
  * and uses fixed literals — so the driver's hash compare is stable
  * across engines.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Scoped caching for query bodies that hit an expensive intermediate
  * from several plan branches (q11's JSON decode, p02's shingle set). */
private[queries] object Caching {

  /** Persist the intermediates, materialize them EAGERLY (branches
    * racing to fill an unmaterialized cache duplicate the upstream
    * work — measured in round 1), evaluate the query's bounded final
    * result, and unpersist before returning. The caller gets the
    * result as a local frame, so no persisted RDDs outlive the query
    * function — callers other than Verify/Bench (which clearCache()
    * defensively) can no longer leak cache. Only for queries whose
    * output is inherently bounded (top-k limits / planted-anomaly
    * pairs): the collect moves the final k rows, never corpus data. */
  def withCached(cached: DataFrame*)(body: => DataFrame): DataFrame = {
    cached.foreach(_.persist())
    cached.foreach(_.count())
    try {
      val out = body
      val rows = java.util.Arrays.asList(out.collect(): _*)
      out.sparkSession.createDataFrame(rows, out.schema)
    } finally cached.foreach(_.unpersist())
  }
}

/** The declared relational inventory Q1–Q32 (SURVEY.md §2.11) —
  * the reference's capability surface re-expressed Spark-first.
  * Reference behaviors cited per query (file:line in /root/reference).
  */
object Inventory {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** cosine(a, b) over array<double> via the codegen'd DotProduct
    * expression (graft.functions.Vectors). */
  def cosine(a: Column, b: Column): Column = graft.functions.Vectors.cosine(a, b)

  val defs: Seq[QueryDef] = Seq(

    // Q1 [S1,P1,O1] full scan + projection (psql_connector.py:112-134)
    QueryDef("q01_scan_project",
      (s, d) => T(s, d, "customer")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("bal"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Q2 [S2] incremental watermark scan (batch_ingestion_pipeline.py:78-82)
    QueryDef("q02_incremental_scan",
      (s, d) => T(s, d, "events")
        .filter(col("ts") > lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE ts > TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id""".stripMargin)),

    // Q3 [P2] equality predicate (oltp_seeder.py:312-317)
    QueryDef("q03_eq_filter",
      (s, d) => T(s, d, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, ROUND(o_totalprice, 2) AS price FROM orders
             |WHERE o_orderstatus = 'O' ORDER BY o_orderkey""".stripMargin)),

    // Q4 [P4,F7] range + interval arithmetic (polished_transactions.py:163-168)
    QueryDef("q04_interval_range",
      (s, d) => T(s, d, "orders")
        .filter(col("o_orderdate") > expr("DATE '2000-01-01' - INTERVAL '90' DAY"))
        .select("o_orderkey")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_orderdate > DATE '2000-01-01' - INTERVAL 90 DAY
             |ORDER BY o_orderkey""".stripMargin)),

    // Q5 [J5,P6] anti-join orphan detection (oltp_seeder.py:50)
    QueryDef("q05_anti_join",
      (s, d) => T(s, d, "customer")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey"),
      Some("""SELECT c.c_custkey FROM customer c
             |LEFT JOIN orders o ON c.c_custkey = o.o_custkey
             |WHERE o.o_orderkey IS NULL ORDER BY c.c_custkey""".stripMargin)),

    // Q6 [P3] negative-balance validation (polished_transactions.py:460)
    QueryDef("q06_neg_balance",
      (s, d) => T(s, d, "customer")
        .filter(col("c_acctbal") < 0)
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, ROUND(c_acctbal, 2) AS bal FROM customer
             |WHERE c_acctbal < 0 ORDER BY c_custkey""".stripMargin)),

    // Q7 [P7,F10] date-trunc equality (oltp_seeder.py:522-525)
    QueryDef("q07_date_eq",
      (s, d) => T(s, d, "events")
        .filter(to_date(col("ts")) === lit("2024-01-15").cast("date"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM events
             |WHERE CAST(ts AS DATE) = DATE '2024-01-15'""".stripMargin)),

    // Q8 [J1] IN-subquery semi-join (polished_transactions.py:475-481)
    QueryDef("q08_semi_join",
      (s, d) => T(s, d, "orders")
        .join(T(s, d, "customer").filter(col("c_acctbal") < 0),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
             |ORDER BY o_orderkey""".stripMargin)),

    // Q9 [J3,J6,A5] 3-way join + group aggregation (README.md:35-40 gold revenue)
    QueryDef("q09_join3_agg",
      (s, d) => {
        val c = T(s, d, "customer"); val o = T(s, d, "orders"); val l = T(s, d, "lineitem")
        // Money math in DECIMAL: double sums diverge across engines in the
        // last ulp (addition order), which flips ROUND at .005 boundaries.
        // Decimal sums are exact and associative → engine-independent.
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy("c_custkey")
          .agg(
            round(sum(col("l_extendedprice").cast("decimal(12,4)")
              * (lit(1) - col("l_discount").cast("decimal(6,4)"))), 2)
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c.c_custkey,
             |       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
             |                      * (1 - CAST(l.l_discount AS DECIMAL(6,4)))), 2)
             |            AS DOUBLE) AS revenue,
             |       COUNT(*) AS n_items
             |FROM customer c
             |JOIN orders o ON c.c_custkey = o.o_custkey
             |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin)),

    // Q10 [J6] broadcast dim join (northwind.sql:3809-3874 join graph)
    QueryDef("q10_broadcast_join",
      (s, d) => T(s, d, "nation")
        .join(broadcast(T(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey"),
      Some("""SELECT n.n_nationkey, n.n_name, r.r_name FROM nation n
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |ORDER BY n.n_nationkey""".stripMargin)),

    // Q11 [J4,F17] self-join circular transfers (polished_transactions.py:364-375)
    QueryDef("q11_self_join_circular",
      (s, d) => {
        // Scoped cache: both sides of the self-join need the
        // JSON-decoded projection; without caching the scan+parse runs
        // twice, and withCached releases it before returning.
        val tr = T(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id").as("src"),
            get_json_object(col("props"), "$.k").cast("int").as("dst"))
        Caching.withCached(tr) {
          val a = tr.as("a"); val b = tr.as("b")
          a.join(b,
              col("a.src") === col("b.dst") && col("a.dst") === col("b.src") &&
              col("a.event_id") < col("b.event_id"))
            .select(col("a.event_id").as("e1"), col("b.event_id").as("e2"))
            .orderBy("e1", "e2")
        }
      },
      Some("""WITH transfers AS (
             |  SELECT event_id, user_id AS src,
             |         CAST(props->>'$.k' AS INT) AS dst
             |  FROM events WHERE event_type = 'purchase')
             |SELECT a.event_id AS e1, b.event_id AS e2
             |FROM transfers a JOIN transfers b
             |  ON a.src = b.dst AND a.dst = b.src AND a.event_id < b.event_id
             |ORDER BY e1, e2""".stripMargin)),

    // Q12 [A2,A6] HAVING on grouped count
    QueryDef("q12_having",
      (s, d) => T(s, d, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .filter(col("n") > 3)
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
             |HAVING COUNT(*) > 3 ORDER BY o_custkey""".stripMargin)),

    // Q13 [A1-A3,A6] multi-aggregate with filter (TPC-H Q1 shape)
    QueryDef("q13_multi_agg",
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity").cast("decimal(12,4)")), 2)
            .cast("double").as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(12,4)")), 2)
            .cast("double").as("sum_base"),
          // exact decimal sum → identical double quotient on both engines
          round(sum(col("l_discount").cast("decimal(12,4)")).cast("double")
            / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE)      AS sum_qty,
             |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base,
             |       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
             |       COUNT(*)                       AS n
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Q14 [A8] exact distinct counts (oltp_seeder.py:106-142 email set)
    QueryDef("q14_distinct_count",
      (s, d) => T(s, d, "lineitem")
        .agg(
          countDistinct(col("l_partkey")).as("d_part"),
          countDistinct(col("l_suppkey")).as("d_supp")),
      Some("""SELECT COUNT(DISTINCT l_partkey) AS d_part,
             |       COUNT(DISTINCT l_suppkey) AS d_supp FROM lineitem""".stripMargin)),

    // Q15 [A10] rollup subtotals (README.md:34-40 dashboard subtotals)
    QueryDef("q15_rollup",
      (s, d) => T(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders
             |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // Q16 [O2] top-k with tiebreak (database_seeder.py:136-139)
    QueryDef("q16_topk",
      (s, d) => T(s, d, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, ROUND(o_totalprice, 2) AS price FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Q17 [O3,J2,F16] deterministic "random" sample (oltp_seeder.py:248-251)
    QueryDef("q17_hash_sample",
      (s, d) => T(s, d, "customer")
        .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
        .select("c_custkey")
        .limit(20),
      Some("""SELECT c_custkey FROM customer
             |ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey LIMIT 20""".stripMargin)),

    // Q18 [A4,O4] dynamic (count-proportional) limit — two-step program
    // (polished_transactions.py:163-168: LIMIT (SELECT COUNT(*)*0.15 ...))
    QueryDef("q18_dynamic_limit",
      (s, d) => {
        val c = T(s, d, "customer")
        val n = math.ceil(c.count() * 0.15).toInt
        c.select("c_custkey").orderBy("c_custkey").limit(n)
      },
      Some("""SELECT c_custkey FROM (
             |  SELECT c_custkey,
             |         ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn,
             |         COUNT(*) OVER () AS total
             |  FROM customer) t
             |WHERE rn <= CEIL(0.15 * total) ORDER BY c_custkey""".stripMargin)),

    // Q19 [W1,W3] ranking: first 3 orders per customer
    QueryDef("q19_rank_per_group",
      (s, d) => T(s, d, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn"),
      Some("""SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
             |  SELECT o_custkey, o_orderkey,
             |         ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                            ORDER BY o_orderdate, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // Q20 [W4] running total with explicit frame (ledger running balance)
    QueryDef("q20_running_total",
      (s, d) => T(s, d, "orders")
        .withColumn("run_tot", round(sum("o_totalprice").over(
          Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .select("o_custkey", "o_orderkey", "run_tot")
        .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey,
             |       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_tot
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Q21 [W2] SCD2-style validity intervals via LEAD (README.md:27)
    QueryDef("q21_scd2_lead",
      (s, d) => T(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
          lead("ts", 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("valid_to"))
        .orderBy("user_id", "event_id"),
      Some("""SELECT user_id, event_id, ts AS valid_from,
             |       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // Q22a [U3] intersect (reconciliation, batch_ingestion_pipeline.py:94-96)
    QueryDef("q22_intersect",
      (s, d) => T(s, d, "customer").filter(col("c_acctbal") > 0).select("c_custkey")
        .intersect(T(s, d, "orders").select("o_custkey"))
        .orderBy("c_custkey"),
      Some("""(SELECT c_custkey FROM customer WHERE c_acctbal > 0
             |INTERSECT SELECT o_custkey FROM orders) ORDER BY c_custkey""".stripMargin)),

    // Q22b [U1] except / new-keys-only (oltp_seeder.py:127)
    QueryDef("q22_except",
      (s, d) => T(s, d, "customer").filter(col("c_acctbal") > 0).select("c_custkey")
        .except(T(s, d, "orders").select("o_custkey"))
        .orderBy("c_custkey"),
      Some("""(SELECT c_custkey FROM customer WHERE c_acctbal > 0
             |EXCEPT SELECT o_custkey FROM orders) ORDER BY c_custkey""".stripMargin)),

    // Q23 [F1-F5] string functions (oltp_seeder.py:122-132,274-277)
    QueryDef("q23_string_funcs",
      (s, d) => T(s, d, "customer")
        .select(col("c_custkey"),
          concat(lit("ACC-"), lpad(col("c_custkey").cast("string"), 8, "0")).as("acc_no"),
          translate(lower(col("c_name")), "ae", "43").as("fuzzed"),
          substring(col("c_name"), 1, 10).as("name10"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |       'ACC-' || LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS acc_no,
             |       TRANSLATE(LOWER(c_name), 'ae', '43')               AS fuzzed,
             |       SUBSTRING(c_name, 1, 10)                           AS name10
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Q24 [F8-F11] date parts (oltp_seeder.py:98-102,375-377)
    QueryDef("q24_date_parts",
      (s, d) => T(s, d, "orders")
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("order_month"),
          when(dayofmonth(col("o_orderdate")) >= 28, 1).otherwise(0).as("month_end"),
          year(col("o_orderdate")).as("yr"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
             |       CASE WHEN EXTRACT(DAY FROM o_orderdate) >= 28 THEN 1 ELSE 0 END AS month_end,
             |       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Q25 [F12-F15] math: round/greatest/least/cast (oltp_seeder.py:423-432)
    QueryDef("q25_math_funcs",
      (s, d) => T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice").cast("decimal(12,4)")
            * (lit(1) - col("l_discount").cast("decimal(6,4)"))
            * (lit(1) + col("l_tax").cast("decimal(6,4)")), 2)
            .cast("double").as("charged"),
          round(greatest(lit(0.0), col("l_extendedprice") - 2000.0), 2).as("over2k"),
          least(col("l_quantity"), lit(25.0)).as("capped"),
          col("l_quantity").cast("int").as("qty_i"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,4))
             |                  * (1 - CAST(l_discount AS DECIMAL(6,4)))
             |                  * (1 + CAST(l_tax AS DECIMAL(6,4))), 2) AS DOUBLE) AS charged,
             |       ROUND(GREATEST(0.0, l_extendedprice - 2000.0), 2)          AS over2k,
             |       LEAST(l_quantity, 25.0)                                    AS capped,
             |       CAST(l_quantity AS INT)                                    AS qty_i
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Q26 [F17] JSON extraction (psql_connector.py:139-140 config JSON)
    QueryDef("q26_json_extract",
      (s, d) => T(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // Q27 [W1,A8,F16] dedup keep-first by content hash (oltp_seeder.py:115-126).
    // Routed through the library operator so the gate exercises the
    // skew-safe owner-aggregation form (the ROW_NUMBER oracle below is
    // the semantically-equal declarative spec).
    QueryDef("q27_dedup_hash",
      (s, d) => graft.operators.Dedup.exactKeepFirst(T(s, d, "documents"))
        .select("doc_id")
        .orderBy("doc_id"),
      Some("""SELECT doc_id FROM (
             |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text)
             |                                    ORDER BY doc_id) AS rn
             |  FROM documents) t
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // Q28 [T2 batch-form] tumbling hourly windows (batch_ingestion_pipeline.py:94-96)
    QueryDef("q28_tumbling_window",
      (s, d) => T(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("h", "event_type"),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
             |       COUNT(*) AS n, ROUND(SUM(value), 2) AS total
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q29 [T3,T6 batch-form] late / future-dated counts (polished:377-390,463-467)
    QueryDef("q29_late_future",
      (s, d) => T(s, d, "events")
        .agg(
          sum(when(col("ts") > lit("2024-01-28 00:00:00").cast("timestamp"), 1)
            .otherwise(0)).as("future_ct"),
          sum(when(col("ts") < lit("2024-01-05 00:00:00").cast("timestamp"), 1)
            .otherwise(0)).as("late_ct")),
      Some("""SELECT CAST(SUM(CASE WHEN ts > TIMESTAMP '2024-01-28 00:00:00'
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS future_ct,
             |       CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-05 00:00:00'
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS late_ct
             |FROM events""".stripMargin)),

    // Q30 [A5] signed conditional ledger aggregation (oltp_seeder.py:450-470)
    QueryDef("q30_signed_ledger",
      (s, d) => T(s, d, "events")
        .groupBy("user_id")
        .agg(
          round(sum(when(col("event_type") === "purchase", col("value"))
            .otherwise(0.0)), 2).as("spent"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("errors"),
          count(lit(1)).as("n"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS spent,
             |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)  AS errors,
             |       COUNT(*)                                                               AS n
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q31 [X4,F18] text analysis: token frequency top-20
    QueryDef("q31_token_freq",
      (s, d) => T(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("token"))
        .limit(20),
      Some("""SELECT token, COUNT(*) AS c FROM (
             |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
             |GROUP BY token ORDER BY c DESC, token LIMIT 20""".stripMargin)),

    // Q32 [X1,X3,F18] cosine similarity top-10 vs vec_id=0
    QueryDef("q32_cosine_topk",
      (s, d) => {
        val e = T(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        val q = e.filter(col("vec_id") === 0).select(col("emb").as("qemb"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), round(cosine(col("emb"), col("qemb")), 3).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
      },
      Some("""SELECT vec_id, sim FROM (
             |  SELECT e.vec_id,
             |         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |                                      CAST(q.embedding AS DOUBLE[])), 3) AS sim
             |  FROM embeddings e,
             |       (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |  WHERE e.vec_id <> 0) t
             |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
