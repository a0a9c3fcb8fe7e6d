package graft

import org.apache.spark.sql.DataFrame
import graft.sources.Tables

/** SQL front door parity (r10 verdict #6): every q-row's oracle SQL —
  * the portable-dialect string the driver runs in DuckDB — is replayed
  * through `spark.sql` over temp views of the SAME fixture tables and
  * must match the DataFrame form row for row. Two things are guarded:
  * dialect drift (an oracle edit that silently stops describing the
  * DataFrame plan), and the SQL entry point itself — the reference's
  * consumers submit SQL strings (`connector_config.py:99-157`), so the
  * portable oracle doubles as the user-facing front door and must
  * actually run on Spark where the dialect permits.
  *
  * Exclusions are DuckDB-only constructs Spark cannot parse or
  * evaluates differently, each named; the exclusion set is asserted
  * EXACTLY — a parse-level exclusion that starts passing fails the
  * suite until removed, so the list can only shrink.
  */
class SqlParitySpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Pure SPELLING shims — the same operation written in the other
  // engine's surface syntax, no semantic change:
  //  - DuckDB's read_parquet part-file-glob table function -> Spark's
  //    parquet.-backtick directory reference (same files, same schema;
  //    the Northwind rows, whose fixture lives outside the sf dir)
  //  - the ->> JSON text-extraction operator -> get_json_object (both
  //    return the scalar as text)
  //  - CAST(... AS VARCHAR) -> AS STRING (Spark demands a VARCHAR
  //    length; STRING is its unparameterized spelling)
  private def shim(sql: String): String = {
    val a = "read_parquet\\('([^']+)/\\*\\.parquet'\\)".r
      .replaceAllIn(sql, m => s"parquet.`${m.group(1)}`")
    val b = "([A-Za-z_][A-Za-z0-9_.]*)->>'([^']+)'".r
      .replaceAllIn(a, m => scala.util.matching.Regex.quoteReplacement(
        s"get_json_object(${m.group(1)}, '${m.group(2)}')"))
    b.replace("AS VARCHAR)", "AS STRING)")
  }

  /** Dialect-bound q-rows. Reasons starting with "runs but" are
    * SEMANTIC (Spark parses the SQL but a function disagrees) and are
    * not failure-asserted; everything else must keep failing to parse
    * or analyze, or the exclusion is stale and the suite says so. */
  private val excluded: Map[String, String] = Map(
    "q31_token_freq" ->
      "DuckDB unnest(string_split(...)) table function in FROM",
    "q32_cosine_topk" ->
      "DuckDB list comprehension [a[i]*b[i] FOR i IN ...] + list_reduce")

  private def canon(df: DataFrame): (Seq[String], Seq[Seq[String]]) = {
    val cols = df.columns.sorted.toSeq
    val sel = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val rows = sel.collect().toSeq
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
      .sortBy(_.mkString(""))
    (cols, rows)
  }

  /** r/p rows whose oracle SQL happens to be Spark-parseable TODAY —
    * probed across all 128 (r11): these 29 ran AND matched the
    * DataFrame form bit for bit, and ZERO parseable rows differed (the
    * other 99 fail to parse on DuckDB list comprehensions /
    * list_reduce / table functions; the 7 r103–r109 rows added later
    * in r11 are all list-comprehension/list_reduce/string_split-bound
    * and fail to parse the same way). Asserted as a fixed regression
    * list: an edit that makes one of these stop matching — or stop
    * parsing — fails here. */
  private val extendedParity = Seq(
    "p11_fingerprints", "p15_fuzzy_dedup", "r100_winsorize_by",
    "r102_transitions_bucketed", "r33_pivot", "r34_cube",
    "r35_union_dedup", "r36_lag", "r37_asof_join", "r38_sliding_window",
    "r40_grouping_sets", "r43_session_window", "r46_stratified_sample",
    "r50_domain_mix", "r54_temperature_mix", "r56_corpus_diff",
    "r73_histogram_quantiles", "r79_range_join", "r80_overlap_join",
    "r81_topk_agg", "r83_bloom_join", "r85_salted_join",
    "r88_temporal_split", "r90_robust_binned", "r93_psi_drift",
    "r94_profile_diff", "r95_funnel", "r97_winsorize", "r98_transitions")

  test("extended parity: the 29 Spark-parseable r/p oracle rows match the DataFrame form") {
    tables.foreach(t =>
      Tables.load(spark, sf, t).createOrReplaceTempView(t))
    val problems = scala.collection.mutable.ArrayBuffer[String]()
    extendedParity.foreach { name =>
      try {
        val viaSql = canon(spark.sql(shim(SparkEntry.oracleSql(name))))
        val viaDf = canon(SparkEntry.queries(name)(spark, sf))
        if (viaSql != viaDf) problems += s"$name: sql != df"
      } catch {
        case e: Throwable => problems += s"$name: ${e.getClass.getSimpleName}"
      }
      spark.catalog.clearCache()
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("q-rows: spark.sql(oracle SQL) == DataFrame form; exclusion set exact") {
    tables.foreach(t =>
      Tables.load(spark, sf, t).createOrReplaceTempView(t))
    val qRows = SparkEntry.queries.keys.filter(_.startsWith("q")).toSeq.sorted
    assert(qRows.size >= 36, s"expected the 36 q-rows, got ${qRows.size}")
    assert(excluded.keySet.subsetOf(qRows.toSet), "stale exclusion name")
    val problems = scala.collection.mutable.ArrayBuffer[String]()
    var covered = 0
    qRows.foreach { name =>
      SparkEntry.oracleSql.get(name) match {
        case None =>
          problems += s"$name: q-row without oracle SQL"
        case Some(raw) =>
          val sql = shim(raw)
          if (excluded.contains(name)) {
            if (!excluded(name).startsWith("runs but")) {
              val runs =
                try { spark.sql(sql).collect(); true }
                catch { case _: Throwable => false }
              if (runs) problems += s"$name: excluded (${excluded(name)}) " +
                "but spark.sql now runs it — remove the exclusion"
            }
          } else {
            try {
              val viaSql = canon(spark.sql(sql))
              val viaDf = canon(SparkEntry.queries(name)(spark, sf))
              if (viaSql._1 != viaDf._1)
                problems += s"$name: columns ${viaSql._1} vs ${viaDf._1}"
              else if (viaSql._2 != viaDf._2) {
                val i = viaSql._2.zip(viaDf._2).indexWhere(p => p._1 != p._2)
                val detail = if (i >= 0)
                  s"row $i: sql=${viaSql._2(i)} df=${viaDf._2(i)}"
                else s"rows ${viaSql._2.size} vs ${viaDf._2.size}"
                problems += s"$name: values differ — $detail"
              } else covered += 1
            } catch {
              case e: Throwable =>
                problems += s"$name: ${e.getClass.getSimpleName}: " +
                  e.getMessage.linesIterator.take(2).mkString(" | ").take(300)
            }
          }
      }
      spark.catalog.clearCache()
    }
    assert(problems.isEmpty, "\n" + problems.mkString("\n"))
    assert(covered == qRows.size - excluded.size,
      s"covered $covered of ${qRows.size} (excluded ${excluded.size})")
  }
}
