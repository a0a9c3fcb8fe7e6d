package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Small metadata utilities completing SURVEY §2 rows S5/S6/P11 — the
  * reference's connector introspection surface
  * (psql_connector.py:78-110, PostgreSQL/test.py:31-44). */
object Meta {

  /** P11: SELECT-statement classifier. The reference token-sniffs with
    * sqlparse; here the real parser decides — a statement is a query
    * iff it parses to a plan that is not a command/DDL/DML node. */
  def isSelectStatement(spark: SparkSession, sql: String): Boolean =
    try {
      val plan = spark.sessionState.sqlParser.parsePlan(sql)
      val name = plan.getClass.getSimpleName
      // command-ish plans live outside the query algebra
      !(name.endsWith("Command") || name.contains("Insert") ||
        name.contains("Create") || name.contains("Drop") ||
        name.contains("Delete") || name.contains("Update"))
    } catch { case _: Throwable => false }

  /** S5: total bytes under a table path (pg_total_relation_size
    * analog — file bytes are the only physical size Spark owns). */
  def tableSizeBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength
  }

  /** One-pass column profiler — the stats surface behind the
    * reference's planned "data quality tests with dbt tests" roadmap
    * item (README.md:28) and its printed seeder quality summary
    * (oltp_seeder.py:154), as data: one row per column with row count, null
    * count, distinct count, and typed min/max — numerics and
    * timestamps land in `min_num`/`max_num` (timestamps as epoch
    * seconds, micros in the fraction — the cross-engine-exact double),
    * strings in `min_str`/`max_str` (binary collation in both
    * engines), other types profile counts only.
    *
    * Scale shape: ONE aggregation job either way, but `exact = true`
    * plans multi-column COUNT(DISTINCT) via Expand — the scan's rows
    * replicate once per profiled column before the partial aggregate,
    * which is the honest cost of exact cardinalities. At 100 TB run
    * `exact = false`: approx_count_distinct keeps a fixed-size HLL per
    * column inside a single true pass with map-side combine (MetaSpec
    * pins the approximation within 5% of exact on the gate tables).
    * Output: col, n, n_null, n_distinct, min_num, max_num, min_str,
    * max_str — ordered by column name. */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    def slug(i: Int, what: String) = s"_p${i}_$what"
    val aggs: Seq[Column] = count(lit(1)).cast("long").as("_n") +: fields.zipWithIndex.flatMap {
      case (f, i) =>
        val c = col(f.name)
        val numeric = f.dataType match {
          case _: NumericType | _: TimestampType => Some(c.cast("double"))
          // NTZ has no direct double cast; the session runs UTC, so the
          // timestamp hop is the identity wall-clock epoch DuckDB uses
          case _: TimestampNTZType => Some(c.cast("timestamp").cast("double"))
          case _ => None
        }
        val str = f.dataType match {
          case _: StringType => Some(c)
          case _ => None
        }
        Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).cast("long").as(slug(i, "null")),
          (if (exact) countDistinct(c) else approx_count_distinct(c))
            .cast("long").as(slug(i, "dist")),
          min(numeric.getOrElse(lit(null).cast("double"))).as(slug(i, "minn")),
          max(numeric.getOrElse(lit(null).cast("double"))).as(slug(i, "maxn")),
          min(str.getOrElse(lit(null).cast("string"))).as(slug(i, "mins")),
          max(str.getOrElse(lit(null).cast("string"))).as(slug(i, "maxs")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      struct(lit(f.name).as("col"), col("_n").as("n"),
        col(slug(i, "null")).as("n_null"), col(slug(i, "dist")).as("n_distinct"),
        col(slug(i, "minn")).as("min_num"), col(slug(i, "maxn")).as("max_num"),
        col(slug(i, "mins")).as("min_str"), col(slug(i, "maxs")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy("col")
  }

  /** Profile DIFF between two table snapshots — the schema-drift +
    * column-drift monitor a lakehouse runs between refreshes (the
    * audit sibling of Quality.corpusDiff, at COLUMN granularity):
    * added/removed columns, type changes, and per-column null-rate /
    * distinct-count movement, from one [[profile]] pass per side.
    * A silently added column, a type widened by an upstream schema
    * merge, or a null-rate jump from a broken extractor all surface
    * as one diffable row.
    *
    * Scale: [[profile]] is one aggregation pass per side (ONE job,
    * all columns at once); the diff joins two columns-sized frames.
    * null_frac is 6dp-rounded so the row is engine-comparable.
    * Output: col, dtype_a, dtype_b, status ∈ {added, removed, kept},
    * type_changed, n_a, n_b, null_frac_a, null_frac_b, n_distinct_a,
    * n_distinct_b (ordered by col). */
  def profileDiff(old: DataFrame, curr: DataFrame,
      exact: Boolean = true): DataFrame = {
    val spark = old.sparkSession
    import spark.implicits._
    def side(df: DataFrame, suf: String): DataFrame = {
      val types = df.schema.fields.toSeq
        .map(f => (f.name, f.dataType.simpleString))
        .toDF("col", s"dtype$suf")
      profile(df, exact)
        .select(col("col"), col("n").as(s"n$suf"),
          when(col("n") > 0,
            round(col("n_null").cast("double") / col("n"), 6))
            .as(s"null_frac$suf"),
          col("n_distinct").as(s"n_distinct$suf"))
        .join(types, Seq("col"))
    }
    side(old, "_a").join(side(curr, "_b"), Seq("col"), "full_outer")
      .select(col("col"), col("dtype_a"), col("dtype_b"),
        when(col("dtype_a").isNull, "added")
          .when(col("dtype_b").isNull, "removed")
          .otherwise("kept").as("status"),
        coalesce(col("dtype_a") =!= col("dtype_b"), lit(false))
          .as("type_changed"),
        col("n_a"), col("n_b"), col("null_frac_a"), col("null_frac_b"),
        col("n_distinct_a"), col("n_distinct_b"))
      .orderBy("col")
  }

  /** S6: engine version/info dict analog. */
  def info(spark: SparkSession): Map[String, String] = Map(
    "engine" -> "graft",
    "spark_version" -> spark.version,
    "scala_version" -> util.Properties.versionNumberString,
    "master" -> spark.sparkContext.master)
}
