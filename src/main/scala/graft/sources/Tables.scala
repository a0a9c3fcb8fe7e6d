package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Design note (100 TB): each loader returns a lazily-planned scan, so
  * Catalyst pushes filters/projections into the parquet reader
  * (`PushedFilters`/`ReadSchema` in explain). No caching, no collect —
  * callers compose plans and the optimizer prunes.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) (FIXTURES.md A). Spark's
    * vectorized reader does not support nano timestamps directly; with
    * `spark.sql.legacy.parquet.nanosAsLong` it surfaces as LongType
    * nanos-since-epoch, which we convert losslessly (fixture data is
    * micro-aligned; DuckDB's oracle reads the same values as
    * TIMESTAMP micros) via integer division — never double division,
    * which loses precision above 2^53 ns.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _        => raw
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }
  }

  /** Register every fixture table as a temp view for SQL entry points. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
