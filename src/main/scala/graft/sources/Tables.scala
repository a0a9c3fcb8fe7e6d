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

  /** `events.ts` normalization shim. The driver's fixture generations
    * have shipped two parquet flavors (FIXTURES.md A):
    *  - TIMESTAMP(NANOS): Spark's vectorized reader does not support
    *    nano timestamps directly; with
    *    `spark.sql.legacy.parquet.nanosAsLong` it surfaces as LongType
    *    nanos-since-epoch, converted losslessly (fixture data is
    *    micro-aligned) via integer division — never double division,
    *    which loses precision above 2^53 ns.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round-6 fixtures):
    *    surfaces as TIMESTAMP_NTZ, cast to TIMESTAMP. Every graft
    *    entry point pins the session timezone to UTC, so the cast is
    *    value-preserving and DuckDB (which reads the same column as a
    *    naive TIMESTAMP) sees identical wall-clock micros.
    * Either way callers — and the streaming event-time paths, which
    * reject TIMESTAMP_NTZ watermarks — always see TimestampType.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  /** Session-scoped RELATION cache (r14): `spark.read.parquet` builds a
    * fresh InMemoryFileIndex and re-reads the footer schema on every
    * call, and the bench/driver resolve each fixture table hundreds of
    * times per run — pure repeated driver-side metadata work. A catalog
    * table would be resolved once; this map is that resolution for the
    * path-based fixtures. Values are UNEXECUTED lazy scans (no data, no
    * cached results — Catalyst still plans/prunes per query; exactly the
    * guide's file-listing-cache point, §6).
    *
    * Eviction (r15, advisor note): weak keys alone can NEVER collect an
    * entry here — the cached DataFrames strongly reference their
    * SparkSession through queryExecution, and a WeakHashMap value that
    * references its key pins the entry — so stopped sessions are purged
    * EXPLICITLY on every access instead (`sparkContext.isStopped`).
    *
    * Staleness contract (r15, advisor note): a cached relation freezes
    * its file listing at first load. The fixture dirs are
    * immutable-per-session by the round contract (the driver generates
    * them once); a caller that regenerates fixtures mid-session must
    * call [[invalidate]] first or later reads see the old listing. */
  private val relations =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  /** Drop cached relations under `dir` (every session) — the hook for
    * fixture-regeneration paths; see the staleness contract above. */
  def invalidate(dir: String): Unit = relations.synchronized {
    val it = relations.values().iterator()
    while (it.hasNext)
      it.next().filterInPlace { case ((d, _), _) => d != dir }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val bySession = relations.synchronized {
      val dead = relations.entrySet().iterator()
      while (dead.hasNext)
        if (dead.next().getKey.sparkContext.isStopped) dead.remove()
      var m = relations.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        relations.put(spark, m)
      }
      m
    }
    bySession.getOrElseUpdate((dir, name), name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    })
  }

  /** Register every fixture table as a temp view for SQL entry points. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** JDBC source — the reference's actual transport (every read is
    * `pd.read_sql` over a live Postgres connection,
    * psql_connector.py:112-134). Returns a lazily-planned scan with the
    * same pushdown surface as the parquet loaders: Catalyst pushes
    * filters into the remote query, `partitionColumn`+`numPartitions`
    * splits the read into `numPartitions` parallel range queries so a
    * big table arrives as a distributed scan, not one connection.
    *
    * Exercised end-to-end against embedded Derby (JdbcSpec, r6 —
    * Spark ships the Derby driver in its jars for the Hive
    * metastore): JDBC write, partitioned 4-way range read,
    * filter pushdown into the remote query all proven live. Against
    * Postgres (the reference's transport) only the URL and driver
    * class change.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 32,
      props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(props)
    val partitioned = (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) => base
        .option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", numPartitions)
      case _ => base
    }
    partitioned.load()
  }
}
