package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-side sinks and DDL, replacing the reference's connector layer:
  *
  *  - S7  bronze sink: the reference serializes pandas frames to CSV and
  *    puts them at `test/bronze/{table}/{table}/{ts}.csv`
  *    (psql_connector.py:136-166). Here the layout becomes a partition
  *    COLUMN (`batch_ts=...`), so the path scheme is queryable and
  *    partition pruning applies; format defaults to parquet (the
  *    reference's own roadmap, README.md:17) with CSV kept for bronze
  *    compatibility.
  *  - S8  append sink: `df.write.mode("append")` — vectorized, replacing
  *    the row-at-a-time execute_many loop (connector_config.py:186-188).
  *  - S9  keyed overwrite ("UPDATE"): recompute-and-overwrite — Spark has
  *    no in-place update; the ledger/SCD pattern (SURVEY §7.4.4) models
  *    mutation as append + latest-wins compaction (streaming.Ingest.latestPerKey).
  *  - S10/S11 DDL from StructType: `CREATE TABLE ... USING parquet` /
  *    DROP-rebuild (schemas.py:63-79, generator.py:33-48).
  */
object Lake {

  /** S7: write one ingest batch under a batch_ts partition. At scale the
    * same call distributes: one partition column = one pruned directory
    * per ingest cycle. */
  def writeBronze(df: DataFrame, root: String, table: String, batchTs: String,
      format: String = "parquet"): Unit =
    df.withColumn("batch_ts", lit(batchTs))
      .write.mode("append")
      .format(format)
      .option("header", "true")
      .partitionBy("batch_ts")
      .save(s"$root/$table")

  /** Read the bronze table; `sinceBatch` prunes partitions at the
    * source (the incremental-read path) and `asOfBatch` is the
    * time-travel form — the table as it stood after that ingest batch,
    * everything later pruned out. Both are partition-column predicates
    * on the lexically-ordered batch_ts layout, so they prune
    * DIRECTORIES (PartitionFilters in explain), never open a file
    * outside the window; they compose to a half-open batch range. */
  def readBronze(spark: SparkSession, root: String, table: String,
      sinceBatch: Option[String] = None, format: String = "parquet",
      asOfBatch: Option[String] = None): DataFrame = {
    val df = spark.read.format(format)
      .option("header", "true").option("inferSchema", "true")
      .load(s"$root/$table")
    val lower = sinceBatch.fold(df)(b => df.filter(col("batch_ts") > lit(b)))
    asOfBatch.fold(lower)(b => lower.filter(col("batch_ts") <= lit(b)))
  }

  /** JSONL corpus reader — the de-facto interchange format for
    * web-scale text corpora (Dolma, RedPajama, FineWeb all ship as
    * compressed JSONL shards). Contract choices, each load-bearing at
    * 100 TB:
    *  - EXPLICIT schema, never inference: schema inference is a whole
    *    extra pass over the data, and on dirty corpora it silently
    *    widens types per-run (a numeric id shard + a string id shard
    *    infer differently on different days).
    *  - PERMISSIVE with a corrupt-record column: a malformed line
    *    lands intact in `corruptCol` with every data column null —
    *    quarantined and auditable, neither dropped (DROPMALFORMED
    *    hides data loss) nor fatal (FAILFAST kills a 10-hour job on
    *    line 9 billion).
    *  - Compression is per-file by extension (.gz/.zst). Gzip shards
    *    are NOT splittable — one shard is one task, so the WRITER's
    *    shard count ([[writeJsonl]] `numShards`) is the reader's
    *    parallelism ceiling; shard accordingly upstream.
    * Caveat (Spark rule): a query whose referenced columns are ONLY
    * the corrupt column is disallowed on a raw JSON scan — select at
    * least one data column alongside it (or cache first) when
    * auditing the quarantine. */
  def readJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' column; pass corruptCol to rename")
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** JSONL corpus writer: `numShards` output files (the unit of
    * downstream read parallelism — see [[readJsonl]]), round-robin
    * repartitioned so shards are size-balanced regardless of upstream
    * skew. Compression defaults to gzip for interchange compatibility. */
  def writeJsonl(df: DataFrame, path: String, numShards: Int,
      compression: String = "gzip"): Unit = {
    require(numShards > 0, "numShards must be positive")
    df.repartition(numShards)
      .write.mode("overwrite")
      .option("compression", compression)
      .json(path)
  }

  /** Per-file statistics of a parquet table: rows plus min/max of
    * `cols` for every physical file — the audit view of what row-group
    * skipping has to work with (LakeSpec derives this inline to assert
    * writeClustered's disjointness; this is that check productized).
    * One scan, one file-keyed partial agg; no file is read twice. */
  def fileStats(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats needs at least one column")
    val df = spark.read.parquet(path)
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
      .orderBy("file")
  }

  /** Range-clustered write for file skipping: rows are range-partitioned
    * and sorted on `cols`, so every output file covers a disjoint slice
    * of the clustering key and parquet row-group min/max stats let a
    * range predicate skip whole files (the silver/gold layout knob at
    * 100 TB — the partition column prunes directories, clustering prunes
    * files within them). Disjointness is asserted in LakeSpec by
    * re-deriving per-file [min, max] from `input_file_name()`. */
  def writeClustered(df: DataFrame, path: String, nFiles: Int,
      cols: org.apache.spark.sql.Column*): Unit =
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)

  /** Morton (Z-order) interleave of two 16-bit normalized columns —
    * pure shift/mask arithmetic, fully codegen'd. */
  private def zInterleave(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Z-ORDERED write: cluster files on the Morton interleave of TWO
    * columns, so per-file min/max stats are tight on BOTH dimensions
    * and a range predicate on either column skips files
    * ([[writeClustered]] gives that for one column only — its files
    * span the full range of every other column). Each column is
    * normalized to a 16-bit rank via its min/max (a 4-scalar layout
    * statistic, the only driver-side values), interleaved, then
    * range-partitioned and sorted on the z-value. The standard
    * lakehouse OPTIMIZE ZORDER layout, as one declarative write. */
  def writeZOrdered(df: DataFrame, path: String, nFiles: Int,
      ca: org.apache.spark.sql.Column, cb: org.apache.spark.sql.Column): Unit = {
    val s = df.agg(min(ca).cast("double"), max(ca).cast("double"),
      min(cb).cast("double"), max(cb).cast("double")).head()
    // Empty input (or all-null clustering values): no layout to derive —
    // write the frame as-is rather than NPE on the null min/max.
    if ((0 until 4).exists(s.isNullAt)) {
      df.repartition(math.max(1, nFiles)).write.mode("overwrite").parquet(path)
      return
    }
    val (aLo, aHi, bLo, bHi) = (s.getDouble(0), s.getDouble(1), s.getDouble(2), s.getDouble(3))
    def norm(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      if (hi == lo) lit(0L)
      else least(lit(65535L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * 65536.0).cast("long"))
    df.withColumn("_z", zInterleave(norm(ca, aLo, aHi), norm(cb, bLo, bHi)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the maintenance job every streaming/
    * append sink needs at scale: micro-batches leave many tiny files,
    * and at 100 TB scan cost is driven by file count as much as bytes.
    * Rewrites `dir` into ceil(bytes / targetFileBytes) files (optionally
    * preserving a partition-column layout), swapped park-then-promote:
    * the old layout is parked aside (never deleted first), and a crash
    * between park and promote is healed by the next compact() call,
    * which restores the parked layout before proceeding. During that
    * brief window readers see a missing dir — run compaction in a
    * maintenance window or behind a table-format commit at scale. Row
    * content is byte-for-byte preserved (LakeSpec). */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20,
      partitionCols: Seq[String] = Nil): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    val bak = new org.apache.hadoop.fs.Path(dir + "_compact_bak")
    // Heal a previous crash caught between park and promote: the old
    // layout is parked in _compact_bak and the live dir is missing.
    if (!fs.exists(p) && fs.exists(bak))
      require(fs.rename(bak, p), s"compact: failed to restore $bak")
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + "_compact_tmp")
    fs.delete(tmp, true)
    val writer = df.repartition(nFiles).write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    fs.delete(bak, true)
    require(fs.rename(p, bak), s"compact: failed to park $p")
    require(fs.rename(tmp, p), s"compact: failed to promote $tmp")
    fs.delete(bak, true)
  }

  /** Retention vacuum for the bronze layout: drop all but the newest
    * `keepLast` `batch_ts=` partitions of `root/table`. The
    * timestamped layout sorts lexically (ISO-ish batch ids), so
    * "newest" is a directory-name sort — one namenode listing plus one
    * recursive delete per expired partition; no data file is ever
    * read. Incremental consumers are unaffected as long as their
    * `sinceBatch` cursor is at or past the retention horizon (the
    * standard retention-vs-replay contract — a consumer further behind
    * has already lost its source and should re-bootstrap).
    * Returns (kept, deleted) batch ids, both sorted ascending. */
  def vacuumBronze(spark: SparkSession, root: String, table: String,
      keepLast: Int): (Seq[String], Seq[String]) = {
    require(keepLast >= 1, "keepLast must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$root/$table")
    val batches = fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("batch_ts="))
      .sortBy(_.getName)
    val (keep, drop) = batches.splitAt(0.max(batches.size - keepLast)) match {
      case (old, recent) => (recent, old)
    }
    drop.foreach { p =>
      require(fs.delete(p, true), s"vacuumBronze: failed to delete $p")
    }
    def id(p: org.apache.hadoop.fs.Path) =
      p.getName.stripPrefix("batch_ts=")
    (keep.map(id), drop.map(id))
  }

  /** S10: DDL string from a schema (SchemaLoader.generate_ddl analog). */
  def createTableDdl(table: String, schema: org.apache.spark.sql.types.StructType,
      location: Option[String] = None): String = {
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    s"CREATE TABLE IF NOT EXISTS $table (${schema.toDDL}) USING parquet$loc"
  }

  /** S10/S11: drop-and-recreate a catalog table (generator.py:33-48). */
  def recreateTable(spark: SparkSession, table: String,
      schema: org.apache.spark.sql.types.StructType, location: Option[String] = None): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(createTableDdl(table, schema, location))
  }

  /** S3/S4 catalog introspection, pg_catalog/information_schema analog:
    * (table, column, type, nullable) rows from the session catalog. */
  def describeColumns(spark: SparkSession, table: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    spark.catalog.listColumns(table)
      .map(c => (table, c.name, c.dataType, c.nullable))
      .toDF("table_name", "column_name", "data_type", "is_nullable")
  }
}
