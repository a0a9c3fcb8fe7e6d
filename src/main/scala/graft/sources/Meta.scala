package graft.sources

import org.apache.spark.sql.SparkSession

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

  /** S6: engine version/info dict analog. */
  def info(spark: SparkSession): Map[String, String] = Map(
    "engine" -> "graft",
    "spark_version" -> spark.version,
    "scala_version" -> util.Properties.versionNumberString,
    "master" -> spark.sparkContext.master)
}
