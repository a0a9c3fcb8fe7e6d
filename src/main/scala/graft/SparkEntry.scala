package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Inventory, NorthwindInventory, PipelineInventory}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2) to a
  * Spark DataFrame program over the parquet corpus dir; `oracleSql` gives
  * the DuckDB-equivalent SQL the driver hashes against at sf0.01.
  */
object SparkEntry {

  /** Flagship query (Q9: 3-way join + group agg — exercises scan, join
    * strategy choice, partial aggregation, rounding and ordering) on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Inventory.queries("q09_join3_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Inventory.queries ++ PipelineInventory.queries ++ NorthwindInventory.queries

  def oracleSql: Map[String, String] =
    Inventory.oracleSql ++ PipelineInventory.oracleSql ++ NorthwindInventory.oracleSql
}
