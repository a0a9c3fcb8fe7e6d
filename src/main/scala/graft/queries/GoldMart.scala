package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's DECLARED dashboard set, packaged as a named gold
  * mart — closing the one capability the reference states only as a
  * roadmap ("Deploy Metabase/Superset for dashboards … Create 5-7 key
  * dashboards", README.md:34-40): daily transaction volumes, customer
  * acquisition trends, account balance distribution, fraud detection
  * alerts, data quality metrics.
  *
  * This module adds NO new distributed logic: every panel is one of
  * the engine's already-green oracle-checked queries (the BI layer's
  * job is naming, not computing), so the mart's correctness story is
  * exactly those queries' CORRECTNESS rows. A BI tool points at the
  * materialized outputs of [[panel]] the way the reference's roadmap
  * points Metabase at its gold tables.
  */
object GoldMart {

  private lazy val registry: Map[String, (SparkSession, String) => DataFrame] =
    Inventory.queries ++ PipelineInventory.queries ++ NorthwindInventory.queries

  /** README dashboard bullet -> the oracle-checked queries that feed
    * that panel.
    *  - daily_transaction_volumes: per-day tumbling counts (q28 — A7
    *    group-by-day; the streaming sibling is ST2).
    *  - customer_acquisition_trends: cohort first-activity sizes and
    *    their retention decay (r96) plus the signup funnel (r95).
    *  - account_balance_distribution: equi-width balance histogram +
    *    exact quantiles (r73) and the signed running-ledger balances
    *    it summarizes (q30).
    *  - fraud_detection_alerts: circular transfer rings (q11), illegal
    *    negative balances (q06), future-dated/late events (q29) — the
    *    reference's own seeded anomaly classes (oltp_seeder.py:154).
    *  - data_quality_metrics: the orphan/validity/dup audit panel
    *    (q42, Quality.report). */
  val panels: Map[String, Seq[String]] = Map(
    "daily_transaction_volumes" -> Seq("q28_tumbling_window"),
    "customer_acquisition_trends" -> Seq("r96_retention", "r95_funnel"),
    "account_balance_distribution" -> Seq("r73_histogram_quantiles", "q30_signed_ledger"),
    "fraud_detection_alerts" -> Seq("q11_self_join_circular", "q06_neg_balance", "q29_late_future"),
    "data_quality_metrics" -> Seq("q42_quality_report"))

  /** One dashboard panel's backing frames, keyed by query name. */
  def panel(spark: SparkSession, sfDir: String,
      name: String): Map[String, DataFrame] = {
    require(panels.contains(name),
      s"unknown panel '$name'; have ${panels.keys.toSeq.sorted.mkString(", ")}")
    panels(name).map(q => q -> registry(q)(spark, sfDir)).toMap
  }

  /** The whole mart: every panel's frames, keyed panel -> query. */
  def all(spark: SparkSession, sfDir: String): Map[String, Map[String, DataFrame]] =
    panels.keys.map(p => p -> panel(spark, sfDir, p)).toMap
}
