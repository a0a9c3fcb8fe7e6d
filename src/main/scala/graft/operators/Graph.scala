package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation — the quality prior
  * web-scale pipelines attach to documents (Common Crawl link
  * analysis; OPIC/PageRank-family centrality as a crawl/keep signal),
  * complementing the content-side quality stack (rule gate, learned
  * filter, perplexity).
  *
  * Reference analog: the reference has no graph layer; this is part of
  * the beyond-reference training-data surface (SURVEY §6), built the
  * Spark-first way: power iteration where each round is ONE edge join
  * + one destination-keyed partial aggregation + a one-row dangling
  * aggregate — no corpus-wide window, no driver-side adjacency. */
object Graph {

  private def fold9(c: Column): Column =
    round(aggregate(sort_array(collect_list(c)), lit(0d), _ + _), 9)

  /** PageRank by power iteration with damping `d`:
    *
    *   pr'(v) = (1−d)/N + d · (Σ_{u→v} pr(u)/deg(u) + dangling/N)
    *
    * where `dangling` is the rank mass of nodes with no out-edges
    * (redistributed uniformly — the standard correction that keeps Σpr
    * at 1). Nodes are the UNION of edge endpoints; `edges` must carry
    * (src, dst) with no duplicate edges (dedupe upstream if multi-edges
    * should not double-weight).
    *
    * Scale shape: per iteration, one src-keyed join of the rank frame
    * onto the edge list, one dst-keyed partial-aggregable sum, and a
    * 1-row dangling aggregate (a driver scalar — the classic power-
    * iteration shape). The rank frame is `localCheckpoint`ed every
    * iteration so lineage stays one round deep (the trainCentroids
    * lesson: lazy iteration compounds ~2^iters replays). On a cluster
    * the checkpoint is the natural durable between-iteration table.
    *
    * Determinism: per-edge contributions are 9dp-rounded off exact
    * IEEE divisions, per-destination sums and the dangling mass are
    * ascending sorted folds, and each new rank is 9dp-rounded — so
    * ranks are bit-identical across engines, runs, and partitionings.
    * Pass a damping whose complement is IEEE-exact (0.5, 0.75, 0.85
    * is NOT: 1−0.85 ≠ 0.15 in doubles — both engines must spell the
    * complement the same way; this operator uses `1 − d` internally,
    * so an oracle must too).
    * Output: v, pr (9dp), ordered by v. */
  def pagerank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, "iters must be positive")
    require(damping > 0.0 && damping < 1.0, s"damping $damping outside (0, 1)")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var pr = nodes.select(col("v"), (lit(1.0) / n).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val dangRow = pr.join(deg.select(col("src").as("v")), Seq("v"), "left_anti")
        .agg(fold9(col("pr")).as("dm")).head
      val dm = if (dangRow.isNullAt(0)) 0.0 else dangRow.getDouble(0)
      val sums = e.join(pr.withColumnRenamed("v", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("v"), round(col("pr") / col("deg"), 9).as("c"))
        .groupBy("v").agg(fold9(col("c")).as("s"))
      pr = nodes.join(sums, Seq("v"), "left")
        .select(col("v"), round(
          lit(1 - damping) / n +
            lit(damping) * (coalesce(col("s"), lit(0.0)) + lit(dm) / n), 9)
          .as("pr"))
        .localCheckpoint(true)
    }
    pr.orderBy("v")
  }
}
