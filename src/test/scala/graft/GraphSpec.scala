package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("two-node cycle is the fixed point: both ranks stay exactly 0.5") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Graph.pagerank(e, iters = 4, damping = 0.5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // (1-d)/2 + d*(0.5/1) = 0.25 + 0.25 = 0.5 every iteration, no rounding loss
    assert(pr(1L) == 0.5 && pr(2L) == 0.5)
  }

  test("star graph: the hub out-ranks the leaves; rank mass is conserved") {
    val e = ((1L to 5L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val pr = Graph.pagerank(e, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > pr(2L), pr.toString)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
  }

  test("dangling sink: mass is redistributed, total still ~1") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // node 3 has no out-edges
    val pr = Graph.pagerank(e, iters = 8, damping = 0.5).collect().map(_.getDouble(1))
    assert(math.abs(pr.sum - 1.0) < 1e-6)
  }

  test("partition invariance: identical ranks regardless of input layout") {
    val e = (0L until 60L).map(i => (i, (i * 7 + 3) % 60))
      .filter(t => t._1 != t._2).toDF("src", "dst")
    val a = Graph.pagerank(e, iters = 3, damping = 0.5).collect().toSeq
    val b = Graph.pagerank(e.repartition(7), iters = 3, damping = 0.5).collect().toSeq
    assert(a == b)
  }

  test("parameter validation") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { Graph.pagerank(e, iters = 0) }
    intercept[IllegalArgumentException] { Graph.pagerank(e, damping = 1.0) }
  }

  test("reliableGraphPins: reliable edge pin yields identical pagerank and hits") {
    val e = (0L until 40L).map(i => (i, (i * 11 + 5) % 40))
      .filter(t => t._1 != t._2).toDF("src", "dst")
    val prLocal = Graph.pagerank(e, iters = 3, damping = 0.5).collect().toSeq
    val hitsLocal = Graph.hits(e, iters = 2).collect().toSeq
    spark.conf.set("spark.graft.reliableGraphPins", "true")
    try {
      assert(Graph.pagerank(e, iters = 3, damping = 0.5).collect().toSeq == prLocal)
      assert(Graph.hits(e, iters = 2).collect().toSeq == hitsLocal)
    } finally spark.conf.unset("spark.graft.reliableGraphPins")
  }

  test("hits: pure star — the center is the sole authority, leaves split hub mass") {
    val e = (1L to 5L).map(i => (i, 0L)).toDF("src", "dst")
    val m = Graph.hits(e, iters = 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(0L)._1 == 1.0)           // all authority on the center
    assert(m(0L)._2 == 0.0)           // the center points at nothing
    (1L to 5L).foreach { v =>
      assert(m(v)._1 == 0.0)          // leaves have no in-edges
      assert(m(v)._2 == 0.2, m(v))    // hub mass splits evenly
    }
  }

  test("hits: auth and hub each sum to ~1 on an arbitrary graph") {
    val e = (0L until 40L).map(i => (i, (i * 7 + 3) % 40))
      .filter(t => t._1 != t._2).toDF("src", "dst")
    val rows = Graph.hits(e, iters = 4).collect()
    assert(math.abs(rows.map(_.getDouble(1)).sum - 1.0) < 1e-6)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-6)
  }

  test("hits: a page linked once by a strong hub out-ranks one linked by weak hubs") {
    // hub 0 points at {10, 11, 12} (strong hub: all its targets are
    // also pointed at by everyone). Node 20 is linked ONCE, by hub 0's
    // peer structure; nodes 1..3 are weak hubs pointing only at 21.
    val strong = Seq((0L, 10L), (0L, 11L), (0L, 12L), (4L, 10L), (4L, 11L),
      (4L, 12L), (0L, 20L))
    val weak = Seq((1L, 21L), (2L, 21L), (3L, 21L))
    val m = Graph.hits((strong ++ weak).toDF("src", "dst"), iters = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 20 is linked once (by the strong hub 0); 21 three times (by hubs
    // that score ~0 because their only target is off the dense core)
    assert(m(20L) > m(21L), m.toString)
  }

  test("assoc mode law: pagerank(exact=false) matches exact within 1e-9") {
    // Arbitrary 2-out-degree graph with dangling nodes (src % 11
    // dropped) — exercises the dangling total AND the per-node sums.
    val e = (0L until 200L).flatMap(i => Seq((i, (i * 7 + 3) % 200), (i, (i * 13 + 5) % 200)))
      .filter(t => t._1 != t._2 && t._1 % 11 != 0).distinct.toDF("src", "dst")
    val ex = Graph.pagerank(e, iters = 4, damping = 0.5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val as = Graph.pagerank(e, iters = 4, damping = 0.5, exact = false).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ex.keySet == as.keySet)
    val maxDiff = ex.keys.map(v => math.abs(ex(v) - as(v))).max
    assert(maxDiff <= 1e-9, s"assoc vs exact max diff $maxDiff")
    // and the assoc per-node aggregation carries NO collect_list
    // buffer. Asserted on the aggregation frame itself: the pagerank
    // RETURN value is localCheckpoint-truncated (a checkpoint-read +
    // sort), so its plan would read clean in BOTH modes — the r10
    // vacuity fix. The exact-mode positive control proves the probe
    // sees the buffer when it IS there.
    def aggPlan(exact: Boolean) = e
      .groupBy("dst").agg(Graph.nodeSum(col("src").cast("double"), exact))
      .queryExecution.executedPlan.toString
    assert(aggPlan(exact = true).contains("collect_list"),
      "probe sanity: the exact fold must show its collect_list buffer")
    assert(!aggPlan(exact = false).contains("collect_list"),
      "assoc mode must not collect per-node arrays")
  }

  test("assoc mode law: hits(exact=false) matches exact within 1e-9") {
    val e = (0L until 150L).flatMap(i => Seq((i, (i * 7 + 3) % 150), (i, (i * 11 + 1) % 150)))
      .filter(t => t._1 != t._2).distinct.toDF("src", "dst")
    val ex = Graph.hits(e, iters = 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val as = Graph.hits(e, iters = 3, exact = false).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ex.keySet == as.keySet)
    val maxDiff = ex.keys.map { v =>
      math.max(math.abs(ex(v)._1 - as(v)._1), math.abs(ex(v)._2 - as(v)._2))
    }.max
    assert(maxDiff <= 1e-9, s"assoc vs exact max diff $maxDiff")
  }

  test("assoc mode: hot node (in-degree 20k) — ranks still match exact") {
    // A star at scale-model size: every node points at 0, plus 0 -> 1.
    // The per-destination sum at node 0 is the hot-key aggregation the
    // assoc mode keeps O(1)-state; at test size both modes run, and
    // their results must agree.
    val e = ((1L to 20000L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val ex = Graph.pagerank(e, iters = 2, damping = 0.5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val as = Graph.pagerank(e, iters = 2, damping = 0.5, exact = false).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val maxDiff = ex.keys.map(v => math.abs(ex(v) - as(v))).max
    assert(maxDiff <= 1e-9, s"hot-node assoc vs exact max diff $maxDiff")
    assert(as(0L) > as(2L))
  }

  test("hits: partition invariance") {
    val e = (0L until 60L).map(i => (i, (i * 11 + 1) % 60))
      .filter(t => t._1 != t._2).toDF("src", "dst")
    val a = Graph.hits(e, iters = 2).collect().toSeq
    val b = Graph.hits(e.repartition(9), iters = 2).collect().toSeq
    assert(a == b)
  }
}
