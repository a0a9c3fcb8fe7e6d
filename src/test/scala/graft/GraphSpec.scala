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
}
