package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def grams(rows: (Long, String)*) = rows.toDF("doc_id", "gram")

  test("cms never undercounts, and is exact when the sketch is wide enough") {
    // 3 distinct grams with known multiplicities, width >> distinct
    val g = grams(
      (Seq.fill(7)((1L, "alpha beta")) ++ Seq.fill(3)((1L, "beta gamma")) ++
        Seq.fill(1)((2L, "gamma delta"))): _*)
    val row = Sketch.cmsBuild(g, depth = 4, width = 1024).head
    val sk = row.getAs[scala.collection.Seq[Long]]("sketch").toSeq
    assert(sk.length == 4 * 1024)
    val est = Seq("alpha beta", "beta gamma", "gamma delta", "never seen")
      .toDF("gram")
      .select(col("gram"), Sketch.cmsEstimate(sk, 4, 1024)(col("gram")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha beta") == 7L)
    assert(est("beta gamma") == 3L)
    assert(est("gamma delta") == 1L)
    assert(est("never seen") == 0L) // wide sketch: no collision on the fixture
    // each row of the sketch sums to the total instance count
    (0 until 4).foreach { j =>
      assert(sk.slice(j * 1024, (j + 1) * 1024).sum == 11L, s"row $j")
    }
  }

  test("cms soundness under forced collisions: estimate >= exact for every gram") {
    // width 16 with 60 distinct grams — collisions guaranteed
    val g = (1L to 300L).map(i => (i, s"gram-${i % 60}")).toDF("doc_id", "gram")
    val sk = Sketch.cmsBuild(g, depth = 4, width = 16).head
      .getAs[scala.collection.Seq[Long]]("sketch").toSeq
    val exact = g.groupBy("gram").count().as[(String, Long)].collect().toMap
    val est = g.select(col("gram")).distinct()
      .select(col("gram"), Sketch.cmsEstimate(sk, 4, 16)(col("gram")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (gram, cnt) =>
      assert(est(gram) >= cnt, s"$gram: est ${est(gram)} < exact $cnt")
    }
  }

  test("cms merge law: sketch(A ∪ B) == merge(sketch(A), sketch(B)) cell for cell") {
    val a = (1L to 100L).map(i => (i, s"g${i % 13}")).toDF("doc_id", "gram")
    val b = (200L to 260L).map(i => (i, s"g${i % 7}")).toDF("doc_id", "gram")
    def sk(df: org.apache.spark.sql.DataFrame) =
      Sketch.cmsBuild(df, depth = 3, width = 64)
    val merged = Sketch.cmsMerge(sk(a).unionByName(sk(b))).head
      .getAs[scala.collection.Seq[Long]]("sketch").toSeq
    val oneShot = sk(a.unionByName(b)).head
      .getAs[scala.collection.Seq[Long]]("sketch").toSeq
    assert(merged == oneShot)
  }

  test("ngramCms: end-to-end corpus sketch answers gram frequencies; partition-invariant") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on a chair"),
      (3L, "dogs bark loudly at night")).toDF("doc_id", "text")
    val sk = Sketch.ngramCms(docs, n = 3, width = 2048).head
      .getAs[scala.collection.Seq[Long]]("sketch").toSeq
    val est = Seq("the cat sat", "cat sat on", "dogs bark loudly", "sat on the")
      .toDF("gram")
      .select(col("gram"), Sketch.cmsEstimate(sk, 4, 2048)(col("gram")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("the cat sat") == 2L && est("cat sat on") == 2L)
    assert(est("dogs bark loudly") == 1L && est("sat on the") == 1L)
    val sk2 = Sketch.ngramCms(docs.repartition(7), n = 3, width = 2048).head
      .getAs[scala.collection.Seq[Long]]("sketch").toSeq
    assert(sk2 == sk)
  }
}
