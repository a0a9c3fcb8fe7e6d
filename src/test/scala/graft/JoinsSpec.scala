package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends SparkSpec {

  import spark.implicits._

  private def fact = (1L to 20000L).map(i => (i % 4000, s"f$i"))
    .toDF("k", "payload")
  // dim keys 0..99: 1/40 of the fact key space matches
  private def dim = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "attr")

  test("bloomReducedJoin is row-identical to the plain join at any fpp") {
    val plain = fact.join(dim, Seq("k"))
    for (fpp <- Seq(0.5, 0.01)) {
      val reduced = Joins.bloomReducedJoin(fact, dim, "k",
        expectedKeys = 1000, fpp = fpp)
      assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty,
        s"fpp=$fpp diverged from the plain join")
    }
  }

  test("bloomSemiFilter keeps every matching row and drops ~all non-matching") {
    val filtered = Joins.bloomSemiFilter(fact, dim, "k",
      expectedKeys = 1000, fpp = 0.01)
    val matching = fact.join(dim.select("k"), Seq("k"), "left_semi")
    // no false negatives: the filtered frame is a superset of matches
    assert(matching.exceptAll(filtered).isEmpty)
    // and the leak is Bloom-sized, not join-sized: 19500 non-matching
    // rows at fpp=0.01 leak ~195 in expectation; 10x slack kills flakes
    val nMatch = matching.count()
    assert(filtered.count() - nMatch < 2000,
      s"semi-filter leaked ${filtered.count() - nMatch} of ${20000 - nMatch} non-matching rows")
  }

  test("null fact keys are dropped by the reduction (they cannot equi-join)") {
    val withNulls = fact.union(Seq((0L, "n1"), (0L, "n2")).toDF("k", "payload")
      .withColumn("k", lit(null).cast("long")))
    val filtered = Joins.bloomSemiFilter(withNulls, dim, "k", expectedKeys = 1000)
    assert(filtered.filter(col("k").isNull).count() == 0)
    val reduced = Joins.bloomReducedJoin(withNulls, dim, "k", expectedKeys = 1000)
    val plain = withNulls.join(dim, Seq("k"))
    assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty)
  }

  test("the probe is the codegen'd might_contain expression in the fact filter") {
    // a Range-backed fact: a LocalRelation fact would let
    // ConvertToLocalRelation evaluate the whole filter at PLAN time
    // (valid, but nothing left to assert on); r83's PlanSpec row covers
    // the parquet-scan shape
    val rangeFact = spark.range(20000).select((col("id") % 4000).as("k"))
    val reduced = Joins.bloomReducedJoin(rangeFact, dim, "k", expectedKeys = 1000)
    val plan = reduced.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "expected the BloomFilterMightContain probe in the physical plan")
  }
}
