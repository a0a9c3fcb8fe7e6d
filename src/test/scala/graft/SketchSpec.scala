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

  test("wordNgrams: docs shorter than n carry no gram (descending-sequence regression)") {
    // sequence(1, 0) is [1, 0] in Spark — the old greatest() clamp
    // walked index 0 on sub-n docs and slice(t, 0, n) throws (the
    // Mix.ngramBuckets r11 finding, same fix here).
    val docs = Seq((1L, "a"), (2L, "a b"), (3L, "a b c d"), (4L, ""))
      .toDF("doc_id", "text")
    val tri = Sketch.wordNgrams(docs, n = 3)
      .as[(Long, String)].collect().toSet
    assert(tri == Set((3L, "a b c"), (3L, "b c d")), tri.toString)
    val uni = Sketch.wordNgrams(docs, n = 1)
      .as[(Long, String)].collect().length
    assert(uni == 8) // every token incl. the empty-string split token
  }

  test("misra-gries summary obeys the frequency bounds and its computable miss bound") {
    // heavy head + long flat tail, budget far under the vocabulary so
    // compressions actually run (vocab 203 >> 2*budget)
    val toks = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(150)("gamma") ++ (1 to 200).map(i => s"rare$i")
    val df = scala.util.Random.shuffle(toks).toDF("token").repartition(5)
    val (mg, n) = Sketch.mgAggregate(df, budget = 16)
    assert(n == toks.size.toLong)
    assert(mg.size <= 16)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val miss = (n - mg.values.sum).toDouble / 17
    mg.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounts")
      assert(c >= exact(t) - miss, s"$t undercounts past the bound")
    }
    // every token the summary missed really is below the miss bound
    exact.foreach { case (t, c) =>
      if (!mg.contains(t)) assert(c <= miss, s"missed $t with count $c > $miss")
    }
    assert(mg.contains("alpha") && mg.contains("beta") && mg.contains("gamma"))
  }

  test("heavyHitters: exact top-k on a skewed corpus via the certified sketch path") {
    val docs = (
      Seq.fill(100)("alpha alpha alpha beta beta gamma") ++
        (1 to 200).map(i => s"rare$i")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hh = Sketch.heavyHitters(docs, k = 3, budget = 16)
    // certified path returns a driver-local frame (no scan in the plan)
    assert(hh.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val rows = hh.collect().map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Int]("rn")))
    assert(rows.toSeq == Seq(("alpha", 300L, 1), ("beta", 200L, 2), ("gamma", 100L, 3)))
    // partition-invariant
    val rows2 = Sketch.heavyHitters(docs.repartition(7), k = 3, budget = 16)
      .collect().map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Int]("rn")))
    assert(rows2.toSeq == rows.toSeq)
  }

  test("heavyHitters: flat distribution fails certification but stays exact via fallback") {
    // 100 singletons, budget 8: the miss bound dwarfs every count, so
    // the sketch cannot certify — the exact groupBy path must answer
    val docs = (0L until 100L).map(i => (i, s"tok$i")).toDF("doc_id", "text")
    val hh = Sketch.heavyHitters(docs, k = 3, budget = 8)
    assert(!hh.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val rows = hh.collect().map(r => (r.getString(0), r.getAs[Long]("cnt")))
    // all counts 1; ties break token-ascending (string order: tok0 < tok1 < tok10)
    assert(rows.toSeq == Seq(("tok0", 1L), ("tok1", 1L), ("tok10", 1L)))
  }

  test("heavyHitters: whole small vocabulary certifies even below k results") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val rows = Sketch.heavyHitters(docs, k = 10, budget = 16)
      .collect().map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Int]("rn")))
    assert(rows.toSeq == Seq(("a", 2L, 1), ("b", 2L, 2), ("c", 1L, 3)))
  }

  test("histogramQuantiles: every estimate within half a bin width of the exact percentile") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.95)
    val got = Sketch.histogramQuantiles(li, "l_extendedprice", qs, bins = 512)
      .select("q", "est").as[(Double, Double)].collect().toMap
    val mm = li.agg(min(col("l_extendedprice")).cast("double"),
      max(col("l_extendedprice")).cast("double")).as[(Double, Double)].head()
    val halfBin = (mm._2 - mm._1) / 512 / 2
    val exact = li.selectExpr(
      s"percentile(l_extendedprice, array(${qs.mkString(",")})) AS p")
      .selectExpr("explode(p) AS p").as[Double].collect()
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(got(q) - ex) <= halfBin + 1e-9,
        s"q=$q est=${got(q)} exact=$ex halfBin=$halfBin")
    }
    // estimates are monotone in q
    val ordered = Sketch.histogramQuantiles(li, "l_extendedprice", qs, bins = 512)
      .orderBy("q").select("est").as[Double].collect()
    assert(ordered.sameElements(ordered.sorted))
  }

  test("histogramQuantilesBy: per-group error bound, group independence, null group kept") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val got = Sketch.histogramQuantilesBy(li, "l_returnflag",
        "l_extendedprice", Seq(0.5), bins = 256)
      .select("group", "est").as[(String, Double)].collect().toMap
    val groups = li.select("l_returnflag").distinct().as[String].collect()
    groups.foreach { g =>
      val sub = li.filter(col("l_returnflag") === g)
      val mm = sub.agg(min(col("l_extendedprice")).cast("double"),
        max(col("l_extendedprice")).cast("double")).as[(Double, Double)].head()
      val exact = sub.selectExpr("percentile(l_extendedprice, 0.5) AS p")
        .as[Double].head()
      val halfBin = (mm._2 - mm._1) / 256 / 2
      assert(math.abs(got(g) - exact) <= halfBin + 1e-9,
        s"group=$g est=${got(g)} exact=$exact")
    }
    // a per-group result equals running the ungrouped form on that
    // group alone — groups never contaminate each other's bins
    val one = Sketch.histogramQuantiles(
        li.filter(col("l_returnflag") === groups.head),
        "l_extendedprice", Seq(0.5), bins = 256)
      .select("est").as[Double].head()
    assert(got(groups.head) == one)
    // null group is its own group, not dropped
    val withNull = Seq(("a", 1.0), ("a", 3.0), (null: String, 10.0))
      .toDF("g", "x")
    val n = Sketch.histogramQuantilesBy(withNull, "g", "x", Seq(1.0), bins = 4)
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Double]("est")).toMap
    assert(n.contains(None) && n(None) == 10.0)
  }

  test("valueHistogram/quantilesFromHistogram: merge law and equality with the one-shot form") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val mm = li.agg(min(col("l_extendedprice")).cast("double"),
      max(col("l_extendedprice")).cast("double")).as[(Double, Double)].head()
    val (lo, hi) = mm
    // per-half histograms sum cell-wise to the whole-corpus histogram
    val h1 = Sketch.valueHistogram(
      li.filter(col("l_orderkey") % 2 === 0), "l_extendedprice", lo, hi, 256)
    val h2 = Sketch.valueHistogram(
      li.filter(col("l_orderkey") % 2 === 1), "l_extendedprice", lo, hi, 256)
    val merged = h1.unionByName(h2).groupBy("bin")
      .agg(sum("c").cast("long").as("c"))
    val whole = Sketch.valueHistogram(li, "l_extendedprice", lo, hi, 256)
    assert(merged.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
      whole.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
    // with (lo, hi) = the true min/max, the fixed-bounds read side
    // reproduces histogramQuantiles row for row
    val qs = Seq(0.25, 0.5, 0.9)
    val a = Sketch.quantilesFromHistogram(merged, lo, hi, qs, 256)
      .collect().map(_.toSeq).toSeq
    val b = Sketch.histogramQuantiles(li, "l_extendedprice", qs, 256)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    // out-of-range values clamp into edge bins, never drop
    val clamped = Sketch.valueHistogram(
      Seq(lo - 100, hi + 100, (lo + hi) / 2).toDF("x"), "x", lo, hi, 8)
    assert(clamped.agg(sum("c")).as[Long].head() == 3L)
    val bins = clamped.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(bins(0) >= 1L && bins(7) >= 1L)
  }

  test("histogramQuantiles: degenerate all-equal input and partition invariance") {
    val const = Seq.fill(100)(42.5).toDF("x")
    val c = Sketch.histogramQuantiles(const, "x", Seq(0.5, 1.0))
      .select("est").as[Double].collect()
    assert(c.forall(_ == 42.5))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val a = Sketch.histogramQuantiles(li, "l_extendedprice", Seq(0.5))
      .collect().map(_.toSeq).toSeq
    val b = Sketch.histogramQuantiles(li.repartition(7), "l_extendedprice", Seq(0.5))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("hll estimate lands inside the p=10 error band on 20k-distinct fixtures") {
    // σ = 1.04/√1024 ≈ 3.3%: each fixture inside 3σ, and the MEAN
    // across fixtures near zero (the estimator is unbiased — verified
    // against a 40-prefix simulation: mean -0.06%, sd 3.1%).
    val errs = Seq("v", "x", "y").map { pref =>
      val vals = spark.range(20000)
        .select(concat(lit(pref), col("id")).as("v"))
      val est = Sketch.hllDistinct(vals, "v", p = 10)
        .select("n_est").as[Double].head()
      val err = (est - 20000.0) / 20000.0
      assert(math.abs(err) < 0.10, s"prefix $pref est $est")
      err
    }
    assert(math.abs(errs.sum / errs.size) < 0.05, errs.toString)
    // duplicates never move the registers: 3 copies, same estimate
    val vals = spark.range(20000).select(concat(lit("v"), col("id")).as("v"))
    val est = Sketch.hllDistinct(vals, "v", p = 10)
      .select("n_est").as[Double].head()
    val est3 = Sketch.hllDistinct(
      vals.union(vals).union(vals), "v", p = 10)
      .select("n_est").as[Double].head()
    assert(est3 == est)
  }

  test("hll merge of batch registers equals the whole-corpus registers exactly") {
    val a = spark.range(5000).select(concat(lit("x"), col("id")).as("v"))
    val b = spark.range(3000, 9000).select(concat(lit("x"), col("id")).as("v"))
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(a, "v").unionByName(Sketch.hllRegisters(b, "v")))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val whole = Sketch.hllRegisters(a.union(b), "v")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(merged == whole)
  }

  test("hll small-range linear counting and estimate partition invariance") {
    val small = spark.range(50).select(col("id").cast("string").as("v"))
    val est = Sketch.hllDistinct(small, "v", p = 10)
      .select("n_est").as[Double].head()
    assert(math.abs(est - 50.0) < 5.0, s"est $est")
    // nulls are not values
    val withNulls = small.union(
      spark.range(10).select(lit(null).cast("string").as("v")))
    assert(Sketch.hllDistinct(withNulls, "v", p = 10)
      .select("n_est").as[Double].head() == est)
    // row order / partitioning never moves the estimate
    val vals = spark.range(4000).select(col("id").cast("string").as("v"))
    val e1 = Sketch.hllDistinct(vals, "v").select("n_est").as[Double].head()
    val e2 = Sketch.hllDistinct(vals.repartition(13), "v")
      .select("n_est").as[Double].head()
    assert(e1 == e2)
  }

  test("grouped hll: per-group estimates inside the error band; grouped == per-slice ungrouped") {
    val df = spark.range(12000).select(
      when(col("id") % 3 === 0, "a").otherwise("b").as("g"),
      // group a: 4000 distinct; group b: 8000 rows over 4000 distinct
      // residues (every residue mod 4000 is hit by a non-multiple-of-3
      // id — 4000 ≡ 1 (mod 3) walks the residue classes)
      when(col("id") % 3 === 0, concat(lit("x"), col("id")))
        .otherwise(concat(lit("y"), pmod(col("id"), lit(4000)))).as("v"))
    val est = Sketch.hllDistinctBy(df, "g", "v", p = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(est("a") - 4000) < 4000 * 0.12, s"a ${est("a")}")
    assert(math.abs(est("b") - 4000) < 4000 * 0.12, s"b ${est("b")}")
    // the grouped estimate IS the ungrouped estimate of that slice —
    // same hash, same registers, same arithmetic
    val solo = Sketch.hllDistinct(df.filter(col("g") === "a").select("v"), "v", p = 10)
      .select("n_est").as[Double].head()
    assert(est("a") == solo)
  }

  test("grouped hll merge of batch registers equals whole-corpus grouped registers exactly") {
    val a = spark.range(5000).select(
      when(col("id") % 2 === 0, "g1").otherwise("g2").as("g"),
      concat(lit("x"), col("id")).as("v"))
    val b = spark.range(3000, 9000).select(
      when(col("id") % 2 === 0, "g1").otherwise("g2").as("g"),
      concat(lit("x"), col("id")).as("v"))
    val merged = Sketch.hllMergeBy(
      Sketch.hllRegistersBy(a, "g", "v").unionByName(Sketch.hllRegistersBy(b, "g", "v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val whole = Sketch.hllRegistersBy(a.union(b), "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(merged == whole)
  }
}
