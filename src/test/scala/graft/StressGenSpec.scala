package graft

import org.apache.spark.sql.functions._

import graft.gen.DataGen
import graft.operators.{Ann, Dedup}

/** The corpus/embedding generators behind `tools.Stress`: partition-
  * invariant (the property that makes them usable as distributed
  * fixtures at any scale), and the PLANTED dedup structure is both
  * present at its declared rates and actually recovered by the
  * operators the stress harness drives — so a stress run's row counts
  * are meaningful recall evidence, not just throughput. */
class StressGenSpec extends SparkSpec {

  private val N = 5000L
  private lazy val docs = DataGen.documents(spark, N).cache()
  private lazy val emb = DataGen.embeddings(spark, 4000).cache()

  test("documents generator is deterministic and partition-invariant") {
    val a = DataGen.documents(spark, 800).orderBy("doc_id").collect()
    val b = DataGen.documents(spark, 800).repartition(7).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("embeddings generator is deterministic and partition-invariant") {
    val a = DataGen.embeddings(spark, 800).orderBy("vec_id").collect()
    val b = DataGen.embeddings(spark, 800).repartition(7).orderBy("vec_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("planted exact-dup rate ~4%: distinct texts ≈ 0.96n, exactKeepFirst recovers them") {
    val distinct = docs.select(countDistinct("text")).collect().head.getLong(0)
    val rate = (N - distinct).toDouble / N
    assert(math.abs(rate - 0.04) < 0.012, s"exact-dup rate $rate")
    // keep-first survivors == distinct texts (each dup group keeps one)
    assert(Dedup.exactKeepFirst(docs).count() == distinct)
  }

  test("planted near-dups merge in dedupCorpus: survivors land in the expected band") {
    // exact dups (~4%) all merge; near-dups (~4%) share all but one of
    // 20-79 words, Jaccard(3-gram shingles) ≈ 0.9 — LSH at 4 bands × 4
    // rows catches ~90% of pairs at that similarity. Survivor count
    // lands between "only exact merged" and "everything planted merged".
    val s = Dedup.dedupCorpus(docs).count().toDouble / N
    assert(s > 0.89 && s < 0.95, s"survivor fraction $s")
    // no two survivors share a text: the exact class is fully closed
    val surv = Dedup.dedupCorpus(docs)
    assert(surv.groupBy("text").count().filter(col("count") > 1).isEmpty)
  }

  test("planted boilerplate is on ~10% of docs and stripBoilerplate removes exactly it") {
    val withBp = docs.filter(col("text").startsWith(DataGen.BoilerPara)).count()
    val rate = withBp.toDouble / N
    assert(math.abs(rate - 0.10) < 0.02, s"boilerplate rate $rate")
    val stripped = Dedup.stripBoilerplate(docs, maxDocs = 100)
    assert(stripped.filter(col("clean_text").contains(DataGen.BoilerPara)).isEmpty)
    // non-boilerplate docs come back verbatim
    val unchanged = docs.filter(!col("text").startsWith(DataGen.BoilerPara))
      .join(stripped, "doc_id")
      .filter(col("clean_text") =!= col("text"))
    assert(unchanged.isEmpty)
  }

  test("planted embedding near-dups are found by lshNearDup at cosine ≈ 0.999") {
    val top = Ann.lshNearDup(emb, topN = 50).collect()
    assert(top.length == 50)
    assert(top.forall(_.getAs[Double]("sim") > 0.99),
      s"min sim ${top.map(_.getAs[Double]("sim")).min}")
  }

  test("the 8-bit-key recall cliff is real at 250k vectors and lshNearDupAuto clears it") {
    // Hyperplane sketches of this corpus spread unevenly over the 256
    // 8-bit band keys (measured min/max bucket 122/1473 at 150k — the
    // planes are ±1, not orthogonal, so sketch bits correlate). At
    // 250k vectors even the SMALLEST bucket (207) exceeds maxBucket
    // 200: the default key width deterministically drops every bucket
    // and returns nothing — the defect tools.Stress caught live. Auto
    // widens the band keys with log2(n) and recovers the dups.
    val big = DataGen.embeddings(spark, 250000).cache()
    try {
      assert(Ann.lshNearDup(big, topN = 50).isEmpty,
        "expected the fixed-width path to collapse at this n (else the test scale is wrong)")
      val top = Ann.lshNearDupAuto(big, topN = 50).collect()
      assert(top.length == 50)
      assert(top.forall(_.getAs[Double]("sim") > 0.99),
        s"min sim ${top.map(_.getAs[Double]("sim")).min}")
    } finally big.unpersist()
  }

  test("simhash block-pair keys: same pair set as single-block at small n, full recall at 150k where single-block collapses") {
    import spark.implicits._
    // law: both schemes guarantee every pair within maxDist when no
    // bucket caps — the result SETS must be identical
    val small = DataGen.documents(spark, 1500)
    val sim = Dedup.simhashPacked(small).cache()
    try {
      val a = Dedup.simhashPairs(sim).select("d1", "d2", "dist").collect().toSet
      val b = Dedup.simhashPairsScaled(sim).select("d1", "d2", "dist").collect().toSet
      assert(a == b, s"single-block ${a.size} pairs vs block-pair ${b.size}")
      assert(a.nonEmpty)
    } finally sim.unpersist()
    // scale: synthetic 60-bit fingerprints, uniform except 300 planted
    // identical pairs (i, i + n). Single-block keys average 146 docs
    // per 10-bit bucket at n=150k — over the cap, recall collapses;
    // block-pair keys average ~2 per 16-bit bucket and find every
    // planted pair.
    val n = 150000L
    val base = spark.range(n).select(col("id").as("doc_id"),
      pmod(hash(col("id"), lit("sim")), lit(1L << 60)).cast("long").as("simhash"))
    val plants = spark.range(300).select((col("id") + n).as("doc_id"),
      pmod(hash(col("id"), lit("sim")), lit(1L << 60)).cast("long").as("simhash"))
    val fp = base.unionByName(plants)
    val planted = spark.range(300)
      .select(col("id").as("d1"), (col("id") + n).as("d2"))
    val single = Dedup.simhashPairs(fp).join(planted, Seq("d1", "d2")).count()
    val scaled = Dedup.simhashPairsScaled(fp).join(planted, Seq("d1", "d2")).count()
    assert(single < 50, s"single-block found $single/300 — expected near-total collapse")
    assert(scaled == 300, s"block-pair found only $scaled/300 planted pairs")
  }
}
