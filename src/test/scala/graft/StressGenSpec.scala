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
}
