package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exactKeepFirst keeps one row per identical text, lowest id") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val kept = Dedup.exactKeepFirst(d).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("wordShingles emits distinct 3-grams") {
    val d = docs((1L, "a b c d"))
    val sh = Dedup.wordShingles(d).select("shingle").as[String].collect().sorted
    assert(sh.toSeq == Seq("a b c", "b c d"))
  }

  test("identical docs share every minhash band; disjoint docs share none") {
    val d = docs((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
    val cand = Dedup.lshCandidates(Dedup.lshBands(Dedup.minhashSignatures(
      Dedup.wordShingles(d))))
    val pairs = cand.as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("lshCandidates drops hot band buckets (boilerplate corpus stays sub-quadratic)") {
    // 250 docs sharing identical boilerplate collide on every band key;
    // uncapped that is 250*249/2 pairs from one bucket. The default cap
    // (100) drops the hot bucket entirely while an unrelated small pair
    // still surfaces.
    val boiler = (1L to 250L).map(i => (i, "shared boilerplate header text common to every single document here"))
    val pair = Seq((1001L, "alpha beta gamma delta epsilon zeta eta"),
      (1002L, "alpha beta gamma delta epsilon zeta eta"))
    val bands = Dedup.lshBands(Dedup.minhashSignatures(
      Dedup.wordShingles(docs((boiler ++ pair): _*))))
    val capped = Dedup.lshCandidates(bands).as[(Long, Long)].collect().toSet
    assert(capped == Set((1001L, 1002L)))
    val uncapped = Dedup.lshCandidates(bands, maxBucket = 1000).count()
    assert(uncapped == 250L * 249 / 2 + 1)  // the blowup the cap prevents
  }

  test("jaccardPairs computes exact set Jaccard") {
    // shingles: doc1 {a b c, b c d}, doc2 {a b c, b c x} -> J = 1/3
    val d = docs((1L, "a b c d"), (2L, "a b c x"))
    val j = Dedup.jaccardPairs(Dedup.wordShingles(d))
      .select("jaccard").as[Double].head()
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
  }

  test("simhash: identical texts collide, near texts are close, far texts far") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog today again ok"),
      (2L, "the quick brown fox jumps over the lazy dog today again ok"),
      (3L, "the quick brown fox jumps over the lazy dog today again no"),
      (4L, "zz yy xx ww vv uu tt ss rr qq pp oo"))
    val sims = Dedup.simhash(d).as[(Long, Long)].collect().toMap
    assert(sims(1L) == sims(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(3L)) < ham(sims(1L), sims(4L)))
  }

  test("simhashPairs finds identical pair at distance 0 via blocking") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words everywhere in this document"))
    val pairs = Dedup.simhashPairs(Dedup.simhash(d), maxDist = 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
