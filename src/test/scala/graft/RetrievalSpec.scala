package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(rows: (Long, Long, Int)*) =
    rows.toDF("q_id", "id", "rn")

  test("rrfFuse: a candidate in both lists outranks single-list candidates; scores exact") {
    val lex = ranked((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
    val den = ranked((0L, 10L, 1), (0L, 13L, 2))
    val out = Retrieval.rrfFuse(Seq(lex, den), k = 10)
      .orderBy("rn").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // id 10 is rank 1 in BOTH lists: rrf = 2/61 exactly (rounded 6dp)
    assert(out.head._1 == 10L)
    assert(out.head._2 == math.rint(2.0 / 61 * 1e6) / 1e6)
    // dual-list always beats any single-list candidate here
    assert(out.tail.forall(_._2 < out.head._2))
    // single-list scores: 1/(60+rn), ties broken by id
    val m = out.map(t => t._1 -> t._2).toMap
    assert(m(11L) == math.rint(1.0 / 62 * 1e6) / 1e6)
    assert(m(13L) == m(11L)) // same rank 2 in different lists → tie
    val rnOf = out.map(t => t._1 -> t._3).toMap
    assert(rnOf(11L) < rnOf(13L)) // tie → lower id first
  }

  test("rrfFuse caps at k per query and keeps queries independent") {
    val lex = ranked((0L until 8L).map(i => (0L, 100L + i, i.toInt + 1)) ++
      Seq((1L, 500L, 1)): _*)
    val den = ranked((0L until 8L).map(i => (0L, 200L + i, i.toInt + 1)): _*)
    val out = Retrieval.rrfFuse(Seq(lex, den), k = 5).collect()
    val q0 = out.filter(_.getLong(0) == 0L)
    assert(q0.length == 5 && q0.map(_.getInt(3)).sorted.toSeq == (1 to 5))
    val q1 = out.filter(_.getLong(0) == 1L)
    assert(q1.length == 1 && q1.head.getLong(1) == 500L)
  }

  test("hybridTopK fuses the library's own BM25 and dense retrievers") {
    val docs = Seq(
      (0L, "the zebra query text example words"),
      (1L, "the zebra runs far away today"),
      (2L, "completely different tokens here now"),
      (3L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.95f, 0.05f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val q = docs.filter(col("doc_id") === 0L)
      .select(col("doc_id").as("q_id"), col("text").as("qtext"))
    val out = Retrieval.hybridTopK(docs, emb, q, k = 3)
      .orderBy("rn").collect().map(_.getLong(1))
    // doc 1 is top in BOTH spaces (shares "zebra", nearest vector) →
    // it must fuse to rank 1; the query doc itself never appears
    assert(out.head == 1L, out.toSeq.toString)
    assert(!out.contains(0L))
  }

  test("rm3TopK: expansion recovers vocabulary-mismatch docs plain BM25 cannot reach") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (0L, "car engine automobile motor repair"),
      (1L, "automobile motor maintenance guide"),
      (2L, "automobile motor handbook pages"),
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val q = Seq((99L, "car engine")).toDF("q_id", "qtext")
    val bm = TextAnalysis.bm25TopK(docs, q, k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(bm == Set(0L)) // the literal query only reaches doc 0
    val rows = TextAnalysis.rm3TopK(docs, q, k = 5, fb = 2, e = 3, alpha = 0.5)
      .orderBy("rn").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(rows.head._1 == 0L) // the literal match still wins
    val ids = rows.map(_._1).toSet
    assert(Set(1L, 2L).subsetOf(ids), s"expansion docs missing from $ids")
    assert(rows.filter(t => t._1 == 1L || t._1 == 2L).forall(_._2 > 0))
    // identical synonym-only docs tie on score; the id breaks the tie
    val rnOf = rows.map(_._1).zipWithIndex.toMap
    assert(rnOf(1L) < rnOf(2L))
  }

  test("mmrRerank: redundant runner-up is skipped for a diverse pick; λ=1 is plain top-k") {
    // Embedding geometry: 10 and 11 nearly identical (cos ≈ 1), 12
    // orthogonal to both. Relevance: 10 > 11 > 12.
    val emb = Seq(
      (10L, Array(1f, 0f, 0.1f)), (11L, Array(1f, 0f, 0f)),
      (12L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val cands = Seq((0L, 10L, 0.9), (0L, 11L, 0.8), (0L, 12L, 0.5))
      .toDF("q_id", "vec_id", "rel")
    // λ=0.5: step 2 scores 11 at .5*.8-.5*.995 < 12's .5*.5-.5*0 —
    // diversity wins
    val mmr = Retrieval.mmrRerank(cands, emb, k = 3, lambda = 0.5)
      .orderBy("step").select("vec_id").as[Long].collect().toSeq
    assert(mmr == Seq(10L, 12L, 11L))
    // λ=1 ignores redundancy: pure relevance order
    val plain = Retrieval.mmrRerank(cands, emb, k = 3, lambda = 1.0)
      .orderBy("step").select("vec_id").as[Long].collect().toSeq
    assert(plain == Seq(10L, 11L, 12L))
  }

  test("mmrRerank: queries independent; k beyond the shortlist stops at the shortlist") {
    val emb = Seq(
      (10L, Array(1f, 0f)), (11L, Array(0f, 1f)),
      (20L, Array(1f, 1f)), (21L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val cands = Seq((0L, 10L, 0.9), (0L, 11L, 0.4),
      (1L, 20L, 0.7), (1L, 21L, 0.6)).toDF("q_id", "vec_id", "rel")
    val out = Retrieval.mmrRerank(cands, emb, k = 5, lambda = 0.5)
      .orderBy("q_id", "step")
      .select("q_id", "vec_id", "step").as[(Long, Long, Int)].collect().toSeq
    // each query yields exactly its 2 candidates, steps 1..2, no
    // cross-query leakage and no phantom picks past the shortlist
    assert(out == Seq((0L, 10L, 1), (0L, 11L, 2), (1L, 20L, 1), (1L, 21L, 2)))
  }

  test("rm3TopK at alpha = 1 degenerates to bm25TopK on the positive-score prefix") {
    import graft.functions.TextAnalysis
    val docs = (0L until 12L).map { i =>
      (i, Seq("common", s"tok${i % 4}", s"tok${(i + 1) % 4}",
        s"word$i", "filler").mkString(" "))
    }.toDF("doc_id", "text")
    val q = docs.filter($"doc_id" < 2)
      .select($"doc_id".as("q_id"), $"text".as("qtext"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "doc_id", "score", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val bm = key(TextAnalysis.bm25TopK(docs, q, k = 8))
    val rm = key(TextAnalysis.rm3TopK(docs, q, k = 8, alpha = 1.0)
      .filter($"score" > 0))
    assert(rm == bm)
  }

  test("evalMetrics: hand-checked nDCG/MRR/recall, perfect list, empty qrels") {
    val results = ranked(
      // q1: hit at 1 (rel 2), miss at 2, hit at 3 (rel 1); one relevant unretrieved
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      // q2: perfect ranking of its two judged docs
      (2L, 20L, 1), (2L, 21L, 2),
      // q3: no judged docs at all
      (3L, 30L, 1))
    val qrels = Seq(
      (1L, 10L, 2.0), (1L, 12L, 1.0), (1L, 99L, 1.0),
      (2L, 20L, 3.0), (2L, 21L, 1.0)).toDF("q_id", "id", "rel")
    val m = Retrieval.evalMetrics(results, qrels, k = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getLong(4), r.getLong(5)))).toMap
    // q1 by hand: DCG = 2/log2(2) + 0 + 1/log2(4) = 2.5;
    // IDCG = 2 + 1/log2(3) + 1/log2(4) = 2 + 0.63093 + 0.5
    val ndcg1 = BigDecimal(2.5 / 3.13093)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(1L) == ((ndcg1, 1.0, 0.666667, 2L, 3L)))
    // q2: results order == ideal order -> nDCG exactly 1
    assert(m(2L) == ((1.0, 1.0, 1.0, 2L, 2L)))
    // q3: nothing judged -> all-zero metrics, never null/NaN
    assert(m(3L) == ((0.0, 0.0, 0.0, 0L, 0L)))
  }

  test("evalMetrics: rank beyond k is invisible; rn<=k filter applied") {
    val results = ranked((1L, 10L, 1), (1L, 11L, 12))
    val qrels = Seq((1L, 11L, 5.0)).toDF("q_id", "id", "rel")
    val m = Retrieval.evalMetrics(results, qrels, k = 10).collect().head
    // the only relevant doc sits at rank 12 > k: zero hits
    assert(m.getDouble(1) == 0.0 && m.getDouble(2) == 0.0 &&
      m.getLong(4) == 0L && m.getLong(5) == 1L)
  }
}
