package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rank-list fusion for hybrid retrieval: the lexical side
  * ([[graft.functions.TextAnalysis.bm25TopK]]) and the dense side
  * ([[Ann]]'s top-k family) each produce a per-query ranked list;
  * fusing them is how every hybrid search stack combines exact-match
  * and semantic recall without comparing incomparable scores.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al.): a candidate's fused
    * score is `Σ_lists 1 / (k0 + rank)` over the lists that retrieved
    * it (absent → contributes nothing). Rank-based, so BM25 scores
    * and cosines never need calibration against each other; k0 = 60
    * is the published default that damps rank-1 dominance.
    *
    * Inputs: each frame carries (q_id, id, rn) with rn = 1-based rank
    * per query. Output: q_id, id, rrf, rn — the fused top-k per query.
    *
    * Determinism: each contribution `1/(k0 + rn)` is one IEEE division
    * of exact integers; the per-candidate sum is an ascending sorted
    * fold; ties in the fused score break by id. Scale: a union of
    * (queries × k) rows — retrieval output, never corpus data — so
    * the fusion costs one bounded groupBy + per-query top-k window
    * regardless of corpus size. */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 10, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0 && k0 >= 0, "k must be positive, k0 non-negative")
    lists.map(_.select(col("q_id"), col("id"),
        (lit(1.0) / (col("rn") + k0)).as("contrib")))
      .reduce(_ unionByName _)
      .groupBy("q_id", "id")
      .agg(round(aggregate(sort_array(collect_list(col("contrib"))), lit(0d), _ + _), 6)
        .as("rrf"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rrf").desc, col("id"))))
      .filter(col("rn") <= k)
  }

  /** The standard hybrid-search composition over this library's own
    * retrievers: BM25 over `docs` ∪ brute-force cosine over `emb`
    * (ids shared across the two tables — the fixture/SemDeDup
    * convention), fused with [[rrfFuse]]. `queries` carries
    * (q_id, qtext); the dense side queries are the embedding rows
    * whose vec_id appears in `queries`. */
  def hybridTopK(docs: DataFrame, emb: DataFrame, queries: DataFrame,
      k: Int = 10, kEach: Int = 10, k0: Int = 60): DataFrame = {
    val lex = graft.functions.TextAnalysis.bm25TopK(docs, queries, kEach)
      .select(col("q_id"), col("doc_id").as("id"), col("rn"))
    val den = Ann.bruteTopK(emb,
        emb.join(queries.select(col("q_id").as("vec_id")), "vec_id"), kEach)
      .select(col("q_id"), col("vec_id").as("id"), col("rn"))
    rrfFuse(Seq(lex, den), k, k0)
  }
}
