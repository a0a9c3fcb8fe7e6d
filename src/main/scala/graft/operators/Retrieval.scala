package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** IR evaluation metrics for any ranked list against graded
    * relevance judgments — the measurement half of the retrieval
    * stack (BM25 / ANN / RRF / MMR produce lists; this scores them):
    * per query, nDCG@k (graded, base-2 discount), MRR@k (reciprocal
    * rank of the first relevant hit) and recall@k (hits / total
    * relevant). What every retrieval ablation loop reads.
    *
    * `results`: (q_id, id, rn) with rn 1-based; `qrels`: (q_id, id,
    * rel) graded, rel > 0 = relevant (pairs absent from qrels score
    * 0). Scale: every frame is retrieval-output- or judgment-sized,
    * never corpus data — one bounded join, two group-sized
    * aggregations, the ideal-ranking window partitions by q_id over
    * qrels only (judgments per query are label-team-sized by
    * construction). Determinism: the base-2 discount is
    * `ln(rn+1) / ln2` with ln2 as the same double literal both
    * engines parse, each term 6-dp rounded, per-query sums are
    * ascending sorted folds, ndcg/recall divisions round at 6 dp —
    * the dsir/rrf discipline end to end.
    * Output: q_id, ndcg, mrr, recall, n_hit, n_rel (0-metrics for
    * queries with no relevant judgments, never null/NaN). */
  def evalMetrics(results: DataFrame, qrels: DataFrame,
      k: Int = 10): DataFrame = {
    require(k > 0, "k must be positive")
    val ln2 = lit(0.6931471805599453)
    def dcgTerm(rel: Column, rank: Column): Column =
      round(rel / (log(rank + 1) / ln2), 6)
    def sortedSum(c: Column): Column =
      round(aggregate(sort_array(collect_list(c)), lit(0d), _ + _), 6)
    val rel = qrels.select(col("q_id"), col("id"),
      col("rel").cast("double").as("rel"))
    val hits = results.filter(col("rn") <= k)
      .select(col("q_id"), col("id"), col("rn"))
      .join(rel, Seq("q_id", "id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0.0)))
    val perQ = hits.groupBy("q_id").agg(
      sortedSum(dcgTerm(col("rel"), col("rn"))).as("dcg"),
      max(when(col("rel") > 0, round(lit(1.0) / col("rn"), 6))
        .otherwise(lit(0.0))).as("mrr"),
      sum(when(col("rel") > 0, 1L).otherwise(0L)).cast("long").as("n_hit"))
    val ideal = rel.filter(col("rel") > 0)
      .withColumn("irn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rel").desc, col("id"))))
      .filter(col("irn") <= k)
      .groupBy("q_id")
      .agg(sortedSum(dcgTerm(col("rel"), col("irn"))).as("idcg"))
    val totals = rel.filter(col("rel") > 0).groupBy("q_id")
      .agg(count(lit(1)).cast("long").as("n_rel"))
    perQ.join(broadcast(ideal), Seq("q_id"), "left")
      .join(broadcast(totals), Seq("q_id"), "left")
      .select(col("q_id"),
        when(col("idcg") > 0, round(col("dcg") / col("idcg"), 6))
          .otherwise(lit(0.0)).as("ndcg"),
        col("mrr"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          round(col("n_hit").cast("double") / col("n_rel"), 6))
          .otherwise(lit(0.0)).as("recall"),
        col("n_hit"), coalesce(col("n_rel"), lit(0L)).as("n_rel"))
  }

  /** MMR (Maximal Marginal Relevance, Carbonell & Goldstein) diversity
    * re-rank of a retrieval shortlist: greedily pick the candidate
    * maximizing `λ·rel − (1−λ)·max sim to the already-selected`, so
    * the final k trade relevance against redundancy (λ=1 is plain
    * top-k; λ=0 pure diversity). The de-facto post-processing step
    * between "top-k by score" and "top-k worth showing/labeling".
    *
    * Greedy selection is inherently sequential in k — but ONLY over
    * the shortlist: every frame here is (queries × shortlist) rows,
    * retrieval output, never corpus data, so the k bounded argmax
    * jobs cost the same at any corpus size. The candidate-pair
    * cosines are computed once (queries × N² rows, N = shortlist
    * size) and localCheckpointed so the per-step lineage stays flat
    * (the trainCentroids lesson). Candidates must have an embedding
    * row; sims round to 3dp and the MMR score to 6dp with vec_id
    * tiebreaks, so the selection is engine-exact.
    *
    * `cands`: (q_id, vec_id, rel) — rel from any retriever, already
    * deterministically rounded. Output: q_id, vec_id, rel, step
    * (1-based selection order). */
  def mmrRerank(cands: DataFrame, emb: DataFrame, k: Int = 5,
      lambda: Double = 0.5): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0, 1]")
    val mu = 1.0 - lambda
    val e = emb.select(col("vec_id"),
      graft.functions.Vectors.asDouble(col("embedding")).as("emb"))
    val ce = cands.select("q_id", "vec_id", "rel").join(e, "vec_id")
      .localCheckpoint(false)
    val pairs = ce.select(col("q_id"), col("vec_id"), col("emb"))
      .join(ce.select(col("q_id").as("q2"), col("vec_id").as("o_id"),
        col("emb").as("oemb")),
        col("q_id") === col("q2") && col("vec_id") =!= col("o_id"))
      .select(col("q_id"), col("vec_id"), col("o_id"),
        round(graft.functions.Vectors.cosine(col("emb"), col("oemb")), 3)
          .as("sim"))
      .localCheckpoint(false)
    val base = ce.select("q_id", "vec_id", "rel")
    val first = base
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rel").desc, col("vec_id"))))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("step", lit(1)).localCheckpoint(false)
    var selected = first
    for (t <- 2 to k) {
      val selIds = selected.select(col("q_id").as("sq"), col("vec_id").as("sel_id"))
      val remaining = base.join(
        selIds.select(col("sq").as("q_id"), col("sel_id").as("vec_id")),
        Seq("q_id", "vec_id"), "left_anti")
      val scored = remaining
        .join(pairs.join(selIds,
            col("q_id") === col("sq") && col("o_id") === col("sel_id"))
          .groupBy(col("q_id").as("mq"), col("vec_id").as("mv"))
          .agg(max("sim").as("msim")),
          col("q_id") === col("mq") && col("vec_id") === col("mv"), "left")
        .select(col("q_id"), col("vec_id"), col("rel"),
          round(lit(lambda) * col("rel") -
            lit(mu) * coalesce(col("msim"), lit(0.0)), 6).as("mmr"))
      val pick = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy("q_id").orderBy(col("mmr").desc, col("vec_id"))))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("vec_id"), col("rel"), lit(t).as("step"))
      // lazy pin: materializes inside the next step's anti-join (or the
      // caller's first action on the last step) - same flat lineage,
      // one fewer dedicated job per greedy step (r14)
      selected = selected.unionByName(pick).localCheckpoint(false)
    }
    selected
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
