package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: a distributed trainer over the
  * word-frequency table and a pure-Catalyst encoder (a codegen'd
  * string-replace chain — no UDF anywhere). The reference counts
  * whitespace tokens only; a training-data pipeline needs subword
  * token budgets, and BPE is the standard (Sennrich et al. 2016,
  * the GPT-2/LLaMA tokenizer family).
  *
  * Representation: a word's token sequence is its characters joined
  * with `|` (e.g. "the" → "t|h|e"); applying merge (a,b) rewrites
  * `|a|b|` → `|ab|` with sentinel pipes so a pair can never match
  * across token or word boundaries; two replace passes per merge give
  * canonical greedy application for distinct pairs and a documented
  * deterministic variant for self-pairs on odd runs (see
  * `applyOneFramed`). Literal `|` characters are stripped from input
  * text up front (the delimiter must not occur in data; documented
  * contract).
  *
  * Scale design (100 TB): the corpus is scanned ONCE for word
  * frequencies; every merge iteration is one partial-aggregable
  * pair-count over the (distinct-word, freq) VOCAB table — orders of
  * magnitude smaller than the corpus — plus a one-row argmax to the
  * driver (the merge table itself is the only driver-side state,
  * bounded by nMerges). Encoding is a narrow per-row replace chain:
  * no shuffle, no state, fully codegen'd, and identical SQL runs in
  * any engine — which is what makes the application ORACLE-CHECKABLE
  * (p35) even though training is engine-side (spec'd against a
  * sequential reference implementation instead).
  */
object Bpe {

  /** `text` → the sentinel-framed whole-document representation:
    * `|w1c1|w1c2|...|` + `||` between words. The double pipe between
    * words blocks cross-word merges. */
  private[graft] def docRep(text: Column): Column = {
    val clean = regexp_replace(coalesce(text, lit("")), "\\|", "")
    val words = filter(split(clean, " "), w => w =!= "")
    // a wordless document is the EMPTY rep (not "||"): zero tokens,
    // and the token-count arithmetic stays pipes − words with no
    // special case
    when(size(words) === 0, lit(""))
      .otherwise(concat(lit("|"),
        array_join(transform(words, w => array_join(split(w, ""), "|")), "||"),
        lit("|")))
  }

  /** One merge (a, b) → ab on a sentinel-framed rep, applied as TWO
    * plain (regexp-free, codegen'd) replaces: a single left-to-right
    * pass misses every second occurrence of a consecutive run
    * (`|a|b|a|b|` — the shared delimiter is consumed by the first
    * match), and the second pass catches the pairs the first pass
    * separated. For DISTINCT pairs (a ≠ b) the result equals
    * canonical greedy BPE. For SELF-pairs (a = b) on odd runs of
    * length ≥ 5 the unmerged singleton lands mid-run instead of at
    * the end (`aaaaa` → aa,a,aa where canonical gives aa,aa,a): the
    * token COUNT of the merge itself is identical, the rule is
    * deterministic, and both engines implement the same replace
    * semantics so oracle parity is exact — but a LATER merge
    * consuming the differently-placed singleton can diverge from a
    * canonical-BPE tokenizer. BpeSpec pins both the distinct-pair
    * equivalence and the self-pair placement against a sequential
    * reference implementing this exact rule. */
  private def applyOneFramed(rep: Column, a: String, b: String): Column = {
    val pat = lit(s"|$a|$b|"); val rep2 = lit(s"|${a}${b}|")
    org.apache.spark.sql.functions.replace(
      org.apache.spark.sql.functions.replace(rep, pat, rep2), pat, rep2)
  }

  /** The whole merge table as one codegen'd column expression. */
  def applyMerges(text: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(docRep(text)) { case (rep, (a, b)) => applyOneFramed(rep, a, b) }

  /** BPE token count per document under a trained merge table:
    * Σ tokens over words = pipes(final rep) − words (each word
    * contributes tokens+1 pipes, none shared across the `||` word
    * boundary). Output: doc_id, n_words, n_tok. */
  def tokenCounts(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rep = applyMerges(col(textCol), merges)
    val pipes = length(rep) - length(regexp_replace(rep, "\\|", ""))
    val words = size(filter(split(
      regexp_replace(coalesce(col(textCol), lit("")), "\\|", ""), " "), w => w =!= ""))
    docs.select(col(idCol).as("doc_id"),
      words.cast("long").as("n_words"),
      (pipes - words).cast("long").as("n_tok"))
  }

  /** Encode: the ordered subword token array per document (word
    * boundaries collapse — the `||` separators split to empty strings
    * and are filtered). Narrow and codegen'd like [[tokenCounts]]. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      filter(split(applyMerges(col(textCol), merges), "\\|"),
        t => t =!= "").as("toks"))

  /** Train `nMerges` BPE merges over the corpus: one corpus scan for
    * word frequencies, then per merge one pair-count aggregation over
    * the vocab and a single-row argmax (count desc, then (a, b)
    * lexicographic — fully deterministic). Pair frequencies count
    * OVERLAPPING adjacent pairs (the standard), application is greedy
    * non-overlapping. Returns the merge table in training order. */
  def train(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): Seq[(String, String)] = {
    val clean = regexp_replace(coalesce(col(textCol), lit("")), "\\|", "")
    var vocab = docs
      .select(explode(split(clean, " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(array_join(split(col("word"), ""), "|").as("rep"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val toks = vocab.select(col("freq"), split(col("rep"), "\\|").as("t"))
        .filter(size(col("t")) >= 2)
      val best = toks.select(col("freq"),
          explode(expr("transform(sequence(0, size(t)-2), i -> struct(t[i] AS a, t[i+1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        // sentinel-frame, double-replace, strip — the same application
        // semantics as applyMerges (incl. the consecutive-run fix)
        val replaced = applyOneFramed(
          concat(lit("|"), col("rep"), lit("|")), a, b)
        vocab = vocab
          .select(replaced.as("f"), col("freq"))
          .select(expr("substring(f, 2, length(f) - 2)").as("rep"), col("freq"))
          .localCheckpoint(true)
        i += 1
      }
    }
    merges.toSeq
  }
}
