package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.sources.Tables

/** BPE trainer/encoder vs a sequential reference implementation —
  * merge selection (count desc, lexicographic tie-break), greedy
  * non-overlapping application incl. consecutive runs, and the
  * token-count arithmetic. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- sequential reference --------------------------------------------
  // One replace PASS over the framed string, in token terms: a match
  // consumes its trailing boundary pipe, so the immediately-following
  // token cannot START a match in the same pass (skip one extra).
  private def passOnce(toks: Vector[String], m: (String, String)): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == m._1 && toks(i + 1) == m._2) {
        out += (m._1 + m._2)
        if (i + 2 < toks.length) { out += toks(i + 2); i += 3 } else i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toVector
  }

  // The operator's exact application rule: two passes per merge —
  // canonical greedy for distinct pairs; for self-pairs on odd runs
  // the singleton lands mid-run (documented in Bpe.applyOneFramed).
  private def refApply(toks: Vector[String], m: (String, String)): Vector[String] =
    passOnce(passOnce(toks, m), m)

  // Canonical greedy BPE (the textbook rule) — used to PIN where the
  // operator's rule agrees with it and where it deliberately differs.
  private def canonicalApply(toks: Vector[String], m: (String, String)): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == m._1 && toks(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toVector
  }

  private def refTrain(wordFreq: Map[String, Long], n: Int): Seq[(String, String)] = {
    var vocab = wordFreq.toVector.map { case (w, f) =>
      (w.map(_.toString).toVector, f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var done = false
    while (k < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, f) <- vocab; i <- 0 until toks.length - 1)
        counts((toks(i), toks(i + 1))) = counts.getOrElse((toks(i), toks(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += best
        vocab = vocab.map { case (toks, f) => (refApply(toks, best), f) }
        k += 1
      }
    }
    merges.toSeq
  }

  private def refTokens(text: String, merges: Seq[(String, String)]): Long =
    text.split(" ", -1).map { w =>
      merges.foldLeft(w.replace("|", "").map(_.toString).toVector)(refApply).length.toLong
    }.sum

  test("train matches the sequential reference merge-for-merge on the fixture corpus") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text").limit(200)
    val freq = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter($"w" =!= "").groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val trained = Bpe.train(docs, nMerges = 12)
    assert(trained == refTrain(freq, 12), s"got $trained")
    assert(trained.size == 12)
  }

  test("applyMerges equals greedy reference application, including consecutive runs") {
    // runs of the same pair are where a single-pass replace diverges
    // from BPE greedy — pin the doubled-replace fix
    val docs = Seq(
      (1L, "ababab zz"),           // 3-run of (a,b) INSIDE one word
      (2L, "aaaa"),                // a,a,a,a -> aa,aa under merge (a,a)
      (3L, "x ab ab y"),           // pre-merged text, word boundaries
      (4L, ""),                    // empty doc -> zero tokens
      (5L, "the the theme")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab"), ("a", "a"), ("t", "h"), ("th", "e"))
    val got = Bpe.tokenCounts(docs, merges).orderBy("doc_id")
      .select("doc_id", "n_tok").as[(Long, Long)].collect().toSeq
    val want = Seq(1L, 2L, 3L, 4L, 5L).map { id =>
      val text = docs.filter($"doc_id" === id).select("text").as[String].head()
      id -> refTokens(text, merges)
    }
    assert(got == want)
    // spot-check the run semantics explicitly:
    // "ababab" -> (a,b): ab,ab,ab -> (ab,ab): abab,ab = 2 tokens, +2 for "zz"
    assert(got.head._2 == 4L)
  }

  test("distinct-pair merges equal canonical greedy BPE; self-pair odd runs pin the documented variant") {
    // distinct pairs: the two-pass rule IS canonical greedy
    for (word <- Seq("ababab", "abababab", "xabyabab", "abba")) {
      val toks = word.map(_.toString).toVector
      assert(refApply(toks, ("a", "b")) == canonicalApply(toks, ("a", "b")), word)
    }
    // engine matches the reference rule on a self-pair odd run...
    val docs5 = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs5, Seq(("a", "a"))).select("toks")
      .as[Seq[String]].head()
    assert(enc == Seq("aa", "a", "aa"))   // the documented placement
    // ...which differs from canonical (aa,aa,a) — same count for THIS
    // merge; a later merge like (aa,aa) is where counts diverge
    assert(canonicalApply("aaaaa".map(_.toString).toVector, ("a", "a"))
      == Vector("aa", "aa", "a"))
    val enc2 = Bpe.encode(docs5, Seq(("a", "a"), ("aa", "aa"))).select("toks")
      .as[Seq[String]].head()
    assert(enc2 == Seq("aa", "a", "aa"))  // no adjacent aa pair under our rule
  }

  test("encode emits the greedy token sequence; counts agree with tokenCounts") {
    val docs = Seq((1L, "ababab zz"), (2L, "the theme")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab"), ("t", "h"), ("th", "e"))
    val enc = Bpe.encode(docs, merges).orderBy("doc_id")
      .as[(Long, Seq[String])].collect().toSeq
    assert(enc == Seq(
      1L -> Seq("abab", "ab", "z", "z"),
      2L -> Seq("the", "the", "m", "e")))
    val viaCount = Bpe.tokenCounts(docs, merges).orderBy("doc_id")
      .select("n_tok").as[Long].collect().toSeq
    assert(viaCount == enc.map(_._2.size.toLong))
  }

  test("token counts under trained merges shrink monotonically with more merges") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text").limit(100)
    val m12 = Bpe.train(docs, 12)
    val t0 = Bpe.tokenCounts(docs, Nil).agg(sum("n_tok")).as[Long].head()
    val t6 = Bpe.tokenCounts(docs, m12.take(6)).agg(sum("n_tok")).as[Long].head()
    val t12 = Bpe.tokenCounts(docs, m12).agg(sum("n_tok")).as[Long].head()
    assert(t0 > t6 && t6 > t12, s"$t0 / $t6 / $t12")
    // no-merge token count = characters per word (sanity anchor)
    val chars = docs.select(sum(length(regexp_replace(
        regexp_replace(coalesce($"text", lit("")), "\\|", ""), " ", ""))))
      .as[Long].head()
    assert(t0 == chars)
  }
}
