package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

class DomainLogregSpec extends SparkSpec {
  import spark.implicits._

  test("one-vs-rest training recovers planted separable domains") {
    // Three domains with disjoint feature signatures on the quality
    // feature set: varied long docs (high distinct_ratio, no stops),
    // stopword-only docs (stop_ratio 1), and one-bigram loops
    // (top_frac ~0.5, tiny distinct_ratio).
    val docs = (0 until 150).map { i =>
      val (text, cls) = i % 3 match {
        case 0 => ((1 to 60).map(j => s"w${(i * 7 + j) % 97}").mkString(" "), "varied")
        case 1 => (Seq.fill(10)("the a and of to").mkString(" "), "stoppy")
        case 2 => (Seq.fill(20)("spam ham").mkString(" "), "loopy")
      }
      (i.toLong, text, cls)
    }.toDF("doc_id", "text", "domain")
    val feats = TextAnalysis.qualityFeatures(docs)
    val w = TextAnalysis.trainDomainLogreg(feats, docs.select($"doc_id", $"domain"))
    assert(w.map(_._1) == Seq("loopy", "stoppy", "varied")) // sorted-classes contract
    val scored = TextAnalysis.scoreDomains(feats, w)
      .select($"doc_id", $"domain".as("pred"))
      .join(docs.select($"doc_id", $"domain"), "doc_id")
    val acc = scored.filter($"pred" === $"domain").count().toDouble / 150
    assert(acc >= 0.95, s"argmax accuracy $acc < 0.95 on a separable corpus")
  }

  test("argmax ties break to the smallest class label; weight contract is validated") {
    val feats = Seq((1L, 0.5, 0.5, 0.0, 0.5))
      .toDF("doc_id", "len_frac", "stop_ratio", "top_frac", "distinct_ratio")
    val w = Seq(
      "b" -> Seq(0.125, 0.0, 0.0, 0.0, 0.0),
      "a" -> Seq(0.125, 0.0, 0.0, 0.0, 0.0))
    val r = TextAnalysis.scoreDomains(feats, w).head
    assert(r.getAs[String]("domain") == "a")
    assert(r.getAs[Double]("logit") == 0.125)
    intercept[IllegalArgumentException] {
      TextAnalysis.scoreDomains(feats, Seq("a" -> Seq(0.1)))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.scoreDomains(feats, w :+ ("a" -> Seq(0.0, 0.0, 0.0, 0.0, 0.0)))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.scoreDomains(feats, Seq.empty)
    }
  }

  test("training rejects a single-class label frame") {
    val docs = Seq((1L, "a b c", "only"), (2L, "d e f", "only"))
      .toDF("doc_id", "text", "domain")
    intercept[IllegalArgumentException] {
      TextAnalysis.trainDomainLogreg(
        TextAnalysis.qualityFeatures(docs), docs.select($"doc_id", $"domain"))
    }
  }
}
