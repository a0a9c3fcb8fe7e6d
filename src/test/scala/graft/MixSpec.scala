package graft

import graft.operators.Mix

class MixSpec extends SparkSpec {
  import spark.implicits._

  // The operator's md5-uniform, replicated exactly: assertions below
  // derive the expected copy counts instead of hardcoding hash luck.
  private def u(id: Long): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rs:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h.substring(0, 8), 16).toDouble / 4294967296.0
  }

  private def corpus = Seq(
    (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"), (10L, "fr", "b"))
    .toDF("doc_id", "lang", "source")

  test("resampleByWeight emits floor(w) copies plus a deterministic md5 extra") {
    val wts = Seq(("en", "a", 2.0 / 3.0), ("fr", "b", 2.0))
      .toDF("lang", "source", "weight")
    val got = Mix.resampleByWeight(corpus, wts, Seq("lang", "source"))
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // fr doc: floor(2.0) = 2 guaranteed copies, frac = 0 so never a third
    assert(got(10L) == 2L)
    // en docs: 0 guaranteed, kept iff u < 2/3 — per-doc deterministic
    for (id <- Seq(1L, 2L, 3L)) {
      val expected = if (u(id) < 2.0 / 3.0) Some(1L) else None
      assert(got.get(id) == expected, s"doc $id: u=${u(id)}")
    }
    // copy indices are contiguous from 1
    val copies = Mix.resampleByWeight(corpus, wts, Seq("lang", "source"))
      .filter($"doc_id" === 10L).select("copy").as[Int].collect().sorted
    assert(copies.toSeq == Seq(1, 2))
  }

  test("resampleByWeight caps pathological weights at maxCopies") {
    val wts = Seq(("en", "a", 1000.0), ("fr", "b", 0.0))
      .toDF("lang", "source", "weight")
    val got = Mix.resampleByWeight(corpus, wts, Seq("lang", "source"), maxCopies = 4)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(got(_) == 4L)) // capped, not 1000
    assert(!got.contains(10L))                   // weight 0 drops the domain
  }
}
