package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** URL-curation operators: canonicalization, URL-level dedup, and the
  * domain blocklist stage. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Quality.normalizeUrl(col("u")).as("n"))
      .as[String].head()

  test("normalizeUrl folds every cosmetic variant class to one canonical form") {
    val canonical = "https://www.ex.com/a/b?a=1&b=2"
    val variants = Seq(
      "HTTPS://WWW.EX.COM/a/b?a=1&b=2",          // scheme+host case
      "https://www.ex.com:443/a/b?a=1&b=2",      // default port
      "https://user:pw@www.ex.com/a/b?a=1&b=2",  // userinfo
      "https://www.ex.com/a//b?a=1&b=2",         // doubled slash
      "https://www.ex.com/a/b/?a=1&b=2",         // trailing slash
      "https://www.ex.com/a/b?b=2&a=1",          // param order
      "https://www.ex.com/a/b?a=1&utm_source=x&b=2&fbclid=z", // trackers
      "https://www.ex.com/a/b?a=1&b=2#frag",     // fragment
      "  https://www.ex.com/a/b?a=1&b=2  ")      // whitespace
    variants.foreach { v =>
      assert(norm(v) == canonical, s"variant <$v>")
    }
    // path CASE is significant — only scheme/host lowercase
    assert(norm("https://ex.com/A/B") == "https://ex.com/A/B")
  }

  test("normalizeUrl keeps genuinely distinct URLs distinct") {
    assert(norm("https://ex.com/a") != norm("https://www.ex.com/a")) // www kept
    assert(norm("http://ex.com/a") != norm("https://ex.com/a"))      // scheme kept
    assert(norm("https://ex.com:8443/a") != norm("https://ex.com/a")) // non-default port
    assert(norm("https://ex.com/a?x=1") != norm("https://ex.com/a?x=2"))
    // http default port is 80, not 443
    assert(norm("http://ex.com:80/a") == "http://ex.com/a")
    assert(norm("http://ex.com:443/a") == "http://ex.com:443/a")
  }

  test("normalizeUrl edge forms: all-tracker query, root slash, non-URL, null") {
    assert(norm("https://ex.com/a?utm_source=x&utm_medium=y") == "https://ex.com/a")
    assert(norm("https://ex.com/") == "https://ex.com")
    assert(norm("not a url") == "not a url") // pass-through, groupable
    val n = Seq((1L, null: String)).toDF("id", "u")
      .select(Quality.normalizeUrl(col("u")).as("n")).as[String].head()
    assert(n == "") // null never reaches the dedup join as a null key
  }

  test("normalizeUrl drops trackers by WHOLE param name, never by prefix") {
    // 'gclid_src' / 'fbclidx' are NOT tracking params — a prefix match
    // would mangle them to '_src=foo' / 'x=1' and falsely merge
    // genuinely distinct URLs (r7 ADVICE finding).
    assert(norm("https://ex.com/a?gclid_src=foo") ==
      "https://ex.com/a?gclid_src=foo")
    assert(norm("https://ex.com/a?fbclidx=1") == "https://ex.com/a?fbclidx=1")
    assert(norm("https://ex.com/a?gclid_src=1") != norm("https://ex.com/a"))
    // the real trackers still go, valueless or not
    assert(norm("https://ex.com/a?gclid=x&b=1") == "https://ex.com/a?b=1")
    assert(norm("https://ex.com/a?fbclid&b=1") == "https://ex.com/a?b=1")
    // separator debris never splits a group
    assert(norm("https://ex.com/a?b=2&&a=1") == "https://ex.com/a?a=1&b=2")
  }

  test("urlDedup keeps the min doc_id per canonical URL and flags the rest") {
    val docs = Seq(
      (1L, "https://EX.com/p/1"),
      (2L, "https://ex.com/p/1/"),          // dup of 1
      (3L, "https://ex.com/p/1?utm_source=x"), // dup of 1
      (4L, "https://ex.com/p/2"),
      (5L, null: String)).toDF("doc_id", "url")
    val out = Quality.urlDedup(docs).orderBy("doc_id")
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, true), (2L, false), (3L, false), (4L, true), (5L, true)))
  }

  test("blocklistFilter blocks exact domains and all subdomains, strips authority noise") {
    val docs = Seq(
      (1L, "https://ads.example.com/x"),        // exact hit
      (2L, "https://deep.sub.ads.example.com/x"), // subdomain hit
      (3L, "https://example.com/x"),            // parent of blocked — clean
      (4L, "https://bot@Tracker.NET:8080/x"),   // case/userinfo/port noise
      (5L, "https://clean.org/x")).toDF("doc_id", "url")
    val blk = Seq("ads.example.com", "tracker.net").toDF("domain")
    val out = Quality.blocklistFilter(docs, blk).orderBy("doc_id")
      .select("doc_id", "matched", "kept")
      .as[(Long, Option[String], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, Some("ads.example.com"), false),
      (2L, Some("ads.example.com"), false),
      (3L, None, true),
      (4L, Some("tracker.net"), false),
      (5L, None, true)))
  }

  test("blocklistFilter catches the trailing-dot FQDN spelling of a blocked domain") {
    // 'example.com.' is a valid absolute-FQDN spelling of 'example.com';
    // without the trailing-dot strip its suffix chain never equals any
    // blocklist entry and the evader sails through (r7 ADVICE finding).
    val docs = Seq(
      (1L, "https://ads.example.com./x"),
      (2L, "https://sub.ads.example.com.:8080/x"),
      (3L, "https://clean.org./x")).toDF("doc_id", "url")
    val blk = Seq("ads.example.com").toDF("domain")
    val out = Quality.blocklistFilter(docs, blk).orderBy("doc_id")
      .select("doc_id", "host", "kept")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "ads.example.com", false),
      (2L, "sub.ads.example.com", false),
      (3L, "clean.org", true)))
  }

  test("blocklistFilter with nested blocked ancestors matches deterministically") {
    val docs = Seq((1L, "https://a.b.c.org/x")).toDF("doc_id", "url")
    val blk = Seq("b.c.org", "c.org").toDF("domain")
    val m = Quality.blocklistFilter(docs, blk)
      .select("matched").as[String].head()
    assert(m == "b.c.org") // min over the matched suffixes
  }

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("corpusDrift of a snapshot against itself is exactly zero everywhere") {
    val a = corpus((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "alpha alpha beta"))
    val terms = Quality.corpusDrift(a, a, buckets = 64)
      .select("js_term").as[Double].collect()
    assert(terms.nonEmpty && terms.forall(_ == 0.0))
  }

  test("corpusDrift is symmetric and bounded by ln 2; a planted shift dominates") {
    val a = corpus((1L, "alpha beta gamma delta"), (2L, "beta gamma delta"))
    val b = corpus((1L, "alpha beta gamma delta"),
      (2L, "spam spam spam spam spam spam spam spam"))
    val ab = Quality.corpusDrift(a, b, buckets = 64)
    val ba = Quality.corpusDrift(b, a, buckets = 64)
    val jsAb = ab.agg(sum("js_term")).as[Double].head()
    val jsBa = ba.agg(sum("js_term")).as[Double].head()
    assert(jsAb > 0.0 && jsAb <= math.log(2) + 1e-6)
    assert(math.abs(jsAb - jsBa) < 1e-12) // JS is symmetric
    // the top |contribution| bucket is one where only ONE side has mass
    // (the spam gram or a displaced original gram)
    val top = ab.orderBy(abs(col("js_term")).desc).select("ca", "cb")
      .as[(Long, Long)].head()
    assert(top._1 == 0L || top._2 == 0L)
  }

  test("corpusDrift against an EMPTY side reads loud, not null (failed-batch guard)") {
    // An empty/failed batch must register as maximal drift; a null sum
    // would silently report nothing (r7 ADVICE finding).
    // mass-concentrated corpus so smoothing doesn't drown the signal
    val a = corpus((1L, Seq.fill(400)("spam").mkString(" ")))
    val empty = corpus()
    val js = Quality.corpusDrift(a, empty, buckets = 64)
      .agg(sum("js_term")).as[Double].head()
    assert(!js.isNaN && js > 0.2 && js <= math.log(2) + 1e-6)
    // and the per-bucket rows are all finite
    val rows = Quality.corpusDrift(a, empty, buckets = 64)
      .select("pa", "pb", "js_term").as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r._1 > 0 && r._2 > 0 && !r._3.isNaN))
  }

  test("corpusDrift buckets cover both snapshots' grams with smoothed probabilities") {
    val a = corpus((1L, "only old tokens"))
    val b = corpus((1L, "entirely new words"))
    val out = Quality.corpusDrift(a, b, buckets = 32)
      .select("ca", "cb", "pa", "pb").as[(Long, Long, Double, Double)].collect()
    // full outer: buckets with mass on exactly one side appear, and
    // smoothing keeps every probability strictly positive
    assert(out.exists(r => r._1 > 0 && r._2 == 0))
    assert(out.exists(r => r._1 == 0 && r._2 > 0))
    assert(out.forall(r => r._3 > 0 && r._4 > 0))
  }

  test("resolveEntities closes match chains transitively and picks one canonical row") {
    // aaaa ~1~ aaab ~1~ aabb, but aaaa vs aabb is 2 edits: only the
    // transitive closure puts all three in one entity
    val people = Seq(
      (10L, "aaaa"), (11L, "aaab"), (12L, "aabb"),
      (20L, "zzzz")).toDF("pid", "name")
    val out = Quality.resolveEntities(people, col("pid"), lit("one"),
        col("name"), maxDist = 1)
      .select("pid", "entity", "canonical")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (20L, 20L, true)))
  }

  test("robustOutliers flags a planted spike the mean-based z-score would bury") {
    // group a: 99 values near 10 plus TWO huge spikes. A mean/stddev
    // z-score is dragged by the spikes themselves (stddev ~ 2000);
    // the median/MAD verdict is immune (50% breakdown point).
    val base = (1 to 99).map(i => ("a", i.toLong, 10.0 + (i % 5)))
    val spikes = Seq(("a", 900L, 20000.0), ("a", 901L, -15000.0))
    val calm = (1 to 50).map(i => ("b", 1000L + i, 5.0 + (i % 3)))
    val df = (base ++ spikes ++ calm).toDF("g", "id", "v")
    val out = Quality.robustOutliers(df, "g", "v", cutoff = 3.5)
    val flagged = out.filter(col("outlier")).select("id").as[Long].collect().toSet
    assert(flagged == Set(900L, 901L), s"flagged $flagged")
    // sign preserved: the low spike has negative z
    val zs = out.filter(col("outlier"))
      .select("id", "robust_z").as[(Long, Double)].collect().toMap
    assert(zs(900L) > 0 && zs(901L) < 0)
  }

  test("robustOutliers: MAD=0 and null values yield no verdict, not a blow-up") {
    val df = (Seq.fill(20)(("c", 7.0)) ++ Seq(("c", 99.0)))
      .zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
      .toDF("g", "id", "v")
      .union(Seq(("c", 777L, Option.empty[Double])).toDF("g", "id", "v"))
    val out = Quality.robustOutliers(df, "g", "v")
    // >50% of the group sits at one value -> MAD = 0 -> null z everywhere
    assert(out.filter(col("outlier")).count() == 0)
    assert(out.filter(col("robust_z").isNotNull).count() == 0)
    // med/mad still reported
    assert(out.select("med").distinct().as[Double].collect().toSet == Set(7.0))
  }
}
