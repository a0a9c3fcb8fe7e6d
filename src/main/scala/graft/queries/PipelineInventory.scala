package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.{Ann, Dedup, Quality, Windows}
import graft.functions.TextAnalysis
import graft.gen.DataGen

/** Training-data-pipeline operators (dedup, similarity search, text
  * analysis, multimodal metadata) declared as oracle-checked queries,
  * plus relational extras (pivot/cube/union/lag/as-of/sliding windows)
  * completing SURVEY §2 coverage.
  *
  * Oracle parity notes:
  *  - All content hashes are md5 (identical hex in both engines).
  *  - Cosines in DuckDB use a list_reduce left fold that reproduces
  *    Spark's `aggregate` fold order, so the doubles are bit-identical.
  *  - Rounds of double expressions use `rrepr`, which emulates Spark's
  *    ROUND (HALF_UP on the shortest-decimal representation).
  */
object PipelineInventory {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DuckDB emulation of Spark's ROUND on doubles: Spark rounds the
    * shortest-decimal repr HALF_UP; DuckDB rounds the binary value. Cast
    * through VARCHAR (shortest repr) -> DECIMAL -> round -> DOUBLE. */
  private def rrepr(x: String, n: Int): String =
    s"CAST(ROUND(CAST(CAST(($x) AS VARCHAR) AS DECIMAL(38,18)), $n) AS DOUBLE)"

  /** DuckDB cosine with Spark's exact fold order (left fold from 0.0). */
  private def dcos(a: String, b: String): String = {
    def fold(x: String, y: String) =
      s"list_reduce([$x[i]*$y[i] FOR i IN range(1, len($x)+1)], (p,q) -> p+q)"
    s"(${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)})))"
  }

  /** Shared DuckDB CTEs: distinct word 3-shingles / distinct tokens. */
  private val shCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                         FOR i IN range(1, len(t)-1)]) AS shingle
      |  FROM toks WHERE len(t) >= 3))""".stripMargin

  private val mhCte =
    s"""$shCte,
       |mh AS (SELECT doc_id, j, min(md5(j::VARCHAR || ':' || shingle)) AS h
       |       FROM sh, range(0, 16) s(j) GROUP BY doc_id, j),
       |bands AS (SELECT doc_id, j // 4 AS band, md5(string_agg(h, '' ORDER BY j)) AS bh
       |          FROM mh GROUP BY doc_id, j // 4)""".stripMargin

  private val tokCte =
    """tok AS (SELECT DISTINCT doc_id, token FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents))""".stripMargin

  /** DuckDB 60-bit simhash CTE (mirrors Dedup.simhash). */
  private val simhashCte: String = {
    val terms = (0 until 60).map { b =>
      s"CASE WHEN SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) > 0" +
        s" THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    s"""$tokCte,
       |th AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM tok),
       |sim AS (SELECT doc_id, $terms AS simhash FROM th GROUP BY doc_id)""".stripMargin
  }

  private val embCte =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- Deduplication suite --------------------------------------------

    // MinHash signatures -> LSH band keys (the scale path: near-dup search
    // becomes an equi-join on band keys instead of an all-pairs compare).
    QueryDef("p01_minhash_bands",
      (s, d) => Dedup.lshBands(Dedup.minhashSignatures(
          Dedup.wordShingles(T(s, d, "documents"))))
        .select(col("doc_id"), col("band").cast("long").as("band"), col("bh"))
        .orderBy("doc_id", "band"),
      Some(s"""WITH $mhCte
              |SELECT doc_id, band, bh FROM bands ORDER BY doc_id, band""".stripMargin)),

    // LSH candidates verified with exact shingle-set Jaccard.
    QueryDef("p02_minhash_lsh_pairs",
      (s, d) => {
        // The shingle set feeds four plan branches (signatures, counts,
        // both sides of the intersection join); without persist Spark
        // re-derives the explode+distinct subtree per branch.
        // persist + eager count: plan branches hitting an
        // UNmaterialized cache race to populate it and duplicate the
        // upstream work; a cheap count() first makes later scans pure
        // cache reads.
        val sh = Dedup.wordShingles(T(s, d, "documents")).persist()
        sh.count()
        val bands = Dedup.lshBands(Dedup.minhashSignatures(sh)).persist()
        bands.count()
        Dedup.jaccardPairs(sh, Some(Dedup.lshCandidates(bands)))
          .select(col("d1"), col("d2"), round(col("jaccard"), 3).as("jaccard"))
          .orderBy(col("jaccard").desc, col("d1"), col("d2"))
          .limit(100)
      },
      Some(s"""WITH $mhCte,
              |bandc AS (SELECT * FROM (SELECT z.*, COUNT(*) OVER (PARTITION BY band, bh) AS bc
              |                         FROM bands z) t WHERE bc <= 100),
              |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
              |         FROM bandc x JOIN bandc y
              |           ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
              |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
              |inter AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2, COUNT(*) AS ninter
              |          FROM sh s1 JOIN sh s2
              |            ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
              |          GROUP BY s1.doc_id, s2.doc_id)
              |SELECT c.d1, c.d2,
              |       ${rrepr("i.ninter / (c1.n + c2.n - i.ninter)", 3)} AS jaccard
              |FROM cand c
              |JOIN inter i ON c.d1 = i.d1 AND c.d2 = i.d2
              |JOIN cnt c1 ON c.d1 = c1.doc_id
              |JOIN cnt c2 ON c.d2 = c2.doc_id
              |ORDER BY jaccard DESC, c.d1, c.d2 LIMIT 100""".stripMargin)),

    // 60-bit SimHash fingerprint per document.
    QueryDef("p03_simhash",
      (s, d) => Dedup.simhash(T(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH $simhashCte
              |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin)),

    // Closest pairs by Hamming distance via pigeonhole block join.
    QueryDef("p04_simhash_pairs",
      (s, d) => Dedup.simhashPairs(Dedup.simhash(T(s, d, "documents")), maxDist = 60)
        .select(col("d1"), col("d2"), col("dist").cast("int").as("dist"))
        .orderBy(col("dist"), col("d1"), col("d2"))
        .limit(50),
      Some(s"""WITH $simhashCte,
              |blk0 AS (SELECT doc_id, simhash, k AS blk, (simhash >> CAST(10 * k AS INT)) & 1023 AS bkey
              |         FROM sim, range(0, 6) r(k)),
              |blk AS (SELECT * FROM (SELECT b.*, COUNT(*) OVER (PARTITION BY blk, bkey) AS bc
              |                       FROM blk0 b) t WHERE bc <= 100),
              |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
              |                 CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS dist
              |          FROM blk x JOIN blk y
              |            ON x.blk = y.blk AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
              |SELECT d1, d2, dist FROM pairs ORDER BY dist, d1, d2 LIMIT 50""".stripMargin)),

    // Embedding near-duplicates: top-50 all-pairs cosine (exact baseline;
    // blocking/LSH is the scale path — see Ann scaladoc).
    QueryDef("p05_embed_neardup",
      (s, d) => Ann.nearDupPairs(T(s, d, "embeddings"), topN = 50),
      Some(s"""WITH $embCte
              |SELECT v1, v2, sim FROM (
              |  SELECT a.vec_id AS v1, b.vec_id AS v2,
              |         ${rrepr(dcos("a.emb", "b.emb"), 3)} AS sim
              |  FROM e a JOIN e b ON a.vec_id < b.vec_id) t
              |ORDER BY sim DESC, v1, v2 LIMIT 50""".stripMargin)),

    // ---- Similarity search ----------------------------------------------

    // Brute-force exact top-10 for query vectors 0..4.
    QueryDef("p06_ann_brute",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Ann.bruteTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
          .select(col("q_id"), col("vec_id"), col("sim"), col("rn"))
          .orderBy("q_id", "rn")
      },
      Some(s"""WITH $embCte,
              |scored AS (SELECT q.vec_id AS q_id, x.vec_id,
              |                  ${rrepr(dcos("x.emb", "q.emb"), 3)} AS sim
              |           FROM e x, e q
              |           WHERE q.vec_id < 5 AND x.vec_id <> q.vec_id)
              |SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rn FROM (
              |  SELECT q_id, vec_id, sim,
              |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
              |  FROM scored) t
              |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin)),

    // IVF-bucketed search: assign to nearest of 8 centroids, scan only
    // the query's cluster.
    QueryDef("p07_ann_ivf",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        Ann.ivfTopK(emb, emb.filter(col("vec_id") < 8), queryId = 0L, k = 10)
      },
      Some(s"""WITH $embCte,
              |c AS (SELECT vec_id AS c_id, emb AS cemb FROM e WHERE vec_id < 8),
              |scored AS (SELECT e.vec_id, c.c_id,
              |                  ${rrepr(dcos("e.emb", "c.cemb"), 6)} AS csim
              |           FROM e, c),
              |assign AS (SELECT vec_id, c_id FROM (
              |    SELECT vec_id, c_id,
              |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crn
              |    FROM scored) t WHERE crn = 1),
              |qc AS (SELECT c_id FROM assign WHERE vec_id = 0),
              |qe AS (SELECT emb AS qemb FROM e WHERE vec_id = 0)
              |SELECT a.vec_id, ${rrepr(dcos("e.emb", "qe.qemb"), 3)} AS sim
              |FROM assign a JOIN qc ON a.c_id = qc.c_id JOIN e ON a.vec_id = e.vec_id, qe
              |WHERE a.vec_id <> 0
              |ORDER BY sim DESC, a.vec_id LIMIT 10""".stripMargin)),

    // Hyperplane-LSH near-dup (the LSH-bucketed scale path; IVF is the
    // other). Sketch signs are a Scala-generated literal shared with
    // the oracle, so both engines compute identical projections.
    QueryDef("p14_embed_lsh_neardup",
      (s, d) => Ann.lshNearDup(T(s, d, "embeddings"), topN = 20),
      Some {
        val planeLits = Ann.hyperplanes().map(pl =>
          "[" + pl.map(v => if (v > 0) "1.0" else "-1.0").mkString(",") + "]::DOUBLE[]")
        val terms = planeLits.zipWithIndex.map { case (l, p) =>
          s"CASE WHEN list_reduce([e.emb[i] * ($l)[i] FOR i IN range(1, 65)], (x,y) -> x+y) > 0" +
            s" THEN (CAST(1 AS BIGINT) << $p) ELSE CAST(0 AS BIGINT) END"
        }.mkString(" + ")
        s"""WITH $embCte,
           |sk AS (SELECT e.vec_id, e.emb, $terms AS sk FROM e),
           |blk0 AS (SELECT vec_id, sk, b, (sk >> CAST(8 * b AS INT)) & 255 AS bkey
           |         FROM sk, range(0, 2) r(b)),
           |blk AS (SELECT * FROM (SELECT z.*, COUNT(*) OVER (PARTITION BY b, bkey) AS bc
           |                       FROM blk0 z) t WHERE bc <= 200),
           |cand AS (SELECT DISTINCT x.vec_id AS v1, y.vec_id AS v2
           |         FROM blk x JOIN blk y
           |           ON x.b = y.b AND x.bkey = y.bkey AND x.vec_id < y.vec_id)
           |SELECT c.v1, c.v2, ${rrepr(dcos("a.emb", "b.emb"), 3)} AS sim
           |FROM cand c JOIN e a ON c.v1 = a.vec_id JOIN e b ON c.v2 = b.vec_id
           |ORDER BY sim DESC, c.v1, c.v2 LIMIT 20""".stripMargin
      }),

    // X2 stage 2: blocked edit-distance fuzzy dedup — block on
    // (nation, segment), levenshtein <= 1 on the name within blocks.
    // Work is Σ block², never corpus²; hot blocks capped.
    QueryDef("p15_fuzzy_dedup",
      (s, d) => Quality.fuzzyDuplicatesBlocked(
          T(s, d, "customer"), col("c_custkey"),
          concat_ws(":", col("c_nationkey"), col("c_mktsegment")), col("c_name"),
          maxDist = 1, maxBlock = 1000)
        .orderBy("id1", "id2"),
      Some("""WITH b0 AS (SELECT c_custkey,
             |              CAST(c_nationkey AS VARCHAR) || ':' || c_mktsegment AS blk,
             |              c_name
             |            FROM customer),
             |b AS (SELECT * FROM (SELECT z.*, COUNT(*) OVER (PARTITION BY blk) AS bc
             |                     FROM b0 z) t WHERE bc <= 1000)
             |SELECT x.c_custkey AS id1, y.c_custkey AS id2,
             |       CAST(levenshtein(x.c_name, y.c_name) AS INT) AS dist
             |FROM b x JOIN b y ON x.blk = y.blk AND x.c_custkey < y.c_custkey
             |WHERE levenshtein(x.c_name, y.c_name) <= 1
             |ORDER BY id1, id2""".stripMargin)),

    // Quality report as ONE declarative plan over a deterministic
    // generated-corpus snapshot (polished_transactions.py:448-521): five
    // single-row aggregates cross-joined — zero driver-side actions.
    QueryDef("q42_quality_report",
      (s, _) => {
        DataGen.materializeQualityCorpus(s)
        val dir = DataGen.qualityCorpusDir
        Quality.report(
          s.read.parquet(s"$dir/customers.parquet"),
          s.read.parquet(s"$dir/accounts.parquet"),
          s.read.parquet(s"$dir/transactions.parquet"),
          "2024-01-15 00:00:00")
      },
      Some {
        val dir = DataGen.qualityCorpusDir
        s"""WITH cust AS (SELECT * FROM read_parquet('$dir/customers.parquet/*.parquet')),
           |acct AS (SELECT * FROM read_parquet('$dir/accounts.parquet/*.parquet')),
           |tx AS (SELECT * FROM read_parquet('$dir/transactions.parquet/*.parquet')),
           |grp AS (SELECT replace(replace(lower(email), '4', 'a'), '3', 'e') AS k,
           |               COUNT(*) AS n
           |        FROM cust GROUP BY 1),
           |circ AS (SELECT a.transaction_id
           |         FROM tx a JOIN tx b
           |           ON a.account_id = b.related_account_id
           |          AND a.related_account_id = b.account_id
           |          AND a.transaction_id < b.transaction_id
           |          AND CAST(a.transaction_date AS DATE) = CAST(b.transaction_date AS DATE)
           |         WHERE a.transaction_type = 'Transfer' AND b.transaction_type = 'Transfer'
           |           AND a.related_account_id IS NOT NULL AND b.related_account_id IS NOT NULL)
           |SELECT
           |  (SELECT COUNT(*) FROM cust) AS n_customers,
           |  (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM grp WHERE n > 1) AS n_fuzzy_dups,
           |  (SELECT COUNT(*) FILTER (WHERE phone IS NULL) FROM cust) AS n_null_phone,
           |  (SELECT COUNT(*) FILTER (WHERE balance < 0) FROM acct) AS n_negative_balance,
           |  (SELECT COUNT(*) FILTER (WHERE transaction_date > TIMESTAMP '2024-01-15 00:00:00') FROM tx) AS n_future_dated,
           |  (SELECT COUNT(*) FROM circ) AS n_circular_pairs""".stripMargin
      }),

    // ---- Text analysis --------------------------------------------------

    QueryDef("p08_text_stats",
      (s, d) => TextAnalysis.stats(T(s, d, "documents")).orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              |       CAST(length(text) AS BIGINT) AS n_chars,
              |       ${rrepr("CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE) / len(string_split(text,' '))", 3)} AS avg_token_len
              |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("p09_quality_score",
      (s, d) => TextAnalysis.qualityScore(T(s, d, "documents")).orderBy("doc_id"),
      Some {
        val stops = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
        s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
           |agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
           |        CAST(SUM(CASE WHEN token IN ($stops) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
           |        FROM tok GROUP BY doc_id)
           |SELECT doc_id, n_tokens,
           |  ${rrepr("CAST(n_stop AS DOUBLE) / n_tokens", 4)} AS stop_ratio,
           |  ${rrepr("LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50) * 0.5 + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.5", 4)} AS score
           |FROM agg ORDER BY doc_id""".stripMargin
      }),

    QueryDef("p10_lang_id",
      (s, d) => TextAnalysis.langId(T(s, d, "documents")).orderBy("doc_id"),
      Some {
        val langs = Seq("en", "es", "de", "fr", "zh")
        val sums = langs.map { l =>
          val stops = TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(", ")
          s"SUM(CASE WHEN token IN ($stops) THEN 1 ELSE 0 END) AS s_$l"
        }.mkString(",\n        ")
        val best = s"GREATEST(${langs.map(l => s"s_$l").mkString(", ")})"
        val pred = langs.map(l => s"WHEN s_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
        s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
           |sc AS (SELECT doc_id,
           |        $sums
           |       FROM tok GROUP BY doc_id)
           |SELECT doc_id, CASE $pred ELSE 'und' END AS pred_lang,
           |       CAST($best AS BIGINT) AS hits
           |FROM sc ORDER BY doc_id""".stripMargin
      }),

    QueryDef("p11_fingerprints",
      (s, d) => TextAnalysis.fingerprints(T(s, d, "documents")).orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id, i AS pos, md5(substring(text, CAST(i AS INT), 5)) AS h
             |           FROM documents, range(1, 1000) r(i)
             |           WHERE i <= length(text) - 4),
             |wm AS (SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos
             |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm FROM g)
             |SELECT doc_id, COUNT(DISTINCT wm) AS n_fp, MIN(wm) AS min_fp
             |FROM wm GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    QueryDef("p12_token_counts",
      (s, d) => TextAnalysis.tokenCounts(T(s, d, "documents")).orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
             |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Multimodal metadata (binary column plumbing) -------------------

    // Text treated as an opaque binary payload: byte length + content
    // digest — the metadata layer every multimodal column carries. The
    // typed decode/feature pipeline lives in operators.Multimodal (the
    // decode itself is stubbed; codecs are not in this environment).
    QueryDef("p13_multimodal_meta",
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          sha2(col("text"), 256).as("content_sha"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       sha256(text) AS content_sha
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Relational extras (SURVEY §2 rows not covered by Q1-Q32) -------

    // A6: pivoted conditional aggregation. Explicit pivot values — no
    // driver-side distinct scan at plan time.
    QueryDef("r33_pivot",
      (s, d) => T(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |       COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
             |       COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
             |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |       COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
             |       COUNT(*) FILTER (WHERE event_type = 'view')     AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // A10: full cube.
    QueryDef("r34_cube",
      (s, d) => T(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders
             |GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // U2/P8: union of eligibility sets (range ∪ deterministic sample).
    QueryDef("r35_union_dedup",
      (s, d) => {
        val c = T(s, d, "customer")
        c.filter(col("c_acctbal") > 9000).select("c_custkey")
          .unionByName(c.orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
            .limit(20).select("c_custkey"))
          .distinct()
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_acctbal > 9000
             |UNION
             |SELECT c_custkey FROM (
             |  SELECT c_custkey FROM customer
             |  ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey LIMIT 20)
             |ORDER BY c_custkey""".stripMargin)),

    // W5: lag — previous event type per user (circular-transfer window).
    QueryDef("r36_lag",
      (s, d) => T(s, d, "events")
        .select(col("user_id"), col("event_id"),
          lag("event_type", 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("prev_type"))
        .orderBy("user_id", "event_id"),
      Some("""SELECT user_id, event_id,
             |       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // J7: as-of join — each purchase matched to the signup interval
    // containing it (SCD2 lookup built from LEAD validity intervals).
    QueryDef("r37_asof_join",
      (s, d) => {
        // Both sides derive from the same `events` frame; renaming the
        // join key on the build side (s_uid) keeps the equi-join
        // unambiguous after refactors — `pu("user_id") === su("user_id")`
        // on shared lineage trips Spark's "trivially true predicate"
        // resolution and is where silently-wrong self-joins come from.
        val ev = T(s, d, "events")
        val su = ev.filter(col("event_type") === "signup")
          .select(col("user_id").as("s_uid"), col("event_id").as("s_id"),
            col("ts").as("vf"),
            lead("ts", 1).over(
              Window.partitionBy("user_id").orderBy("ts", "event_id")).as("vt"))
        val pu = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        pu.join(su, col("user_id") === col("s_uid") &&
            col("ts") >= col("vf") && (col("vt").isNull || col("ts") < col("vt")))
          .select(col("event_id"), col("s_id"))
          .orderBy("event_id")
      },
      Some("""WITH s AS (SELECT user_id, event_id AS s_id, ts AS vf,
             |             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
             |           FROM events WHERE event_type = 'signup'),
             |p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
             |SELECT p.event_id, s.s_id FROM p JOIN s ON p.user_id = s.user_id
             |  AND p.ts >= s.vf AND (s.vt IS NULL OR p.ts < s.vt)
             |ORDER BY p.event_id""".stripMargin)),

    // T7 batch-form: 7-day sliding windows advancing by 1 day.
    QueryDef("r38_sliding_window",
      (s, d) => T(s, d, "events")
        .groupBy(window(col("ts"), "7 days", "1 day"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n"))
        .orderBy("w_start"),
      Some("""SELECT date_trunc('day', ts) - (k * INTERVAL 1 DAY) AS w_start, COUNT(*) AS n
             |FROM events, range(0, 7) r(k)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // T7 batch form: inactivity-gap session windows (gaps-and-islands;
    // boundary rule matches Structured Streaming's session_window, so
    // the streaming form merges identically — StreamingSpec T7s).
    QueryDef("r43_session_window",
      (s, d) => Windows.sessionize(T(s, d, "events"),
          col("user_id"), col("ts"), "1 HOUR", col("event_id"))
        .groupBy(col("user_id"), col("session_id").cast("int").as("sid"))
        .agg(min("ts").as("s_start"), max("ts").as("s_end"), count(lit(1)).as("n"))
        .orderBy("user_id", "sid"),
      Some("""WITH l AS (SELECT user_id, event_id, ts,
             |             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |           FROM events),
             |f AS (SELECT *, CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 1 HOUR
             |                     THEN 1 ELSE 0 END AS new_s FROM l),
             |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM f)
             |SELECT user_id, CAST(sid AS INT) AS sid,
             |       MIN(ts) AS s_start, MAX(ts) AS s_end, COUNT(*) AS n
             |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin)),

    // A10 general form: explicit GROUPING SETS — the subtotal shape
    // dashboard views emit (README.md:34-40); rollup/cube are its
    // special cases (q15, r34).
    QueryDef("r40_grouping_sets",
      (s, d) => T(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // A8 at scale: HLL approximate distinct (no cross-engine oracle —
    // sketch internals differ; driver records a rows-only check).
    QueryDef("r39_approx_distinct",
      (s, d) => T(s, d, "lineitem")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_part"),
          countDistinct(col("l_partkey")).as("exact_part")),
      None)
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
