package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Silver-layer data-quality detectors for the reference's ten injected
  * issue classes (polished_transactions.py:27-40, quality report
  * :448-521). Each detector is a declarative plan — a filter, an
  * anti-join, or a self-join — so Catalyst pushes predicates into the
  * scan and AQE sizes the shuffles; nothing here is row-at-a-time.
  */
object Quality {

  /** Host of a URL, by the conservative regex subset both Java regex
    * and RE2 evaluate identically: `scheme://` followed by everything
    * up to the first `/`, `?` or `#`, lowercased. Userinfo/port stay
    * inside the host (strip downstream if needed); a non-URL string
    * yields '' and groups visibly rather than erroring. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))

  /** Canonical form of a URL — the key the first stage of every web
    * curation pipeline dedups on (CCNet/RefinedWeb dedup by URL before
    * ever touching content: a crawl revisits the same page under
    * cosmetic URL variants far more often than distinct pages share
    * text). Two URLs that differ only in scheme/host case, default
    * port, userinfo, a fragment, a trailing slash, doubled path
    * slashes, tracking parameters (utm_*, fbclid, gclid, msclkid) or
    * query-parameter ORDER normalize to the same string.
    *
    * One narrow codegen'd projection — a chain of regexp rewrites in
    * the RE2 ∩ Java-regex dialect (no lookaround, no backrefs in
    * patterns), so the oracle engine reproduces it byte-for-byte.
    * Deliberately NOT normalized: `www.` (www.foo.com and foo.com can
    * serve different pages) and percent-encoding (decoding is
    * charset-dependent). A string with no `scheme://` passes through
    * unchanged — visible and groupable, never an error; null becomes
    * '' upstream of the chain (a dedup key must not be null-dropped
    * by the join back). */
  def normalizeUrl(url: Column): Column = {
    val u = trim(coalesce(url.cast("string"), lit("")))
    // scheme://host[:port], lowercased, userinfo stripped, default
    // ports dropped per scheme.
    val sh0 = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    val sh1 = regexp_replace(sh0, "://[^/?#@]*@", "://")
    val sh = regexp_replace(
      regexp_replace(sh1, "^(http://[^/?#:]*):80$", "$1"),
      "^(https://[^/?#:]*):443$", "$1")
    // Everything after the authority, fragment dropped.
    val rest = regexp_replace(
      regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""), "#.*$", "")
    val path = regexp_replace(
      regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/{2,}", "/"),
      "/+$", "")
    // Query: split on '&' FIRST, then drop tracking params with an
    // ANCHORED match over whole name=value units — a rewrite of the
    // raw string ("(^|&)(…|gclid)(=[^&]*)?" → "$1") prefix-matches
    // longer param names ('gclid_src=foo' → '_src=foo'), silently
    // merging genuinely distinct URLs. Filtering the split array is
    // immune to that and drops the empty units ('a=1&&b=2' debris)
    // for free; sort what survives so parameter order never splits a
    // dedup group. Anchored, RE2 ∩ Java-regex safe (no lookaround).
    val q0 = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val params = filter(split(q0, "&"), p => p =!= "" &&
      !p.rlike("^(utm_[^=&]*|fbclid|gclid|msclkid)(=.*)?$"))
    val sortedQ = array_join(array_sort(params), "&")
    when(sh === "", u).otherwise(concat(sh, path,
      when(size(params) === 0, lit(""))
        .otherwise(concat(lit("?"), sortedQ))))
  }

  /** URL-level dedup: flag the first doc (min doc_id) per
    * [[normalizeUrl]] key as the survivor. The flagged form (every
    * row kept, `kept` boolean) rather than the filtered form because
    * URL dedup is stage ONE of a cascade — downstream content dedup
    * and the audit trail both want to see what was dropped and why.
    *
    * Scale: one url-keyed partial-aggregable groupBy onto a
    * urls-sized owner table (far below corpus bytes — ~the line count
    * of the crawl index), joined back url-keyed; no window, so a URL
    * crawled a million times costs map-side combine, not a
    * single-reducer sort. Output: doc_id, <urlCol>, norm_url, kept. */
  def urlDedup(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame = {
    val n = docs.select(col(idCol).as("doc_id"), col(urlCol),
      normalizeUrl(col(urlCol)).as("norm_url"))
    val owner = n.groupBy("norm_url").agg(min("doc_id").as("__owner"))
    n.join(owner, Seq("norm_url"))
      .select(col("doc_id"), col(urlCol), col("norm_url"),
        (col("doc_id") === col("__owner")).as("kept"))
  }

  /** Domain blocklist filter (the CCNet/RefinedWeb UT1-blocklist
    * stage): a doc is blocked when its URL's host equals a blocklisted
    * domain OR sits anywhere under one (`ads.example.com` blocks
    * `x.ads.example.com` too). The flagged form — every doc kept with
    * its verdict and the matched domain — because the blocklist stage
    * opens the curation cascade and the audit trail wants the why.
    *
    * Mechanics: host (userinfo/port stripped) explodes into its
    * dot-suffix chain (`a.b.c` → a.b.c, b.c, c — ≤ label-count rows,
    * a constant ~6), which left-joins the BROADCAST blocklist (real
    * blocklists are a few MB — driver-safe by construction); the
    * per-doc min over matches keeps the verdict deterministic when
    * several blocklisted ancestors match. No corpus-keyed shuffle
    * beyond the doc-id re-group of the suffix rows.
    * Output: doc_id, <urlCol>, host, matched (null when clean), kept. */
  def blocklistFilter(docs: DataFrame, blocklist: DataFrame,
      urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    // Userinfo and port stripped, then the trailing root-label dot:
    // 'example.com.' is a valid FQDN spelling of 'example.com', and
    // without the strip its suffix chain ('example.com.', 'com.', '')
    // never equals any blocklist entry — a blocked domain written
    // with the trailing dot would evade the filter.
    val host = regexp_replace(regexp_replace(regexp_replace(
      urlHost(col(urlCol)),
      "^[^/?#@]*@", ""), ":[0-9]*$", ""), "\\.$", "")
    val base = docs.select(col(idCol).as("doc_id"), col(urlCol),
      host.as("host"))
    val sufs = base
      .select(col("doc_id"), split(col("host"), "\\.").as("p"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(p)), i -> " +
          "array_join(slice(p, i, size(p) - i + 1), '.'))")).as("suf"))
    val hits = sufs.join(broadcast(
        blocklist.select(col("domain").as("suf"))), Seq("suf"))
      .groupBy("doc_id").agg(min("suf").as("matched"))
    base.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col(urlCol), col("host"), col("matched"),
        col("matched").isNull.as("kept"))
  }

  /** Site-level quality prior (the RefinedWeb/C4 pattern: judge the
    * HOST, not just the page — a spam site's every page inherits the
    * site's reputation): per-host doc count and mean quality score,
    * joined back onto every document. Feed any per-doc score
    * (`TextAnalysis.qualityScore`, the learned filter's logit, an LM
    * score); threshold or feature-ize `host_prior` downstream.
    *
    * Scale shape: ONE host-keyed partial-aggregable groupBy (the host
    * table is sites-sized, far below the corpus) joined back host-
    * keyed. The mean is a 6dp sorted fold for cross-engine parity.
    * Docs absent from `scores` (unscoreable) are absent here too.
    * Output: doc_id, host, score, n_docs, host_prior. */
  def hostPrior(docs: DataFrame, scores: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val withHost = docs.select(col("doc_id"), urlHost(col(urlCol)).as("host"))
      .join(scores.select(col("doc_id"), col("score")), "doc_id")
    val prior = withHost.groupBy("host").agg(
      count(lit(1)).cast("long").as("n_docs"),
      round(aggregate(sort_array(collect_list(col("score"))), lit(0d), _ + _) /
        count(lit(1)), 6).as("host_prior"))
    withHost.join(prior, "host")
      .select(col("doc_id"), col("host"), col("score"),
        col("n_docs"), col("host_prior"))
  }

  /** Null-rate profile for the given columns (issue #2/#3). */
  def nullRates(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      cols.map(c => round(avg(when(col(c).isNull, 1.0).otherwise(0.0)), 4)
        .as(s"null_rate_$c")): _*)

  /** Fuzzy duplicate customers (issue #1), stage 1: normalize the
    * leet-typo map (4->a, 3->e) and group on the key. Pairs whose typos
    * fall outside the map (domain rewrites, dropped characters —
    * oltp_seeder.py:115-126, polished_transactions.py:100-119) are the
    * job of stage 2, [[fuzzyDuplicatesBlocked]]. Returns (dup_key, ids, n). */
  def fuzzyDuplicateCustomers(customers: DataFrame): DataFrame =
    customers
      .withColumn("norm_email", translate(lower(col("email")), "43", "ae"))
      .groupBy("norm_email")
      .agg(sort_array(collect_list("customer_id")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Keep-first survivor set after fuzzy dedup (W1). */
  def dedupCustomersKeepFirst(customers: DataFrame): DataFrame =
    customers
      .withColumn("norm_email", translate(lower(col("email")), "43", "ae"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("norm_email").orderBy("customer_id")))
      .filter(col("rn") === 1)
      .drop("rn", "norm_email")

  /** Fuzzy duplicates, stage 2: blocked edit-distance match for typo
    * classes the normalization key misses by construction. Rows are
    * grouped by `blockKey` (caller picks: exact name, soundex, prefix);
    * only within-block pairs are compared — work is ∝ Σ block², never
    * the corpus², and blocks hotter than `maxBlock` are dropped (the
    * same bounded-recall guard as the LSH joins). Returns
    * (id1, id2, dist) with dist = levenshtein(matchCol) <= maxDist. */
  def fuzzyDuplicatesBlocked(df: DataFrame, id: Column, blockKey: Column,
      matchCol: Column, maxDist: Int = 2, maxBlock: Int = 100): DataFrame = {
    val base = Dedup.capBuckets(
      df.select(id.as("id"), blockKey.as("blk"), matchCol.as("m")),
      Seq("blk"), maxBlock)
    val a = base.select(col("id").as("id1"), col("blk"), col("m").as("m1"))
    val b = base.select(col("id").as("id2"), col("blk").as("blk2"), col("m").as("m2"))
    // Length gap is a lower bound on edit distance — a one-subtraction
    // pre-filter that skips the O(len²) levenshtein for most pairs.
    a.join(b, col("blk") === col("blk2") && col("id1") < col("id2") &&
        abs(length(col("m1")) - length(col("m2"))) <= maxDist)
      .withColumn("dist", levenshtein(col("m1"), col("m2")))
      .filter(col("dist") <= maxDist)
      .select("id1", "id2", "dist")
  }

  /** End-to-end entity resolution — the MDM step downstream of the
    * reference's own planted duplicate customers (oltp_seeder.py:111-125
    * seeds ~8% near-duplicate names by design; its "Silver layer
    * (cleaned, deduplicated)" is a roadmap item, README.md:25): blocked
    * edit-distance
    * match pairs ([[fuzzyDuplicatesBlocked]]) closed TRANSITIVELY into
    * entity clusters via [[graft.operators.Dedup.components]] — "J.
    * Smith" ~ "Jo Smith" ~ "Joe Smith" is ONE customer even though the
    * ends are 2 edits apart and only chain through the middle. Every
    * row gets its cluster's minimum id as `entity` (unmatched rows are
    * their own singleton entity) and `canonical` marks the survivor
    * row per entity — the golden-record choice, swap in a
    * survivorsByScore-style policy upstream if recency/completeness
    * should win instead of min-id.
    *
    * Scale: candidate work is bounded by the blocking scheme
    * (`maxBlock` cap per block key — the same hot-bucket discipline as
    * LSH), the pair graph is checkpointed label propagation (no
    * corpus-sized driver state), and the final attach is one left
    * join of the cluster table. Ids must be integral (components'
    * contract). Output: input columns + entity, canonical. */
  def resolveEntities(df: DataFrame, id: Column, blockKey: Column,
      matchCol: Column, maxDist: Int = 1, maxBlock: Int = 1000,
      maxIter: Int = 20): DataFrame = {
    val pairs = fuzzyDuplicatesBlocked(df, id, blockKey, matchCol,
        maxDist, maxBlock)
      .select(col("id1").as("d1"), col("id2").as("d2"))
    val comp = Dedup.components(pairs, maxIter)
    df.withColumn("_rid", id.cast("long"))
      .join(comp.withColumnRenamed("id", "_rid"), Seq("_rid"), "left")
      .withColumn("entity", coalesce(col("comp"), col("_rid")))
      .withColumn("canonical", col("entity") === col("_rid"))
      .drop("_rid", "comp")
  }

  // --------------------------------------------------------------------
  // Incremental entity resolution — the persisted-index discipline the
  // dedup families already have (Dedup.writeBandIndex /
  // incrementalCandidates), applied to [[resolveEntities]]: a new
  // customer batch resolves against what is already known WITHOUT
  // re-running blocking + transitive closure over every old row.
  //
  // Index model: a row store (id, blk, m, comp) where `comp` is the
  // entity label AT INSERT TIME, plus an append-only remap log
  // (src, dst) recording label merges. Labels only ever DECREASE
  // (every merge relabels to the min id of the merged component), and
  // every merge links all its input labels to its output label — so
  // the CURRENT label of any stored comp is the min of its
  // remap-connected component, recoverable by one components() pass
  // over the log (merge-log-sized, not corpus-sized). That makes the
  // disk layout append-only in both parts: old row files are never
  // rewritten, exactly like the band/PQ indexes.
  //
  // Semantics vs full recompute: identical — incremental == full on
  // the union (QualitySpec law, including a merge event where one new
  // row bridges two existing entities) — EXCEPT the hot-block cap:
  // the cap counts old+new occupancy together (the
  // incrementalCandidates discipline), so a block pushed past
  // `maxBlock` by later batches stops generating NEW candidates, but
  // prior merges are never revoked (a full recompute would drop that
  // block's old pairs too and SPLIT entities — incremental MDM
  // semantics are monotone instead). Ids must be unique across
  // batches (the caller's contract; a re-sent id would be re-blocked,
  // not upserted).
  // --------------------------------------------------------------------

  /** One incremental resolution step, all in frames: `(new rows with
    * their labels, remap log entries for old labels that merged)`.
    * `nb` = (id, blk, m) of the new batch; `cur` = the prior index
    * (id, blk, m, comp) with labels current.
    *
    * Scale shape: the prior index contributes ONLY rows in blocks the
    * batch touches (left-semi on blk — partition-prunable when the
    * row store is written blk-bucketed); candidate work is the
    * blocked pair join with the combined per-block cap; closure runs
    * over SUPER-NODES (old entities enter as their single label, not
    * their member rows), so the pair graph is batch-sized + touched-
    * entity-sized no matter how large the accumulated index. */
  private[graft] def erStepParts(nb: DataFrame, cur: DataFrame, maxDist: Int,
      maxBlock: Int, maxIter: Int): (DataFrame, DataFrame) = {
    val touched = nb.select("blk").distinct()
    // Pinned: oldT feeds BOTH the candidate union and the remap label
    // set; unpinned, the whole prior-index plan (a parquet read on the
    // disk path, but a full resolution chain in the in-frame form)
    // re-runs per consumer. Touched-block-sized — the step's working
    // set by definition.
    val oldT = cur.join(touched, Seq("blk"), "left_semi")
      .localCheckpoint(false)
    val comb = nb.select(col("id"), col("blk"), col("m"),
        col("id").as("comp"), lit(true).as("is_new"))
      .unionByName(oldT.select(col("id"), col("blk"), col("m"), col("comp"))
        .withColumn("is_new", lit(false)))
    // Combined-occupancy cap: same hot-block discipline as
    // fuzzyDuplicatesBlocked, counted over old + new together.
    val capped = comb
      .withColumn("_bc", count(lit(1)).over(Window.partitionBy("blk")))
      .filter(col("_bc") <= maxBlock).drop("_bc")
    val a = capped.select(col("id").as("id1"), col("blk").as("blk1"),
      col("m").as("m1"), col("is_new").as("new1"), col("comp").as("c1"))
    val b = capped.select(col("id").as("id2"), col("blk").as("blk2"),
      col("m").as("m2"), col("is_new").as("new2"), col("comp").as("c2"))
    // Old-old pairs are excluded: same strings, same maxDist — they
    // either matched when first seen (same comp now; a self-edge) or
    // never will. The length gap is the levenshtein lower-bound
    // prefilter from fuzzyDuplicatesBlocked.
    val pairs = a.join(b, col("blk1") === col("blk2") &&
        col("id1") < col("id2") && (col("new1") || col("new2")) &&
        abs(length(col("m1")) - length(col("m2"))) <= maxDist)
      .filter(levenshtein(col("m1"), col("m2")) <= maxDist)
      .select(col("c1").as("d1"), col("c2").as("d2"))
      .filter(col("d1") =!= col("d2"))
    // Transitive closure over super-nodes: vertices are new ids and
    // old entity LABELS. The min over a merged component is the true
    // global min, because each old label is already the min of its
    // members.
    val comp2 = Dedup.components(pairs, maxIter)
    val newRows = nb
      .join(comp2, Seq("id"), "left")
      .select(col("id"), col("blk"), col("m"),
        coalesce(col("comp"), col("id")).as("comp"))
    val remap = comp2
      .join(oldT.select(col("comp").as("id")).distinct(), Seq("id"), "left_semi")
      .filter(col("comp") =!= col("id"))
      .select(col("id").as("src"), col("comp").as("dst"))
    (newRows, remap)
  }

  /** In-frame incremental resolution: fold a new batch into a prior
    * index frame (id, blk, m, comp), returning the UPDATED index
    * frame — labels current, no log to chase (within one step the
    * closure is converged, so the remap applies directly). Chain steps
    * by feeding the result back in; [[resolveEntitiesIncremental]] is
    * the disk-backed form that never rewrites old rows. */
  def resolveEntitiesStep(newDf: DataFrame, index: DataFrame, id: Column,
      blockKey: Column, matchCol: Column, maxDist: Int = 1,
      maxBlock: Int = 1000, maxIter: Int = 20): DataFrame = {
    val nb = normalizeErBatch(newDf, id, blockKey, matchCol)
    val (newRows, remap) = erStepParts(nb, index, maxDist, maxBlock, maxIter)
    val rm = remap.withColumnRenamed("src", "comp")
    index.join(rm, Seq("comp"), "left")
      .select(col("id"), col("blk"), col("m"),
        coalesce(col("dst"), col("comp")).as("comp"))
      .unionByName(newRows)
  }

  /** Entity table of an index frame: id, entity, canonical — the
    * [[resolveEntities]] output shape. */
  def entityTable(index: DataFrame): DataFrame =
    index.select(col("id"), col("comp").as("entity"),
      (col("comp") === col("id")).as("canonical"))

  /** The zero-row index frame — seed a [[resolveEntitiesStep]] chain
    * from nothing (the first step then equals a full
    * [[resolveEntities]] of its batch). */
  def emptyEntityIndex(spark: org.apache.spark.sql.SparkSession): DataFrame =
    // blk/m derive from the (empty) id column rather than literals: a
    // literal blk constant-folds OUT of the first step's semi-join
    // keys, leaving a keyless (nested-loop-shaped, zero-row) join that
    // trips the cartesian plan audit.
    spark.range(0).select(col("id"), col("id").cast("string").as("blk"),
      col("id").cast("string").as("m"), col("id").as("comp"))

  private[graft] def normalizeErBatch(df: DataFrame, id: Column, blockKey: Column,
      matchCol: Column): DataFrame =
    df.select(id.cast("long").as("id"), blockKey.cast("string").as("blk"),
      matchCol.cast("string").as("m"))

  // The persisted layout is COMMITTED STEPS: each resolution step N
  // lands `rows/step=N` + `remap/step=N` (overwrite) and THEN an empty
  // commit marker `commits/N` — a step is fully visible or invisible,
  // never half (the r9 advisor's atomicity finding: the old flat
  // append wrote rows then remap as two non-atomic appends, so a crash
  // between them kept the step's rows while losing its merges, and a
  // retry re-appended duplicate ids). A retry of an uncommitted step
  // recomputes the SAME step number (from the committed set) and
  // overwrites the orphan attempt. Markers named `N.base` mark a
  // compaction generation: reads use only steps >= the newest base.

  // Resolved from the INDEX PATH's own scheme, not the default
  // filesystem: commit markers, the flat-layout probe, and compaction
  // deletes must act on the same store the parquet reads/writes honor,
  // or an index on a non-default FS (s3a:// with an HDFS default)
  // silently loses the commit-step atomicity (r10 advisor finding).
  private def erFs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  private def commitErStep(spark: org.apache.spark.sql.SparkSession,
      path: String, n: Long, base: Boolean): Unit = {
    val fs = erFs(spark, path)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/commits"))
    val name = if (base) s"$n.base" else s"$n"
    fs.create(new org.apache.hadoop.fs.Path(s"$path/commits/$name"), true)
      .close()
  }

  /** Committed (step, isBase) pairs — the ONLY authority on what the
    * index contains; uncommitted step dirs are invisible garbage. */
  private def committedErSteps(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(Long, Boolean)] = {
    val fs = erFs(spark, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/commits")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .map { n =>
        (n.stripSuffix(".base").toLong, n.endsWith(".base"))
      }.toSeq
  }

  // ---- blk-hash file bucketing of the ER row store (r11) ----------
  // Every rows/step=N dir is sub-partitioned blkb=pmod(xxhash64(blk),
  // B): an incremental step's prior-state read then prunes to the
  // batch's TOUCHED buckets at the FILE level — per-step read cost
  // ∝ touched blocks, not index size (without this, the touched-block
  // semi-join still SCANNED the whole row store every batch, the one
  // index-sized term left in the step). B is pinned per index by a
  // write-once `meta/blkb=B` marker at seed time — a reader hashing
  // with a different B would prune the WRONG buckets and silently
  // drop old rows, so B always comes from the marker, never a
  // parameter. No marker = a pre-r11 (unbucketed) index: reads skip
  // pruning and writes stay unbucketed, so layouts never mix.

  private def erBlkb(b: Int): Column =
    pmod(xxhash64(col("blk")), lit(b.toLong)).cast("int")

  private def erBlkbOf(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[Int] = {
    val fs = erFs(spark, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/meta")
    if (!fs.exists(p)) None
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("blkb="))
      .map(_.stripPrefix("blkb=").toInt).headOption
  }

  private def writeErBlkbMarker(spark: org.apache.spark.sql.SparkSession,
      path: String, b: Int): Unit = {
    val fs = erFs(spark, path)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/meta"))
    fs.create(new org.apache.hadoop.fs.Path(s"$path/meta/blkb=$b"), true)
      .close()
  }

  /** Land a rows frame as step `n`, blkb-bucketed when the index is.
    * The frame is repartitioned ON the bucket key before the
    * partitionBy write: without it every task writes into every
    * bucket dir (buckets × shufflePartitions small files — measured
    * 3.7 vs 2.3 s/step against the flat layout at 900k rows, pure
    * listing overhead); with it each bucket is one task's file(s),
    * and AQE splits genuinely large buckets. */
  private def writeErRows(rows: DataFrame, path: String, n: Long,
      blkbOpt: Option[Int]): Unit = blkbOpt match {
    case Some(b) =>
      rows.withColumn("blkb", erBlkb(b))
        .repartition(col("blkb"))
        .write.partitionBy("blkb").mode("overwrite")
        .parquet(s"$path/rows/step=$n")
    case None =>
      rows.write.mode("overwrite").parquet(s"$path/rows/step=$n")
  }

  /** The batch's touched bucket ids — bounded by B (≤ 256 ints to the
    * driver, the ivfPqSearchIndex routing-table discipline), applied
    * as a STATIC partition predicate on the rows read. */
  private def touchedBuckets(nb: DataFrame, b: Int): Seq[Int] =
    nb.select(erBlkb(b).as("blkb")).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq

  /** Seed the persisted index: full [[resolveEntities]]-equivalent
    * resolution of `df`, landed as committed base step 0, with the
    * row store blkb-bucketed (`blkBuckets` pinned in the meta marker)
    * so incremental steps prune their prior-state read to touched
    * buckets at the file level. */
  def writeEntityIndex(df: DataFrame, id: Column, blockKey: Column,
      matchCol: Column, path: String, maxDist: Int = 1,
      maxBlock: Int = 1000, maxIter: Int = 20,
      blkBuckets: Int = 64): Unit = {
    require(blkBuckets >= 1, "blkBuckets must be positive")
    val spark = df.sparkSession
    writeErBlkbMarker(spark, path, blkBuckets)
    val nb = normalizeErBatch(df, id, blockKey, matchCol)
    val pairs = fuzzyDuplicatesBlocked(df, id, blockKey, matchCol,
        maxDist, maxBlock)
      .select(col("id1").as("d1"), col("id2").as("d2"))
    val comp = Dedup.components(pairs, maxIter)
    writeErRows(
      nb.join(comp, Seq("id"), "left")
        .select(col("id"), col("blk"), col("m"),
          coalesce(col("comp"), col("id")).as("comp")),
      path, 0, Some(blkBuckets))
    spark.range(0).select(col("id").as("src"), col("id").as("dst"))
      .write.mode("overwrite").parquet(s"$path/remap/step=0")
    commitErStep(spark, path, 0, base = true)
  }

  /** Resolve a new batch against the persisted index: lands the
    * batch's rows (labels as of this step) and the step's label
    * merges as ONE committed step — committed step dirs are NEVER
    * rewritten — then returns the updated entity table. Incremental
    * == full recompute on the union (QualitySpec law; cap caveat in
    * the section comment); a step that crashed before its commit
    * marker is invisible and the retry overwrites it in place. */
  def resolveEntitiesIncremental(newDf: DataFrame, id: Column,
      blockKey: Column, matchCol: Column, path: String, maxDist: Int = 1,
      maxBlock: Int = 1000, maxIter: Int = 20): DataFrame = {
    val spark = newDf.sparkSession
    val nb = normalizeErBatch(newDf, id, blockKey, matchCol)
      .localCheckpoint(true)
    // Prior state PRUNED to the batch's touched blkb buckets (file-
    // level, a superset of the exact blk semi-join erStepParts keeps):
    // the step's read cost is ∝ touched blocks, not index size.
    val cur = erBlkbOf(spark, path) match {
      case Some(b) => currentIndexPruned(spark, path, touchedBuckets(nb, b))
      case None => currentIndex(spark, path)
    }
    val (newRows, remap) = erStepParts(nb, cur, maxDist, maxBlock, maxIter)
    val steps = committedErSteps(spark, path)
    // A flat pre-committed-step index READS fine (currentIndex's
    // no-commits branch) but cannot be appended to — without this
    // guard the next line dies with a bare "empty.max".
    require(steps.nonEmpty,
      s"resolveEntitiesIncremental: $path has no committed steps — a " +
        "flat (pre-committed-step) index must be re-seeded with " +
        "writeEntityIndex before incremental use")
    val n = steps.map(_._1).max + 1
    writeErRows(newRows, path, n, erBlkbOf(spark, path))
    remap.write.mode("overwrite").parquet(s"$path/remap/step=$n")
    commitErStep(spark, path, n, base = false)
    entityIndexSnapshot(spark, path)
  }

  /** Compact the index: land the CURRENT labels as a new committed
    * BASE step (rows with the remap closure applied, empty remap),
    * then drop the superseded step dirs — the answer to the remap
    * log's unbounded replay growth (every snapshot re-walks the whole
    * log otherwise; labels only decrease, so folding them in loses
    * nothing — QualitySpec law: snapshot after == before). Reads use
    * only steps >= the newest base, so a crash between the base
    * commit and the cleanup leaves the old dirs as invisible garbage,
    * never a double-count. */
  def compactEntityIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val steps = committedErSteps(spark, path)
    require(steps.nonEmpty, s"compactEntityIndex: nothing committed under $path")
    val n = steps.map(_._1).max + 1
    writeErRows(currentIndex(spark, path), path, n, erBlkbOf(spark, path))
    spark.range(0).select(col("id").as("src"), col("id").as("dst"))
      .write.mode("overwrite").parquet(s"$path/remap/step=$n")
    commitErStep(spark, path, n, base = true)
    val fs = erFs(spark, path)
    steps.map(_._1).foreach { s =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/rows/step=$s"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/remap/step=$s"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/commits/$s"), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/commits/$s.base"), false)
      ()
    }
  }

  /** One streamed ER micro-batch landed as committed step `id` — the
    * [[graft.streaming.Ingest.erIngestStream]] engine, living here so
    * the committed-step machinery has exactly one home. The stream's
    * step numbers ARE its batch ids, which is what makes checkpoint
    * replay idempotent against the marker discipline:
    *
    *  - marker for `id` already present → the previous attempt
    *    completed its writes (the marker is written LAST) and crashed
    *    before the checkpoint commit; skip straight to GC.
    *  - no marker → any `step=id` dirs are an uncommitted attempt's
    *    orphans, invisible to every read (prior state = committed
    *    steps only, ≥ the newest base); recompute from the same prior
    *    state and overwrite them.
    *
    * AUTO-COMPACTION (r10 verdict #4): when the live remap log
    * (committed steps ≥ newest base, plus this step's own merges)
    * exceeds `maxRemapRows`, the step lands as a BASE — the full
    * composed snapshot with the closure folded in and an empty remap —
    * instead of a delta, inside the same marker discipline: a crash
    * after the snapshot write but before the marker leaves the base
    * invisible, and the replay re-makes the SAME deterministic
    * decision (the threshold reads only committed state and the
    * recomputed step parts). The threshold is an absolute row count,
    * not the verdict's k × entities sketch, because the cost being
    * bounded is the closure replay over the log — a function of the
    * log's own size — and an entity-proportional rule would spend a
    * corpus-sized distinct-count per micro-batch to save a
    * merge-log-sized one. Superseded dirs (steps < newest base) are
    * GC'd AFTER the marker, and again at the next batch's entry — a
    * crash mid-delete leaves invisible garbage, never a double-count. */
  private[graft] def erStreamStep(batch: DataFrame, id: Long, path: String,
      idCol: String, blkCol: String, matchCol: String, maxDist: Int,
      maxBlock: Int, maxIter: Int, maxRemapRows: Long,
      blkBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    def gc(): Unit = {
      val cs = committedErSteps(spark, path)
      val bases = cs.filter(_._2).map(_._1)
      if (bases.nonEmpty) {
        val fs = erFs(spark, path)
        cs.map(_._1).filter(_ < bases.max).foreach { s =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/rows/step=$s"), true)
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/remap/step=$s"), true)
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/commits/$s"), false)
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/commits/$s.base"),
            false)
          ()
        }
      }
    }
    val steps = committedErSteps(spark, path)
    if (steps.exists(_._1 == id)) { gc(); return }
    // A marker BEYOND the current batch means this is not (only) this
    // stream's index — e.g. a manual compactEntityIndex ran against a
    // live stream dir (its step = max + 1 collides with the next batch
    // id). Fail loud; silently skipping would drop that batch's rows.
    require(steps.forall(_._1 < id),
      s"erStreamStep: $path has committed steps beyond batch $id " +
        s"(${steps.map(_._1).filter(_ >= id).sorted.mkString(", ")}) — " +
        "the stream must own its index dir; do not run " +
        "compactEntityIndex against an index a live stream appends to " +
        "(auto-compaction via maxRemapRows replaces it)")
    val base = steps.filter(_._2).map(_._1).maxOption.getOrElse(Long.MinValue)
    val live = steps.map(_._1).filter(_ >= base).sorted
    // Seed the blkb marker with the stream's OWN batch 0 (the stream
    // owns its dir); a pre-existing unmarked index keeps the legacy
    // unbucketed layout so files never mix bucketing schemes.
    if (live.isEmpty && erBlkbOf(spark, path).isEmpty)
      writeErBlkbMarker(spark, path, blkBuckets)
    val blkbOpt = erBlkbOf(spark, path)
    val emptyRemap = spark.range(0)
      .select(col("id").as("src"), col("id").as("dst"))
    def readPart(kind: String): Option[DataFrame] =
      if (live.isEmpty) None
      else Some(readSteps(spark, path, kind, live,
        bucketed = kind == "rows" && blkbOpt.isDefined))
    val priorRows = readPart("rows")
    val priorRemap = readPart("remap")
    val nb = normalizeErBatch(batch, col(idCol), col(blkCol), col(matchCol))
    // The step-parts input is PRUNED to the batch's touched blkb
    // buckets (file-level; erStepParts' blk semi-join stays as the
    // exact filter) — the full-rows frame is only composed on the
    // compaction branch, which rewrites everything anyway.
    val cur = (priorRows, blkbOpt) match {
      case (None, _) => emptyEntityIndex(spark)
      case (Some(_), Some(b)) =>
        composeIndex(
          readStepsRowsPruned(spark, path, live, touchedBuckets(nb, b)),
          priorRemap.getOrElse(emptyRemap))
      case (Some(r), None) =>
        composeIndex(r, priorRemap.getOrElse(emptyRemap))
    }
    val (newRows0, remap0) = erStepParts(nb, cur, maxDist, maxBlock, maxIter)
    // Materialize BEFORE writing: the plans read the very dirs the
    // writes extend (the dedupIngestStream lesson).
    val nr = newRows0.localCheckpoint(true)
    val rm = remap0.localCheckpoint(true)
    try {
      val liveRemapRows = priorRemap.map(_.count()).getOrElse(0L) + rm.count()
      if (liveRemapRows > maxRemapRows) {
        // land the step as a BASE: full snapshot, closure folded,
        // empty remap — reads pin to it, the log replay resets to zero
        writeErRows(
          composeIndex(priorRows.map(_.unionByName(nr)).getOrElse(nr),
            priorRemap.map(_.unionByName(rm)).getOrElse(rm)),
          path, id, blkbOpt)
        emptyRemap.write.mode("overwrite").parquet(s"$path/remap/step=$id")
        commitErStep(spark, path, id, base = true)
      } else {
        writeErRows(nr, path, id, blkbOpt)
        rm.write.mode("overwrite").parquet(s"$path/remap/step=$id")
        commitErStep(spark, path, id, base = false)
      }
    } finally { nr.unpersist(); rm.unpersist(); () }
    gc()
  }

  /** The index with labels CURRENT: stored comps composed with the
    * remap log's closure. The closure is one components() pass over
    * the log — labels only decrease and every merge links its inputs
    * to its output, so the current label of any historical comp is
    * the min of its remap-connected component. The log is
    * merge-count-sized; the join back is broadcast-shaped long before
    * the row store stops being corpus-sized. One layout since r11:
    * batch AND stream builders land committed steps (the stream's step
    * numbers are its batch ids — [[erStreamStep]]), read as the newest
    * base generation's committed steps only; the no-`commits/` branch
    * below reads a legacy flat dir whole (read-only compat). */
  private def currentIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    if (!erFs(spark, path).exists(
        new org.apache.hadoop.fs.Path(s"$path/commits")))
      return composeIndex(spark.read.parquet(s"$path/rows"),
        spark.read.parquet(s"$path/remap"))
    val steps = committedErSteps(spark, path)
    require(steps.nonEmpty,
      s"no committed entity-index steps under $path (seed with writeEntityIndex)")
    val baseStep = steps.filter(_._2).map(_._1) match {
      case s if s.isEmpty => 0L
      case s => s.max
    }
    val live = steps.map(_._1).filter(_ >= baseStep).sorted
    composeIndex(
      readSteps(spark, path, "rows", live,
        bucketed = erBlkbOf(spark, path).isDefined),
      readSteps(spark, path, "remap", live, bucketed = false))
  }

  /** ONE partition-discovered read of the committed step dirs, pruned
    * to `live` — a per-step read reduced by unionByName grows the plan
    * linearly with the number of live micro-batches (hundreds between
    * compactions), where a `step` partition-column filter is O(1) plan
    * with static pruning; uncommitted orphan dirs (always > every
    * committed step) are excluded by the isin, never scanned. */
  /** The fixed on-disk schemas (normalizeErBatch pins the column
    * types), provided EXPLICITLY to every step read: an empty
    * micro-batch's bucketed step dir carries no data file at all (a
    * partitionBy write of zero rows emits nothing), so schema
    * inference over the parent would fail exactly when the index
    * starts with an empty batch. */
  private def erReadSchema(kind: String,
      bucketed: Boolean): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val base =
      if (kind == "rows")
        new StructType().add("id", LongType).add("blk", StringType)
          .add("m", StringType).add("comp", LongType)
      else new StructType().add("src", LongType).add("dst", LongType)
    val s = base.add("step", LongType)
    if (bucketed) s.add("blkb", IntegerType) else s
  }

  private def readSteps(spark: org.apache.spark.sql.SparkSession,
      path: String, kind: String, live: Seq[Long],
      bucketed: Boolean): DataFrame =
    spark.read.schema(erReadSchema(kind, bucketed))
      .parquet(s"$path/$kind")
      .where(col("step").isin(live: _*)).drop("step", "blkb")

  /** [[readSteps]] for rows, additionally pruned to the touched blkb
    * partitions — BOTH predicates are static partition filters, so an
    * incremental step lists and reads only the touched buckets' files
    * of the live steps, never the whole row store. */
  private def readStepsRowsPruned(spark: org.apache.spark.sql.SparkSession,
      path: String, live: Seq[Long], buckets: Seq[Int]): DataFrame =
    spark.read.schema(erReadSchema("rows", bucketed = true))
      .parquet(s"$path/rows")
      .where(col("step").isin(live: _*) && col("blkb").isin(buckets: _*))
      .drop("step", "blkb")

  /** [[currentIndex]] restricted to the touched blkb buckets' rows
    * (full remap — the closure is merge-log-sized regardless): the
    * incremental batch form's pruned prior-state read. Labels are
    * exact for every returned row (composition is row-wise). */
  private def currentIndexPruned(spark: org.apache.spark.sql.SparkSession,
      path: String, buckets: Seq[Int]): DataFrame = {
    val steps = committedErSteps(spark, path)
    require(steps.nonEmpty,
      s"no committed entity-index steps under $path (seed with writeEntityIndex)")
    val baseStep = steps.filter(_._2).map(_._1) match {
      case s if s.isEmpty => 0L
      case s => s.max
    }
    val live = steps.map(_._1).filter(_ >= baseStep).sorted
    composeIndex(readStepsRowsPruned(spark, path, live, buckets),
      readSteps(spark, path, "remap", live, bucketed = false))
  }

  /** The frame form of the composition — shared by the disk reads and
    * [[erStreamStep]]'s in-step folds. Extra columns on `rows` are
    * dropped. */
  private[graft] def composeIndex(rows: DataFrame,
      remap: DataFrame): DataFrame = {
    val closure = Dedup.components(
        remap.select(col("src").as("d1"), col("dst").as("d2")))
      .select(col("id").as("comp"), col("comp").as("_fin"))
    rows.join(closure, Seq("comp"), "left")
      .select(col("id"), col("blk"), col("m"),
        coalesce(col("_fin"), col("comp")).as("comp"))
  }

  /** Entity table (id, entity, canonical) of the persisted index. */
  def entityIndexSnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    entityTable(currentIndex(spark, path))

  /** Distributional drift between two corpus snapshots — the
    * monitoring sibling of [[corpusDiff]]: corpusDiff says WHICH docs
    * changed, corpusDrift says whether the LANGUAGE changed (topic
    * shift, a scraper gone bad, a new source dominating). Both
    * snapshots reduce to smoothed hashed unigram+bigram bucket models
    * (the `Mix.ngramBuckets` feature space — O(buckets) state
    * regardless of vocabulary), and each bucket row carries its
    * add-one-smoothed probabilities under both snapshots and its
    * Jensen-Shannon contribution `½·pa·ln(pa/m) + ½·pb·ln(pb/m)`,
    * m = (pa+pb)/2; Σ js_term over the frame is the JS divergence in
    * nats (0 = identical distributions, ln 2 = disjoint). The per-
    * bucket rows, ordered by |contribution|, name the drifting grams'
    * buckets — the starting point for a heavy-hitters drill-down. The
    * output is DENSE — one row per bucket, both-side-empty buckets
    * included (their smoothed terms are nonzero when na ≠ nb).
    *
    * Scale: two corpus-linear partial-aggregable groupBys onto
    * `buckets` rows each, one bucket-keyed full-outer join of those
    * tiny tables, two 1-row totals broadcast back. Determinism: pa/pb
    * are single IEEE divisions of exact ints, the two `ln`s are
    * 6dp-rounded (the dsir discipline), everything after is the same
    * operand sequence in any engine.
    * Output: bucket, ca, cb, pa, pb, js_term (ordered by bucket). */
  def corpusDrift(old: DataFrame, curr: DataFrame, buckets: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // Impl directly — driftCounts emits unique in-range buckets by
    // construction (hash % buckets, one row per bucket), so the
    // external-form guards would only rescan the corpus (the [[psi]]
    // argument).
    driftFromCountsImpl(driftCounts(old, buckets, idCol, textCol),
      driftCounts(curr, buckets, idCol, textCol), buckets)

  /** A corpus's hashed-ngram bucket counts — the bounded (≤ buckets
    * rows, ~16 B each) summary [[corpusDrift]] compares. ADDITIVE over
    * disjoint doc batches (counts sum), which is what makes the
    * summary streamable and mergeable: land per-batch counts, sum per
    * bucket, compare whenever. Output: bucket, n. */
  def driftCounts(df: DataFrame, buckets: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    Mix.ngramBuckets(df, buckets, idCol, textCol)
      .groupBy("bucket").agg(sum("c").cast("long").as("n"))
  }

  /** [[corpusDrift]] over two PRE-AGGREGATED [[driftCounts]] tables
    * (each: bucket, n) — the form a drift monitor calls repeatedly
    * against a frozen reference summary without ever re-reading the
    * reference corpus. */
  def driftFromCounts(old: DataFrame, curr: DataFrame,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    requireBucketsInRange(old, buckets, "driftFromCounts(old)")
    requireBucketsInRange(curr, buckets, "driftFromCounts(curr)")
    // Sum landed multi-batch cells per bucket before the spine join —
    // the [[psiFromHistograms]] duplicate-cell guard, on the JS side.
    driftFromCountsImpl(
      old.groupBy("bucket").agg(sum("n").cast("long").as("n")),
      curr.groupBy("bucket").agg(sum("n").cast("long").as("n")), buckets)
  }

  private def driftFromCountsImpl(old: DataFrame, curr: DataFrame,
      buckets: Int): DataFrame = {
    val spark = old.sparkSession
    // No pins here, deliberately (r15): each side has only TWO
    // consumers (side total + spine join) and the duplicated towers are
    // independent subtrees of one job — they run in the parallel slack,
    // while a pin is a serializing materialization barrier (measured:
    // pinning moved r70 0.45 -> 0.96 s at sf0.1). The 3-consumer
    // grouped form (driftFromCountsByImpl) IS pinned — there the trade
    // measured the other way.
    val a = old.select(col("bucket"), col("n").as("ca"))
    val b = curr.select(col("bucket"), col("n").as("cb"))
    // coalesce: an EMPTY side (failed/missing batch) sums to null,
    // which would null pa/pb and every js_term — the monitor would
    // read "no drift" at exactly the moment drift is maximal. With a
    // 0 total, add-one smoothing still yields finite probabilities
    // and the divergence reads loud and positive instead of null.
    val na = a.agg(coalesce(sum("ca"), lit(0L)).cast("long").as("na"))
    val nb = b.agg(coalesce(sum("cb"), lit(0L)).cast("long").as("nb"))
    // DENSE spine — one row per bucket 0..buckets−1, including buckets
    // empty on BOTH sides, whose smoothed JS terms are nonzero whenever
    // na ≠ nb; the sparse full-outer layout under-read the smoothed
    // divergence exactly when side totals differ (the [[psi]] dense-
    // spine argument, applied to the JS side — r10 advisor finding).
    val spine = spark.range(buckets).select(col("id").as("bucket"))
    spine.join(a, Seq("bucket"), "left").join(b, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("bucket"), col("ca"), col("cb"),
        ((col("ca") + 1).cast("double") / (col("na") + buckets)).as("pa"),
        ((col("cb") + 1).cast("double") / (col("nb") + buckets)).as("pb"))
      .withColumn("m", (col("pa") + col("pb")) / 2)
      .select(col("bucket"), col("ca"), col("cb"), col("pa"), col("pb"),
        (lit(0.5) * col("pa") * round(log(col("pa") / col("m")), 6) +
          lit(0.5) * col("pb") * round(log(col("pb") / col("m")), 6))
          .as("js_term"))
  }

  /** [[requireBinsInRange]] for the drift summaries' `bucket` column. */
  private def requireBucketsInRange(h: DataFrame, buckets: Int,
      what: String): Unit = {
    val r = h.agg(min(col("bucket").cast("long")),
      max(col("bucket").cast("long"))).head
    if (!r.isNullAt(1))
      require(r.getLong(0) >= 0 && r.getLong(1) < buckets,
        s"$what: bucket range [${r.getLong(0)}, ${r.getLong(1)}] outside " +
          s"[0, $buckets) — buckets argument does not match the " +
          "summary's layout")
  }

  /** Per-segment [[corpusDrift]] — text drift monitored PER GROUP
    * (per lang / source / domain), because a corpus-global divergence
    * washes out one segment's scraper gone bad exactly the way a
    * global PSI hides one segment's shift ([[psiBy]]'s argument, on
    * the text side). Each side reduces to [[driftCountsBy]] grouped
    * bucket models; every (group, bucket) row carries add-one-smoothed
    * probabilities under the GROUP's totals and its JS contribution;
    * Σ js_term per group is that segment's divergence in nats.
    * Output: group, bucket, ca, cb, pa, pb, js_term. */
  def corpusDriftBy(old: DataFrame, curr: DataFrame, groupCol: String,
      buckets: Int = 1024, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    // Impl directly — the [[corpusDrift]] argument, grouped.
    driftFromCountsByImpl(
      driftCountsBy(old, groupCol, buckets, idCol, textCol),
      driftCountsBy(curr, groupCol, buckets, idCol, textCol), buckets)

  /** Per-group [[driftCounts]]: hashed-ngram bucket counts keyed by a
    * segment column, carried THROUGH the explode (no second corpus
    * scan to re-attach the group). ≤ groups × buckets rows, additive
    * per (group, bucket) over disjoint batches. Output: group,
    * bucket, n. */
  def driftCountsBy(df: DataFrame, groupCol: String, buckets: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(groupCol != idCol,
      "driftCountsBy: groupCol must differ from idCol")
    Mix.ngramBuckets(df, buckets, idCol, textCol, carry = Seq(groupCol))
      .groupBy(col(groupCol).as("group"), col("bucket"))
      .agg(sum("c").cast("long").as("n"))
  }

  /** [[corpusDriftBy]] over two PRE-AGGREGATED (group, bucket, n)
    * tables — the monitor form, composable from landed per-batch
    * [[driftCountsBy]] summaries (multi-batch cells are summed per
    * (group, bucket) here). DENSE over the group-union × buckets
    * spine, like [[driftFromCounts]]: a group on one side only, or a
    * bucket empty on both sides of a group with unequal totals, reads
    * loud instead of vanishing. NULL groups are their own group. */
  def driftFromCountsBy(old: DataFrame, curr: DataFrame,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    requireBucketsInRange(old, buckets, "driftFromCountsBy(old)")
    requireBucketsInRange(curr, buckets, "driftFromCountsBy(curr)")
    driftFromCountsByImpl(
      old.groupBy("group", "bucket").agg(sum("n").cast("long").as("n")),
      curr.groupBy("group", "bucket").agg(sum("n").cast("long").as("n")),
      buckets)
  }

  private def driftFromCountsByImpl(old: DataFrame, curr: DataFrame,
      buckets: Int): DataFrame = {
    val spark = old.sparkSession
    // Each side is consumed THREE times (cell join, group totals, the
    // group spine); the frames are summary-sized (≤ groups × buckets
    // rows) but their lineage can be the full corpus ngram tower
    // (corpusDriftBy), which re-ran once per consumer — r101 at sf0.1:
    // 8 corpus scans in the final plan, 23.7 s task time. Lazy pins
    // (the r14 small-frame idiom) run each tower once.
    val a = old.select(col("group").as("ga"), col("bucket").as("ba"),
      col("n").as("ca"))
      .localCheckpoint(false)
    val b = curr.select(col("group").as("gb"), col("bucket").as("bb"),
      col("n").as("cb"))
      .localCheckpoint(false)
    val na = a.groupBy("ga").agg(sum("ca").cast("long").as("na"))
      .withColumnRenamed("ga", "gna")
    val nb = b.groupBy("gb").agg(sum("cb").cast("long").as("nb"))
      .withColumnRenamed("gb", "gnb")
    // DENSE groups × buckets spine (the [[psiBy]] shape): the groups
    // are the union of both sides', the buckets the full 0..buckets−1
    // range — both-side-empty cells carry nonzero smoothed JS terms
    // whenever the group's totals differ (the [[driftFromCounts]]
    // dense-spine argument, grouped — r10 advisor finding). Still
    // summary-sized: ≤ groups × buckets rows.
    val groups = a.select(col("ga").as("group"))
      .unionByName(b.select(col("gb").as("group"))).distinct()
    val spine = groups.crossJoin(
      spark.range(buckets).select(col("id").as("bucket")))
    spine
      .join(a, col("group") <=> col("ga") && col("bucket") === col("ba"),
        "left")
      .join(b, col("group") <=> col("gb") && col("bucket") === col("bb"),
        "left")
      .join(broadcast(na), col("group") <=> col("gna"), "left")
      .join(broadcast(nb), col("group") <=> col("gnb"), "left")
      .select(col("group"), col("bucket"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        ((coalesce(col("ca"), lit(0L)) + 1).cast("double") /
          (coalesce(col("na"), lit(0L)) + buckets)).as("pa"),
        ((coalesce(col("cb"), lit(0L)) + 1).cast("double") /
          (coalesce(col("nb"), lit(0L)) + buckets)).as("pb"))
      .withColumn("m", (col("pa") + col("pb")) / 2)
      .select(col("group"), col("bucket"), col("ca"), col("cb"),
        col("pa"), col("pb"),
        (lit(0.5) * col("pa") * round(log(col("pa") / col("m")), 6) +
          lit(0.5) * col("pb") * round(log(col("pb") / col("m")), 6))
          .as("js_term"))
  }

  /** Population Stability Index between two NUMERIC snapshots — the
    * model-monitoring sibling of [[corpusDrift]] (that one watches
    * text; this one watches a feature/score/amount column for the
    * shift that silently invalidates a trained threshold). Both sides
    * reduce to [[graft.functions.Sketch.valueHistogram]] summaries
    * under the SAME frozen (lo, hi) bounds (values outside clamp into
    * the edge bins, so a drifted batch reads loud rather than
    * vanishing), each bin carries add-one-smoothed probabilities and
    * its contribution `(pa − pb) · ln(pa/pb)`; Σ psi_term is the PSI
    * (industry rule of thumb: < 0.1 stable, 0.1–0.25 watch, > 0.25
    * act). Per-bin rows ordered by |contribution| name the drifting
    * value ranges directly — bin edges are `lo + bin·(hi−lo)/bins`.
    *
    * Scale: two corpus-linear partial-aggregable passes onto ≤ bins
    * rows each, joined onto a bins-sized spine, two 1-row totals
    * broadcast back (the [[driftFromCounts]] shape, including its
    * empty-side discipline: a missing batch reads as maximal drift,
    * never null). The output is DENSE — exactly one row per bin
    * 0..bins−1, including bins empty on BOTH sides, whose smoothed
    * terms are nonzero whenever na ≠ nb; without them Σ psi_term
    * would under-read the add-one-smoothed PSI exactly when side
    * totals differ (the r9 advisor finding). The histograms are
    * ADDITIVE, so a monitor composes landed per-batch
    * [[graft.streaming.Ingest.histogramIngestStream]] cells against a
    * frozen reference without rescanning anything. Determinism: pa/pb
    * are single IEEE divisions of exact ints, the ln is 6dp-rounded
    * (the dsir discipline). Output: bin, ca, cb, pa, pb, psi_term. */
  def psi(old: DataFrame, curr: DataFrame, valueCol: String, lo: Double,
      hi: Double, bins: Int = 256): DataFrame =
    // Impl directly: valueHistogram clamps bins into [0, bins) and
    // yields one cell per bin by construction, so the external-form
    // range check / pre-aggregation would only re-execute the two
    // corpus scans it is built from (r10 advisor finding: the eager
    // .head check turned the documented two passes into four).
    psiFromHistogramsImpl(
      graft.functions.Sketch.valueHistogram(old, valueCol, lo, hi, bins),
      graft.functions.Sketch.valueHistogram(curr, valueCol, lo, hi, bins),
      bins)

  /** [[psi]] over two PRE-AGGREGATED (bin, c) histograms (the
    * [[graft.functions.Sketch.valueHistogram]] layout) — the form the
    * monitor calls repeatedly against a frozen reference summary. */
  /** Fail loud when a histogram carries bins outside [0, `bins`): the
    * dense spine would silently DROP those cells while the na/nb
    * totals still count them, deflating every surviving probability —
    * the quiet-wrong failure mode of a bins-argument mismatch between
    * the landing stream and the monitor (r10 review finding). One
    * tiny job over a ≤ bins-row summary. */
  private def requireBinsInRange(h: DataFrame, bins: Int,
      what: String): Unit = {
    val r = h.agg(min(col("bin").cast("long")),
      max(col("bin").cast("long"))).head
    if (!r.isNullAt(1))
      require(r.getLong(0) >= 0 && r.getLong(1) < bins,
        s"$what: histogram bin range [${r.getLong(0)}, ${r.getLong(1)}] " +
          s"outside [0, $bins) — bins argument does not match the " +
          "histogram's layout")
  }

  def psiFromHistograms(old: DataFrame, curr: DataFrame,
      bins: Int = 256): DataFrame = {
    require(bins > 0, "bins must be positive")
    requireBinsInRange(old, bins, "psiFromHistograms(old)")
    requireBinsInRange(curr, bins, "psiFromHistograms(curr)")
    // Landed per-batch cells arrive MULTIPLE rows per bin; the spine's
    // left join assumes one. Summing here (summary-sized) makes raw
    // multi-batch input correct instead of quietly applying +1
    // smoothing per duplicate row (r10 advisor finding). The internal
    // [[psi]] path skips both the check and this pass — its
    // histograms are unique-celled by construction.
    psiFromHistogramsImpl(
      old.groupBy("bin").agg(sum("c").cast("long").as("c")),
      curr.groupBy("bin").agg(sum("c").cast("long").as("c")), bins)
  }

  private def psiFromHistogramsImpl(old: DataFrame, curr: DataFrame,
      bins: Int): DataFrame = {
    val spark = old.sparkSession
    // No pins: two consumers per side — the driftFromCountsImpl
    // parallel-slack argument (r15); only the 3-consumer grouped form
    // pins.
    val a = old.select(col("bin"), col("c").as("ca"))
    val b = curr.select(col("bin"), col("c").as("cb"))
    val na = a.agg(coalesce(sum("ca"), lit(0L)).cast("long").as("na"))
    val nb = b.agg(coalesce(sum("cb"), lit(0L)).cast("long").as("nb"))
    val spine = spark.range(bins).select(col("id").cast("int").as("bin"))
    spine.join(a, Seq("bin"), "left").join(b, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("bin"), col("ca"), col("cb"),
        ((col("ca") + 1).cast("double") / (col("na") + bins)).as("pa"),
        ((col("cb") + 1).cast("double") / (col("nb") + bins)).as("pb"))
      .select(col("bin"), col("ca"), col("cb"), col("pa"), col("pb"),
        ((col("pa") - col("pb")) * round(log(col("pa") / col("pb")), 6))
          .as("psi_term"))
  }

  /** Per-segment [[psi]] — drift monitored PER GROUP (per lang /
    * domain / account type: the reference's per-table quality report,
    * as a distributional screen), because a corpus-global PSI washes
    * out a segment that drifted alone. Both snapshots reduce to
    * [[graft.functions.Sketch.valueHistogramBy]] summaries under ONE
    * frozen (lo, hi) domain shared by every group (bin edges must
    * agree across groups and sides), then every (group, bin) cell of
    * the dense groups × bins spine carries its own add-one-smoothed
    * probabilities — smoothed against the GROUP's totals — and PSI
    * term; Σ psi_term per group is that segment's PSI.
    *
    * Scale: two corpus-linear partial-aggregable passes onto
    * ≤ groups × bins rows each, then everything downstream is
    * summary-sized (the spine join, the per-group totals, the terms).
    * The groups spine is the UNION of both sides' groups, so a
    * segment present in only one snapshot reads maximal drift, never
    * disappears (the [[driftFromCounts]] empty-side discipline, per
    * group). NULL groups are their own group (null-safe joins, the
    * [[graft.functions.Sketch.histogramQuantilesBy]] rule).
    * Output: group, bin, ca, cb, pa, pb, psi_term. */
  def psiBy(old: DataFrame, curr: DataFrame, groupCol: String,
      valueCol: String, lo: Double, hi: Double,
      bins: Int = 256): DataFrame = {
    import graft.functions.Sketch
    // Impl directly — the [[psi]] argument: valueHistogramBy clamps
    // bins and emits unique (group, bin) cells by construction, so the
    // external-form guards would just rescan the corpus.
    psiFromHistogramsByImpl(
      Sketch.valueHistogramBy(old, groupCol, valueCol, lo, hi, bins),
      Sketch.valueHistogramBy(curr, groupCol, valueCol, lo, hi, bins),
      bins)
  }

  /** [[psiBy]] over two PRE-AGGREGATED (group, bin, c) histograms
    * (the [[graft.functions.Sketch.valueHistogramBy]] layout) — the
    * monitor form: landed per-batch grouped cells, summed per
    * (group, bin), compared against a frozen reference whenever. */
  def psiFromHistogramsBy(old: DataFrame, curr: DataFrame,
      bins: Int = 256): DataFrame = {
    require(bins > 0, "bins must be positive")
    requireBinsInRange(old, bins, "psiFromHistogramsBy(old)")
    requireBinsInRange(curr, bins, "psiFromHistogramsBy(curr)")
    // Sum landed multi-batch cells per (group, bin) before the spine
    // join — the [[psiFromHistograms]] duplicate-cell guard, grouped.
    psiFromHistogramsByImpl(
      old.groupBy("group", "bin").agg(sum("c").cast("long").as("c")),
      curr.groupBy("group", "bin").agg(sum("c").cast("long").as("c")),
      bins)
  }

  private def psiFromHistogramsByImpl(old: DataFrame, curr: DataFrame,
      bins: Int): DataFrame = {
    val spark = old.sparkSession
    // Lazy pins: three consumers per side (group totals, group spine,
    // cell join) — the driftFromCountsByImpl argument, on the PSI side
    // (r15).
    val a = old.select(col("group").as("ga"), col("bin").as("bina"),
      col("c").as("ca"))
      .localCheckpoint(false)
    val b = curr.select(col("group").as("gb"), col("bin").as("binb"),
      col("c").as("cb"))
      .localCheckpoint(false)
    val na = a.groupBy("ga").agg(sum("ca").cast("long").as("na"))
      .withColumnRenamed("ga", "gna")
    val nb = b.groupBy("gb").agg(sum("cb").cast("long").as("nb"))
      .withColumnRenamed("gb", "gnb")
    val groups = a.select(col("ga").as("group"))
      .unionByName(b.select(col("gb").as("group"))).distinct()
    val spine = groups.crossJoin(
      spark.range(bins).select(col("id").cast("int").as("bin")))
    spine
      .join(a, col("group") <=> col("ga") && col("bin") === col("bina"), "left")
      .join(b, col("group") <=> col("gb") && col("bin") === col("binb"), "left")
      .join(broadcast(na), col("group") <=> col("gna"), "left")
      .join(broadcast(nb), col("group") <=> col("gnb"), "left")
      .select(col("group"), col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
      .select(col("group"), col("bin"), col("ca"), col("cb"),
        ((col("ca") + 1).cast("double") / (col("na") + bins)).as("pa"),
        ((col("cb") + 1).cast("double") / (col("nb") + bins)).as("pb"))
      .select(col("group"), col("bin"), col("ca"), col("cb"), col("pa"),
        col("pb"),
        ((col("pa") - col("pb")) * round(log(col("pa") / col("pb")), 6))
          .as("psi_term"))
  }

  /** Quantile winsorization — clip a numeric column to its
    * [loQ, hiQ] estimated quantile band, the feature-hygiene step
    * that keeps one fat-finger 10^9 amount from dominating a scale
    * fit or a histogram feature. Bounds come from bounded-state
    * histograms (the [[robustStatsApprox]] argument: exact percentile
    * state is distinct-value-sized), in TWO refining passes, because
    * one pass self-defeats here: the very outliers being clipped
    * stretch the histogram range, collapsing every interior value
    * into one bin (a ±1e9 spike over unit-scale data leaves
    * bin-midpoint "quantiles" ~250k off). Pass 1
    * ([[graft.functions.Sketch.histogramQuantiles]]) brackets the two
    * rank elements to their bins; pass 2 re-histograms inside that
    * band ([[graft.functions.Sketch.valueHistogram]] — out-of-band
    * values clamp into the EDGE bins, which preserves every rank
    * because clamping is monotone and the target elements are
    * in-band) and re-picks with
    * [[graft.functions.Sketch.quantilesFromHistogram]], so the final
    * error is ≤ bandWidth/bins — resolution set by the data's
    * interior, not its spikes. The clip itself is one narrow
    * codegen'd greatest/least against the broadcast 1-row bounds.
    * Null values stay null (guarded: both engines' LEAST/GREATEST
    * skip nulls, which would otherwise clip a null to the upper
    * bound). In-band values pass through bit-identical — only the
    * tails move. All-null input yields null bounds and passthrough.
    * Output: input columns + qlo, qhi, <valueCol>_w. */
  def winsorize(df: DataFrame, valueCol: String, loQ: Double = 0.01,
      hiQ: Double = 0.99, bins: Int = 4096): DataFrame = {
    require(loQ > 0 && loQ < hiQ && hiQ <= 1,
      s"need 0 < loQ < hiQ <= 1, got ($loQ, $hiQ)")
    import graft.functions.Sketch
    val coarse = Sketch.histogramQuantiles(df, valueCol, Seq(loQ, hiQ), bins)
    val band = coarse.agg(
      min(when(col("q") === loQ, col("blo"))).as("blo"),
      min(when(col("q") === hiQ, col("bhi"))).as("bhi")).head
    val v = col(valueCol).cast("double")
    if (band.isNullAt(0) || band.isNullAt(1)) {
      // no non-null values at all: null bounds, passthrough clip
      return df.withColumn("qlo", lit(null).cast("double"))
        .withColumn("qhi", lit(null).cast("double"))
        .withColumn(s"${valueCol}_w", v)
    }
    val (bandLo, bandHi) = (band.getDouble(0), band.getDouble(1))
    val fine = Sketch.quantilesFromHistogram(
      Sketch.valueHistogram(df, valueCol, bandLo, bandHi, bins),
      bandLo, bandHi, Seq(loQ, hiQ), bins)
    val bounds = fine.agg(
      min(when(col("q") === loQ, col("est"))).as("qlo"),
      min(when(col("q") === hiQ, col("est"))).as("qhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${valueCol}_w",
        when(v.isNotNull, greatest(col("qlo"), least(col("qhi"), v))))
  }

  /** Per-group [[winsorize]] — the clip band fit PER SEGMENT (per
    * currency / account type / domain), because a global band either
    * flattens a high-scale group or lets its tail through: the
    * segment whose p99 is another segment's median needs its own
    * bounds. Same two refining passes, grouped: pass 1
    * ([[graft.functions.Sketch.histogramQuantilesBy]]) brackets each
    * group's rank elements to their bins; pass 2 re-histograms every
    * group INSIDE its own band (out-of-band values clamp into the
    * edge bins — rank-preserving, the [[winsorize]] argument) and
    * re-picks, so each group's error is ≤ its own bandWidth/bins.
    *
    * Scale: per-group aggregation state is ≤ bins longs in every
    * pass (the [[robustStatsApprox]] discipline — nothing
    * group-sized in one buffer, hot groups welcome); all summary
    * frames are ≤ groups × bins rows, broadcast back for the narrow
    * clip. NULL groups are their own group; a group with no non-null
    * values gets null bounds and passes through (null values stay
    * null — the LEAST/GREATEST null-skip guard).
    * Output: input columns + qlo, qhi, <valueCol>_w. */
  def winsorizeBy(df: DataFrame, groupCol: String, valueCol: String,
      loQ: Double = 0.01, hiQ: Double = 0.99, bins: Int = 4096): DataFrame = {
    require(loQ > 0 && loQ < hiQ && hiQ <= 1,
      s"need 0 < loQ < hiQ <= 1, got ($loQ, $hiQ)")
    import graft.functions.Sketch
    val spark = df.sparkSession
    import spark.implicits._
    val coarse = Sketch.histogramQuantilesBy(df, groupCol, valueCol,
      Seq(loQ, hiQ), bins)
    val band = coarse.groupBy("group").agg(
      min(when(col("q") === loQ, col("blo"))).as("blo2"),
      min(when(col("q") === hiQ, col("bhi"))).as("bhi2"))
    val base = df.select(col(groupCol).as("group"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val counts = base
      .join(broadcast(band.withColumnRenamed("group", "bg")),
        col("group") <=> col("bg"))
      .select(col("group"), when(col("bhi2") === col("blo2"), lit(0))
        .otherwise(greatest(lit(0), least(lit(bins - 1),
          floor((col("v") - col("blo2")) /
            (col("bhi2") - col("blo2")) * bins))))
        .cast("int").as("bin"))
      .groupBy("group", "bin").agg(count(lit(1)).cast("long").as("c"))
    // ≤ groups × bins rows from here on: the per-group window, ranks,
    // picks and bounds are all summary-sized.
    val cum = counts.withColumn("cum",
      sum("c").over(Window.partitionBy("group").orderBy("bin")).cast("long"))
    val nn = counts.groupBy("group").agg(sum("c").cast("long").as("n"))
      .withColumnRenamed("group", "ng")
    val ranks = Seq(loQ, hiQ).toDF("q").crossJoin(nn)
      .select(col("ng"), col("q"),
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")).as("rank"))
    val pick = broadcast(ranks)
      .join(cum, col("ng") <=> col("group") && col("cum") >= col("rank"))
      .groupBy("ng", "q", "rank").agg(min("bin").as("bin"))
    val est = pick
      .join(broadcast(band.withColumnRenamed("group", "bg2")),
        col("ng") <=> col("bg2"))
      .select(col("ng"), col("q"),
        (((col("blo2") + col("bin") * ((col("bhi2") - col("blo2")) / bins)) +
          (col("blo2") + (col("bin") + 1) *
            ((col("bhi2") - col("blo2")) / bins))) / 2).as("est"))
    val bounds = est.groupBy("ng").agg(
      min(when(col("q") === loQ, col("est"))).as("qlo"),
      min(when(col("q") === hiQ, col("est"))).as("qhi"))
    val v = col(valueCol).cast("double")
    df.join(broadcast(bounds), col(groupCol) <=> col("ng"), "left")
      .drop("ng")
      .withColumn(s"${valueCol}_w",
        when(v.isNotNull, greatest(col("qlo"), least(col("qhi"), v))))
  }

  /** Snapshot diff between two corpus versions: one row per doc whose
    * content differs between `old` and `curr` — `added` (id only in
    * curr), `removed` (only in old), `changed` (in both, content hash
    * differs). Unchanged docs emit nothing. This is the audit
    * primitive behind incremental work: what must be re-embedded,
    * re-deduped, or re-trained after a corpus refresh.
    *
    * Scale: each side reduces to (id, md5(content)) BEFORE the join —
    * ~50 B/doc no matter how large the text — so the full-outer
    * equi-join shuffles only those compact rows (AQE-splittable, no
    * window, no driver state). `contentCols` are concat_ws-joined with
    * an unlikely separator; both engines skip nulls there, so a null
    * column equals an absent one.
    * Output: idCol, status ∈ {added, removed, changed}. */
  def corpusDiff(old: DataFrame, curr: DataFrame, idCol: String = "doc_id",
      contentCols: Seq[String] = Seq("text")): DataFrame = {
    def hashed(df: DataFrame, suffix: String) = df.select(
      col(idCol).as(s"id$suffix"),
      md5(concat_ws("\u0001", contentCols.map(col): _*)).as(s"h$suffix"))
    hashed(old, "a").join(hashed(curr, "b"),
        col("ida") === col("idb"), "full_outer")
      .filter(col("ida").isNull || col("idb").isNull || col("ha") =!= col("hb"))
      .select(coalesce(col("ida"), col("idb")).as(idCol),
        when(col("ida").isNull, "added")
          .when(col("idb").isNull, "removed")
          .otherwise("changed").as("status"))
  }

  /** Negative balances (issue #4). */
  def negativeBalances(accounts: DataFrame): DataFrame =
    accounts.filter(col("balance") < 0)

  /** Robust per-group outlier detection: modified z-score from the
    * group's MEDIAN and MAD (median absolute deviation), the
    * Iglewicz–Hoaglin rule `|0.6745·(x − med) / MAD| > cutoff`. The
    * anomalous-amount screen a mean/stddev z-score can't be at 100 TB:
    * one fat-finger 10^9 transaction drags a mean-based threshold past
    * every other anomaly in the group (the mean has a 0% breakdown
    * point; the median's is 50%), so the robust form is the one the
    * reference's quality report actually wants for amount screens.
    *
    * Shape: two group-sized aggregations (median, then MAD over the
    * med-joined frame) broadcast back — three scans of `df`, the
    * corpus itself never shuffles on the group key. Uses EXACT
    * `percentile` (r44 discipline: interpolation matches DuckDB's
    * quantile_cont bit-for-bit at the 4-dp contract); groups must be
    * few enough to broadcast (true of every dimension-keyed screen —
    * for high-cardinality groups swap in
    * [[graft.functions.Sketch.histogramQuantilesBy]]'s bounded-error
    * medians). med/mad/z are rounded to 4 dp so float noise cannot
    * flip a borderline verdict across engines (the Ann rounded-rank
    * discipline). Null values and MAD = 0 groups (>50% of the group
    * at one value — ties everywhere) yield null z / outlier = false
    * rather than a division blow-up.
    * Output: input columns + med, mad, robust_z, outlier. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      cutoff: Double = 3.5): DataFrame =
    scoreOutliers(df, robustStats(df, groupCol, valueCol), groupCol,
      valueCol, cutoff)

  /** The (med, mad) model alone — one row per group. Split out so a
    * STREAM can score against a FROZEN model
    * ([[graft.streaming.Ingest.outlierIngestStream]] — the
    * fixed-codebook pattern: fit batch-side once, score forever). */
  def robustStats(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val med = df.groupBy(groupCol).agg(
      round(expr(s"percentile(cast($valueCol as double), 0.5)"), 4).as("med"))
    df.join(broadcast(med), Seq(groupCol))
      .groupBy(groupCol)
      .agg(first(col("med")).as("med"),
        round(expr(s"percentile(abs(cast($valueCol as double) - med), 0.5)"), 4)
          .as("mad"))
  }

  /** Bounded-error sibling of [[robustStats]] for HIGH-CARDINALITY /
    * hot groups — the 100 TB form. Spark's exact `percentile` buffers
    * a counts-map of every distinct value of a group on ONE reducer,
    * so an unrounded double metric with a hot group is an OOM; here
    * both the median and the MAD come from
    * [[graft.functions.Sketch.histogramQuantilesBy]]'s fixed-width
    * histograms instead: per-group aggregation state is ≤ `bins`
    * longs no matter how hot the group, every stage is a partial-
    * aggregable groupBy, and nothing group-sized ever sits in one
    * buffer.
    *
    * Error contract (QualitySpec pins it, odd AND even group counts):
    * the estimated median is the midpoint of the bin holding the
    * rank-⌈n/2⌉ element, and `med_err` is the span of the bins
    * BRACKETING both middle order statistics
    * ([[graft.functions.Sketch.histogramQuantileBracketsBy]]): for odd
    * n that is one bin width `w_v = (max−min)/bins`; for even n exact
    * `percentile(0.5)` interpolates two middle elements that can
    * straddle a bin gap (values [0,0,100,100] → exact 50 while the
    * rank element's bin sits at ~0 — the r9 advisor finding), and the
    * span covers both bins plus the gap, so `|med − exact| ≤ med_err`
    * holds unconditionally. The MAD pass histograms `|x − med̂|`, so
    * `|mad − exact| ≤ med_err + w_d` (the med̂ shift moves each
    * deviation by ≤ med_err — the median is 1-Lipschitz in a uniform
    * operand shift — plus that pass's own bracket span `w_d`). Both
    * bounds are returned as `med_err` / `mad_err` so a caller can
    * derive the z-score band within which a verdict is uncertain;
    * outside it, approx and exact verdicts agree.
    *
    * Cost: four corpus scans (min/max + histogram, twice) vs exact's
    * three — the price of bounded state. Shape: every pass is a
    * group-keyed partial agg onto ≤ groups × bins summary rows.
    * Output: groupCol, med, mad, med_err, mad_err (med/mad 4dp, the
    * [[robustStats]] contract). */
  def robustStatsApprox(df: DataFrame, groupCol: String, valueCol: String,
      bins: Int = 4096): DataFrame = {
    import graft.functions.Sketch
    val med = Sketch.histogramQuantileBracketsBy(df, groupCol, valueCol,
        Seq(0.5), bins)
      .select(col("group").as(groupCol), round(col("est"), 4).as("med"),
        (col("bhi2") - col("blo2")).as("med_err"))
    val dev = df.select(col(groupCol), col(valueCol).cast("double").as("_v"))
      .join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), abs(col("_v") - col("med")).as("_adev"))
    Sketch.histogramQuantileBracketsBy(dev, groupCol, "_adev", Seq(0.5), bins)
      .select(col("group").as(groupCol), round(col("est"), 4).as("mad"),
        (col("bhi2") - col("blo2")).as("dev_w"))
      .join(med, Seq(groupCol))
      .select(col(groupCol), col("med"), col("mad"), col("med_err"),
        (col("med_err") + col("dev_w")).as("mad_err"))
  }

  /** [[robustOutliers]] on the bounded-state [[robustStatsApprox]]
    * model — same [[scoreOutliers]] scoring, so the streamed form
    * ([[graft.streaming.Ingest.outlierIngestStream]]) accepts either
    * model interchangeably. Verdicts agree with the exact form for
    * every row whose exact |z| sits outside the cutoff by more than
    * the propagated bin-error band (QualitySpec law). */
  def robustOutliersApprox(df: DataFrame, groupCol: String,
      valueCol: String, cutoff: Double = 3.5, bins: Int = 4096): DataFrame =
    scoreOutliers(df,
      robustStatsApprox(df, groupCol, valueCol, bins)
        .select(groupCol, "med", "mad"),
      groupCol, valueCol, cutoff)

  /** Score rows against a supplied (groupCol, med, mad) model:
    * broadcast join + a narrow 4-dp z — per-row pure given the model,
    * which is what makes the streamed form exactly equal to the batch
    * form. Groups absent from the model score null/false. */
  def scoreOutliers(df: DataFrame, stats: DataFrame, groupCol: String,
      valueCol: String, cutoff: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    df.join(broadcast(stats), Seq(groupCol), "left")
      .withColumn("robust_z",
        when(col("mad") > 0,
          round(lit(0.6745) * (v - col("med")) / col("mad"), 4)))
      .withColumn("outlier",
        coalesce(abs(col("robust_z")) > cutoff, lit(false)))
  }

  /** Orphaned child rows (issue #10): anti-join against the parent. */
  def orphans(child: DataFrame, parent: DataFrame, key: String): DataFrame =
    child.join(parent, Seq(key), "left_anti")

  /** Circular transfers (issue #8): A->B and B->A on the same day
    * (J4 self-join: equi keys + theta residual). */
  def circularTransfers(tx: DataFrame): DataFrame = {
    val t = tx.filter(col("transaction_type") === "Transfer" &&
      col("related_account_id").isNotNull)
    val a = t.select(col("transaction_id").as("t1"), col("account_id").as("src1"),
      col("related_account_id").as("dst1"), col("transaction_date").as("d1"))
    val b = t.select(col("transaction_id").as("t2"), col("account_id").as("src2"),
      col("related_account_id").as("dst2"), col("transaction_date").as("d2"))
    a.join(b,
        col("src1") === col("dst2") && col("dst1") === col("src2") &&
        col("t1") < col("t2") &&
        to_date(col("d1")) === to_date(col("d2")))
      .select(col("t1"), col("t2"), col("src1").as("acct_a"), col("dst1").as("acct_b"))
  }

  /** Future-dated transactions vs a fixed clock (issue #6). */
  def futureDated(tx: DataFrame, now: String): DataFrame =
    tx.filter(col("transaction_date") > lit(now).cast("timestamp"))

  /** Late arrivals: event time more than `days` before ingest time
    * (issue #5 — reference injects 5-30 day lateness). */
  def lateArrivals(tx: DataFrame, days: Int): DataFrame =
    tx.filter(col("transaction_date") <
      col("created_at") - expr(s"INTERVAL $days DAYS"))

  /** Transactions on non-active accounts (issue #7): semi-join against
    * the inactive dimension (broadcast when small). */
  def inactiveAccountTx(tx: DataFrame, accounts: DataFrame): DataFrame =
    tx.join(accounts.filter(col("status") =!= "active").select("account_id"),
      Seq("account_id"), "left_semi")

  /** One-row quality report mirroring the reference's validation
    * aggregates (polished_transactions.py:448-502).
    *
    * One declarative plan: each source contributes one single-row
    * aggregate and the 1-row frames cross-join — no driver-side
    * `count()`/`first()` loop, so the report is itself composable,
    * oracle-checkable, and runs its table scans as one job each
    * instead of six serialized actions. */
  def report(customers: DataFrame, accounts: DataFrame, tx: DataFrame,
      now: String): DataFrame = {
    val custAgg = customers.agg(
      count(lit(1)).as("n_customers"),
      coalesce(sum(when(col("phone").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_null_phone"))
    val dupAgg = fuzzyDuplicateCustomers(customers)
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_fuzzy_dups"))
    val acctAgg = accounts.agg(
      coalesce(sum(when(col("balance") < 0, 1L).otherwise(0L)), lit(0L))
        .as("n_negative_balance"))
    val txAgg = tx.agg(
      coalesce(sum(when(col("transaction_date") > lit(now).cast("timestamp"), 1L)
        .otherwise(0L)), lit(0L)).as("n_future_dated"))
    val circAgg = circularTransfers(tx).agg(count(lit(1)).as("n_circular_pairs"))
    custAgg.crossJoin(dupAgg).crossJoin(acctAgg).crossJoin(txAgg).crossJoin(circAgg)
      .select("n_customers", "n_fuzzy_dups", "n_null_phone",
        "n_negative_balance", "n_future_dated", "n_circular_pairs")
  }
}
