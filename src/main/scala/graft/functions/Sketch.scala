package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Count-min sketch over corpus grams — the mergeable bounded-memory
  * frequency summary (Cormode & Muthukrishnan). The production use at
  * 100 TB is the SUMMARY ARTIFACT: build one depth×width sketch per
  * ingest batch (a few hundred KB regardless of corpus size), merge
  * sketches by elementwise sum (exact — no accuracy is lost in the
  * merge), and answer "how often does this n-gram occur?" for ANY gram
  * without rescanning a byte of text. Estimates never undercount;
  * overcounts are bounded by collisions (~N/width per row, min over
  * depth rows).
  *
  * Spark-first shape: the sketch is built DECLARATIVELY — each gram
  * explodes into its depth cells, one partial-aggregable cell count,
  * and a single bounded (depth·width)-row fold into the array — no
  * custom buffer class, so map-side combine crushes hot grams before
  * the shuffle and the only wide state is the cell table itself.
  * Hashing is md5-derived (two 60-bit halves feeding a universal
  * family), so sketches are reproducible across engines, runs, and
  * partitionings.
  */
object Sketch {

  private def hashA(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")
  private def hashB(g: Column): Column =
    conv(substring(md5(g), 16, 15), 16, 10).cast("long")

  /** Cell index of gram `g` in row j: j·width + (a + j·b) mod width.
    * a, b < 2^60 and j ≤ 7, so a + j·b stays well inside Long. */
  private def cell(g: Column, j: Int, width: Int): Column =
    lit(j.toLong * width) + pmod(hashA(g) + lit(j.toLong) * hashB(g), lit(width.toLong))

  /** Build one sketch row over a gram frame (one row per gram
    * INSTANCE — pre-aggregate to (gram, weight) yourself and explode
    * if instances are expensive). Output: sketch array<long> of
    * length depth·width, depth, width. */
  def cmsBuild(grams: DataFrame, gramCol: String = "gram", depth: Int = 4,
      width: Int = 8192): DataFrame = {
    require(depth >= 1 && depth <= 8, "depth must be in [1, 8]")
    require(width >= 16, "width must be at least 16")
    val g = grams.select(col(gramCol).cast("string").as("g"))
    // Densify by unioning an all-cells zero frame and folding the
    // SORTED (cell, cnt) pairs — O(dw·log dw) on one bounded row. (The
    // obvious map_from_arrays + element_at-per-position form is
    // quadratic: element_at on a map is a linear scan, and 32k probes
    // of a 32k map measured ~80 s at sf0.1.)
    g.select(explode(array((0 until depth).map(j => cell(col("g"), j, width)): _*))
        .as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
      .unionByName(grams.sparkSession.range(depth.toLong * width)
        .select(col("id").as("cell"), lit(0L).as("cnt")))
      .groupBy("cell").agg(sum("cnt").as("cnt"))
      .agg(transform(sort_array(collect_list(struct(col("cell"), col("cnt")))),
        s => s.getField("cnt")).as("sketch"))
      .select(col("sketch"), lit(depth).as("depth"), lit(width).as("width"))
  }

  /** Merge sketch rows of IDENTICAL (depth, width) by elementwise sum —
    * exact: cms(A ∪ B) == merge(cms(A), cms(B)) cell for cell, which
    * is what makes per-batch sketches composable into a corpus-lifetime
    * summary. Bounded work: (rows × depth × width) cells. */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches
      .select(col("depth"), col("width"),
        posexplode(col("sketch")).as(Seq("pos", "v")))
      .groupBy("depth", "width", "pos").agg(sum("v").as("v"))
      .groupBy("depth", "width")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("sketch"))
      .select(col("sketch"), col("depth"), col("width"))

  /** Point estimate for a gram column against a COLLECTED sketch (the
    * artifact is depth·width longs — driver-sized by construction;
    * embedding it as a literal is the broadcast). min over the depth
    * rows; never under the true count. */
  def cmsEstimate(sketch: Seq[Long], depth: Int, width: Int)(gram: Column): Column = {
    require(sketch.length == depth * width,
      s"sketch length ${sketch.length} != depth*width ${depth * width}")
    val arr = typedLit(sketch)
    least((0 until depth).map(j =>
      element_at(arr, (cell(gram, j, width) + 1).cast("int"))): _*)
  }

  /** Assemble the corpus-lifetime sketch from a directory of landed
    * per-batch sketch rows (the
    * [[graft.streaming.Ingest.sketchIngestStream]] layout; the
    * batch_id partition column is discovery metadata the merge never
    * reads). Work is (batches × depth × width) cells — summary-sized,
    * no document is ever rescanned. */
  def readMergedCms(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    cmsMerge(spark.read.parquet(path).select("sketch", "depth", "width"))

  /** Word n-grams WITH multiplicity (the counting form — the dedup
    * shingle path is distinct-set semantics, this one is frequency
    * semantics). Output: doc_id, gram. */
  def wordNgrams(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, "n must be positive")
    graft.operators.Fanout(docs, idCol)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      // Guarded, not clamped: sequence(1, 0) is a descending [1, 0] in
      // Spark, so the old greatest() clamp walked indices 0 and 1 on a
      // sub-n document — slice(t, 0, n) throws (the Mix.ngramBuckets
      // r11 finding, same fix). Docs shorter than n carry no n-gram.
      .select(col("doc_id"), explode(expr(
        s"IF(size(t) >= $n, transform(sequence(1, size(t) - ${n - 1}), " +
          s"i -> array_join(slice(t, i, $n), ' ')), array())")).as("gram"))
  }

  /** Convenience: the corpus n-gram sketch in one call. */
  def ngramCms(docs: DataFrame, n: Int = 3, depth: Int = 4, width: Int = 8192,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    cmsBuild(wordNgrams(docs, n, idCol, textCol), depth = depth, width = width)

  /** Misra-Gries frequent-items summary (Misra & Gries 1982; the
    * amortized "frequent" variant): a counter map that never exceeds
    * `budget` entries after compression. Compression subtracts the
    * (budget+1)-th largest count from every entry and drops the
    * non-positive ones — the same rule the MERGE uses, which is what
    * makes per-partition summaries composable (Agarwal et al.,
    * "Mergeable Summaries", PODS 2012). Invariants, with N = stream
    * length and S = sum of surviving counts:
    *   count(t) − (N − S)/(budget+1) ≤ summary(t) ≤ count(t)
    * so any token the summary MISSES has true count ≤ (N−S)/(budget+1)
    * — a bound computable from the summary itself (tight form of the
    * classic N/(budget+1)).
    *
    * Buffer grows to 2×budget between compressions so the O(buffer)
    * compression cost amortizes to O(1)/row. The buffer is an opaque
    * kryo blob (only ever shipped partition→reducer, ≤ 2·budget
    * entries ≈ tens of KB); the OUTPUT is a plain map column. */
  private final class MisraGries(budget: Int, out: Encoder[Map[String, Long]])
      extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {

    private def compress(m: mutable.HashMap[String, Long], cap: Int): Unit =
      if (m.size > cap) {
        val counts = m.values.toArray
        java.util.Arrays.sort(counts)
        val delta = counts(counts.length - (cap + 1)) // (cap+1)-th largest
        m.filterInPlace((_, c) => c > delta)
        m.mapValuesInPlace((_, c) => c - delta)
      }

    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty
    def reduce(b: mutable.HashMap[String, Long], t: String): mutable.HashMap[String, Long] = {
      b.update(t, b.getOrElse(t, 0L) + 1L)
      if (b.size > 2 * budget) compress(b, budget)
      b
    }
    def merge(a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
      compress(a, budget)
      a
    }
    def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = {
      compress(b, budget)
      b.toMap
    }
    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] = out
  }

  private def tokens(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
      explode(split(coalesce(col(textCol), lit("")), " ")).as("token"))

  /** One pass over a 1-column token frame → a 1-row (mg, n, budget)
    * frame. Partial aggregation runs map-side (each task ships one
    * ≤ budget-entry summary), so the only global state is the merged
    * map — bounded regardless of vocabulary size, unlike a groupBy
    * whose shuffle is |vocab|-sized. */
  private def mgAggFrame(toks: DataFrame, budget: Int): DataFrame = {
    val sp = toks.sparkSession
    val enc: Encoder[Map[String, Long]] = {
      import sp.implicits._
      implicitly[Encoder[Map[String, Long]]]
    }
    val mg = udaf(new MisraGries(budget, enc), Encoders.STRING)
    toks.agg(mg(col("token")).as("mg"), count(lit(1)).as("n"))
      .select(col("mg"), col("n"), lit(budget).as("budget"))
  }

  private[graft] def mgAggregate(toks: DataFrame,
      budget: Int): (Map[String, Long], Long) = {
    val row = mgAggFrame(toks, budget).head
    (row.getAs[Map[String, Long]]("mg"), row.getAs[Long]("n"))
  }

  /** The MG summary of a document corpus as a 1-row (mg, n, budget)
    * frame — the landable per-ingest-batch artifact
    * ([[graft.streaming.Ingest.mgIngestStream]] writes one per
    * micro-batch; [[heavyHittersFromSummaries]] consumes them). */
  def mgSummary(docs: DataFrame, budget: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget >= 1, "budget must be positive")
    mgAggFrame(tokens(docs, textCol), budget)
  }

  /** EXACT top-k most frequent tokens, computed the bounded-memory way:
    * one MG pass yields ≤ `budget` candidate tokens (every token with
    * count above the miss bound is guaranteed present), one filtered
    * pass recounts ONLY the candidates exactly, and the result is
    * certified complete when the k-th candidate count exceeds the miss
    * bound (N − Σsummary)/(budget+1) — any token outside the candidate
    * set counts at most that. If certification fails (near-flat
    * distribution or an undersized budget), fall back to the exact
    * |vocab|-shuffle groupBy, so the OUTPUT is exact top-k either way —
    * the sketch only decides how much data moves. At 100 TB the
    * certified path shuffles ≤ budget entries per task in pass 1 and
    * only candidate-token instances (pre-combined map-side) in pass 2;
    * the full vocabulary never rides an exchange.
    * Ties break token-ascending. Output: token, cnt, rn — ordered. */
  def heavyHitters(docs: DataFrame, k: Int = 20, budget: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be positive")
    require(budget >= k, s"budget $budget must be at least k=$k")
    val toks = tokens(docs, textCol)
    val (cand, n) = mgAggregate(toks, budget)
    val missBound = (n - cand.values.sum).toDouble / (budget + 1)
    certifiedTopK(toks, cand.keys.toSeq, missBound, k)
  }

  /** Shared recount + certification tail: exact counts over the
    * candidate tokens, certified complete when the k-th count exceeds
    * the miss bound (no excluded token can reach it); the exact
    * |vocab|-shuffle groupBy answers otherwise. */
  private def certifiedTopK(toks: DataFrame, cand: Seq[String],
      missBound: Double, k: Int): DataFrame = {
    val wTop = Window.orderBy(col("cnt").desc, col("token").asc)
    // TakeOrderedAndProject trims to k DISTRIBUTED (per-partition heaps,
    // k rows to the driver); the single-partition row_number window
    // only ever sees those k rows.
    def rank(counts: DataFrame): DataFrame = counts
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
      .withColumn("rn", row_number().over(wTop).cast("int"))
      .orderBy("rn")
    val candTop = rank(
      toks.filter(col("token").isInCollection(cand))
        .groupBy("token").agg(count(lit(1)).as("cnt")))
    val rows = candTop.collect()
    val complete =
      (rows.length == k && rows.last.getAs[Long]("cnt") > missBound) ||
        (rows.length < k && missBound == 0.0) // summary holds the whole vocab
    if (complete)
      toks.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), candTop.schema)
    else rank(toks.groupBy("token").agg(count(lit(1)).as("cnt")))
  }

  /** EXACT top-k from landed per-batch MG summaries + ONE recount over
    * the corpus — the incremental form of [[heavyHitters]]: summaries
    * accumulate per ingest batch (streamed or appended), and the
    * corpus-wide MG pass is never re-run.
    *
    * Merging keeps EVERY token in any summary with its summed count —
    * a valid summary whose miss bound is the SUM of the per-batch
    * bounds Σ_b (n_b − S_b)/(budget_b+1) (a token absent everywhere is
    * below every per-batch bound). Candidates are then pruned by the
    * exactness-preserving rule lb + missBound ≥ L (L = k-th largest
    * summed lower bound): a pruned token's true count ≤ lb + missBound
    * < L ≤ the k-th candidate's true count, so it cannot reach the
    * top-k. The recount + certification tail is [[heavyHitters]]'s.
    * Summary work is (batches × budget)-sized; only the single
    * filtered recount touches the corpus. */
  def heavyHittersFromSummaries(summaries: DataFrame, docs: DataFrame,
      k: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be positive")
    val missRow = summaries.agg(sum(
      (col("n") - expr("aggregate(map_values(mg), 0L, (a, x) -> a + x)"))
        .cast("double") / (col("budget") + 1)).as("miss")).head
    require(!missRow.isNullAt(0), "heavyHittersFromSummaries: no summary rows")
    val missBound = missRow.getDouble(0)
    val lbs = summaries.select(explode(col("mg")).as(Seq("token", "cnt")))
      .groupBy("token").agg(sum("cnt").as("lb"))
    val topLb = lbs.orderBy(col("lb").desc, col("token").asc).limit(k).collect()
    val kthLb = if (topLb.length < k) 0L else topLb.last.getAs[Long]("lb")
    val cand = lbs.filter(col("lb") + missBound >= kthLb)
      .select("token").collect().map(_.getString(0)).toSeq
    certifiedTopK(tokens(docs, textCol), cand, missBound, k)
  }

  /** Two-pass bounded-error quantiles WITHOUT a sort — the distributed
    * answer when `percentile` (global sort-ish state per group) and
    * `approx_percentile` (engine-specific sketch, not oracle-checkable)
    * both misfit: pass 1 is one (min, max, count) aggregation, pass 2
    * one partial-aggregable histogram onto ≤ `bins` rows, and every
    * estimate is the midpoint of the bin holding rank ⌈q·n⌉ — error
    * provably ≤ half the bin width ((max−min)/bins), SketchSpec-pinned
    * against the exact percentile. Unlike a quantile SKETCH the
    * summary here is a plain additive histogram: per-batch histograms
    * sum cell-wise (the CMS/driftCounts mergeability), so the same
    * two jobs work streamed or incrementally.
    *
    * Everything downstream of the two corpus passes runs over
    * summary-sized frames (≤ bins rows; the rank join is qs × bins —
    * broadcast, bounded); all arithmetic is IEEE-identical in the
    * oracle engine, so the output is hash-exact, not approximately
    * compared. Degenerate all-equal input collapses every bin to the
    * single value. Output: q, rank, bin, blo, bhi, est (ordered). */
  /** Value-bin histogram of a column against FIXED bounds — the
    * additive summary behind [[histogramQuantiles]], exposed for
    * incremental/streamed use: with (lo, hi) frozen (from a reference
    * corpus or domain knowledge), per-batch histograms sum cell-wise
    * into the corpus-lifetime histogram, exactly like the CMS and
    * driftCounts summaries. Values outside [lo, hi] clamp into the
    * edge bins (a streamed batch may exceed the reference range; the
    * clamp keeps the summary total equal to the row count, at the
    * documented cost of edge-bin error). Output: bin, c. */
  def valueHistogram(df: DataFrame, valueCol: String, lo: Double,
      hi: Double, bins: Int = 1024): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(lo <= hi, "lo must not exceed hi")
    val v = col(valueCol).cast("double")
    df.select(v.as("v")).filter(col("v").isNotNull)
      .select(when(lit(hi) === lit(lo), lit(0))
        .otherwise(greatest(lit(0), least(lit(bins - 1),
          floor((col("v") - lo) / (lit(hi) - lo) * bins))))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).cast("long").as("c"))
  }

  /** Per-group [[valueHistogram]] under the SAME fixed (lo, hi)
    * domain for every group — the summary grouped PSI compares (both
    * snapshots and all groups must share bin edges or the per-bin
    * subtraction is meaningless). Out-of-range values clamp into the
    * edge bins, the [[valueHistogram]] rule. A NULL group is its own
    * group. ADDITIVE per (group, bin) over disjoint batches. Per-group
    * aggregation state: none beyond the (group, bin) count — the
    * output is ≤ groups × bins rows. Output: group, bin, c. */
  def valueHistogramBy(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int = 1024): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(lo <= hi, "lo must not exceed hi")
    val v = col(valueCol).cast("double")
    df.select(col(groupCol).as("group"), v.as("v"))
      .filter(col("v").isNotNull)
      .select(col("group"), when(lit(hi) === lit(lo), lit(0))
        .otherwise(greatest(lit(0), least(lit(bins - 1),
          floor((col("v") - lo) / (lit(hi) - lo) * bins))))
        .cast("int").as("bin"))
      .groupBy("group", "bin").agg(count(lit(1)).cast("long").as("c"))
  }

  /** Quantile estimates from a (bin, c) [[valueHistogram]] under the
    * same fixed (lo, hi) bounds — the read side of the streamed /
    * incremental quantile monitor. Estimates match
    * [[histogramQuantiles]] whenever (lo, hi) equal the data's true
    * min/max (SketchSpec law). */
  def quantilesFromHistogram(hist: DataFrame, lo: Double, hi: Double,
      qs: Seq[Double], bins: Int = 1024): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must lie in (0, 1]")
    val spark = hist.sparkSession
    import spark.implicits._
    val h = hist.select(col("bin").cast("int").as("bin"),
      col("c").cast("long").as("c"))
    val n = h.agg(sum("c").cast("long").as("n"))
    val cum = h.groupBy("bin").agg(sum("c").cast("long").as("c"))
      // bounded frame: the global cumulative window runs over the
      // ≤ bins-row histogram summary, never the corpus
      .withColumn("cum", sum("c").over(Window.orderBy("bin")).cast("long"))
    val ranks = qs.toDF("q").crossJoin(broadcast(n))
      .select(col("q"),
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")).as("rank"))
    broadcast(ranks).join(cum, col("cum") >= col("rank"))
      .groupBy("q", "rank").agg(min("bin").as("bin"))
      .select(col("q"), col("rank"), col("bin"),
        (lit(lo) + col("bin") * ((lit(hi) - lo) / bins)).as("blo"),
        (lit(lo) + (col("bin") + 1) * ((lit(hi) - lo) / bins)).as("bhi"))
      .withColumn("est", (col("blo") + col("bhi")) / 2)
      .orderBy("q")
  }

  /** Per-group [[histogramQuantiles]] — the 100 TB answer for
    * "p-th percentile of a CONTINUOUS metric per domain" (LM scores,
    * latencies, prices), where the exact `percentile` aggregation's
    * state is a counts-map of DISTINCT values and an unrounded double
    * column makes that corpus-sized for a hot group. (The library's
    * own exact-percentile users — qualityPrune, ccnetBuckets — stay
    * exact deliberately: their scores are 4/6dp-rounded, so the state
    * is bounded by construction. Reach for this form when the metric
    * cannot be pre-rounded.) Same two corpus passes, keyed by group:
    * per-group (min, max, n), then one (group, bin) histogram;
    * everything downstream is ≤ groups × bins summary rows, the
    * per-group window included. Groups with hi == lo collapse every
    * estimate to the single value; a NULL group is its own group
    * (null-safe join back, the qualityPrune rule).
    * Output: group, q, rank, bin, blo, bhi, est (ordered). */
  def histogramQuantilesBy(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double], bins: Int = 1024): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must lie in (0, 1]")
    val (mm, cum) = groupedCumHistogram(df, groupCol, valueCol, bins)
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = qs.toDF("q").crossJoin(mm)
      .select(col("mg"), col("q"),
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")).as("rank"))
    val pick = broadcast(ranks)
      .join(cum, col("mg") <=> col("group") && col("cum") >= col("rank"))
      .groupBy("mg", "q", "rank").agg(min("bin").as("bin"))
      .withColumnRenamed("mg", "pg")
    pick.join(broadcast(mm), col("pg") <=> col("mg"))
      .select(col("pg").as("group"), col("q"), col("rank"), col("bin"),
        (col("lo") + col("bin") * ((col("hi") - col("lo")) / bins)).as("blo"),
        (col("lo") + (col("bin") + 1) * ((col("hi") - col("lo")) / bins)).as("bhi"))
      .withColumn("est", (col("blo") + col("bhi")) / 2)
      .orderBy("group", "q")
  }

  /** The grouped (min/max/count, cumulative bin counts) pair behind
    * [[histogramQuantilesBy]] and [[histogramQuantileBracketsBy]]:
    * `mm` = (mg, lo, hi, n) per group, `cum` = (group, bin, c, cum).
    * Two corpus passes; everything after is ≤ groups × bins rows. */
  private def groupedCumHistogram(df: DataFrame, groupCol: String,
      valueCol: String, bins: Int): (DataFrame, DataFrame) = {
    val base = df.select(col(groupCol).as("group"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val mm = base.groupBy("group").agg(min("v").as("lo"), max("v").as("hi"),
        count(lit(1)).cast("long").as("n"))
      .withColumnRenamed("group", "mg")
    val counts = base.join(broadcast(mm), col("group") <=> col("mg"))
      .select(col("group"),
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col("v") - col("lo")) / (col("hi") - col("lo")) * bins)))
          .cast("int").as("bin"))
      .groupBy("group", "bin").agg(count(lit(1)).cast("long").as("c"))
    val cum = counts.withColumn("cum",
      sum("c").over(Window.partitionBy("group").orderBy("bin")).cast("long"))
    (mm, cum)
  }

  /** [[histogramQuantilesBy]] that also BRACKETS the order statistics
    * exact interpolated percentile(q) lies between: exact
    * `percentile` interpolates at index h = (n−1)·q + 1, i.e. between
    * ranks ⌊h⌋ and ⌈h⌉ — a single rank for odd counts at q = 0.5 but
    * ADJACENT ranks for even counts, whose two middle elements may
    * sit in different (even non-adjacent) bins. `rank`/`bin`/`blo`/
    * `bhi`/`est` keep [[histogramQuantilesBy]]'s single-rank (⌈q·n⌉)
    * semantics bit-for-bit (oracle compatibility); `blo2`/`bhi2` add
    * the outer edges of the ⌊h⌋- and ⌈h⌉-rank bins, so [blo2, bhi2]
    * provably contains both bracketing order statistics AND their
    * interpolation, and `bhi2 − blo2` is the honest error bound (the
    * r9 advisor's even-n finding: a one-bin bound is violated when
    * the two middle elements straddle a gap). The single rank always
    * lies inside the bracket, so `[blo, bhi] ⊆ [blo2, bhi2]`.
    * Output: group, q, rank, bin, blo, bhi, est, blo2, bhi2. */
  def histogramQuantileBracketsBy(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double], bins: Int = 1024): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must lie in (0, 1]")
    val (mm, cum) = groupedCumHistogram(df, groupCol, valueCol, bins)
    val spark = df.sparkSession
    import spark.implicits._
    val h = (col("n") - 1) * col("q") + 1
    val ranks = qs.toDF("q").crossJoin(mm)
      .select(col("mg"), col("q"),
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")).as("rank"),
        greatest(lit(1L), floor(h).cast("long")).as("rlo"),
        least(col("n"), ceil(h).cast("long")).as("rhi"))
    // One cum join picks all three ranks: rows with cum >= rlo are a
    // superset of the others (rlo <= rank <= rhi), so the tighter
    // picks are conditional mins inside the same group.
    val pick = broadcast(ranks)
      .join(cum, col("mg") <=> col("group") && col("cum") >= col("rlo"))
      .groupBy("mg", "q", "rank").agg(
        min(when(col("cum") >= col("rank"), col("bin"))).as("bin"),
        min("bin").as("binlo"),
        min(when(col("cum") >= col("rhi"), col("bin"))).as("binhi"))
      .withColumnRenamed("mg", "pg")
    pick.join(broadcast(mm), col("pg") <=> col("mg"))
      .select(col("pg").as("group"), col("q"), col("rank"), col("bin"),
        (col("lo") + col("bin") * ((col("hi") - col("lo")) / bins)).as("blo"),
        (col("lo") + (col("bin") + 1) * ((col("hi") - col("lo")) / bins)).as("bhi"),
        (col("lo") + col("binlo") * ((col("hi") - col("lo")) / bins)).as("blo2"),
        (col("lo") + (col("binhi") + 1) * ((col("hi") - col("lo")) / bins)).as("bhi2"))
      .withColumn("est", (col("blo") + col("bhi")) / 2)
      .select("group", "q", "rank", "bin", "blo", "bhi", "est", "blo2", "bhi2")
      .orderBy("group", "q")
  }

  def histogramQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Double], bins: Int = 1024): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must lie in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val mm = base.agg(min("v").as("lo"), max("v").as("hi"),
      count(lit(1)).cast("long").as("n"))
    val counts = base.crossJoin(broadcast(mm))
      .select(when(col("hi") === col("lo"), lit(0))
        .otherwise(least(lit(bins - 1),
          floor((col("v") - col("lo")) / (col("hi") - col("lo")) * bins)))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).cast("long").as("c"))
    // ≤ bins rows: the empty-partition window is summary-sized by
    // construction (the tokenBudgetSample bucket-summary precedent)
    val cum = counts.withColumn("cum",
      sum("c").over(Window.orderBy("bin")).cast("long"))
    val ranks = qs.toDF("q").crossJoin(broadcast(mm))
      .select(col("q"),
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")).as("rank"))
    val pick = broadcast(ranks).join(cum, col("cum") >= col("rank"))
      .groupBy("q", "rank").agg(min("bin").as("bin"))
    pick.crossJoin(broadcast(mm))
      .select(col("q"), col("rank"), col("bin"),
        (col("lo") + col("bin") * ((col("hi") - col("lo")) / bins)).as("blo"),
        (col("lo") + (col("bin") + 1) * ((col("hi") - col("lo")) / bins)).as("bhi"))
      .withColumn("est", (col("blo") + col("bhi")) / 2)
      .orderBy("q")
  }

  // --------------------------------------------------------------------
  // Portable HyperLogLog (Flajolet et al. 2007): approximate distinct
  // counts whose SKETCH AND ESTIMATE are bit-reproducible across
  // engines, runs, and partitionings — unlike the built-in
  // approx_count_distinct, whose HLL++ internals are engine-private
  // (the r39 no-oracle row). The trick is the same md5 discipline as
  // the CMS above: register index and leading-zero rank both derive
  // from the md5 hex string with pure string/integer ops, and the
  // harmonic sum runs in EXACT decimal arithmetic (every term 2^(65-r)
  // is an integer), so the only floating-point steps are one division
  // and one rounded ln — deterministic under any row order.
  //
  // The production artifact at 100 TB is the REGISTER TABLE: ≤ 2^p
  // rows of (idx, r), mergeable by per-register max (exact — no
  // accuracy is lost), so per-batch register tables land incrementally
  // and the corpus-lifetime distinct count never rescans a byte.
  // Standard error ≈ 1.04/√(2^p): p=10 → ~3.3%.
  // --------------------------------------------------------------------

  /** Leading-zero rank of the 64-bit tail of md5(v) (hex chars 17-32),
    * computed on the hex string so both engines agree bit for bit:
    * 4·(leading '0' chars) + in-nibble zeros of the first nonzero char
    * + 1; an all-zero tail (never observed for real inputs, probability
    * 2^-64) saturates at 65. */
  private def hllRho(tail: Column): Column = {
    val z = length(regexp_extract(tail, "^(0*)", 1))
    val nz = substring(regexp_replace(tail, "^0+", ""), 1, 1)
    val lz4 = when(nz === "1", 3).when(nz.isin("2", "3"), 2)
      .when(nz.isin("4", "5", "6", "7"), 1).otherwise(0)
    when(nz === "", lit(65)).otherwise(z * 4 + lz4 + 1)
  }

  /** Register table of a value column: idx = first 60 md5 bits mod 2^p,
    * r = max leading-zero rank seen for that register. Occupied
    * registers only (absent = 0) — ≤ 2^p rows, one partial-aggregable
    * groupBy, additive over batches via [[hllMerge]]. Nulls are skipped
    * (a null is not a value, matching COUNT(DISTINCT)). */
  def hllRegisters(df: DataFrame, valueCol: String, p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1L << p
    val h = md5(col(valueCol).cast("string"))
    df.filter(col(valueCol).isNotNull)
      .select(
        pmod(conv(substring(h, 1, 15), 16, 10).cast("long"), lit(m)).as("idx"),
        hllRho(substring(h, 17, 16)).as("r"))
      .groupBy("idx").agg(max("r").cast("int").as("r"))
  }

  /** Merge register tables of identical p by per-register max — exact:
    * hll(A ∪ B) == merge(hll(A), hll(B)) register for register, the
    * property that makes per-batch tables composable into a lifetime
    * sketch. */
  def hllMerge(registers: DataFrame): DataFrame =
    registers.groupBy("idx").agg(max("r").cast("int").as("r"))

  /** Distinct-count estimate from a register table. The harmonic sum
    * Σ 2^(-r) is scaled by 2^65 into exact DECIMAL(38,0) (largest term
    * 2^65, ≤ 2^16 terms — no overflow, no float-order sensitivity);
    * empty registers enter as 2^65 via densification. Small-range
    * correction: when the raw estimate ≤ 2.5·m and zero registers
    * remain, linear counting m·ln(m/V) takes over (ln 6dp-rounded, the
    * engine-portability discipline). Output: m, v_zero, n_est. */
  def hllEstimate(registers: DataFrame, p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // C/S with S the exact scaled harmonic sum: C = α·m²·2^65.
    val cNum = alpha * m * m * math.pow(2.0, 65)
    val dense = registers.select(col("idx"), col("r"))
      .unionByName(registers.sparkSession.range(m)
        .select(col("id").as("idx"), lit(0).as("r")))
      .groupBy("idx").agg(max("r").as("r"))
    val agg = dense.agg(
      sum(pow(lit(2.0), lit(65) - col("r"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"),
      sum(when(col("r") === 0, 1L).otherwise(0L)).cast("long").as("v_zero"))
    val raw = lit(cNum) / col("s").cast("double")
    agg.select(lit(m).as("m"), col("v_zero"),
      when(col("v_zero") > 0 && raw <= lit(2.5 * m),
        round(lit(m.toDouble) *
          round(log(lit(m.toDouble) / col("v_zero")), 6), 6))
        .otherwise(round(raw, 6)).as("n_est"))
  }

  /** One-shot convenience: estimate the distinct count of a column. */
  def hllDistinct(df: DataFrame, valueCol: String, p: Int = 10): DataFrame =
    hllEstimate(hllRegisters(df, valueCol, p), p)

  /** Per-GROUP register tables: (group, idx, r) — the grouped A8 form
    * ("distinct users per domain/event_type" at 100 TB). One partial-
    * aggregable groupBy onto ≤ groups × 2^p rows; same md5-derived
    * idx/rank as [[hllRegisters]], so the sketch is engine-portable
    * and per-(group, idx) max-mergeable across batches exactly like
    * the ungrouped table. Null groups are their own group (groupBy
    * keeps them); null values are skipped. */
  def hllRegistersBy(df: DataFrame, groupCol: String, valueCol: String,
      p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1L << p
    val h = md5(col(valueCol).cast("string"))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("group"),
        pmod(conv(substring(h, 1, 15), 16, 10).cast("long"), lit(m)).as("idx"),
        hllRho(substring(h, 17, 16)).as("r"))
      .groupBy("group", "idx").agg(max("r").cast("int").as("r"))
  }

  /** Per-group estimates from a (group, idx, r) register table — the
    * [[hllEstimate]] arithmetic (exact-decimal harmonic sum, 6dp
    * linear-counting correction) per group. Densification is a
    * groups × 2^p cross of two SUMMARY-sized frames (the r73/r74
    * broadcast-cross discipline), never corpus data.
    * Output: group, m, v_zero, n_est (ordered by group). */
  def hllEstimateBy(registers: DataFrame, p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val cNum = alpha * m * m * math.pow(2.0, 65)
    val spark = registers.sparkSession
    val groups = registers.select(col("group")).distinct()
    val dense = registers.select(col("group"), col("idx"), col("r"))
      .unionByName(groups
        .crossJoin(spark.range(m).select(col("id").as("idx")))
        .withColumn("r", lit(0)))
      .groupBy("group", "idx").agg(max("r").as("r"))
    val agg = dense.groupBy("group").agg(
      sum(pow(lit(2.0), lit(65) - col("r"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"),
      sum(when(col("r") === 0, 1L).otherwise(0L)).cast("long").as("v_zero"))
    val raw = lit(cNum) / col("s").cast("double")
    agg.select(col("group"), lit(m).as("m"), col("v_zero"),
      when(col("v_zero") > 0 && raw <= lit(2.5 * m),
        round(lit(m.toDouble) *
          round(log(lit(m.toDouble) / col("v_zero")), 6), 6))
        .otherwise(round(raw, 6)).as("n_est"))
      .orderBy("group")
  }

  /** One-shot grouped convenience. */
  def hllDistinctBy(df: DataFrame, groupCol: String, valueCol: String,
      p: Int = 10): DataFrame =
    hllEstimateBy(hllRegistersBy(df, groupCol, valueCol, p), p)

  /** Merge grouped register tables by per-(group, idx) max — exact,
    * like [[hllMerge]]: per-batch grouped tables land incrementally
    * and compose into the lifetime per-group sketch without ever
    * rescanning a value (SketchSpec law: merge of disjoint batches ==
    * one-shot registers). */
  def hllMergeBy(registers: DataFrame): DataFrame =
    registers.groupBy("group", "idx").agg(max("r").cast("int").as("r"))

  /** Assemble the corpus-lifetime register table from a directory of
    * landed per-batch register tables (the
    * [[graft.streaming.Ingest.hllIngestStream]] layout; batch_id is
    * discovery metadata the merge never reads). Work is
    * (batches × occupied registers) rows — summary-sized; no document
    * is ever rescanned, and the merge is exact. */
  def readMergedHll(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    hllMerge(spark.read.parquet(path).select("idx", "r"))
}
