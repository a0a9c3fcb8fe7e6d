package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (SURVEY §4.2 "salting for skew"; the
  * reference's A5 balance ledger keyed by account_id is the motivating
  * workload — a few hot accounts dominate).
  *
  * AQE's skew-join splitting handles join-side skew automatically; this
  * covers AGGREGATION skew, where one groupBy key overwhelms a single
  * reducer: aggregate per (key, salt) first — fanning one hot key over
  * `salts` reducers — then combine the partials per key. Exact for
  * sums/counts/min/max (associative); identical results to the direct
  * groupBy. */
object Skew {

  /** Deterministic per-row salt: a hash of every hashable input column.
    * Unlike `monotonically_increasing_id()` (partition-index-dependent,
    * so a stage retry after a fetch failure — routine at 100 TB —
    * re-salts recomputed rows differently and can double-count or drop
    * rows in the downstream shuffle), this reproduces identical salt
    * assignments on every recompute.
    *
    * LIMIT: determinism requires per-row variety. Rows identical in
    * every hashed column share a salt and land on one reducer — so a
    * frame projected down to just the hot key gains nothing; feed the
    * frame WITH its id/timestamp columns. MapType columns (unhashable
    * in Spark) are excluded from the salt. */
  // hash() rejects MapType RECURSIVELY (a struct or array containing a
  // map fails the same way), so exclusion must check nested types too.
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType =>
      s.fields.exists(f => containsMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
    case _ => false
  }

  private def rowSalt(df: DataFrame, salts: Int): Column = {
    val hashable = df.schema.fields.collect {
      case f if !containsMap(f.dataType) => col(f.name)
    }.toIndexedSeq
    require(hashable.nonEmpty, "saltedXxx: no hashable columns to derive a deterministic salt")
    pmod(hash(hashable: _*), lit(salts))
  }

  /** Two-phase salted sum of `valueCol` per `key`. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int = 16,
      out: String = "total"): DataFrame =
    df.withColumn("_salt", rowSalt(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(out))

  /** Two-phase salted count per `key`. */
  def saltedCount(df: DataFrame, key: String, salts: Int = 16,
      out: String = "n"): DataFrame =
    df.withColumn("_salt", rowSalt(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).cast("long").as(out))

  /** Salted equi-join for join-side skew beyond what AQE's runtime
    * split handles (e.g. one key = 30% of the fact table): the skewed
    * (big) side gets a random salt in [0, salts); the build (small)
    * side is replicated once per salt value; the join key becomes
    * (key, salt), fanning each hot key over `salts` reducers. Exact —
    * every big-side row still meets every matching build row exactly
    * once. Cost: build side shuffles `salts`× (use only when the build
    * side is small but above the broadcast threshold — below it,
    * `broadcast()` already avoids the skewed shuffle entirely). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt", rowSalt(big, salts))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** WINDOW-side skew: deterministic "first ceil(frac·n) per stratum in
    * md5 order" (the stratified-sampling keep rule, r46) without a
    * per-stratum window — `row_number().over(partitionBy(stratum))`
    * puts an entire stratum on ONE reducer (hash partitioning; AQE can
    * split a skewed join partition but never a window partition), and a
    * 5-value stratum column at 100 TB means 5 tasks for the corpus.
    *
    * Same two-pass bucketed prefix machinery as the token-budget
    * sampler, counting rows instead of tokens: md5-PREFIX buckets are
    * contiguous ranges of the (md5(key), key) sort order, so
    *   1. per-(stratum, bucket) row counts (partial-aggregable groupBy),
    *   2. a window over that tiny summary yields each bucket's starting
    *      rank offset and the stratum total; buckets whose offset
    *      already meets the keep threshold ceil(frac·n) are PRUNED
    *      before any per-row work — at a 10% keep rate ~90% of every
    *      stratum's buckets drop here,
    *   3. within-bucket row_number + offset is the exact global rank.
    * Row-identical to the naive window form for any bucket count
    * (SkewSpec). Keeps all input columns. */
  def stratifiedHead(df: DataFrame, stratumCol: String, keyCol: String,
      frac: Double, buckets: Int = 256): DataFrame = {
    require(frac >= 0 && frac <= 1, "frac must be in [0, 1]")
    require(buckets > 0, "buckets must be positive")
    // The bookkeeping columns are added to the caller's frame; an input
    // that already carries one of these names would be silently
    // overwritten and then dropped by the final select — fail loudly
    // instead (tokenBudgetSample avoids this by projecting into a
    // fresh frame; here the full row must ride along to the output).
    val reserved = Seq("__h", "__bkt", "__rn").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"stratifiedHead reserves column name(s) ${reserved.mkString(", ")}; rename them in the input")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .withColumn("__h", md5(col(keyCol).cast("string")))
      .withColumn("__bkt", expr(
        s"(CAST(conv(substring(__h, 1, 8), 16, 10) AS BIGINT) * $buckets)" +
          " DIV 4294967296"))
    val sums = base.groupBy(col(stratumCol).as("__s"), col("__bkt"))
      .agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy("__s").orderBy("__bkt")
    val offs = sums
      .withColumn("__off", sum("__c").over(wOff) - col("__c"))
      .withColumn("__n", sum("__c").over(Window.partitionBy("__s")))
      .withColumn("__t", ceil(col("__n") * lit(frac)))
      .filter(col("__off") < col("__t"))
      .select(col("__s"), col("__bkt").as("__b2"), col("__off"), col("__t"))
    val wIn = Window.partitionBy(stratumCol, "__bkt")
      .orderBy(col("__h"), col(keyCol))
    base.join(offs,
        base(stratumCol) <=> offs("__s") && col("__bkt") === col("__b2"))
      .withColumn("__rn", col("__off") + row_number().over(wIn))
      .filter(col("__rn") <= col("__t"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
