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
}
