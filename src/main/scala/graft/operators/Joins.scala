package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Shuffle-reduction join forms.
  *
  * [[bloomReducedJoin]] is the explicit semi-join reduction every
  * 100 TB fact-to-dim join wants when the dim side is too big to
  * broadcast AS ROWS but its key SET compresses to a few MB of Bloom
  * bits: the fact side drops non-matching rows BEFORE its shuffle, so
  * the exchange carries only rows that can meet the dim side —
  * shuffled bytes scale with the join's selectivity instead of the
  * fact table's size. Spark's own AQE runtime filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects exactly
  * this plan shape when its thresholds line up; the explicit operator
  * is for when they don't — a checkpointed/cached build side, a
  * non-deterministic-looking subtree, a dim frame the optimizer can't
  * size, or a reduction reused across several downstream joins.
  *
  * Reference analog: none concrete — the reference plans its
  * dimensional-model layer as a roadmap item (README.md:24-28,
  * "Install dbt and create dimensional models"); this operator is the
  * industry-standard fact-to-filtered-dim join that layer would run
  * (dbt marts leave the reduction to the engine — here it is a
  * first-class operator).
  */
object Joins {

  /** Serialize a LONG hash column's value set into Bloom-filter bytes —
    * the sketch-build half of the probe pair, shared with
    * [[graft.operators.Dedup.contaminationBloom]] (which Blooms 60-bit
    * shingle hashes rather than xxhash64'd join keys). One aggregation
    * job over `hashes`; the returned bytes are `numBits/8` regardless
    * of row count (~1.2 MB at the 1M/1% defaults). */
  private[graft] def bloomBytes(hashes: DataFrame, hashCol: String,
      expectedKeys: Long, fpp: Double): Array[Byte] = {
    val bf = hashes.stat.bloomFilter(hashCol, expectedKeys, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Membership predicate over a pre-hashed LONG column: Spark's
    * codegen'd `BloomFilterMightContain` over a literal sketch — the
    * filter deserializes ONCE per task and the probe is a few
    * hash-and-bit-test instructions inside the scan stage's codegen,
    * never a UDF. A null hash yields null (filters drop it). */
  private[graft] def mightContainHash(
      spark: org.apache.spark.sql.SparkSession,
      bloomBytes: Array[Byte], hash: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.MightContainName, lit(bloomBytes), hash)
  }

  /** [[bloomBytes]] over `xxhash64(key)` — the same longs-into-sketch
    * construction Spark's InjectRuntimeFilter builds, probed by
    * [[mightContainKey]] with the matching hash. */
  private def buildBloom(dim: DataFrame, key: String,
      expectedKeys: Long, fpp: Double): Array[Byte] =
    bloomBytes(dim.select(xxhash64(col(key)).as("_h")), "_h",
      expectedKeys, fpp)

  /** Join-key membership predicate: null keys fail (they cannot match
    * an equi-join anyway). */
  private def mightContainKey(spark: org.apache.spark.sql.SparkSession,
      bloomBytes: Array[Byte], key: String): Column =
    col(key).isNotNull &&
      mightContainHash(spark, bloomBytes, xxhash64(col(key)))

  /** The reduction primitive alone: `fact` rows whose `key` MIGHT be
    * in `dim`'s key set. A guaranteed SUPERSET of the matching rows
    * (Bloom filters have no false negatives) with ~`fpp` of the
    * non-matching rows leaking through — callers must still verify
    * with the real join ([[bloomReducedJoin]] does); the primitive is
    * exposed for reductions REUSED across several joins or pushed
    * ahead of an aggregation. `expectedKeys` sizes the sketch: bits
    * are allocated for that many distinct keys at `fpp`, and
    * overshooting the estimate degrades fpp, never correctness. */
  def bloomSemiFilter(fact: DataFrame, dim: DataFrame, key: String,
      expectedKeys: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0, "expectedKeys must be positive")
    val bytes = buildBloom(dim, key, expectedKeys, fpp)
    fact.filter(mightContainKey(fact.sparkSession, bytes, key))
  }

  /** Inner equi-join of `fact` to `dim` on the shared `key` column,
    * with the fact side Bloom-pre-filtered on `dim`'s key set before
    * its exchange. EXACT for any `fpp`: false positives are removed by
    * the join itself, and false negatives are impossible — the result
    * is row-identical to `fact.join(dim, Seq(key))`. Costs one extra
    * aggregation job over the dim side (the sketch build); pays for
    * itself whenever the fact-side exchange is the bottleneck and the
    * join is selective. */
  def bloomReducedJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedKeys: Long = 1L << 20, fpp: Double = 0.01): DataFrame =
    bloomSemiFilter(fact, dim, key, expectedKeys, fpp)
      .join(dim, Seq(key))
}
