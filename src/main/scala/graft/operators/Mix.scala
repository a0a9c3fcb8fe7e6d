package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-mixture application: turn per-domain resampling weights (the
  * knob `r50_domain_mix` computes) into an actual resampled corpus.
  *
  * A weight w means "emit each doc of this domain w times in
  * expectation": every doc gets floor(w) guaranteed copies plus one
  * more iff its md5-uniform u < frac(w) — the deterministic analog of
  * Poisson resampling, so the output is reproducible, oracle-checkable,
  * and partition-invariant (u depends only on the doc id, never on
  * placement or RNG state).
  *
  * Scale design (100 TB): the weight table is domain-sized (tiny) and
  * broadcast, the copy decision is a narrow per-row map, and the
  * explode fans out at most `maxCopies` rows per doc — no shuffle
  * anywhere. `maxCopies` bounds the blowup a pathological weight could
  * cause (a 0.01%-share domain weighted to equality would otherwise
  * explode 10,000×).
  */
object Mix {

  /** One output row per kept copy: keys…, doc id, copy ∈ [1, n].
    * `weights` must carry `keys` + a double `weight` column. */
  def resampleByWeight(docs: DataFrame, weights: DataFrame, keys: Seq[String],
      idCol: String = "doc_id", maxCopies: Int = 8): DataFrame =
    docs.join(broadcast(weights), keys)
      .withColumn("u",
        conv(substring(md5(concat(lit("rs:"), col(idCol).cast("string"))), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0))
      // least() BEFORE the int cast: floor() is a long, and a pathological
      // weight beyond Int.MaxValue must hit the cap, not overflow the cast
      // (ANSI mode would throw; non-ANSI would wrap negative and silently
      // drop exactly the domain the weight was meant to upsample).
      .withColumn("n_copies", least(lit(maxCopies.toLong),
        floor(col("weight")) +
          when(col("u") < col("weight") - floor(col("weight")), 1).otherwise(0)).cast("int"))
      .filter(col("n_copies") > 0)
      .select(keys.map(col) :+ col(idCol) :+
        explode(sequence(lit(1), col("n_copies"))).as("copy"): _*)
}
