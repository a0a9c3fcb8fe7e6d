package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType columns.
  *
  * `dot` resolves to the codegen'd Catalyst expression
  * [[graft.expressions.DotProduct]] (register once per session with
  * `GraftFunctions.register`; `graft.sources.Tables.load` does this).
  * The HOF composition (`dotHof`) is kept as the registration-free
  * fallback — it computes the identical left-fold sum but evaluates
  * interpreted (higher-order functions are CodegenFallback), measured
  * ~50x slower on all-pairs workloads. NOTE: in sessions where
  * `GraftFunctions.register` ran, the [[graft.expressions.RewriteHofDot]]
  * rule rewrites this exact pattern into the native expression — to
  * measure or compare the truly interpreted form, disable it first
  * (`SET spark.graft.rewriteHofDot.enabled=false`, or clear
  * `spark.experimental.extraOptimizations` as AnnSpec does).
  */
object Vectors {

  def dot(x: Column, y: Column): Column =
    call_function(graft.expressions.GraftFunctions.DotName, x, y)

  def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  def norm(x: Column): Column = sqrt(dot(x, x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast a float embedding to double so both engines compute the same
    * IEEE754 double arithmetic (the DuckDB oracle casts to DOUBLE[]). */
  def asDouble(c: Column): Column = c.cast("array<double>")
}
