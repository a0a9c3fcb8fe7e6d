package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * — is a higher-order function chain that falls back to interpreted
  * evaluation (CodegenFallback) and allocates an intermediate array per
  * row; measured ~50x slower on the all-pairs similarity workload. This
  * expression stays inside WholeStageCodegen with a tight primitive loop
  * and zero allocation.
  *
  * The fold is a strict left-to-right sum from 0.0 — the same IEEE754
  * operation sequence as the HOF form and as DuckDB's `list_reduce`
  * oracle — so results are bit-identical across all three.
  *
  * Null elements inside the arrays are not expected (embeddings are
  * dense); lengths may differ, the shorter bound wins.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native expressions, exposing them to
  * both SQL and the Column API (via `call_function`). Idempotent. */
object GraftFunctions {
  val DotName = "graft_dot"

  /** Spark's own codegen'd Bloom-membership predicate
    * (`BloomFilterMightContain` — the expression InjectRuntimeFilter
    * plants), surfaced to the Column API for
    * [[graft.operators.Joins]]'s explicit semi-join reduction: args
    * are (serialized sketch binary, xxhash64 of the key). Internal in
    * upstream's registry only because the optimizer normally plants it
    * itself; the expression is public API. */
  val MightContainName = "graft_might_contain"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(DotName)))
      reg.createOrReplaceTempFunction(
        DotName, exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(MightContainName)))
      reg.createOrReplaceTempFunction(
        MightContainName,
        exprs => org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)),
        "built-in")
    // The HOF-dot rewrite on live sessions (GraftExtensions covers
    // sessions built with spark.sql.extensions).
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDot))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDot
  }
}
