package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expressions for the vector hot path [EXT].
 *
 * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_),...)`)
 * allocates an intermediate array and interprets a lambda per element —
 * fine for one-off scoring, too slow for the O(corpus × queries × dim)
 * inner loop of similarity search. [[DotProduct]] is the same computation
 * as a codegen'd primitive loop over the unsafe array data: no
 * allocation, no boxing, fused into whole-stage codegen with the
 * surrounding expressions.
 *
 * Numeric contract: accumulates strictly left-to-right from +0.0 — the
 * exact order both the HOF fold and the DuckDB oracle's `list_reduce`
 * use, so swapping implementations never changes a single bit.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level dot product over two `array<double>` columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftShims.column(
      DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  /** Make `graft_dot` callable from SQL in an already-running session
    * (new sessions can use [[graft.plans.GraftExtensions]] instead). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftShims.registerFunction(spark, "graft_dot",
      children => DotProduct(children.head, children(1)))
}
