package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/**
 * All i<j element pairs of a long array as struct rows [EXT] — the
 * combination-explode idiom shared by market-basket pair mining
 * ([[graft.operators.Relational.ordersMarketBasket]]) and the
 * common-neighbor wedge enumeration
 * ([[graft.operators.Graph.graphCommonNeighbors]]), as ONE native
 * codegen'd expression.
 *
 * Replaces the nested higher-order `transform(slice(...))` formulation:
 * Catalyst evaluates higher-order-function lambdas INTERPRETED, per
 * element, with a struct allocation per lambda application — on a
 * basket/adjacency explode that is the per-row hot loop of the whole
 * query. This expression emits the C(len, 2) pairs in one tight JVM
 * loop inside whole-stage codegen.
 *
 * Pair order follows array order (callers pass sorted, deduplicated
 * arrays, so (a, b) with a < b comes out canonical); null elements are
 * skipped (collect_set/collect_list of a non-null column never emits
 * them). The quadratic width is the CALLER's contract: both call sites
 * bound the array first (MaxBasketParts / the LSH MaxBucketDocs cap) —
 * the 100 TB guard lives there, not here.
 */
case class CombinationPairs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_combination_pairs"

  override def nullSafeEval(a: Any): Any =
    CombinationPairs.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CombinationPairs.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CombinationPairs {
  /** All i<j pairs over the non-null elements, in array order. Called
    * from generated code — named `compute`, not `eval` (the
    * [[NgramsJoined.compute]] forwarder-clash rationale). */
  def compute(ts: ArrayData): ArrayData = {
    val len = ts.numElements()
    // compact the non-null elements first so the pair loop is branch-free
    val vs = new Array[Long](len)
    var n = 0
    var i = 0
    while (i < len) {
      if (!ts.isNullAt(i)) { vs(n) = ts.getLong(i); n += 1 }
      i += 1
    }
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(vs(i), vs(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level combination pairs (a, b) over a long array. */
  def combinationPairs(arr: Column): Column =
    GraftShims.column(CombinationPairs(GraftShims.expression(arr)))
}
