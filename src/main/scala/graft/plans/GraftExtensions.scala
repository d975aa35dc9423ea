package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, HllSketchAgg, HolisticReduce, Md5Long60}

/**
 * Session extension installing graft's native functions into the SQL
 * surface, so `spark.sql("SELECT graft_dot(a, b) ...")` codegens the same
 * [[graft.functions.DotProduct]] the Column API uses. Activate with
 * `spark.sql.extensions=graft.plans.GraftExtensions` (config) or
 * `builder.withExtensions(new GraftExtensions)` (programmatic); for an
 * already-running session use [[graft.functions.VectorFunctions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator lowering for the native as-of join (live sessions can
    // use spark.experimental.extraStrategies instead); column pruning
    // through the node comes free from Catalyst's generic ColumnPruning,
    // but FILTER pushdown needs the custom rule (stock PushDownPredicate
    // does not know the node) — see AsofJoinFilterPushdown
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectOptimizerRule(_ => AsofJoinFilterPushdown)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    // graft_md5long(x): the 60-bit engine-portable hash every dedup/
    // sampling operator keys on (== conv(substring(md5(x),1,15),16,10))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5long"),
      new ExpressionInfo(classOf[Md5Long60].getName, "graft_md5long"),
      (children: Seq[Expression]) => Md5Long60(children.head)))
    // graft_hll_sketch(hash): the native HLL register aggregate (256
    // registers as array<int>) — the mergeable-sketch UDAF from SQL.
    ext.injectFunction((
      new FunctionIdentifier("graft_hll_sketch"),
      new ExpressionInfo(classOf[HllSketchAgg].getName, "graft_hll_sketch"),
      (children: Seq[Expression]) =>
        HllSketchAgg(children.head).toAggregateExpression()))
    // graft_mr_reduce('<app>', key, value): the engine's holistic reduce
    // aggregate (E7) from SQL, resolving the app by registry name — the
    // SQL-surface twin of the reference's `-a <app>` dylib selection.
    ext.injectFunction((
      new FunctionIdentifier("graft_mr_reduce"),
      new ExpressionInfo(classOf[HolisticReduce].getName, "graft_mr_reduce"),
      (children: Seq[Expression]) => {
        require(children.length == 3 && children.head.foldable,
          "usage: graft_mr_reduce('<app name literal>', key, value)")
        val appName = children.head.eval().toString
        val app = graft.mr.MrApps.load(appName)
        HolisticReduce(children(1), children(2), app.reduce _)
      }))
  }
}
