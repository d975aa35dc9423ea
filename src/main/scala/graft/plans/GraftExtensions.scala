package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

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
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
  }
}
