package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FloatVectorDot, ProjectedDist, SimHash64}

/**
 * Spark extension point: registers the engine's native expressions as
 * SQL functions, so `spark.sql("SELECT vec_dot(a, b) ...")` works in any
 * session created with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` (a static
 * conf — set it on the session that creates the SparkContext, e.g. via
 * spark-submit --conf) or `.withExtensions(new GraftExtensions)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => FloatVectorDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("projected_dist"),
      new ExpressionInfo(classOf[ProjectedDist].getName, "projected_dist"),
      (args: Seq[Expression]) => ProjectedDist(args)))
  }
}
