package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{Md5PrefixLong, SecondMax}

/** Session-extensions injection point: makes the engine's native
  * functions available to plain `spark.sql` users cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (the same
  * seam where a custom planner Rule / SparkStrategy would be
  * injected if an operator ever outgrows expression form).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_second_max"),
      new ExpressionInfo(classOf[SecondMax].getCanonicalName, "graft_second_max"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SecondMax(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_prefix"),
      new ExpressionInfo(classOf[Md5PrefixLong].getCanonicalName, "graft_md5_prefix"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5PrefixLong(exprs.head)))
  }
}
