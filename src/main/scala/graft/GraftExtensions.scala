package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` entry point — the idiomatic way to hand the
  * engine's native SQL kernels to sessions the library does NOT build
  * (notebooks, spark-submit jobs, thrift servers):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects every entry of [[graft.functions.GraftFunctions.all]] — the
  * same single table the per-session
  * [[GraftSession.registerFunctions]] path uses, so the two routes
  * cannot drift. Library code never requires this: operators
  * self-register off their DataFrame's session; the extension exists for
  * the pure-SQL user.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.all.foreach { case (name, clazz, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getCanonicalName, name), builder))
    }
}
