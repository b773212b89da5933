package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.pipeline.VecDot

/** Conf-only installation of the engine's SQL surface:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftSparkExtensions ...
  * }}}
  *
  * gives every session `graft_*` and `vec_dot` with no code — the same
  * surface [[GraftFunctions.registerAll]] installs programmatically.
  *
  * Mechanics: the native codegen expressions go through `injectFunction`
  * (the canonical extension path — resolved straight from the
  * FunctionRegistry, staying inside whole-stage codegen). The Scala-UDF
  * half needs a live `SparkSession` (`spark.udf.register`), which
  * `injectFunction` never provides — so it rides the analyzer's
  * rule-builder callback instead: Spark invokes the builder once per
  * session (when that session's analyzer is constructed, before the first
  * query resolves) passing the session itself; the builder registers the
  * UDFs as a side effect and returns a no-op rule. Re-invocation on
  * cloned sessions is harmless — registration is idempotent.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo("graft", "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectResolutionRule { session =>
      GraftFunctions.registerUdfs(session)
      GraftSparkExtensions.NoOpRule
    }
  }
}

object GraftSparkExtensions {
  private object NoOpRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan
  }
}
