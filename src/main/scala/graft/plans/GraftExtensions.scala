package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Optimizer rule: rewrite `transform(arr, x -> x.field)` to the native
  * `GetArrayStructFields` extraction.
  *
  * Catalyst's SchemaPruning cannot see through higher-order-function
  * lambdas, so a ragged-leaf projection written with `transform` forces the
  * parquet scan to read the ENTIRE inner struct (every leaf of every
  * element) even though only one field is used — at 100 TB that is the
  * difference between scanning one column chunk and scanning them all.
  * After this rewrite the expression is a plain extraction, SchemaPruning
  * recognizes it, and the pruned schema reaches the scan (verified in
  * ModulesSpec against FileSourceScanExec.requiredSchema). Semantics are
  * identical, including null elements mapping to null fields.
  *
  * The reference solves the same problem with its typetracer column-report
  * pass (`lib/inspect.py:21-115`, `unproject_layout.py`); here the planner
  * already owns projection analysis, this rule just restores its
  * visibility. Installed via SparkSessionExtensions (injectOptimizerRule
  * runs with the operator-optimization batch, before Early Scan Push-Down
  * where SchemaPruning lives). The rule is a pure optimization: sessions
  * without it produce identical results, just wider scans.
  */
object TransformFieldPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case t @ ArrayTransform(input,
        LambdaFunction(GetStructField(v: NamedLambdaVariable, ord, _),
          Seq(v2: NamedLambdaVariable), _))
        if input.resolved && (v.exprId == v2.exprId) =>
      input.dataType match {
        case ArrayType(st: StructType, containsNull) =>
          GetArrayStructFields(input, st(ord), ord, st.length,
            containsNull || st(ord).nullable)
        case _ => t
      }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => TransformFieldPruning)
}
