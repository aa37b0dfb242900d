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
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Installs the optimizer rule and registers the custom expression kernels
  * as SQL functions, so the pure-SQL surface reaches them too:
  * graft_minhash(shingles, k), graft_simhash48(tokens),
  * graft_word_ngrams(tokens, n), graft_cosine(a, b),
  * graft_combinations(arr, n). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TransformFieldPruning)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectPlannerStrategy(session => new AsofJoinStrategy(session))
    def reg(name: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    reg("graft_minhash") { args =>
      graft.functions.HashExprs.MinHashSignature(args.head,
        if (args.size > 1) intArg(args(1), "graft_minhash") else 32, 42L)
    }
    reg("graft_simhash48")(args =>
      graft.functions.HashExprs.SimHash48(args.head))
    reg("graft_word_ngrams") { args =>
      graft.functions.HashExprs.WordNgrams(args.head,
        intArg(args(1), "graft_word_ngrams"))
    }
    reg("graft_cosine")(args =>
      graft.functions.VectorExprs.CosineSim(args.head, args(1)))
    reg("graft_combinations") { args =>
      graft.functions.CombinatoricsExprs.Combinations(args.head,
        intArg(args(1), "graft_combinations"), replacement = false)
    }
    reg("graft_polyhash")(args =>
      graft.functions.HashExprs.PolyHash(args.head))
    reg("graft_winnow") { args =>
      graft.functions.HashExprs.WinnowFingerprint(args.head,
        intArg(args(1), "graft_winnow"), intArg(args(2), "graft_winnow"))
    }
    reg("graft_minhash_poly") { args =>
      graft.functions.HashExprs.MinHashSignaturePolyBase(args.head,
        if (args.size > 1) intArg(args(1), "graft_minhash_poly") else 32, 42L)
    }
  }
}
