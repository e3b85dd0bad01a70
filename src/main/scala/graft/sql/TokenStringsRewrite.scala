package graft.sql

import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, GetStructField, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

import graft.text.TokenStringsExpr

/** Optimizer rule: rewrite `transform(<token array>, x -> x.token)` to
  * the native [[TokenStringsExpr]].
  *
  * `ArrayTransform` is CodegenFallback — a SQL user writing the obvious
  * token-string projection (`transform(tokenize_plain(text),
  * x -> x.token)`) silently breaks the whole-stage-codegen span on the
  * corpus scan, the exact cost the Column API's
  * `Tokenize.tokenStrings` exists to avoid. This rule gives the SQL
  * surface the same plan the Scala surface gets: same values
  * (elementwise field extraction), strictly better execution.
  *
  * Scope is deliberately narrow — the match requires:
  *   - the lambda body is exactly a `GetStructField` of the lambda
  *     variable at the struct's `token` ordinal (any other body keeps
  *     the general ArrayTransform),
  *   - the array is `containsNull = false` and the `token` field is a
  *     non-nullable string (the [[graft.text.TokenizeExpr]] output
  *     shape), so result nullability is bit-identical.
  *
  * Registered by [[GraftExtensions]] (`spark.sql.extensions` deployments)
  * or [[GraftFunctions.installOptimizerRule]] (already-built sessions,
  * via `experimental.extraOptimizations`). */
object TokenStringsRewrite extends Rule[LogicalPlan] {

  /** The `token` ordinal, when the array has the exact safe shape. */
  private def tokenOrdinal(dt: org.apache.spark.sql.types.DataType): Int = dt match {
    case ArrayType(s: StructType, false) if s.fieldNames.contains("token") => {
      val i = s.fieldIndex("token")
      if (s(i).dataType == StringType && !s(i).nullable) i else -1
    }
    case _ => -1
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayTransform(child,
        LambdaFunction(GetStructField(lv: NamedLambdaVariable, ord, _), Seq(arg: NamedLambdaVariable), _))
        if lv.exprId == arg.exprId && child.resolved && tokenOrdinal(child.dataType) == ord =>
      TokenStringsExpr(child)
  }
}
