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

/** Optimizer rule: `size(tokenize_plain(text))` → the count-only
  * [[graft.text.TokenCountExpr]], skipping the token-struct array the
  * count throws away (per-token row + string allocations on every
  * corpus row). Semantics identical including the null contract:
  * TokenizeExpr is non-nullable (null text → empty array), so
  * `Size` returns 0 there under BOTH legacy and ANSI size-of-null
  * settings — the rewrite can ignore `legacySizeOfNull`. Registered
  * alongside [[TokenStringsRewrite]] by both ladders. */
object TokenCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case org.apache.spark.sql.catalyst.expressions.Size(
        t: graft.text.TokenizeExpr, _) =>
      graft.text.TokenCountExpr(t.child, t.lowercase, t.removePunct)
  }
}
