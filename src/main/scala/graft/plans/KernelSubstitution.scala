package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

import graft.functions.ArrayCountInSet

/** Optimizer rule: KERNEL SUBSTITUTION for the marker-count pattern.
  *
  * `size(filter(arr, x -> x IN (markers...)))` is the idiomatic
  * DataFrame/SQL spelling of "how many tokens belong to this set" —
  * and it evaluates as an interpreted higher-order function: a lambda
  * invocation and an O(|markers|) list probe per token, plus the
  * materialized filtered array taken only for its size. This rule
  * rewrites the analyzed pattern to the codegen
  * [[graft.functions.ArrayCountInSet]] kernel (one hash-set probe per
  * token, no allocation) so the DECLARATIVE form gets the fast path
  * automatically — users don't need to know the kernel exists.
  *
  * Semantics preserved exactly: count of (non-null) elements in the
  * marker set; null input array -> null either way (the rule declines
  * the `legacySizeOfNull` form, where size(null) = -1). Handles both
  * `In` (literal list) and `InSet` (the post-OptimizeIn form).
  *
  * Install: `spark.experimental.extraOptimizations ++= Seq(
  * KernelSubstitution)` on a live session, or through a
  * `SparkSessionExtensions.injectOptimizerRule` in cluster config
  * ([[graft.GraftExtensions]] does both function + rule injection).
  */
object KernelSubstitution extends Rule[LogicalPlan] {

  private def markerStrings(list: Seq[Expression]): Option[Seq[String]] =
    if (list.forall(e => e.foldable && e.dataType == StringType)) {
      val vals = list.map(_.eval(null))
      if (vals.forall(_ != null)) Some(vals.map(_.toString)) else None
    } else None

  private def sameVar(cond: Expression, v: NamedLambdaVariable): Boolean =
    cond match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // size(filter(arr<string>, x -> x IN ('a','b',...)))
      case Size(ArrayFilter(arr,
            LambdaFunction(In(x, list), Seq(v: NamedLambdaVariable), _)), false)
          if sameVar(x, v) &&
            arr.dataType.isInstanceOf[ArrayType] &&
            arr.dataType.asInstanceOf[ArrayType].elementType == StringType &&
            markerStrings(list).isDefined =>
        Cast(ArrayCountInSet(arr, markerStrings(list).get), IntegerType)

      // same, after OptimizeIn turned the literal list into InSet
      case Size(ArrayFilter(arr,
            LambdaFunction(InSet(x, hset), Seq(v: NamedLambdaVariable), _)), false)
          if sameVar(x, v) &&
            arr.dataType.isInstanceOf[ArrayType] &&
            arr.dataType.asInstanceOf[ArrayType].elementType == StringType &&
            hset.forall(_ != null) =>
        Cast(ArrayCountInSet(arr, hset.map(_.toString).toSeq), IntegerType)
    }
}
