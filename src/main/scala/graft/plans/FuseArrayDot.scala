package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.ArrayDotProductStrict

/** Strength-reduction rule: recognize the composed SQL spelling of a
  * dot product —
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (s, v) -> s + v) }}}
  *
  * — and fuse it into the native codegen'd
  * [[graft.functions.ArrayDotProductStrict]]. Array higher-order
  * functions evaluate interpreted (per-element lambda dispatch, boxed
  * accumulator, an intermediate product array), which makes the
  * composed form the bottleneck of a brute-force similarity scan; the
  * fused expression is one primitive loop inside whole-stage codegen.
  * Users writing plain SQL get the engine's fast path without knowing
  * `array_dot` exists — the same move column engines make for
  * `sum(x*y)` patterns.
  *
  * The match is deliberately exact: double arrays, literal 0d zero,
  * elementwise multiply (either argument order), additive merge
  * (either order), identity finish. The STRICT expression reproduces
  * the composed form's null/length semantics bit-for-bit (see its
  * scaladoc), so the rewrite is sound for every input, not just clean
  * embeddings. Registered via `injectOptimizerRule`
  * ([[graft.GraftExtensions]]); fusion is asserted in PlanSpec and
  * the semantics equivalence in ArrayDotProductSpec.
  */
object FuseArrayDot extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    // bit-exact +0.0 only: `v == 0.0` would also accept a -0.0 literal,
    // and aggregate(zip_with(a,b,*), -0.0, +) over two EMPTY arrays
    // returns -0.0 while the fused dot product returns +0.0 — a
    // bit-level divergence the rewrite must not introduce
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  /** (x, y) -> x * y, either operand order */
  private def isElementwiseMul(f: Expression): Boolean = f match {
    case LambdaFunction(
        Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (l.exprId == x.exprId && r.exprId == y.exprId) ||
        (l.exprId == y.exprId && r.exprId == x.exprId)
    case _ => false
  }

  /** (s, v) -> s + v, either operand order */
  private def isAdditiveMerge(f: Expression): Boolean = f match {
    case LambdaFunction(
        Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(s: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (l.exprId == s.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == s.exprId)
    case _ => false
  }

  /** acc -> acc */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(l, r, zf), zero, merge, finish)
          if isDoubleArray(l) && isDoubleArray(r) && isZeroD(zero) &&
            isElementwiseMul(zf) && isAdditiveMerge(merge) &&
            isIdentity(finish) =>
        ArrayDotProductStrict(l, r)
    }
}
