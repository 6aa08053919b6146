package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The REWRITE-SAFE twin of [[ArrayDotProduct]]: bit-for-bit the
  * semantics of `aggregate(zip_with(a, b, (x, y) -> x * y), 0d,
  * (s, v) -> s + v)`, so [[graft.plans.FuseArrayDot]] may substitute it
  * for the composed spelling under ANY input:
  *
  *  - length mismatch → NULL (`zip_with` pads the shorter side with
  *    null, the padded product is null, `+ null` poisons the fold);
  *  - any null element → NULL (same poisoning);
  *  - both empty → 0.0 (the fold's zero);
  *  - accumulation strictly left-to-right (IEEE order preserved).
  *
  * [[ArrayDotProduct]] itself intentionally differs (null element → 0,
  * prefix dot on mismatch) for embedding pipelines that guarantee
  * clean inputs — which is exactly why the optimizer must NOT
  * substitute it and gets this expression instead. Same tight codegen
  * loop, same single array pass.
  */
case class ArrayDotProductStrict(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"array_dot_strict requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  // produces NULL on length mismatch / null elements even when both
  // inputs are non-null
  override def nullable: Boolean = true

  override def prettyName: String = "array_dot_strict"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    $bad = true;
         |  } else {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProductStrict =
    copy(left = newLeft, right = newRight)
}
