package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of elements equal to `right` in the string array `left` — the
  * per-term tf kernel of the BM25 scorers (Ranking.scala), compiled.
  *
  * Why custom: the declarative formulation `size(filter(w, x = term))` runs
  * the predicate through the interpreted HOF path (CodegenFallback) AND
  * materializes the filtered array just to take its size. This is one
  * codegen'd loop over the array with a counter — no allocation, stays
  * inside whole-stage codegen, and a term set of any size is just more
  * columns of the same compiled shape.
  *
  * Semantics exactly match `size(filter(w, x => x === lit(t)))` cast to
  * long: NULL array → NULL; NULL elements are skipped (the HOF predicate
  * evaluates to NULL → element dropped). Counts are integers, so swapping
  * this in changes no downstream double (the BM25 oracle hash is
  * unaffected) — pinned bit-exact in SimilaritySpec.
  */
case class CountInArray(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string) inputs")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_in_array"
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = left.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[UTF8String]
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && arr.getUTF8String(i).equals(v)) c += 1L
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val nullCheck = if (elementsNullable) s"!$a.isNullAt($i) && " else ""
      s"""
         |int $n = $a.numElements();
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($nullCheck$a.getUTF8String($i).equals($b)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
