package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: positional hamming distance between two
  * bit-string signatures ('0'/'1' chars, e.g. the 64-char SimHash
  * fingerprints of ext/Dedup.simhash64).
  *
  * WHY custom (SURVEY preference order (b)): the expression-tree form is a
  * 64-term sum of `substring(a,j,1) <=> substring(b,j,1)` comparisons —
  * each term allocates a one-char UTF8String slice per side per row, 128
  * allocations per evaluated candidate pair. This code-gens to a single
  * primitive loop over the two byte arrays (signatures are ASCII, so byte
  * index == character index): zero allocation, one pass, stays inside
  * whole-stage codegen. Semantics are identical to the unrolled form and
  * to the DuckDB oracle's 64-term CASE sum: count of positions (up to the
  * shorter length) whose characters differ.
  */
case class BitStringHamming(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bitstring_hamming"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = 0
    var i = 0
    while (i < n) {
      if (x(i) != y(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |byte[] $xb = $x.getBytes();
         |byte[] $yb = $y.getBytes();
         |int $n = java.lang.Math.min($xb.length, $yb.length);
         |int $d = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xb[$i] != $yb[$i]) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
