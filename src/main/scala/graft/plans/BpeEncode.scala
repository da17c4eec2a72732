package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: apply a learned BPE merge list to one word,
  * returning its symbol decomposition — the corpus-scale tokenizer hot
  * path (`bpe_encode(word, merges_spec)`).
  *
  * WHY custom (SURVEY preference order (b)): the column-expression form is
  * `merges` chained higher-order `aggregate` folds (ext/Vocab.mergeSyms),
  * each of which re-builds the accumulator array per symbol via
  * concat/slice — O(merges × len²) array allocations per word, outside
  * whole-stage codegen (lambda interpretation). This expression runs the
  * same greedy algorithm as two ping-pong buffers in one JVM loop —
  * O(merges × len), no per-step allocation — and code-gens to a static
  * call that stays inside the generated pipeline. Measured at sf0.1 with
  * 10 merges: 9.2 s → sub-second for the fertility aggregate.
  *
  * Semantics (identical to the fold and to VocabSpec's reference encoder):
  * merges apply in learned order, each greedily left-to-right,
  * non-overlapping ("aaa" under (a,a) → [aa, a]).
  *
  * The merge list rides as a FOLDABLE string second argument — pairs
  * separated by U+001E, the two symbols by U+001F (control characters,
  * disjoint from any whitespace-split token text) — so the literal plans
  * into the expression tree like any constant and the parsed form is
  * cached per expression instance.
  */
case class BpeEncode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable merge spec")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  @transient private lazy val merges: Array[Array[String]] = {
    val spec = right.eval(null)
    require(spec != null, s"$prettyName merge spec must not be null")
    BpeEncode.parseSpec(spec.asInstanceOf[UTF8String].toString)
  }

  override protected def nullSafeEval(word: Any, spec: Any): Any =
    BpeEncode.encodeData(word.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("merges", merges, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.plans.BpeEncode$$.MODULE$$.encodeData($w, $mergesRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {

  /** Spec text for a merge list (the inverse of parseSpec). */
  def toSpec(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a\u001F$b" }.mkString("\u001E")

  private[plans] def parseSpec(spec: String): Array[Array[String]] =
    if (spec.isEmpty) Array.empty
    else spec.split('\u001E').map { p =>
      val i = p.indexOf('\u001F')
      require(i > 0 && i < p.length - 1, s"malformed merge pair '$p'")
      Array(p.substring(0, i), p.substring(i + 1), p.replace("\u001F", ""))
    }

  /** Greedy merge application over ping-pong buffers. `merges` rows are
    * (a, b, a+b) triples from parseSpec. Called from generated code. */
  def encodeData(word: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val w = word.toString
    var cur = new Array[String](w.length)
    var n = w.length
    var i = 0
    while (i < n) { cur(i) = String.valueOf(w.charAt(i)); i += 1 }
    var next = new Array[String](n)
    var m = 0
    while (m < merges.length && n > 1) {
      val a = merges(m)(0); val b = merges(m)(1); val ab = merges(m)(2)
      var in = 0
      var out = 0
      while (in < n) {
        if (in + 1 < n && cur(in) == a && cur(in + 1) == b) {
          next(out) = ab; in += 2
        } else {
          next(out) = cur(in); in += 1
        }
        out += 1
      }
      val t = cur; cur = next; next = t
      n = out
      m += 1
    }
    val out = new Array[AnyRef](n)
    i = 0
    while (i < n) { out(i) = UTF8String.fromString(cur(i)); i += 1 }
    new GenericArrayData(out)
  }
}
