package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted and generated code. */
object CharBigramKernel {
  /** All adjacent code-point bigrams of `s`, each packed into one long
    * as `(cp₁ << 21) | cp₂` — injective because Unicode code points
    * are < 0x110000 < 2²¹, so two bigram codes are equal iff the
    * 2-char substrings are equal and grouping on the code is exactly
    * grouping on the substring. The first code point is `code >> 21`
    * (the model's conditioning context). Iteration is by code point,
    * matching Spark's `substring`/`length` character semantics on
    * supplementary-plane text.
    *
    * Replaces `transform(sequence(1, len-1), i -> substring(text,i,2))`
    * on the hot corpus stream: the lambda ran interpreted per element
    * and allocated a UTF8String per bigram; this emits one primitive
    * long array per document and joins on 8-byte keys.
    */
  def bigrams(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len < 2) return new GenericArrayData(Array.emptyLongArray)
    var prev = str.codePointAt(0)
    var i = Character.charCount(prev)
    if (i >= len) return new GenericArrayData(Array.emptyLongArray)
    // count of code points - 1 bigrams; size via codePointCount
    val out = new Array[Long](str.codePointCount(0, len) - 1)
    var k = 0
    while (i < len) {
      val c = str.codePointAt(i)
      out(k) = (prev.toLong << 21) | c.toLong
      prev = c
      i += Character.charCount(c)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_char_bigrams(string) → array<bigint>: the document's adjacent
  * code-point bigram stream, each bigram packed `(cp₁ << 21) | cp₂`.
  */
case class CharBigrams(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_char_bigrams"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_bigrams requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    CharBigramKernel.bigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharBigramKernel.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)
}
