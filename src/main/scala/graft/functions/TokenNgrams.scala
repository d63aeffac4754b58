package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted and generated code. */
object TokenNgramKernel {
  /** Every adjacent word-`n`-gram of the token array, space-joined —
    * the packed replacement for `transform(sequence(1, size(t)-n+1),
    * i -> concat_ws(' ', element_at(t, i), …))`. The lambda form ran
    * interpreted per position with n catalyst `element_at` calls each;
    * this emits each n-gram as one sized byte-array build. Tokens
    * must be non-null (the engine's tokenizer never yields nulls).
    */
  def ngrams(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[AnyRef])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[AnyRef](sz - n + 1)
    var k = 0
    while (k <= sz - n) {
      var len = n - 1
      var j = 0
      while (j < n) { len += toks(k + j).numBytes(); j += 1 }
      val bytes = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < n) {
        val t = toks(k + j)
        t.writeToMemory(bytes, Platform.BYTE_ARRAY_OFFSET + off)
        off += t.numBytes()
        if (j < n - 1) { bytes(off) = ' '; off += 1 }
        j += 1
      }
      out(k) = UTF8String.fromBytes(bytes)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_token_ngrams(array<string>, N) → array<string>: adjacent
  * space-joined word n-grams; empty array when fewer than N tokens.
  * N must be a positive INT literal.
  */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"graft_token_ngrams: N must be positive, got $n")
  override def prettyName: String = "graft_token_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_ngrams requires ARRAY<STRING> input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenNgramKernel.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenNgramKernel.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

object TokenNgrams {
  /** Shared builder: extracts the required INT-literal n. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_token_ngrams requires exactly 2 arguments (tokens, N), got ${exprs.length}")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    val n = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_token_ngrams: N must be an INT literal, got $other")
    }
    TokenNgrams(exprs.head, n)
  }
}
