package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted and generated code. */
object CharWindowKernel {
  /** Every length-`l` CHARACTER window of `s` as a string, element k
    * = the window at 1-based char position k+1 — the packed
    * replacement for `transform(sequence(1, len-l+1),
    * i -> substring(text, i, l))`. One pass records char-start byte
    * offsets (UTF8String char = code point, Spark's substring
    * semantics), then each window is one `UTF8String.fromBytes` slice
    * copy — no sequence array, no per-element interpreted lambda, no
    * repeated forward scans (stock `substring(text, i, l)` walks from
    * the string head for every i, an O(n²) byte walk per document
    * that this kernel makes O(n·l)).
    */
  def windows(s: UTF8String, l: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    var n = 0
    var b = 0
    while (b < nBytes) { b += UTF8String.numBytesForFirstByte(bytes(b)); n += 1 }
    if (n < l) return new GenericArrayData(Array.empty[AnyRef])
    val offs = new Array[Int](n + 1)
    var i = 0
    b = 0
    while (b < nBytes) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(n) = nBytes
    val out = new Array[AnyRef](n - l + 1)
    var k = 0
    while (k <= n - l) {
      out(k) = UTF8String.fromBytes(bytes, offs(k), offs(k + l) - offs(k))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_char_windows(string, L) → array<string>: every length-L
  * character window, element k = window at 1-based char position k+1.
  * L must be a positive INT literal.
  */
case class CharWindows(child: Expression, l: Int) extends UnaryExpression {
  require(l > 0, s"graft_char_windows: L must be positive, got $l")
  override def prettyName: String = "graft_char_windows"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_windows requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    CharWindowKernel.windows(input.asInstanceOf[UTF8String], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharWindowKernel.windows($c, $l)")

  override protected def withNewChildInternal(newChild: Expression): CharWindows =
    copy(child = newChild)
}

object CharWindows {
  /** Shared builder: extracts the required INT-literal window length. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_char_windows requires exactly 2 arguments (text, L), got ${exprs.length}")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    val l = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_char_windows: L must be an INT literal, got $other")
    }
    CharWindows(exprs.head, l)
  }
}
