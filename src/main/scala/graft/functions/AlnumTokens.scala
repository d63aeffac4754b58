package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted and generated code. */
object AlnumTokenKernel {
  /** The engine's tokenizer — maximal `[a-z0-9]+` runs of the
    * lowercased text — as one linear scan: the packed replacement for
    * `regexp_extract_all(lower(text), '[a-z0-9]+', 0)`. Lowercasing
    * goes through the SAME `UTF8String.toLowerCase` Spark's `lower()`
    * uses (so 1:N mappings like İ → i+◌̇ match exactly), and a greedy
    * regex over a single character class is by definition the maximal
    * runs a scan finds — equal output, no Matcher/ArrayList/regex
    * machinery per document.
    */
  def tokens(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && {
          val d = lower.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) j += 1
        out.add(UTF8String.fromString(lower.substring(i, j)))
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** graft_alnum_tokens(string) → array<string>: maximal [a-z0-9]+ runs
  * of the lowercased text — the engine's shared tokenizer.
  */
case class AlnumTokens(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_alnum_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_alnum_tokens requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    AlnumTokenKernel.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AlnumTokenKernel.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): AlnumTokens =
    copy(child = newChild)
}
