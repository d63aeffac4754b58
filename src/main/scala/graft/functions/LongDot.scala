package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object GraftLVec {

  /** Left-fold long dot product over two int/long arrays — the exact
    * numeric contract of `aggregate(zip_with(a, b, (x, y) -> x*y),
    * 0L, (s, p) -> s + p)` (element-wise widening to long, exact
    * 64-bit arithmetic). Null on length mismatch or any null element,
    * mirroring zip_with's null padding propagating through the
    * running sum.
    */
  def dot(a: ArrayData, b: ArrayData, aInt: Boolean, bInt: Boolean): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aInt) a.getInt(i).toLong else a.getLong(i)
      val y = if (bInt) b.getInt(i).toLong else b.getLong(i)
      s += x * y
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** graft_ldot(array<int|bigint>, array<int|bigint>) → bigint: the
  * integer-vector inner loop (MaxSim token dots, PQ codebook dots) as
  * a native codegen'd expression — the `aggregate(zip_with(...))`
  * form allocates an intermediate product array and dispatches two
  * interpreted lambdas per element.
  */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_ldot"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def isIntArray(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) => true
    case _                         => false
  }
  private def isIntegralArray(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isIntegralArray(left.dataType) && isIntegralArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ldot requires ARRAY<INT|BIGINT> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftLVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isIntArray(left.dataType), isIntArray(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("ldot")
      val ai = isIntArray(left.dataType)
      val bi = isIntArray(right.dataType)
      s"""
         |java.lang.Long $tmp = graft.functions.GraftLVec.dot($a, $b, $ai, $bi);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}
