package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static kernel shared by interpreted eval and generated code. */
object GraftVec {

  /** Left-fold double dot product over two float arrays — the exact
    * numeric contract of `aggregate(zip_with(a, b, (p, q) => p*q),
    * 0.0, _+_)` (element-order float→double widening, left-to-right
    * summation), so swapping the higher-order-function form for this
    * kernel cannot move a single ULP. Null on length mismatch or any
    * null element, mirroring zip_with's null padding propagating
    * through the running sum.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** graft_fdot(array<float>, array<float>) → double: the similarity
  * family's inner loop as a native codegen'd expression. The stock
  * `aggregate(zip_with(...))` formulation allocates an intermediate
  * product array and dispatches two lambda expressions per element
  * outside the generated loop; this kernel reads both
  * `UnsafeArrayData` buffers directly.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_fdot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_fdot requires two ARRAY<FLOAT> inputs, got ${l.sql} and ${r.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("fdot")
      s"""
         |java.lang.Double $tmp = graft.functions.GraftVec.dot($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}
