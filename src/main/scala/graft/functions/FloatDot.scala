package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static kernel shared by interpreted eval and generated code. */
object GraftVec {

  /** Left-fold double dot product over two float/double arrays — the
    * exact numeric contract of `aggregate(zip_with(a, b, (p, q) =>
    * p*q), 0.0, _+_)` (element-order widening to double,
    * left-to-right summation), so swapping the higher-order-function
    * form for this kernel cannot move a single ULP. Null on length
    * mismatch or any null element, mirroring zip_with's null padding
    * propagating through the running sum. `aFloat`/`bFloat` carry the
    * analysis-time element types: the embeddings table has shipped
    * only as `array<float>` so far, but the events.ts episode showed
    * generated data can change physical grain between rounds — a
    * double-element regeneration must keep working (in full double
    * precision, matching what the DuckDB oracle computes), not throw
    * at analysis time.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
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

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(left.dataType) && isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fdot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArray(left.dataType), isFloatArray(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("fdot")
      val af = isFloatArray(left.dataType)
      val bf = isFloatArray(right.dataType)
      s"""
         |java.lang.Double $tmp = graft.functions.GraftVec.dot($a, $b, $af, $bf);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}
