package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object GraftHilbert {

  /** The textbook xy→d walk (Hilbert curve position of a grid cell):
    * per level, accumulate the quadrant code (3·rx) XOR ry and apply
    * the Hilbert rotation. Inputs must already sit in [0, 2^bits);
    * the result spans [0, 4^bits).
    */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** graft_hilbert(x, y, bits) → bigint: the Hilbert curve position as
  * ONE native codegen'd expression. The rotation makes the walk
  * inherently sequential, so a pure-SQL formulation needs one chained
  * projection per level — 20 stacked plan nodes whose expression
  * substitution blows up plan size and analysis time (measured: the
  * unrolled column chain ran the clustering op at 15 s where this
  * expression runs it at z-order parity). The oracle keeps the
  * unrolled 20-CTE chain — two independent formulations of the curve.
  */
case class HilbertIndex(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def prettyName: String = "graft_hilbert"
  override def dataType: DataType = LongType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == LongType && second.dataType == LongType &&
      (third.dataType == IntegerType || third.dataType == LongType) &&
      third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_hilbert requires (BIGINT, BIGINT, literal INT bits), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")

  private def bitsOf(b: Any): Int = b match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long    => l.intValue()
  }

  override protected def nullSafeEval(x: Any, y: Any, b: Any): Any =
    GraftHilbert.xy2d(bitsOf(b), x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, b) => {
      s"${ev.value} = graft.functions.GraftHilbert.xy2d((int) $b, $x, $y);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HilbertIndex =
    copy(first = newFirst, second = newSecond, third = newThird)
}
