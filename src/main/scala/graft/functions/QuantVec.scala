package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Static kernels shared by interpreted eval and generated code.
  *
  * Each mirrors its higher-order-function SQL form's exact left-fold
  * double arithmetic (same per-element operation order, same 0.0
  * seed), so swapping cannot move a single ULP — the DuckDB oracle
  * hash compares are the end-to-end proof. Null on length mismatch or
  * any null element, mirroring zip_with's null padding.
  */
object GraftQVec {

  @inline private def fEl(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  @inline private def qEl(q: ArrayData, i: Int, isInt: Boolean): Double =
    (if (isInt) q.getInt(i).toLong else q.getLong(i)).toDouble

  /** Σ a_i · (q_i · 1e-6): float vector ⋅ micro-int centroid. */
  def dotQ(a: ArrayData, q: ArrayData, aF: Boolean, qI: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != q.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || q.isNullAt(i)) return null
      s += fEl(a, i, aF) * (qEl(q, i, qI) * 1.0e-6)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Σ (a_i − b_i)²: float-vs-float squared L2. */
  def l2(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = fEl(a, i, aF) - fEl(b, i, bF)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Σ (a_i − q_i · 1e-6)²: float-vs-micro-int squared L2. */
  def l2Q(a: ArrayData, q: ArrayData, aF: Boolean, qI: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != q.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || q.isNullAt(i)) return null
      val d = fEl(a, i, aF) - qEl(q, i, qI) * 1.0e-6
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Shared shape for the three quantized-vector kernels. */
abstract class QuantVecExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  protected def isFpArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }
  protected def isIntArray(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) => true
    case _                         => false
  }
  protected def isIntegralArray(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _                                                  => false
  }

  protected def genCall(ctx: CodegenContext, ev: ExprCode,
      kernel: String, rFlag: Boolean): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("qv")
      val af = isFloatArray(left.dataType)
      s"""
         |java.lang.Double $tmp = graft.functions.GraftQVec.$kernel($a, $b, $af, $rFlag);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** graft_fdotq(array<float|double>, array<int|bigint>) → double:
  * Σ a_i · (q_i · 1e-6) — the quantized-centroid assignment dot.
  */
case class FloatDotQuant(left: Expression, right: Expression) extends QuantVecExpr {
  override def prettyName: String = "graft_fdotq"
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFpArray(left.dataType) && isIntegralArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fdotq requires (ARRAY<FLOAT|DOUBLE>, ARRAY<INT|BIGINT>), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftQVec.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArray(left.dataType), isIntArray(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "dotQ", isIntArray(right.dataType))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotQuant =
    copy(left = newLeft, right = newRight)
}

/** graft_fl2(array<float|double>, array<float|double>) → double:
  * Σ (a_i − b_i)² — the PQ seed-codeword assignment distance.
  */
case class FloatL2(left: Expression, right: Expression) extends QuantVecExpr {
  override def prettyName: String = "graft_fl2"
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFpArray(left.dataType) && isFpArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fl2 requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftQVec.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArray(left.dataType), isFloatArray(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "l2", isFloatArray(right.dataType))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatL2 =
    copy(left = newLeft, right = newRight)
}

/** graft_fl2q(array<float|double>, array<int|bigint>) → double:
  * Σ (a_i − q_i · 1e-6)² — the trained-codebook assignment distance.
  */
case class FloatL2Quant(left: Expression, right: Expression) extends QuantVecExpr {
  override def prettyName: String = "graft_fl2q"
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFpArray(left.dataType) && isIntegralArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fl2q requires (ARRAY<FLOAT|DOUBLE>, ARRAY<INT|BIGINT>), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftQVec.l2Q(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArray(left.dataType), isIntArray(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "l2Q", isIntArray(right.dataType))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatL2Quant =
    copy(left = newLeft, right = newRight)
}
