package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Static kernel behind [[PqArgmin]] (shared by interpreted eval and
  * generated code).
  */
object GraftPq {

  /** Quantization-argmin over a flattened codebook.
    *
    * The vector is `M` concatenated `D`-dim sub-vectors; the codebook
    * is `E` entries, entry `e` owning key `keys(e) = m·ks + idx` and
    * the `D` elements `flat[e·D, (e+1)·D)`. For each subspace `m` the
    * kernel returns the packed long `du·ks + idx` minimized over that
    * subspace's entries — exactly the `min(packed)` of the
    * join-formulation (`du` packs above `idx`, so the long min IS the
    * (du, idx) lexicographic argmin; no iteration-order dependence).
    *
    * `du` per mode (each replicating its Column-formulation's exact
    * double arithmetic, left-fold in element order):
    *  - 0: `floor(Σ (a_i − c_i)² · 10⁶)` — float/double codewords
    *       ([[GraftQVec.l2]] then `floor · 1e6 → long`),
    *  - 1: `floor(Σ (a_i − q_i·1e-6)² · 10⁶)` — micro-int codewords
    *       ([[GraftQVec.l2Q]] finish),
    *  - 2: `(long) Σ (a_i − c_i)²` — exact-integer-valued doubles
    *       (every term and sum < 2^53, so the direct fold equals the
    *       `a·a + b·b − 2ab` expansion the Column form uses, exactly).
    *
    * Output: length-M long array; element m is null when no codebook
    * entry targets m (the join-formulation drops the group) — also
    * when any contributing element is null (the Column form's null du
    * never wins `min`). Returns null for malformed shapes (lengths
    * not divisible), mirroring a mis-assembled codebook loudly rather
    * than silently.
    */
  def argmin(vec: ArrayData, keys: ArrayData, flat: ArrayData,
      ks: Int, mode: Int, vecKind: Int, flatKind: Int): ArrayData = {
    val e0 = keys.numElements()
    if (e0 == 0) return null
    val fl = flat.numElements()
    if (fl % e0 != 0) return null
    val d = fl / e0
    val n = vec.numElements()
    if (d == 0 || n % d != 0) return null
    val m0 = n / d

    @inline def vEl(i: Int): Double =
      if (vecKind == 0) vec.getFloat(i).toDouble else vec.getDouble(i)
    @inline def cEl(i: Int): Double = flatKind match {
      case 0 => flat.getFloat(i).toDouble
      case 1 => flat.getDouble(i)
      case 2 => flat.getInt(i).toDouble
      case _ => flat.getLong(i).toDouble
    }

    val best = new Array[Long](m0)
    val has = new Array[Boolean](m0)
    var e = 0
    while (e < e0) {
      if (!keys.isNullAt(e)) {
        val key = keys.getLong(e)
        val m = (key / ks).toInt
        val idx = key % ks
        if (key >= 0 && m < m0) {
          var s = 0.0
          var ok = true
          var j = 0
          while (ok && j < d) {
            val vi = m * d + j
            val ci = e * d + j
            if (vec.isNullAt(vi) || flat.isNullAt(ci)) ok = false
            else {
              val diff =
                if (mode == 1) vEl(vi) - cEl(ci) * 1.0e-6
                else vEl(vi) - cEl(ci)
              s += diff * diff
              j += 1
            }
          }
          if (ok) {
            val du =
              if (mode == 2) s.toLong
              else math.floor(s * 1000000.0).toLong
            val packed = du * ks + idx
            if (!has(m) || packed < best(m)) { best(m) = packed; has(m) = true }
          }
        }
      }
      e += 1
    }
    val out = new Array[Any](m0)
    var i = 0
    while (i < m0) {
      if (has(i)) out(i) = java.lang.Long.valueOf(best(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Nearest-entry scan behind [[ArgminL2]]: first (lowest-index)
    * minimizer of the direct Σ(a_i−b_i)² fold over E concatenated
    * D-dim entries; entries touching a null element are skipped.
    */
  def argminL2(vec: ArrayData, flat: ArrayData,
      vecKind: Int, flatKind: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val d = vec.numElements()
    if (d == 0) return null
    val fl = flat.numElements()
    if (fl == 0 || fl % d != 0) return null
    val e0 = fl / d

    @inline def vEl(i: Int): Double =
      if (vecKind == 0) vec.getFloat(i).toDouble else vec.getDouble(i)
    @inline def cEl(i: Int): Double =
      if (flatKind == 0) flat.getFloat(i).toDouble else flat.getDouble(i)

    var bestIdx = -1L
    var bestDu = 0.0
    var e = 0
    while (e < e0) {
      var s = 0.0
      var ok = true
      var j = 0
      while (ok && j < d) {
        val ci = e * d + j
        if (vec.isNullAt(j) || flat.isNullAt(ci)) ok = false
        else {
          val diff = vEl(j) - cEl(ci)
          s += diff * diff
          j += 1
        }
      }
      if (ok && (bestIdx < 0 || s < bestDu)) { bestDu = s; bestIdx = e }
      e += 1
    }
    if (bestIdx < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestIdx, bestDu.toLong))
  }
}

/** graft_argmin_l2(vec, flat) → struct(idx, du): nearest-codeword
  * scan over a flattened centroid table — `flat` is E concatenated
  * D-dim vectors (D = `vec` length), the result the 0-based index of
  * the entry minimizing the direct Σ(a_i−b_i)² fold plus that
  * distance truncated to long. On exact-integer-valued double inputs
  * (the engine's micro-int convention) the fold is exact, so `du`
  * equals the `a·a + b·b − 2ab` expansion of the join formulation it
  * replaces (corpus × k crossJoin + min_by groupBy — the kernel runs
  * the whole scan in-register, materializing nothing). Ties keep the
  * LOWEST index (strict-less scan) — with entries ordered by id,
  * identical to `min_by(id, struct(du, id))`.
  */
case class ArgminL2(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_argmin_l2"
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("idx", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("du", LongType, nullable = false)))
  override def nullable: Boolean = true

  private def isFpArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFpArray(left.dataType) && isFpArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_argmin_l2 requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def vKind: Int =
    if (left.dataType.asInstanceOf[ArrayType].elementType == FloatType) 0 else 1
  private def fKind: Int =
    if (right.dataType.asInstanceOf[ArrayType].elementType == FloatType) 0 else 1

  override protected def nullSafeEval(v: Any, f: Any): Any =
    GraftPq.argminL2(v.asInstanceOf[ArrayData], f.asInstanceOf[ArrayData], vKind, fKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, f) => {
      val tmp = ctx.freshName("am")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $tmp =
         |  graft.functions.GraftPq.argminL2($v, $f, $vKind, $fKind);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminL2 =
    copy(left = newLeft, right = newRight)
}

/** graft_pq_argmin(vec, keys, flat) → array<bigint>: per-subspace
  * packed argmin-L2 codeword assignment against a flattened broadcast
  * codebook — the product-quantization ENCODE collapsed to one
  * codegen'd map-only call (replaces the corpus × (M·Ks) broadcast
  * join + min-aggregate: same output rows, zero explode, zero encode
  * shuffle). `ks` (the pack radix) and `mode` (the du arithmetic, see
  * [[GraftPq.argmin]]) are plan-time constants.
  */
case class PqArgmin(first: Expression, second: Expression, third: Expression,
    ks: Int, mode: Int) extends TernaryExpression {

  override def prettyName: String = "graft_pq_argmin"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  private def isFpArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }
  private def isIntegralArray(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (ks <= 0 || mode < 0 || mode > 2)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_pq_argmin requires ks > 0 and mode in 0..2, got ks=$ks mode=$mode")
    val flatOk =
      if (mode == 1) isIntegralArray(third.dataType) else isFpArray(third.dataType)
    val keysOk = second.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (isFpArray(first.dataType) && keysOk && flatOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_argmin requires (ARRAY<FLOAT|DOUBLE>, ARRAY<BIGINT>, " +
        s"ARRAY<${if (mode == 1) "INT|BIGINT" else "FLOAT|DOUBLE"}>), got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }

  private def vecKind: Int =
    if (first.dataType.asInstanceOf[ArrayType].elementType == FloatType) 0 else 1
  private def flatKind: Int =
    third.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType   => 0
      case DoubleType  => 1
      case IntegerType => 2
      case _           => 3
    }

  override protected def nullSafeEval(v: Any, k: Any, f: Any): Any =
    GraftPq.argmin(v.asInstanceOf[ArrayData], k.asInstanceOf[ArrayData],
      f.asInstanceOf[ArrayData], ks, mode, vecKind, flatKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, k, f) => {
      val tmp = ctx.freshName("pqa")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.GraftPq.argmin($v, $k, $f, $ks, $mode, $vecKind, $flatKind);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqArgmin =
    copy(first = newFirst, second = newSecond, third = newThird)
}
