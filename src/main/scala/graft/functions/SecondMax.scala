package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Native second-largest aggregate — the hot kernel of the reference's
  * `'arthur'` / `downsample_2ndmax` filters (ktx/util.py:164,
  * tiff2octree.py:237).
  *
  * A `DeclarativeAggregate` over a fixed two-slot buffer (max1, max2):
  * pure expression trees, so it runs inside HashAggregateExec with
  * whole-stage codegen and map-side partial aggregation — unlike the
  * `collect_list + sort_array` formulation it replaces, it shuffles
  * two longs per group instead of a list, allocates nothing per row,
  * and stays in the codegen'd path. At 100 TB this is the difference
  * between a pipelined aggregation and an ObjectHashAggregate with
  * per-group array sorts.
  *
  * Duplicates count separately ([5,5] → second = 5), matching the
  * sorted-subvoxel semantics of the reference; null buffer = fewer
  * than two inputs seen → result null (callers guard on count).
  */
case class SecondMax(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "graft_second_max"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_second_max requires BIGINT input, got ${child.dataType.sql}")

  private lazy val max1 = AttributeReference("max1", LongType)()
  private lazy val max2 = AttributeReference("max2", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(max1, max2)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, LongType), Literal.create(null, LongType))

  /** Least that propagates null (unlike Catalyst's null-skipping
    * Least): "no value yet" must not masquerade as a candidate.
    */
  private def strictLeast(a: Expression, b: Expression): Expression =
    If(Or(IsNull(a), IsNull(b)), Literal.create(null, LongType), Least(Seq(a, b)))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    Greatest(Seq(max1, child)),                      // null-skipping: first value seeds max1
    Greatest(Seq(max2, strictLeast(max1, child))))   // null until a second value arrives

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Greatest(Seq(max1.left, max1.right)),
    // overall 2nd-max candidates: each side's 2nd-max, or the smaller
    // of the two side maxima (strict: an empty side contributes none)
    Greatest(Seq(max2.left, max2.right, strictLeast(max1.left, max1.right))))

  override lazy val evaluateExpression: Expression = max2

  override protected def withNewChildInternal(newChild: Expression): SecondMax =
    copy(child = newChild)
}

object GraftFunctions {
  /** Idempotently register the engine's native functions with a
    * session (temp-function registry; an extensions-based injection
    * would do the same for spark.sql users cluster-wide).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("graft_second_max"))) {
      registry.createOrReplaceTempFunction(
        "graft_second_max", exprs => SecondMax(exprs.head), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_md5_prefix"))) {
      registry.createOrReplaceTempFunction(
        "graft_md5_prefix", exprs => Md5PrefixLong(exprs.head), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_kmv_kth"))) {
      registry.createOrReplaceTempFunction(
        "graft_kmv_kth", kmvBuilder, "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_fdot"))) {
      registry.createOrReplaceTempFunction(
        "graft_fdot", exprs => FloatDot(exprs(0), exprs(1)), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_char_bigrams"))) {
      registry.createOrReplaceTempFunction(
        "graft_char_bigrams", exprs => CharBigrams(exprs.head), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_window_hashes"))) {
      registry.createOrReplaceTempFunction(
        "graft_window_hashes", WindowHashes.builder, "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_char_windows"))) {
      registry.createOrReplaceTempFunction(
        "graft_char_windows", CharWindows.builder, "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_token_ngrams"))) {
      registry.createOrReplaceTempFunction(
        "graft_token_ngrams", TokenNgrams.builder, "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_alnum_tokens"))) {
      registry.createOrReplaceTempFunction(
        "graft_alnum_tokens", exprs => AlnumTokens(exprs.head), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_ldot"))) {
      registry.createOrReplaceTempFunction(
        "graft_ldot", exprs => LongDot(exprs(0), exprs(1)), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_hilbert"))) {
      registry.createOrReplaceTempFunction(
        "graft_hilbert",
        exprs => HilbertIndex(exprs(0), exprs(1), exprs(2)), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_fdotq"))) {
      registry.createOrReplaceTempFunction(
        "graft_fdotq", exprs => FloatDotQuant(exprs(0), exprs(1)), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_fl2"))) {
      registry.createOrReplaceTempFunction(
        "graft_fl2", exprs => FloatL2(exprs(0), exprs(1)), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_fl2q"))) {
      registry.createOrReplaceTempFunction(
        "graft_fl2q", exprs => FloatL2Quant(exprs(0), exprs(1)), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_pq_argmin"))) {
      registry.createOrReplaceTempFunction(
        "graft_pq_argmin", pqArgminBuilder _, "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_argmin_l2"))) {
      registry.createOrReplaceTempFunction(
        "graft_argmin_l2", exprs => ArgminL2(exprs(0), exprs(1)), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_vlsum"))) {
      registry.createOrReplaceTempFunction(
        "graft_vlsum", exprs => VecSumLong(exprs(0)).toAggregateExpression(),
        "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("graft_topk_min"))) {
      registry.createOrReplaceTempFunction(
        "graft_topk_min", topkBuilder _, "built-in")
    }
  }

  /** Shared graft_topk_min(x, K) builder (K is a plan-time literal). */
  def topkBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_topk_min requires exactly 2 arguments (x, K), got ${exprs.length}")
    TopKMin(exprs.head, foldInt(exprs(1), "K")).toAggregateExpression()
  }

  /** Shared graft_pq_argmin builder (temp-function registry and
    * session-extensions injection): the trailing ks / mode arguments
    * are plan-time literals lifted into expression parameters.
    */
  def pqArgminBuilder(exprs: Seq[Expression]): PqArgmin =
    PqArgmin(exprs(0), exprs(1), exprs(2),
      foldInt(exprs(3), "ks"), foldInt(exprs(4), "mode"))

  /** Plan-time Int of a foldable literal argument (ks / mode of
    * graft_pq_argmin are expression parameters, not runtime columns).
    */
  private def foldInt(e: Expression, name: String): Int = {
    require(e.foldable, s"graft function argument $name must be a literal")
    e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long    => l.intValue()
      case other => throw new IllegalArgumentException(
        s"graft function argument $name must be an integer literal, got $other")
    }
  }

  /** Shared graft_kmv_kth(hash, K) builder (temp-function registry and
    * [[graft.GraftExtensions]] injection resolve identically).
    */
  def kmvBuilder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_kmv_kth requires exactly 2 arguments (hash, K), got ${exprs.length}")
    val k = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_kmv_kth: K must be an INT literal, got $other")
    }
    KmvKthHash(exprs.head, k).toAggregateExpression()
  }
}
