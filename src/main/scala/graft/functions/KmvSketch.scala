package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** graft_kmv_kth(hash, K) → struct(k_used, kth_hash): the K smallest
  * DISTINCT values of a BIGINT hash column, summarized as (how many
  * kept, largest kept) — the K-minimum-values distinct-count sketch
  * in its mergeable-aggregate form.
  *
  * A `TypedImperativeAggregate` over a bounded TreeSet: each map-side
  * partial keeps at most K longs per group, so the shuffle carries
  * K·groups values instead of every distinct hash (the
  * distinct+row_number formulation it replaces shuffles ALL distinct
  * hashes and then sorts each group — at 100 TB that is the
  * difference between a constant-size mergeable summary and a full
  * distinct materialization). Runs in ObjectHashAggregateExec with
  * map-side partial merge; the result is independent of partitioning
  * and merge order (a set's K smallest is associative/commutative),
  * which keeps it oracle-deterministic.
  */
case class KmvKthHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "graft_kmv_kth: K must be positive")

  override def prettyName: String = "graft_kmv_kth"

  override def dataType: DataType = StructType(Seq(
    StructField("k_used", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_kth requires BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) buf.remove(buf.last())
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.isEmpty) null
    else new GenericInternalRow(Array[Any](buf.size.toLong, buf.last().longValue()))

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKthHash =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvKthHash =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvKthHash =
    copy(child = newChild)
}
