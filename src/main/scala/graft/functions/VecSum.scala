package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** graft_vlsum(array<bigint>) → array<bigint>: element-wise sum of
  * long arrays — the vector-valued partial every Lloyd/centroid mean
  * update needs.
  *
  * The long-form alternative (posexplode each vector to (pos, x)
  * rows, groupBy (key, pos) sum, then collect_list + array_sort the
  * D dims back into an array) multiplies the shuffled row count by D
  * and pays a per-group sort; this aggregate keeps the vector whole —
  * one D-long buffer per group per map-side partial, element order
  * preserved by construction (no rebuild sort), merge-order
  * independent (integer addition), so results are oracle-identical
  * under any partitioning. Runs in ObjectHashAggregateExec with
  * map-side partial merge.
  *
  * Null input rows are skipped (SQL sum semantics); a null ELEMENT
  * inside an array or a length mismatch across the group throws —
  * a malformed vector corpus should fail loudly, not average
  * silently.
  */
case class VecSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_vlsum"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vlsum requires ARRAY<BIGINT> input, got ${other.sql}")
  }

  /** Empty marker: zero-length array until the first input fixes D. */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(buf: Array[Long], arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val acc = if (buf.length == 0) new Array[Long](n) else buf
    require(acc.length == n,
      s"graft_vlsum: vector length mismatch in group (${acc.length} vs $n)")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), s"graft_vlsum: null element at position $i")
      acc(i) += arr.getLong(i)
      i += 1
    }
    acc
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    require(buf.length == other.length,
      s"graft_vlsum: vector length mismatch in merge (${buf.length} vs ${other.length})")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumLong =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecSumLong =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): VecSumLong =
    copy(child = newChild)
}
