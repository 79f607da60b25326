package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (ord, id) pairs with the highest
  * ord (ties broken by ascending id), returned as a sorted
  * array<struct<ord double, id bigint>>.
  *
  * This is the per-group top-k that Spark lacks as a native operator
  * (TakeOrderedAndProject is global-only; the window `row_number <= k`
  * formulation shuffles EVERY scored row to the group's partition). As a
  * TypedImperativeAggregate the buffer is a k-bounded sorted array that
  * partial-aggregates map-side, so a batch ANN scoring join shuffles
  * `partitions × groups × k` buffer rows instead of `groups × corpus`
  * scored rows — the 100 TB shape for "top-k neighbors per probe".
  *
  * Deterministic regardless of arrival order: the comparator
  * (ord DESC, id ASC) is total, so the retained set and its order are
  * unique for any input multiset (duplicate (ord, id) pairs are kept as
  * many times as they occur, like the window formulation would).
  */
case class TopKByAgg(
    ord: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  override def left: Expression = ord
  override def right: Expression = id
  override def prettyName: String = "graft_topk_by"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == DoubleType && id.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double ord, bigint id, k > 0), got " +
        s"${ord.dataType.catalogString} / ${id.dataType.catalogString} / $k")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) buf.insert(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.mergeFrom(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.ords(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.ords(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.append(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByAgg =
    copy(ord = l, id = r)
}

/** k-bounded buffer kept sorted by (ord DESC, id ASC); O(k) insert via
  * shift — k is small (top-10s, not top-millions), so a heap's constant
  * factors lose to the flat arrays. */
final class TopKBuffer(val k: Int) {
  val ords = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def beats(o: Double, i: Long, pos: Int): Boolean =
    o > ords(pos) || (o == ords(pos) && i < ids(pos))

  def insert(o: Double, i: Long): Unit = {
    if (size == k && !beats(o, i, k - 1)) return
    var pos = if (size == k) k - 1 else size
    if (size < k) size += 1
    while (pos > 0 && beats(o, i, pos - 1)) {
      ords(pos) = ords(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    ords(pos) = o; ids(pos) = i
  }

  /** Append assuming already-sorted input (deserialization fast path). */
  def append(o: Double, i: Long): Unit = { ords(size) = o; ids(size) = i; size += 1 }

  def mergeFrom(b: TopKBuffer): Unit = {
    var i = 0
    val n = b.size
    while (i < n) { insert(b.ords(i), b.ids(i)); i += 1 }
  }
}
