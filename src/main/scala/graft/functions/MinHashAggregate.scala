package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass MinHash signature aggregate (SURVEY §2.J pref. order (b)).
  *
  * Input: one 64-bit shingle/word hash per row. The k permutation hashes
  * are derived from that one base hash with a splitmix64-style finalizer
  * over per-permutation offsets (the standard one-hash construction: the
  * mixer's avalanche makes the k derived values behave as independent
  * permutations) — so each input row costs ONE upstream hash plus k
  * cheap mixes and one k-long buffer update, instead of k independent
  * seeded-hash evaluations feeding k separate aggregate slots.
  *
  * Buffer: k running minima; merges map-side like any imperative
  * aggregate (signatures reduce locally before the exchange — the
  * 100 TB shape). Output: array<bigint> of length k.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && numHashes > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint base-hash argument and numHashes > 0, " +
        s"got ${child.dataType.catalogString} / $numHashes")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < numHashes) {
        val hk = MinHashAgg.mix(h, k)
        if (hk < buf(k)) buf(k) = hk
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    var k = 0
    while (k < numHashes) { bb.putLong(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) { buf(k) = bb.getLong(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** splitmix64-style finalizer over (base hash, permutation index):
    * full-avalanche mixing, so the k derived streams act as independent
    * hash functions (Steele et al.'s SplitMix constants, public). */
  def mix(h: Long, k: Int): Long = {
    var z = h + (k + 1) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
