package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Theta-sketch distinct aggregate (SURVEY §2.J pref. order (b)) over
  * the Apache DataSketches theta family — the sketch HLL cannot
  * replace: theta sketches close under UNION, INTERSECTION and
  * DIFFERENCE, so distinct-set algebra ("users who clicked AND viewed")
  * runs on pre-aggregated per-group sketches instead of rescanning raw
  * data. Spark 4 ships HLL/KLL SQL functions but not theta, hence this
  * aggregate.
  *
  * Buffer: a theta Union (bounded ~2^lgK entries, map-side mergeable —
  * the 100 TB rollup shape). Output: compact ORDERED sketch bytes —
  * deterministic for a given input SET (hashes are sorted, so
  * partitioning/order never changes the bytes). Below ~2^lgK distinct
  * values the sketch is in exact mode and every estimate is the exact
  * count — the regime the oracle checks — and past it the same plan
  * degrades gracefully to bounded-error estimates. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && lgK >= 4 && lgK <= 26)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument and 4 <= lgK <= 26, " +
        s"got ${child.dataType.catalogString} / $lgK")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
}

/** Driver-side set algebra over compact theta sketch bytes (the
  * domain-bounded final step — inputs are one sketch per group). */
object ThetaOps {
  def wrap(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  def intersect(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.getEstimate
  }

  def aNotB(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).getEstimate

  def unionAll(all: Seq[Array[Byte]], lgK: Int): Double = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    all.foreach(b => u.union(wrap(b)))
    u.getResult.getEstimate
  }
}
