package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable bounded-memory sketch aggregates. */
object SketchAggFunctions {

  /** SpaceSaving heavy hitters: the top-`k` most frequent values with
    * per-item error bounds, in O(k) memory PER AGGREGATION BUFFER no
    * matter how many distinct values stream past — the shape that finds
    * hot tokens / hot keys / hot domains over 100 TB where an exact
    * group-by's hash table is the thing that spills. Returns
    * `array<struct<item, count, err>>` sorted by count desc: guarantees
    * `count - err <= true <= count`, and any value with true frequency
    * > n/k is present (Metwally et al., ICDT'05; merge rule after
    * Agarwal et al.'s mergeable summaries: absent items debit the other
    * side's eviction ceiling).
    *
    * When `k` >= the number of distinct values no eviction ever happens
    * and the sketch is EXACT (err 0 everywhere) — the property the SQL
    * oracle checks end to end; the error bounds under genuine eviction
    * are spec-asserted against exact counts on a skewed stream. */
  def spaceSavingTopK(item: Column, k: Int): Column =
    GraftColumnBridge.column(
      SpaceSavingAgg(GraftColumnBridge.expression(item), k)
        .toAggregateExpression())
}

/** See [[SketchAggFunctions.spaceSavingTopK]]. Buffer = (overflowed,
  * item -> (count, err)) with at most k entries. */
case class SpaceSavingAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  require(k > 0, "space_saving_topk needs k > 0")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(k)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any = {
    val rows = buffer.sortedEntries.map { case (item, c, e) =>
      InternalRow(UTF8String.fromString(item), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Mutable SpaceSaving state: `counts(item) = (count, err)`, at most `k`
  * entries. `overflowed` records whether any eviction happened — while
  * false, the sketch is exact and its eviction ceiling is 0. */
final class SpaceSavingBuffer(val k: Int) {
  import scala.collection.mutable
  var overflowed: Boolean = false
  val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  /** Ceiling on the true count of any item NOT in the sketch. */
  def evictionCeiling: Long =
    if (!overflowed) 0L else counts.valuesIterator.map(_._1).min

  def add(item: String): Unit = counts.get(item) match {
    case Some((c, e)) => counts.update(item, (c + 1, e))
    case None if counts.size < k => counts.update(item, (1L, 0L))
    case None =>
      val (minItem, (minC, _)) = counts.minBy { case (i, (c, _)) => (c, i) }
      counts.remove(minItem)
      counts.update(item, (minC + 1, minC))
      overflowed = true
  }

  def mergeWith(other: SpaceSavingBuffer): Unit = {
    val ceilSelf = evictionCeiling
    val ceilOther = other.evictionCeiling
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    for ((i, (c, e)) <- counts) {
      val (oc, oe) = other.counts.getOrElse(i, (ceilOther, ceilOther))
      merged.update(i, (c + oc, e + oe))
    }
    for ((i, (c, e)) <- other.counts if !counts.contains(i))
      merged.update(i, (c + ceilSelf, e + ceilSelf))
    overflowed = overflowed || other.overflowed
    counts.clear()
    if (merged.size <= k) counts ++= merged
    else {
      overflowed = true
      // keep the k largest; deterministic tie-break on the item
      merged.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
        .foreach { case (i, ce) => counts.update(i, ce) }
    }
  }

  /** count desc, then item asc — deterministic output order. */
  def sortedEntries: Seq[(String, Long, Long)] =
    counts.toSeq.map { case (i, (c, e)) => (i, c, e) }
      .sortBy { case (i, c, _) => (-c, i) }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(overflowed)
    out.writeInt(counts.size)
    for ((i, (c, e)) <- counts) {
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }
}

object SpaceSavingBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(k)
    buf.overflowed = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.counts.update(new String(b, "UTF-8"), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }
}
