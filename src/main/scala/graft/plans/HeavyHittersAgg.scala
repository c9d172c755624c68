package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a `TypedImperativeAggregate` —
  * the deterministic-guarantee cousin of the count-min sketch
  * (`sketch_countmin`): at most k counters, and for EVERY item,
  * true_count − n/(k+1) ≤ estimate ≤ true_count, so any item with
  * frequency > n/(k+1) is GUARANTEED present in the summary. Merging
  * follows Agarwal et al.'s mergeable-summaries rule: sum counters
  * pairwise, then subtract the (k+1)-largest counter from all and drop
  * the non-positive — the error bound composes across partitions, which
  * is exactly what map-side partial aggregation needs. The summary's
  * counter VALUES depend on arrival order (not gate-able by hash); the
  * registry query therefore emits only theorem-backed facts — membership
  * of provably-heavy items and bound satisfaction — which are
  * deterministic under ANY partitioning.
  *
  * eval returns `array<struct<item string, est bigint>>` sorted
  * (est DESC, item ASC).
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAgg.Buffer] {

  require(k > 0, s"heavy_hitters requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren(0))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a string item, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): HeavyHittersAgg.Buffer =
    new HeavyHittersAgg.Buffer(k)

  override def update(buf: HeavyHittersAgg.Buffer, input: InternalRow): HeavyHittersAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: HeavyHittersAgg.Buffer, other: HeavyHittersAgg.Buffer): HeavyHittersAgg.Buffer =
    buf.mergeWith(other)

  override def eval(buf: HeavyHittersAgg.Buffer): Any =
    new GenericArrayData(buf.sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })

  override def serialize(buf: HeavyHittersAgg.Buffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): HeavyHittersAgg.Buffer =
    HeavyHittersAgg.Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
}

object HeavyHittersAgg {

  /** At most k counters. `add` is classic MG (decrement-all on overflow,
    * amortized O(1) via zero-pruning); `mergeWith` is the mergeable-
    * summaries rule (pairwise sum, subtract the (k+1)-largest, keep
    * positive), under which the n/(k+1) deficiency bound composes. */
  final class Buffer(k: Int) {
    private[HeavyHittersAgg] val counters =
      scala.collection.mutable.HashMap.empty[String, Long]

    /** Classic unit-weight MG step (the only arrival path — merges go
      * through `mergeWith`, never here): bump a tracked item or fill a
      * free slot; otherwise decrement every counter by one (consuming
      * the arrival) and prune zeros. */
    def add(item: String): Unit = {
      val cur = counters.getOrElse(item, 0L)
      if (cur > 0L || counters.size < k) {
        counters(item) = cur + 1L
      } else {
        counters.mapValuesInPlace((_, c) => c - 1L)
        counters.filterInPlace((_, c) => c > 0L)
      }
    }

    def mergeWith(other: Buffer): Buffer = {
      other.counters.foreach { case (item, c) =>
        counters(item) = counters.getOrElse(item, 0L) + c
      }
      if (counters.size > k) {
        val cut = counters.values.toSeq.sorted(Ordering[Long].reverse)(k)
        counters.mapValuesInPlace((_, c) => c - cut)
        counters.filterInPlace((_, c) => c > 0L)
      }
      this
    }

    def sorted: Array[(String, Long)] =
      counters.toArray.sortBy { case (item, est) => (-est, item) }

    def toBytes: Array[Byte] = {
      val items = counters.toArray
      val enc = items.map { case (s, c) => (s.getBytes("UTF-8"), c) }
      val size = 4 + enc.map(e => 4 + e._1.length + 8).sum
      val bb = ByteBuffer.allocate(size)
      bb.putInt(items.length)
      enc.foreach { case (b, c) =>
        bb.putInt(b.length); bb.put(b); bb.putLong(c)
      }
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(k: Int, bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new Buffer(k)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        buf.counters(new String(b, "UTF-8")) = bb.getLong
        i += 1
      }
      buf
    }
  }

  /** Column wrapper: Misra-Gries summary of up to k heavy items. */
  def heavyHitters(item: Column, k: Int): Column =
    GraftSqlBridge.column(
      HeavyHittersAgg(GraftSqlBridge.expression(item), k).toAggregateExpression())
}
