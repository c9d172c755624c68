package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a native `TypedImperativeAggregate` — the
  * combiner-shaped alternative to the rank-window idiom. Spark 4 already
  * bounds the `row_number() ≤ k` window's exchange with WindowGroupLimit
  * (partial group-limits below the shuffle — pinned on `q_topk_pergroup`
  * in PlanShapeSpec), but that plan still SORTS every map partition's
  * rows to feed the limit; this aggregate replaces the O(n log n)
  * map-side sort with an O(n log k) bounded heap, plans as one
  * partial+final ObjectHashAggregate pair (no Sort, no Window machinery),
  * and applies where the group-limit pattern can't (composite candidates,
  * arbitrary rewrites of the key). Exchange volume is the same k ×
  * groups × partitions — the reference's combiner
  * (`/root/reference/src/lib.rs:132-136`, ReduceFn applied map-side) is
  * what ObjectHashAggregate gives the imperative buffer for free.
  *
  * Ordering contract: candidates rank by (key DESC, payload ASC) — the
  * payload doubles as the deterministic tie-break, so with distinct
  * payloads the result is a total order and the emitted array is unique.
  * Nulls in either child are ignored (a null candidate cannot rank).
  * `eval` emits the kept pairs best-first as `array<struct<k,p>>`;
  * registry queries posexplode it to scalar rows (the driver type
  * frontier never sees the nested type).
  */
case class TopKAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k > 0, s"topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(key, payload)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(key = newChildren(0), payload = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, payload.dataType) match {
      case (LongType | DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"topk requires (bigint|double, bigint), got (${a.catalogString}, ${b.catalogString})")
    }

  // double keys ride the heap as their order-preserving IEEE-bits longs
  // (TopKAgg.toSortable — an exact involution, so eval reconstructs the
  // identical double); the long path stores the value directly
  private def keyIsDouble: Boolean = key.dataType == DoubleType

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", key.dataType, nullable = false),
      StructField("p", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "topk"

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val kv = key.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null) {
      val kl = if (keyIsDouble) TopKAgg.toSortable(kv.asInstanceOf[Double])
        else kv.asInstanceOf[Long]
      buf.insert(kl, pv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.foreach(buf.insert)
    buf
  }

  override def eval(buf: TopKAgg.Buffer): Any =
    new GenericArrayData(buf.sortedBestFirst.map { case (kv, pv) =>
      if (keyIsDouble) InternalRow(TopKAgg.fromSortable(kv), pv)
      else InternalRow(kv, pv)
    })

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer =
    TopKAgg.Buffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
}

object TopKAgg {

  /** `a` outranks `b` under (key DESC, payload ASC). */
  private def better(ak: Long, ap: Long, bk: Long, bp: Long): Boolean =
    ak > bk || (ak == bk && ap < bp)

  /** Order-preserving double → signed long (IEEE order with −0.0
    * canonicalized to +0.0 first — SQL comparison semantics treat the two
    * zeros as EQUAL and fall through to the payload tie-break, so the raw
    * IEEE total order, which ranks −0.0 strictly below +0.0, would
    * silently diverge from the rank-window/oracle contract on zero keys);
    * `fromSortable` inverts the encoding exactly, so a double key
    * survives the heap bit-for-bit (−0.0 keys surface as +0.0, the SQL
    * canonical form). */
  def toSortable(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    if (bits >= 0) bits else -1L - (bits & Long.MaxValue)
  }

  def fromSortable(l: Long): Double =
    java.lang.Double.longBitsToDouble(
      if (l >= 0) l else (-1L - l) | Long.MinValue)

  /** Bounded buffer: a worst-on-top binary heap over (key, payload) pairs
    * packed in one flat long array — no boxing on the hot insert path, and
    * serialization is a bulk copy of the live prefix. */
  final class Buffer(k: Int) {
    private val heap = new Array[Long](2 * k)
    private var n = 0

    def insert(kv: Long, pv: Long): Unit = {
      if (n < k) {
        heap(2 * n) = kv; heap(2 * n + 1) = pv; n += 1
        siftUp(n - 1)
      } else if (better(kv, pv, heap(0), heap(1))) {
        heap(0) = kv; heap(1) = pv
        siftDown(0)
      }
    }

    // heap order: parent is WORSE-or-equal than children (worst at root)
    private def worse(i: Int, j: Int): Boolean =
      better(heap(2 * j), heap(2 * j + 1), heap(2 * i), heap(2 * i + 1))

    private def swap(i: Int, j: Int): Unit = {
      val tk = heap(2 * i); val tp = heap(2 * i + 1)
      heap(2 * i) = heap(2 * j); heap(2 * i + 1) = heap(2 * j + 1)
      heap(2 * j) = tk; heap(2 * j + 1) = tp
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < n && worse(l, w)) w = l
        if (r < n && worse(r, w)) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(heap(2 * i), heap(2 * i + 1)); i += 1 }
    }

    def sortedBestFirst: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](n)
      var i = 0
      while (i < n) { out(i) = (heap(2 * i), heap(2 * i + 1)); i += 1 }
      out.sortWith { case ((ak, ap), (bk, bp)) => better(ak, ap, bk, bp) }
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * n)
      bb.putInt(n)
      var i = 0
      while (i < 2 * n) { bb.putLong(heap(i)); i += 1 }
      bb.array()
    }
  }

  object Buffer {
    def fromBytes(k: Int, bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new Buffer(k)
      var i = 0
      while (i < n) { buf.insert(bb.getLong, bb.getLong); i += 1 }
      buf
    }
  }

  /** Column wrapper: top-k (key DESC, payload ASC) pairs per group. */
  def topk(key: Column, payload: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKAgg(GraftSqlBridge.expression(key), GraftSqlBridge.expression(payload), k)
        .toAggregateExpression())
}
