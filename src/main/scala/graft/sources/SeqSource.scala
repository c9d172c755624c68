package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** A DataSourceV2 `TableProvider` — the engine's source extension point
  * demonstrated end-to-end: a deterministic integer-sequence table
  * (`id`, `mod10`, `label`) generated partition-parallel, with the three
  * scan optimizations that matter at 100 TB implemented for real:
  *
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *     materialize only requested fields — a projection never pays for
  *     unread columns (the DSv2 analog of parquet ReadSchema pruning);
  *   - **filter pushdown** (`SupportsPushDownFilters`): range/equality
  *     predicates on `id` are absorbed into the scan (removed from the
  *     post-scan filter) and narrow the generated range itself;
  *   - **partition pruning**: the pushed `id` bounds clip each planned
  *     slice — a slice whose [start, end) misses the bounds is never
  *     created, the source-level analog of parquet row-group skipping.
  *
  * The reference's sources are whole files handed one-per-map-task
  * (/root/reference/src/coordinator/mod.rs:205-219); this is the
  * Spark-native generalization: the SOURCE plans its own parallelism and
  * participates in the optimizer instead of being a byte stream.
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  *   .option("rows", n).option("slices", p).load()`.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mod10", LongType, nullable = false),
    StructField("label", StringType, nullable = false)))
}

class SeqTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, slices)
}

class SeqScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L          // inclusive id lower bound
  private var hi: Long = rows        // exclusive id upper bound
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema

  /** Absorb id range/equality predicates into the generated range; report
    * everything else back as residual for Spark to evaluate post-scan.
    * The +1 exclusive-bound adjustments saturate instead of wrapping:
    * `id <= Long.MaxValue` must stay a full scan, not overflow hi to
    * Long.MinValue and silently plan zero partitions. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def succ(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    val (absorbed, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, succ(v)); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, succ(v)); true
      case EqualTo("id", v: Long)            =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v)); true
      case _ => false
    }
    pushed = absorbed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(lo, hi, rows, slices, required)
}

class SeqScan(lo: Long, hi: Long, rows: Long, slices: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq bounds=[$lo,$hi) of $rows, columns=${required.fieldNames.mkString(",")}"

  /** Even slices of [0, rows); a slice is PLANNED only if it intersects
    * the pushed bounds — pruned slices cost nothing, on any cluster. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => (i * per, math.min((i + 1) * per, rows)))
      .filter { case (s, e) => s < e && e > lo && s < hi }
      .map { case (s, e) =>
        SeqPartition(math.max(s, lo), math.min(e, hi)): InputPartition
      }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

case class SeqPartition(start: Long, end: Long) extends InputPartition

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqPartition]
    // resolve the projection once per partition, not per row
    val fields: Array[Long => Any] = required.fieldNames.map {
      case "id"    => (id: Long) => id
      case "mod10" => (id: Long) => id % 10
      case "label" => (id: Long) => UTF8String.fromString("n" + id)
      case other   => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        // one array per row — no per-row Seq wrappers
        val values = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) { values(i) = fields(i)(cur); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
