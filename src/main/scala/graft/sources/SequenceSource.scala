package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector: a deterministic integer-sequence
  * table (`id` BIGINT, `bucket` INT = id % 97) — the synthetic-load
  * source a benchmark harness wants, and the repo's demonstration that
  * a connector can do the two things a 100 TB source MUST do:
  *
  *  1. **Filter pushdown to partition pruning** — `id` range predicates
  *     are accepted in [[SeqScanBuilder.pushFilters]] and used in
  *     [[SeqBatch.planInputPartitions]] to drop whole slices whose
  *     [lo, hi) range cannot match, and to clamp the surviving slices'
  *     bounds. Accepted filters are NOT re-evaluated per row — pushFilters
  *     returns only the unaccepted residuals, so Spark trusts the source
  *     for the accepted ones and correctness rests entirely on the bounds
  *     clamp in [[SeqBatch.planInputPartitions]] (loosen that clamp and
  *     rows leak; PlanSpec asserts both the pushed list and the pruned
  *     partition count, and the row-level results are oracle-gated).
  *  2. **Column pruning** — [[SeqScanBuilder.pruneColumns]] narrows the
  *     produced schema; a projection of `bucket` alone never
  *     materializes `id` into row storage.
  *
  * Usage:
  * {{{ spark.read.format("graft.sources.SequenceSource")
  *       .option("start", 0).option("end", 1000000)
  *       .option("slices", 32).load() }}}
  *
  * Reference analogue: the mock in-memory source family
  * (`report_engine.py`'s demo frames) — here as a first-class V2
  * connector instead of a fixture.
  */
class SequenceSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SequenceSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object SequenceSource {
  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", IntegerType, nullable = false)
}

private[sources] class SeqTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"sequence($start, $end, $slices)"
  override def schema(): StructType = SequenceSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(start, end, slices)
}

private[sources] class SeqScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SequenceSource.schema

  /** Accept `id` bounds (they prune slices); everything else stays with
    * Spark. EqualTo on id is a degenerate range.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThan("id", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case EqualTo("id", _: Long) => true
      case _ => false
    }
    pushed = accepted
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(start, end, slices, pushed, required)
}

private[sources] class SeqScan(start: Long, end: Long, slices: Int,
    pushed: Array[Filter], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SequenceScan[$start, $end) slices=$slices pushed=${pushed.mkString(",")}"

  /** Tightest [lo, hi) implied by the pushed id predicates. */
  private def bounds: (Long, Long) = {
    var lo = start
    var hi = end
    pushed.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    (lo, hi)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = bounds
    val per = math.max(1L, (end - start + slices - 1) / slices)
    // keep the ORIGINAL slice grid and drop/clamp slices against the
    // pushed bounds — the partition count visibly shrinks under a
    // selective predicate (the pruning PlanSpec measures)
    (0 until slices).iterator
      .map { i =>
        val s = start + i * per
        val e = math.min(end, s + per)
        (math.max(s, lo), math.min(e, hi))
      }
      .filter { case (s, e) => s < e }
      .map { case (s, e) => SeqPartition(s, e): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

private[sources] case class SeqPartition(lo: Long, hi: Long)
    extends InputPartition

private[sources] class SeqReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = sp.lo - 1
      override def next(): Boolean = { cur += 1; cur < sp.hi }
      override def get(): InternalRow = {
        val vals: Array[Any] = fields.map {
          case "id" => cur
          case "bucket" => (cur % 97).toInt
        }
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(
          vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
