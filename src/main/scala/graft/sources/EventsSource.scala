package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic events source — the engine's `from_map` idea
  * (reference `lib/io/io.py:528-697`, SURVEY §2.1) expressed at the
  * planner-integrated level: partition planning, per-partition readers,
  * and REAL column pruning (SupportsPushDownRequiredColumns — unrequested
  * columns are never generated).
  *
  * Deterministic splitmix64 generation keyed by row id: a 100 TB-scale
  * benchmark corpus with zero storage, reproducible anywhere.
  *
  *   spark.read.format("graft.sources.EventsSource")
  *     .option("rows", n).option("partitions", p).load()
  */
class EventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object EventsSource {
  val fullSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE")
  val eventTypes: Array[UTF8String] =
    Array("click", "view", "purchase", "signup", "error").map(UTF8String.fromString)

  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

private class EventsTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_events($rows)"
  override def schema(): StructType = EventsSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventsScanBuilder(rows, partitions)
}

private class EventsScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = EventsSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new EventsScan(rows, partitions, required)
}

private class EventsScan(rows: Long, partitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per)
      .map(s => EventsRange(s, math.min(rows, s + per)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new EventsReaderFactory(required)
}

private case class EventsRange(start: Long, end: Long) extends InputPartition

private class EventsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[EventsRange]
    // resolve each required column to a generator once, not per row
    val gens: Array[Long => Any] = required.fields.map(_.name match {
      case "event_id" => (id: Long) => id
      case "ts" => (id: Long) => // micros, one event/second from 2026-01-01
        1767225600000000L + id * 1000000L
      case "user_id" => (id: Long) => EventsSource.mix(id) % 1000 match {
        case n if n < 0 => n + 1000; case n => n
      }
      case "event_type" => (id: Long) =>
        EventsSource.eventTypes(((EventsSource.mix(id * 31) % 5 + 5) % 5).toInt)
      case "value" => (id: Long) =>
        ((EventsSource.mix(id * 17) >>> 11) * (1.0 / (1L << 53))) * 100.0
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(id)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
