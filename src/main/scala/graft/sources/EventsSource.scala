package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic events source — the engine's `from_map` idea
  * (reference `lib/io/io.py:528-697`, SURVEY §2.1) expressed at the
  * planner-integrated level: partition planning, per-partition readers,
  * and REAL pushdown across all four DSv2 axes:
  *
  *   - columns (SupportsPushDownRequiredColumns) — unrequested columns
  *     are never generated;
  *   - filters (SupportsPushDownFilters) — event_id range predicates
  *     narrow the generated id interval BEFORE partition planning, so a
  *     selective scan plans proportionally fewer/smaller partitions
  *     (the DSv2 analog of parquet row-group pruning; event_id == row
  *     id, so bounds are exact and the filters are fully absorbed);
  *   - limit (SupportsPushDownLimit) — a pushed LIMIT truncates the id
  *     interval exactly (generation is ordered and deterministic), and
  *     `isPartiallyPushed = false` removes Spark's post-scan limit;
  *   - aggregates (SupportsPushDownAggregates) — global COUNT(*) /
  *     COUNT(col) / MIN / MAX over the id-monotone columns (event_id,
  *     ts) evaluate in CLOSED FORM from the generator equations: a
  *     count over a 10^12-row synthetic corpus is O(1), zero rows
  *     generated. Hash-mixed columns (user_id, event_type, value) are
  *     not id-monotone and are declined — Spark falls back to a real
  *     scan for them, which is the correctness-preserving default.
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
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("ratePerBatch", "1000").toLong)
}

object EventsSource {
  val fullSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE")
  val eventTypes: Array[UTF8String] =
    Array("click", "view", "purchase", "signup", "error").map(UTF8String.fromString)

  /** micros at 2026-01-01T00:00Z; one event per second from there */
  val tsBaseMicros: Long = 1767225600000000L
  @inline def tsMicros(id: Long): Long = tsBaseMicros + id * 1000000L

  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

private class EventsTable(rows: Long, partitions: Int, ratePerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_events($rows)"
  override def schema(): StructType = EventsSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventsScanBuilder(rows, partitions, ratePerBatch)
}

private class EventsScanBuilder(rows: Long, partitions: Int,
    ratePerBatch: Long = 1000L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var required: StructType = EventsSource.fullSchema
  // generated id interval [lo, hi) after filter/limit pushdown
  private var lo: Long = 0L
  private var hi: Long = rows
  private var accepted: Array[Filter] = Array.empty
  // closed-form results of a completely-pushed global aggregate, with
  // the schema Spark expects the scan to emit (positional match)
  private var agg: Option[(StructType, InternalRow)] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Only a single-column reference counts as a generator column. */
  private def refName(e: V2Expression): Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 =>
      Some(f.fieldNames()(0))
    case _ => None
  }

  /** ts is id-monotone (one event per second from the base), so time
    * predicates translate to EXACT id bounds — floorDiv/ceilDiv handle
    * sub-second constants and pre-base times. */
  private def tsMicrosOf(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }
  private def idFloor(us: Long): Long = // greatest id with ts(id) <= us
    Math.floorDiv(us - EventsSource.tsBaseMicros, 1000000L)
  private def idCeil(us: Long): Long = // least id with ts(id) >= us
    -Math.floorDiv(-(us - EventsSource.tsBaseMicros), 1000000L)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case EqualTo("event_id", _: Number) => true
      case GreaterThan("event_id", _: Number) => true
      case GreaterThanOrEqual("event_id", _: Number) => true
      case LessThan("event_id", _: Number) => true
      case LessThanOrEqual("event_id", _: Number) => true
      case EqualTo("ts", v) => tsMicrosOf(v).isDefined
      case GreaterThan("ts", v) => tsMicrosOf(v).isDefined
      case GreaterThanOrEqual("ts", v) => tsMicrosOf(v).isDefined
      case LessThan("ts", v) => tsMicrosOf(v).isDefined
      case LessThanOrEqual("ts", v) => tsMicrosOf(v).isDefined
      // every generated column is non-null, so IsNotNull is a tautology
      // this source absorbs for free (it otherwise blocks agg pushdown:
      // Spark only pushes aggregates when NO post-scan filter remains)
      case IsNotNull(_) => true
      case _ => false
    }
    ok.foreach {
      case EqualTo("event_id", v: Number) =>
        lo = math.max(lo, v.longValue()); hi = math.min(hi, v.longValue() + 1)
      case GreaterThan("event_id", v: Number) => lo = math.max(lo, v.longValue() + 1)
      case GreaterThanOrEqual("event_id", v: Number) => lo = math.max(lo, v.longValue())
      case LessThan("event_id", v: Number) => hi = math.min(hi, v.longValue())
      case LessThanOrEqual("event_id", v: Number) => hi = math.min(hi, v.longValue() + 1)
      case EqualTo("ts", v) => tsMicrosOf(v).foreach { us =>
        if ((us - EventsSource.tsBaseMicros) % 1000000L == 0L) {
          lo = math.max(lo, idFloor(us)); hi = math.min(hi, idFloor(us) + 1)
        } else hi = math.min(hi, 0L) // between ticks: empty range
      }
      case GreaterThan("ts", v) => tsMicrosOf(v).foreach(us =>
        lo = math.max(lo, idFloor(us) + 1))
      case GreaterThanOrEqual("ts", v) => tsMicrosOf(v).foreach(us =>
        lo = math.max(lo, idCeil(us)))
      case LessThan("ts", v) => tsMicrosOf(v).foreach(us =>
        hi = math.min(hi, idCeil(us))) // ids strictly below us
      case LessThanOrEqual("ts", v) => tsMicrosOf(v).foreach(us =>
        hi = math.min(hi, idFloor(us) + 1))
      case _ => () // IsNotNull and anything partition() let through
    }
    lo = math.max(lo, 0L)
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, math.addExact(lo, limit.toLong)); true
  }
  /** Generation is ordered and exact, so the pushed limit is the whole
    * limit — Spark drops its post-scan GlobalLimit. */
  override def isPartiallyPushed(): Boolean = false

  /** Closed forms exist only for the id-monotone columns. Returns the
    * (schema, row) the scan emits when every aggregate translates. */
  private def translate(a: Aggregation): Option[(StructType, InternalRow)] = {
    if (a.groupByExpressions().nonEmpty) return None
    val n = math.max(0L, hi - lo)
    val fields = Vector.newBuilder[StructField]
    val values = Vector.newBuilder[Any]
    a.aggregateExpressions().foreach { f: AggregateFunc =>
      f match {
        case _: CountStar =>
          fields += StructField("count(*)", LongType, nullable = false)
          values += n
        case c: Count if !c.isDistinct &&
            refName(c.column).exists(EventsSource.fullSchema.fieldNames.contains) =>
          // all generated columns are non-null: COUNT(col) == COUNT(*)
          fields += StructField(s"count", LongType, nullable = false)
          values += n
        case m: Min => refName(m.column) match {
          case Some("event_id") =>
            fields += StructField("min(event_id)", LongType)
            values += (if (n == 0L) null else lo)
          case Some("ts") =>
            fields += StructField("min(ts)", TimestampType)
            values += (if (n == 0L) null else EventsSource.tsMicros(lo))
          case _ => return None
        }
        case m: Max => refName(m.column) match {
          case Some("event_id") =>
            fields += StructField("max(event_id)", LongType)
            values += (if (n == 0L) null else hi - 1)
          case Some("ts") =>
            fields += StructField("max(ts)", TimestampType)
            values += (if (n == 0L) null else EventsSource.tsMicros(hi - 1))
          case _ => return None
        }
        case _ => return None
      }
    }
    Some((StructType(fields.result()), InternalRow.fromSeq(values.result())))
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    translate(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    translate(aggregation) match {
      case some @ Some(_) => agg = some; true
      case None => false
    }
  }

  override def build(): Scan = agg match {
    case Some((schema, row)) => new EventsAggScan(schema, row, describePush)
    case None => new EventsScan(lo, hi, rows, partitions, required,
      describePush, ratePerBatch)
  }

  private def describePush: String = {
    val fs = if (accepted.isEmpty) "" else accepted.mkString("[", ", ", "]")
    s"idRange=[$lo,$hi)${if (fs.isEmpty) "" else s", PushedFilters: $fs"}"
  }
}

/** A completely-pushed global aggregate: one partition, one closed-form
  * row, zero generated events. */
private class EventsAggScan(schema: StructType, row: InternalRow,
    pushDesc: String) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_events PushedAggregates(closed-form) $pushDesc"
  override def planInputPartitions(): Array[InputPartition] =
    Array(EventsRange(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    new EventsAggReaderFactory(row)
}

private class EventsAggReaderFactory(row: InternalRow)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

private class EventsScan(lo: Long, hi: Long, tableRows: Long,
    partitions: Int, required: StructType, pushDesc: String,
    ratePerBatch: Long = 1000L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft_events $pushDesc"
  /** Micro-batch face: the same deterministic id space drained
    * `ratePerBatch` ids per trigger — a rate-limited, REPLAYABLE event
    * stream with zero storage. Offsets are plain row ids, so restart
    * recovery is exact: the checkpointed offset resumes generation at
    * the precise row, and a re-planned batch regenerates byte-identical
    * rows (the generator is pure). Column pruning and the id/ts range
    * pushdown apply to the stream exactly as to the batch scan. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EventsMicroBatchStream(lo, hi, partitions, ratePerBatch, required)
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    // split grain comes from the UNFILTERED table, so a pushed id-range
    // plans proportionally fewer partitions — the DSv2 analog of
    // parquet file/row-group pruning (a pruned scan must not re-shred
    // its remnant into the full partition count)
    val per = math.max(1L, (tableRows + partitions - 1) / partitions)
    (lo until hi by per)
      .map(s => EventsRange(s, math.min(hi, s + per)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new EventsReaderFactory(required)
}

private case class EventsRange(start: Long, end: Long) extends InputPartition

private case class EventsOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

private class EventsMicroBatchStream(lo: Long, hi: Long, partitions: Int,
    rate: Long, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
  // Trigger.AvailableNow, FIRST-CLASS: the engine calls
  // prepareForTriggerAvailableNow() once at query start and then drains
  // rate-chunked batches until reportLatestOffset() is reached. Without
  // this interface Spark falls back to wrapping/single-batch heuristics
  // for "unsupported" sources — a path that proved timing-sensitive on a
  // loaded box (observed once: a restarted AvailableNow drain deciding
  // "no new data" at the recovered offset). The drain target is captured
  // here: for this synthetic table the id space [lo, hi) is static, so
  // the capture pins the query-start snapshot the contract asks for.
  private var availableNowTarget: Long = hi
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = hi
  // Admission control, not a mutable planned-counter: the engine hands
  // THIS trigger's start offset (restored from the checkpoint on
  // restart) and the stream advances at most `rate` ids past it — a
  // stateless function, so restart resumes at exactly the committed id
  // (the counter pattern is restart-blind: the engine compares
  // serialized offsets before ever calling deserializeOffset, sees
  // "latest == committed", and declares no new data).
  private def idOf(o: Offset): Long = o match {
    case EventsOffset(id) => id
    case other => other.json().trim.toLong
  }
  override def initialOffset(): Offset = EventsOffset(lo)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rate)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = math.max(lo, idOf(start))
    val cap = availableNowTarget // == hi unless an AvailableNow drain pinned it
    val step = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        m.maxRows()
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable =>
        math.max(0L, cap - s) // drain-everything triggers take the rest
      case _ => rate
    }
    EventsOffset(math.min(cap, math.addExact(s, step)))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: use latestOffset(start, limit)")
  override def reportLatestOffset(): Offset = EventsOffset(availableNowTarget)
  override def deserializeOffset(json: String): Offset =
    EventsOffset(json.trim.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventsOffset].id
    val e = end.asInstanceOf[EventsOffset].id
    if (e <= s) return Array.empty
    val per = math.max(1L, (e - s + partitions - 1) / partitions)
    (s until e by per)
      .map(x => EventsRange(x, math.min(e, x + per)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new EventsReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class EventsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[EventsRange]
    // resolve each required column to a generator once, not per row
    val gens: Array[Long => Any] = required.fields.map(_.name match {
      case "event_id" => (id: Long) => id
      case "ts" => (id: Long) => EventsSource.tsMicros(id)
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
