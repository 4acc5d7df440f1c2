package graft.sources

import java.time.{LocalDateTime, ZoneOffset}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, XXH64}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the synthetic event generator — the
  * `spark.read.format("graft-events")` surface over the SAME
  * deterministic draws as [[EventGenerator.batchEvents]] (spec-pinned
  * row-for-row): a scan whose input partitions each generate a disjoint
  * id range, so a 10⁹-row load fans out across executors with zero I/O
  * and zero driver materialization.
  *
  * Options: `rows` (total, default 10⁵), `partitions` (splits, default
  * 8), `start` ("yyyy-MM-dd HH:mm:ss" UTC, default 2024-01-01).
  *
  * Why a DSv2 source when column expressions over `range()` already
  * scale: the connector exercises Spark's source extension surface the
  * way an external system integration would —
  *   - partition PLANNING is explicit (`planInputPartitions`), the unit
  *     a real connector maps to shards/splits/offsets;
  *   - column pruning arrives via `SupportsPushDownRequiredColumns`,
  *     and the reader computes ONLY the requested columns (a pruned
  *     scan of event_id skips Box-Muller, md5-free status draws, the
  *     lot) — the DSv2 analog of parquet's ReadSchema;
  *   - the row-generation kernel is plain JVM code against
  *     `InternalRow`, the shape a JNI/Kafka/HTTP reader plugs into.
  *
  * Determinism contract (same as the column form): every value derives
  * from `XXH64(event_id, salt)` — identical across retries, partition
  * re-planning, and speculative re-execution, so the source is safe
  * under exactly-once recovery semantics.
  */
class EventsV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new EventsV2Table
}

object EventsV2 {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("metric", DoubleType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false)))

  private val M = 1000000007L
  private val Sources =
    Array("web", "mobile", "api", "device", "service-a", "service-b")

  private def pmod(h: Long, p: Long): Long = { val r = h % p; if (r < 0) r + p else r }

  /** Uniform [0,1) from the SAME chained xxhash64 Spark's
    * `xxhash64(id, lit(salt))` computes: seed 42, long then int links.
    */
  private def u(id: Long, salt: Int): Double =
    pmod(XXH64.hashInt(salt, XXH64.hashLong(id, 42L)), M).toDouble / M

  /** One generated row, mirroring [[EventGenerator.withEventColumns]]
    * expression for expression (Box-Muller, outlier band, correlated
    * status, source pick, user id). `round(x, 2)` is Spark's
    * BigDecimal-HALF_UP semantics, reproduced verbatim.
    */
  private[sources] def genRow(id: Long, startMicros: Long,
                              fields: Array[Int]): InternalRow = {
    lazy val metric: Double = {
      val isOutlier = u(id, 3) < 0.05
      val raw =
        if (isOutlier) 100.0 + u(id, 4) * 400.0
        else {
          val u1 = math.max(u(id, 1), 1e-12)
          val u2 = u(id, 2)
          val normal =
            math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
          math.max(0.0, normal * 15.0 + 50.0)
        }
      java.math.BigDecimal.valueOf(raw)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val row = new GenericInternalRow(fields.length)
    var i = 0
    while (i < fields.length) {
      val v: Any = fields(i) match {
        case 0 => id
        case 1 => startMicros + id * 250000L // +0.25 s per event
        case 2 =>
          UTF8String.fromString(
            Sources(pmod(XXH64.hashLong(id, 42L), 6L).toInt))
        case 3 => metric
        case 4 =>
          val d = u(id, 5)
          val s =
            if (metric > 100) { if (d < 0.3) "ok" else if (d < 0.7) "warning" else "error" }
            else { if (d < 0.8) "ok" else if (d < 0.95) "warning" else "error" }
          UTF8String.fromString(s)
        case 5 =>
          UTF8String.fromString(
            "user_" + (pmod(XXH64.hashInt(6, XXH64.hashLong(id, 42L)), 9000L)
              + 1000L))
      }
      row.update(i, v)
      i += 1
    }
    row
  }
}

private class EventsV2Table extends Table with SupportsRead {
  override def name(): String = "graft_events"
  override def schema(): StructType = EventsV2.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
                         TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventsScanBuilder(
      options.getLong("rows", 100000L),
      options.getInt("partitions", 8),
      LocalDateTime
        .parse(options.getOrDefault("start", "2024-01-01 00:00:00")
          .replace(' ', 'T'))
        .toInstant(ZoneOffset.UTC)
        .toEpochMilli * 1000L,
      options.getLong("rowsPerBatch", 1000L))
}

private class EventsScanBuilder(rows: Long, partitions: Int,
                                startMicros: Long, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = EventsV2.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projections (count(*)) still need row COUNTS; keep a
    // zero-field schema and emit empty rows
    required = requiredSchema

  override def build(): Scan =
    EventsScan(rows, partitions, startMicros, required, rowsPerBatch)
}

/** Streaming offset: the id high-water mark (exclusive). Deterministic
  * content + monotone offsets = exactly-once under checkpoint recovery.
  */
private case class EventsOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

private case class EventsRange(start: Long, end: Long) extends InputPartition

private case class EventsScan(rows: Long, partitions: Int, startMicros: Long,
                              required: StructType,
                              rowsPerBatch: Long = 1000L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Micro-batch form: each trigger advances the id high-water mark by
    * `rowsPerBatch` until `rows` is exhausted — the offset log makes the
    * generated stream REPLAYABLE (a restarted query re-plans exactly the
    * uncommitted id range, and the deterministic kernel regenerates
    * identical rows: the exactly-once contract a Kafka source gets from
    * broker offsets, here from arithmetic).
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsAdmissionControl {
      override def initialOffset(): Offset = EventsOffset(0L)
      // admission-control form: paced from the CURRENT start offset, so
      // a checkpoint-restarted query resumes exactly where the offset
      // log says — no driver-side mutable high-water mark to diverge.
      // The ReadLimit is HONORED: the default limit paces micro-batches
      // at rowsPerBatch, while allAvailable (Trigger.AvailableNow /
      // Once wrappers) gets the full remaining range — ignoring it
      // would end an AvailableNow run after one slice, silently short
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val s0 = start.asInstanceOf[EventsOffset].id
        limit match {
          case _: ReadAllAvailable => EventsOffset(rows)
          case r: ReadMaxRows =>
            EventsOffset(math.min(s0 + r.maxRows(), rows))
          case _ => EventsOffset(math.min(s0 + rowsPerBatch, rows))
        }
      }
      override def getDefaultReadLimit: ReadLimit =
        ReadLimit.maxRows(rowsPerBatch)
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "admission-control latestOffset(start, limit) is the paced form")
      override def deserializeOffset(json: String): Offset =
        EventsOffset(json.trim.toLong)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()

      override def planInputPartitions(start: Offset,
                                       end: Offset): Array[InputPartition] = {
        val s0 = start.asInstanceOf[EventsOffset].id
        val e0 = end.asInstanceOf[EventsOffset].id
        // one rowsPerBatch-sized slice per partition within the range
        val slices = ((e0 - s0) + rowsPerBatch - 1) / rowsPerBatch
        Array.tabulate[InputPartition](math.max(1, slices).toInt) { i =>
          val a = s0 + i * rowsPerBatch
          EventsRange(a, math.min(a + rowsPerBatch, e0))
        }.filter { case r: EventsRange => r.end > r.start }
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        val fields = required.fieldNames.map(EventsV2.schema.fieldIndex)
        EventsReaderFactory(startMicros, fields)
      }
    }
  override def description(): String =
    s"graft-events rows=$rows partitions=$partitions " +
      s"ReadSchema: ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, partitions)
    // contiguous ranges, remainder spread over the first partitions —
    // equal ±1 split like range()'s
    Array.tabulate[InputPartition](n) { p =>
      val base = rows / n
      val extra = rows % n
      val start = p * base + math.min(p, extra)
      val len = base + (if (p < extra) 1 else 0)
      EventsRange(start, start + len)
    }.filter { case r: EventsRange => r.end > r.start }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // field index map resolved once on the driver, shipped to readers
    val fields = required.fieldNames.map(EventsV2.schema.fieldIndex)
    EventsReaderFactory(startMicros, fields)
  }
}

private case class EventsReaderFactory(startMicros: Long, fields: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[EventsRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow =
        EventsV2.genRow(id, startMicros, fields)
      override def close(): Unit = ()
    }
  }
}
