package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * S2/S3 — the reference's in-process `SourceFunction` / wrapped
 * `GeneratorSource` (one Event per tick from a PHP generator, with the
 * source checkpoint protocol replaying a token on restart; reference:
 * src/Scheduler/SourceFunction.php:268-337,
 * src/Library/Source/GeneratorSource.php:236-282,
 * src/functions.php:99-105 checkpoint helper) as a REAL DataSource V2
 * micro-batch stream:
 *
 * {{{
 * spark.readStream
 *   .format(classOf[GeneratorSourceProvider].getName)
 *   .option("rowsPerBatch", 100)  // emitted per trigger
 *   .option("maxRows", 1000)      // sequence end (default unbounded)
 *   .option("eventType", "gen")
 *   .option("startEpochSec", 1704067200)  // event-time base
 *   .option("intervalSec", 1)             // event-time step per row
 *   .load()                       // → the canonical Event schema
 * }}}
 *
 * The emitted stream is the deterministic sequence i = 0,1,2,…: event
 * type `eventType`, id = i, datetime = start + i·interval, payload
 * {"seq" → i} — the Spark twin of the reference's CountToTen test
 * source (tests/scripts/Source/CountToTen.php). Offsets are the
 * consumed prefix length, stored in the checkpoint log, so a restarted
 * query resumes mid-sequence without duplication — S5's checkpoint
 * protocol for free, exactly as SURVEY §2.1 maps it.
 *
 * Scale note: each micro-batch splits into `numPartitions` range
 * partitions; generation is pure compute from (start, end) bounds, so
 * no driver state ships to executors beyond the six numbers.
 */
class GeneratorSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeneratorSourceProvider.EventSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GeneratorTable(new CaseInsensitiveStringMap(properties))
}

object GeneratorSourceProvider {
  /** Canonical Event schema (graft.model.Event). */
  val EventSchema: StructType = StructType.fromDDL(
    "event STRING, id STRING, datetime TIMESTAMP, receivedTime TIMESTAMP, payload MAP<STRING,STRING>")
}

private[sources] class GeneratorTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_generator"
  override def schema(): StructType = GeneratorSourceProvider.EventSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = GeneratorSourceProvider.EventSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GeneratorMicroBatchStream(
          rowsPerBatch = options.getLong("rowsPerBatch", 100L),
          maxRows = options.getLong("maxRows", Long.MaxValue),
          eventType = options.getOrDefault("eventType", "gen"),
          startEpochSec = options.getLong("startEpochSec", 1704067200L),
          intervalSec = options.getLong("intervalSec", 1L),
          numPartitions = options.getLong("numPartitions", 4L).toInt)
    }
}

/** Offset = length of the emitted prefix (events 0 until n). */
private[sources] case class GenOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class GeneratorMicroBatchStream(
    rowsPerBatch: Long, maxRows: Long, eventType: String,
    startEpochSec: Long, intervalSec: Long, numPartitions: Int)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = GenOffset(0L)
  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)

  /** Advance by one batch from the ENGINE-SUPPLIED start — the
   * admission-control form receives the restored offset on restart, so
   * the stream itself is stateless and can never regress behind the
   * checkpoint (the plain latestOffset() has no start and forces the
   * source to guess; Spark's own rate/Kafka sources use this API). The
   * restored-start handoff is the reference's PHPEC_CHECKPOINT env
   * replay (src/Scheduler/SourceExecutionCoordinator.php:200-205). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    GenOffset(math.min(start.asInstanceOf[GenOffset].n + rowsPerBatch, maxRows))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GenOffset].n
    val hi = end.asInstanceOf[GenOffset].n
    if (hi <= lo) Array.empty
    else {
      val span = hi - lo
      val chunk = math.max(1L, (span + numPartitions - 1) / numPartitions)
      (lo until hi by chunk).map(s =>
        GenPartition(s, math.min(s + chunk, hi), eventType, startEpochSec, intervalSec)
          : InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new GenReader(p.asInstanceOf[GenPartition])
    }

  override def stop(): Unit = ()
}

private[sources] case class GenPartition(
    start: Long, end: Long, eventType: String,
    startEpochSec: Long, intervalSec: Long) extends InputPartition

private[sources] class GenReader(p: GenPartition) extends PartitionReader[InternalRow] {
  private var i = p.start - 1
  override def next(): Boolean = { i += 1; i < p.end }
  override def get(): InternalRow = {
    val seq = UTF8String.fromString(i.toString)
    InternalRow(
      UTF8String.fromString(p.eventType),
      seq,
      (p.startEpochSec + i * p.intervalSec) * 1000000L, // µs
      null,
      ArrayBasedMapData(
        Array[Any](UTF8String.fromString("seq")), Array[Any](seq)))
  }
  override def close(): Unit = ()
}
