package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * An ADMISSION-CONTROLLED deterministic sequence source — the local
 * stand-in for a Kafka topic read with `maxOffsetsPerTrigger` (and the
 * Spark analog of the reference's `max.spout.pending` backpressure
 * knob). Emits `value: bigint` rows 0..totalRows-1.
 *
 * Purpose: Spark's built-in local sources cannot exhibit BACKLOG — the
 * rate source consumes everything available each trigger and the file
 * source never reports a latest offset, so a consumer-lag monitor
 * (graft.streaming.ConsumerLagListener, mirroring the reference's
 * offsets monitor, monitors/offsets/offsets_monitor.py:60-72) reads 0
 * forever no matter how saturated the pipeline is. This source
 * separates AVAILABILITY (all `totalRows` at start, or accruing at
 * `rowsPerSecond`) from ADMISSION (`maxRowsPerTrigger` per batch), so
 * when admission < availability the committed offset trails the
 * reported latest offset and the lag series shows the backlog
 * draining — the exact saturation signal the reference measures
 * against Kafka.
 *
 * Options:
 *  - `totalRows`         total sequence length (required)
 *  - `maxRowsPerTrigger` admission cap per micro-batch (0 = unlimited)
 *  - `rowsPerSecond`     availability accrual rate (0 = all available
 *                        immediately: a pre-built backlog)
 *  - `numPartitions`     parallel read splits per micro-batch
 *                        (default 4; each batch's admitted range is
 *                        chunked evenly, like Kafka topic partitions)
 *
 * Usage: `spark.readStream.format(classOf[ThrottledSeqSource].getName)
 *   .option("totalRows", 50).option("maxRowsPerTrigger", 10).load()`
 */
class ThrottledSeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ThrottledSeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ThrottledSeqTable(new CaseInsensitiveStringMap(properties))
}

object ThrottledSeqSource {
  val schema: StructType = StructType(Seq(StructField("value", LongType, nullable = false)))
}

private[sources] class ThrottledSeqTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "throttled_seq"
  override def schema(): StructType = ThrottledSeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ThrottledSeqSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ThrottledSeqStream(
            totalRows = options.getLong("totalRows", 0L),
            maxRowsPerTrigger = options.getLong("maxRowsPerTrigger", 0L),
            rowsPerSecond = options.getLong("rowsPerSecond", 0L),
            numPartitions = options.getLong("numPartitions", 4L).toInt)
      }
    }
}

private[sources] case class SeqOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

private[sources] class ThrottledSeqStream(totalRows: Long,
    maxRowsPerTrigger: Long, rowsPerSecond: Long, numPartitions: Int = 4)
    extends MicroBatchStream with SupportsAdmissionControl {
  require(totalRows > 0, "totalRows must be set > 0")
  require(numPartitions > 0, "numPartitions must be > 0")
  private val startMs = System.currentTimeMillis()

  /** Rows available so far: the full sequence (pre-built backlog), or
   *  the accrual clock when rowsPerSecond is set. */
  private def available(): Long =
    if (rowsPerSecond <= 0) totalRows
    else math.min(totalRows,
      (System.currentTimeMillis() - startMs) / 1000 * rowsPerSecond)

  override def initialOffset(): Offset = SeqOffset(0L)
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerTrigger > 0) ReadLimit.maxRows(maxRowsPerTrigger)
    else ReadLimit.allAvailable()

  /** Admission: advance at most the read limit past `start`, never past
   *  availability — and never BEHIND `start`: after a checkpoint
   *  restart the accrual clock restarts at zero, so raw availability
   *  can momentarily trail the committed offset (offsets must be
   *  monotone; the batch is simply empty until the clock catches up). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].v
    val cap = limit match {
      case r: ReadMaxRows => s + r.maxRows()
      case _ => Long.MaxValue
    }
    SeqOffset(math.max(s, math.min(available(), cap)))
  }

  /** The TRUE head of the queue — what the progress reporter records as
   *  latestOffset, and therefore what lag is measured against. */
  override def reportLatestOffset(): Offset = SeqOffset(available())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  /** The admitted range, split into even chunks so a batch reads in
   *  parallel (empty chunks elided — a small batch may use fewer). */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].v
    val e = end.asInstanceOf[SeqOffset].v
    val n = e - s
    if (n <= 0) Array.empty
    else (0 until numPartitions).iterator.map { p =>
      SeqRange(s + n * p / numPartitions, s + n * (p + 1) / numPartitions)
    }.filter(r => r.until > r.from).map(r => r: InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new SeqReaderFactory
}

private[sources] case class SeqRange(from: Long, until: Long) extends InputPartition

private[sources] class SeqReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SeqRange(from, until) = partition.asInstanceOf[SeqRange]
    new PartitionReader[InternalRow] {
      private var cur = from - 1
      override def next(): Boolean = { cur += 1; cur < until }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](cur))
      override def close(): Unit = ()
    }
  }
}
