package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/**
 * Offset-lag observability: the Structured Streaming analog of the
 * reference's Kafka offsets monitor, whose saturation signal is
 * (latest available offset - committed consumer offset) sampled per
 * partition (monitors/offsets/offsets_monitor.py:60-72). A pipeline
 * that keeps up shows bounded lag; a saturated one shows lag growing
 * linearly with wall time — the reference uses exactly this divergence
 * to find the max sustainable ingest rate.
 *
 * Per completed trigger this records input rows, input/processed
 * rates, and backlog = latestOffset - endOffset summed across sources
 * that report offsets numerically:
 *  - rate source: offsets are seconds since stream start, so lag is
 *    "seconds of generated data not yet consumed";
 *  - Kafka: offsets are per-partition message counts in a JSON object
 *    ({"topic":{"0":n,...}}), so lag is total messages behind — the
 *    same number the reference's monitor emits.
 *
 * One listener instance observes one session; samples are keyed by
 * query runId so concurrent queries don't interleave. Register via
 * `spark.streams.addListener`.
 */
final class ConsumerLagListener extends StreamingQueryListener {

  /** One completed trigger's worth of saturation signal. */
  final case class Sample(runId: String, batchId: Long, rows: Long,
      inputRowsPerSec: Double, processedRowsPerSec: Double, lag: Option[Long])

  private val buf = ArrayBuffer.empty[Sample]

  def samples(runId: java.util.UUID): Seq[Sample] =
    buf.synchronized(buf.filter(_.runId == runId.toString).toVector)

  def clear(): Unit = buf.synchronized(buf.clear())

  /** Sum the integer leaves of an offset blob: a bare long (rate
   *  source) is one value; a Kafka-style nested JSON object sums its
   *  per-partition leaf VALUES ({"topic":{"0":123,"1":4}} -> 127).
   *  Parsed as real JSON, not a colon-digits regex: a source whose
   *  offset embeds numerics inside strings (e.g. a timestamp
   *  "2024-01-01T00:00:12") must not contribute to the sum — string
   *  leaves are skipped. A blob with NO integral leaves is not
   *  offset-countable -> None; so is one with ANY non-integral (or
   *  long-overflowing) NUMERIC leaf — fractional offsets mean the
   *  blob isn't a message count, and a partial sum over the integral
   *  remainder would understate the backlog silently. */
  private[streaming] def offsetSum(s: String): Option[Long] = {
    if (s == null) None
    else {
      val t = s.trim
      if (t.matches("-?\\d+")) Some(t.toLong)
      else if (t.startsWith("{")) {
        try {
          val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
          def leaves(n: com.fasterxml.jackson.databind.JsonNode)
              : Iterator[com.fasterxml.jackson.databind.JsonNode] =
            if (n.isObject || n.isArray)
              scala.jdk.CollectionConverters.IteratorHasAsScala(n.elements()).asScala
                .flatMap(leaves)
            else Iterator(n)
          val nums = leaves(root).filter(_.isNumber).toList
          if (nums.exists(n => !n.isIntegralNumber || !n.canConvertToLong)) None
          else if (nums.isEmpty) None
          else Some(nums.map(_.asLong()).sum)
        } catch { case _: com.fasterxml.jackson.core.JacksonException => None }
      } else None
    }
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val lags = p.sources.toSeq.flatMap { s =>
      for {
        latest <- offsetSum(s.latestOffset)
        committed <- offsetSum(s.endOffset)
      } yield latest - committed
    }
    val sample = Sample(p.runId.toString, p.batchId, p.numInputRows,
      p.inputRowsPerSecond, p.processedRowsPerSecond,
      if (lags.isEmpty) None else Some(lags.sum))
    buf.synchronized { buf += sample; () }
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
}
