package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.model.{FlightState, ProximityWarning, ShardedReport}

/**
 * The `transformWithState` processor behind
 * [[StreamOps.proximityWarningsTws]]: one comparison shard's
 * DistFilterBolt loop (RollingFlightDist.java:213-256) over a
 * per-aircraft `MapState` — each arrival is compared against the
 * shard's owned flights as of that arrival, then installed as its
 * aircraft's freshest position when owned and strictly newer.
 *
 * Versus the flatMapGroupsWithState form, state is keyed PER AIRCRAFT
 * (`MapState[icao, FlightState]`): a trigger writes only the entries
 * it touched, and the store does point lookups instead of
 * (de)serializing the shard's whole map — the difference that matters
 * when one shard owns thousands of aircraft.
 *
 * `ttlMs` is the event-time silence TTL of
 * [[StreamOps.proximityWarningsPerEvent]]'s contract: entries stale
 * relative to an arrival are invisible to its comparisons, and entries
 * stale relative to the shard's event-time high-water mark are
 * point-deleted (`removeKey`) after the batch. Event-time, not
 * `TTLConfig`: the built-in TTL is processing-time-based, which would
 * make replays nondeterministic.
 */
private[streaming] class ProximityShardProcessor(thresholdKm: Double,
    steps: Int, stepSec: Int, strictSharding: Boolean, ttlMs: Long)
    extends StatefulProcessor[Int, ShardedReport, ProximityWarning] {

  @transient private var owned: MapState[String, FlightState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    owned = getHandle.getMapState[String, FlightState]("owned",
      Encoders.STRING, Encoders.product[FlightState], TTLConfig.NONE)

  override def handleInputRows(shard: Int, rows: Iterator[ShardedReport],
      timerValues: TimerValues): Iterator[ProximityWarning] = {
    val out = Vector.newBuilder[ProximityWarning]
    var cursor = Long.MinValue
    // deterministic replay-stable arrival order, as in the fMGWS form
    rows.toVector.sortBy(r => (r.posTime, r.icao)).foreach { r =>
      cursor = math.max(cursor, r.posTime)
      if (!strictSharding || !r.owned)
        owned.iterator().foreach { case (icao2, f) =>
          // difference form — never overflows, even at ttl = MaxValue
          if (r.posTime - f.posTime <= ttlMs)
            out ++= StreamOps.speculativeWarnings(
              r, icao2, f, thresholdKm, steps, stepSec)
        }
      if (r.owned &&
          (!owned.containsKey(r.icao) || owned.getValue(r.icao).posTime < r.posTime))
        owned.updateValue(r.icao,
          FlightState(r.posTime, r.lat, r.lng, r.spdKms, r.trak))
    }
    // physical eviction at the shard's event-time high-water mark
    // (matches StreamOps.processShardBatch; the freshest entry always
    // survives, so the cursor is monotone across batches)
    owned.iterator().foreach { case (_, f) =>
      cursor = math.max(cursor, f.posTime) }
    val stale = owned.iterator().collect {
      case (icao, f) if cursor - f.posTime > ttlMs => icao }.toVector
    stale.foreach(owned.removeKey)
    out.result().iterator
  }
}
