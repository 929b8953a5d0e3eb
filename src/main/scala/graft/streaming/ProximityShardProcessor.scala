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
 */
private[streaming] class ProximityShardProcessor(thresholdKm: Double,
    steps: Int, stepSec: Int, strictSharding: Boolean)
    extends StatefulProcessor[Int, ShardedReport, ProximityWarning] {

  @transient private var owned: MapState[String, FlightState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    owned = getHandle.getMapState[String, FlightState]("owned",
      Encoders.STRING, Encoders.product[FlightState], TTLConfig.NONE)

  override def handleInputRows(shard: Int, rows: Iterator[ShardedReport],
      timerValues: TimerValues): Iterator[ProximityWarning] = {
    val out = Vector.newBuilder[ProximityWarning]
    // deterministic replay-stable arrival order, as in the fMGWS form
    rows.toVector.sortBy(r => (r.posTime, r.icao)).foreach { r =>
      if (!strictSharding || !r.owned)
        owned.iterator().foreach { case (icao2, f) =>
          out ++= StreamOps.speculativeWarnings(
            r, icao2, f, thresholdKm, steps, stepSec)
        }
      if (r.owned &&
          (!owned.containsKey(r.icao) || owned.getValue(r.icao).posTime < r.posTime))
        owned.updateValue(r.icao,
          FlightState(r.posTime, r.lat, r.lng, r.spdKms, r.trak))
    }
    out.result().iterator
  }
}
