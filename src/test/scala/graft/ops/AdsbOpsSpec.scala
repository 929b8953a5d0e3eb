package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.AdsbPosition

class AdsbOpsSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    """{"Id":1,"Icao":"A1B2","PosTime":1500000000000,"Lat":42.7,"Long":-73.7,"Spd":310.0,"Trak":95.0,"Gnd":false},"""
  private val gndNull = // Gnd absent => treated airborne
    """{"Id":2,"Icao":"C3D4","PosTime":1500000000001,"Lat":40.0,"Long":-74.0,"Spd":250.0,"Trak":180.0},"""
  private val onGround =
    """{"Id":3,"Icao":"E5F6","PosTime":1500000000002,"Lat":41.0,"Long":-72.0,"Spd":5.0,"Trak":0.0,"Gnd":true},"""
  private val missingSpd =
    """{"Id":4,"Icao":"G7H8","PosTime":1500000000003,"Lat":41.0,"Long":-72.0,"Trak":0.0},"""
  private val noLatLng = """{"Id":5,"Icao":"I9J0","PosTime":1500000000004},"""
  private val garbage = "not json at all"

  test("parsePositions: strict guards mirror LatLongFilterBolt") {
    val df = Seq(good, gndNull, onGround, missingSpd, noLatLng, garbage).toDF("line")
    val out = AdsbOps.parsePositionsTyped(df, col("line")).collect().sortBy(_.icao)
    assert(out.map(_.icao).toSeq == Seq("A1B2", "C3D4"))
    assert(out.head == AdsbPosition("A1B2", 1500000000000L, 42.7, -73.7, 310.0, 95.0))
  }

  test("parsePositionsWithId keeps the wire Id for tiebreaking") {
    val df = Seq(good, onGround).toDF("line")
    val out = AdsbOps.parsePositionsWithId(df, col("line")).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "A1B2")))
  }

  test("adsbWireLines round-trips bit-exactly to adsbPositions minus the guard slivers") {
    import graft.queries.SyntheticSources
    // events-shaped fixture covering every guard residue: %37, %41, even/odd
    val events = (0L until 200L).map(i =>
      (i, i % 7, s"p$i", 0.37 + i * 1.113)).toDF("event_id", "user_id", "props", "value")
    val viaWire = AdsbOps.parsePositionsWithId(
        SyntheticSources.adsbWireLines(events), col("adsb"))
      .select(col("event_id"), col("icao"), col("posTime").as("pos_time"),
        col("lat"), col("lng"),
        (col("spd") * GeoOps.KnotToKmPerSec).as("spd_kms"), col("trak"))
    val direct = SyntheticSources.adsbPositions(events)
      .filter(col("event_id") % 37 =!= 0 && col("event_id") % 41 =!= 0)
      .select(viaWire.columns.map(col): _*)
    assert(viaWire.count() == 190) // 200 - 6 (%37) - 5 (%41), %0 once
    assert(viaWire.exceptAll(direct).isEmpty && direct.exceptAll(viaWire).isEmpty)
  }

  test("zoneOfLine: sentinel semantics mirror ZoneIndex") {
    val outOfRange =
      """{"Id":6,"Icao":"K1L2","PosTime":1,"Lat":85.0,"Long":0.0},"""
    val noTrailingComma = good.dropRight(1)
    val df = Seq(good, noLatLng, garbage, outOfRange, noTrailingComma).toDF("line")
    val zones = df.select(AdsbOps.zoneOfLine(col("line"))).as[String].collect()
    assert(zones.toSeq == Seq("18T", "no_latlng", "no_latlng", "undefined", "no_latlng"))
  }
}
