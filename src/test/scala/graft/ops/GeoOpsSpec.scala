package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeoOpsSpec extends SparkSpec {
  import spark.implicits._

  private def zone(lat: java.lang.Double, lng: java.lang.Double): String =
    Seq((lat, lng)).toDF("lat", "lng")
      .select(GeoOps.zoneOf(col("lat"), col("lng")).as("z")).as[String].head()

  test("zoneOf band boundaries (RollingGeoCount.java:64-77)") {
    assert(zone(42.7, -73.7) == "18T") // Albany NY — real UTM zone
    assert(zone(-80.0, -180.0) == "1C") // lower corner
    assert(zone(-33.0, 0.0) == "31H") // mode 0 top
    assert(zone(-32.0, 0.0) == "31J") // mode 1 bottom
    assert(zone(7.99, 0.0) == "31N") // mode 1 top
    assert(zone(8.0, 0.0) == "31P") // mode 2 bottom
    assert(zone(71.99, 0.0) == "31W") // mode 2 top
    assert(zone(72.0, 0.0) == "31X") // mode 3 'X' special case
    assert(zone(83.99, 179.99) == "60X") // upper corner
    assert(zone(84.0, 0.0) == "undefined") // out of range north
    assert(zone(0.0, 180.0) == "undefined") // out of range east
    assert(zone(null, 0.0) == "no_latlng")
  }

  test("haversineKm matches known distances and is symmetric") {
    val df = Seq((40.6413, -73.7781, 40.7769, -73.8740)).toDF("a", "b", "c", "d")
    val fwd = df.select(GeoOps.haversineKm(col("a"), col("b"), col("c"), col("d"))).as[Double].head()
    val rev = df.select(GeoOps.haversineKm(col("c"), col("d"), col("a"), col("b"))).as[Double].head()
    assert(math.abs(fwd - 17.0) < 1.0) // JFK -> LGA ~ 17 km
    assert(fwd == rev)
    val self = df.select(GeoOps.haversineKm(col("a"), col("b"), col("a"), col("b"))).as[Double].head()
    assert(self == 0.0)
  }

  test("destinationPoint dead-reckons due north ~1 degree per 111.3 km") {
    val df = Seq((40.0, -73.0)).toDF("lat", "lng")
    val p = df.select(GeoOps.destinationPoint(col("lat"), col("lng"), lit(0.0), lit(111.3194)).as("p"))
      .select($"p.lat", $"p.lng").as[(Double, Double)].head()
    assert(math.abs(p._1 - 41.0) < 0.01)
    assert(math.abs(p._2 - -73.0) < 1e-9)
  }

  test("destinationPoint at zero distance is identity (to ulps)") {
    val df = Seq((37.5, 122.3)).toDF("lat", "lng")
    val p = df.select(GeoOps.destinationPoint(col("lat"), col("lng"), lit(90.0), lit(0.0)).as("p"))
      .select($"p.lat", $"p.lng").as[(Double, Double)].head()
    assert(math.abs(p._1 - 37.5) < 1e-9 && math.abs(p._2 - 122.3) < 1e-9)
  }
}
