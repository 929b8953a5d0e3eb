package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Geo math from the flight topologies, as pure column expressions
 * (codegen-friendly — every node is a built-in math expression, no UDFs).
 *
 * Reference semantics:
 *  - haversine: RollingFlightDist.computeDist (RollingFlightDist.java:172-187)
 *  - dead-reckoning: RollingFlightDist.computeLatLong (RollingFlightDist.java:157-170)
 *  - grid zone: RollingGeoCount.ZoneIndex (RollingGeoCount.java:64-77)
 */
object GeoOps {

  /** Mean earth radius used by the reference (RollingFlightDist.java:130). */
  val EarthRadiusKm = 6378.137

  /** Knots -> km/s (RollingFlightDist.java:131). */
  val KnotToKmPerSec = 0.000514444

  /** Great-circle distance in km between two (degree) points — haversine. */
  def haversineKm(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLng = sin(radians(lng2 - lng1) / 2)
    val a = sLat * sLat + cos(radians(lat1)) * cos(radians(lat2)) * sLng * sLng
    lit(EarthRadiusKm) * lit(2d) * atan2(sqrt(a), sqrt(lit(1d) - a))
  }

  /**
   * Dead-reckoned destination point: start (degrees), initial bearing
   * (degrees), distance (km) -> struct(lat, lng) in degrees.
   */
  def destinationPoint(lat: Column, lng: Column, bearing: Column, distKm: Column): Column = {
    val latR = radians(lat)
    val lngR = radians(lng)
    val brgR = radians(bearing)
    val relDist = distKm / lit(EarthRadiusKm)
    val lat2 = asin(sin(latR) * cos(relDist) + cos(latR) * sin(relDist) * cos(brgR))
    val lng2 = lngR + atan2(
      sin(brgR) * sin(relDist) * cos(latR),
      cos(relDist) - sin(latR) * sin(lat2))
    struct(degrees(lat2).as("lat"), degrees(lng2).as("lng"))
  }

  private val ZoneLetters = "CDEFGHIJKLMNOPQRSTUVWX"

  /**
   * UTM-like grid zone string for a (degree) point: longitude band number
   * (6-degree bands, 1-based from -180) + latitude letter (8-degree bands
   * C..X, with I/O present in the reference's arithmetic alphabet).
   * Out-of-range coordinates -> "undefined"; null lat/lng -> "no_latlng".
   *
   * Mirrors ZoneIndex exactly, including the mode-3 'X' special case for
   * [72, 84). The reference's `(int)` casts truncate toward zero; all
   * operands are non-negative there, so `floor` is equivalent.
   */
  def zoneOf(lat: Column, lng: Column): Column = {
    val letterIdx =
      when(lat < -32, floor((lat + 80) / 8))
        .when(lat < 8, lit(7) + floor((lat + 32) / 8))
        .when(lat < 72, lit(13) + floor((lat - 8) / 8))
        .otherwise(lit(21))
    val letter = lit(ZoneLetters).substr((letterIdx + 1).cast("int"), lit(1))
    val band = (lit(1) + floor((lng + 180) / 6)).cast("int").cast("string")
    when(lat.isNull || lng.isNull, lit("no_latlng"))
      .when(lat >= -80 && lat < 84 && lng >= -180 && lng < 180, concat(band, letter))
      .otherwise(lit("undefined"))
  }
}
