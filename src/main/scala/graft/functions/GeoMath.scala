package graft.functions

/**
 * Scalar geo math mirroring the reference bit-for-bit
 * (RollingFlightDist.java:157-187): same operations in the same order as
 * the column-expression forms in [[graft.ops.GeoOps]], so results are
 * identical whichever path a query uses.
 *
 * Exists so the fused flight-distance expression can emit ONE static
 * call from codegen: the inlined column version generates a ~28 KB
 * method that HotSpot refuses to JIT (8 KB bytecode limit), silently
 * running interpreted; this method is a few hundred bytes and JITs hot.
 */
object GeoMath {
  val EarthRadiusKm = 6378.137

  /** Haversine distance (km) between two points in degrees. */
  def haversineKm(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val sLat = Math.sin(Math.toRadians(lat2 - lat1) / 2)
    val sLng = Math.sin(Math.toRadians(lng2 - lng1) / 2)
    val a = sLat * sLat +
      Math.cos(Math.toRadians(lat1)) * Math.cos(Math.toRadians(lat2)) * sLng * sLng
    EarthRadiusKm * 2d * Math.atan2(Math.sqrt(a), Math.sqrt(1d - a))
  }

  /** Dead-reckoned destination latitude in RADIANS. */
  def destLatRad(latR: Double, relDist: Double, brgR: Double): Double =
    Math.asin(Math.sin(latR) * Math.cos(relDist) +
      Math.cos(latR) * Math.sin(relDist) * Math.cos(brgR))

  /** Dead-reckoned destination longitude in RADIANS (needs the already
   *  computed destination latitude). */
  def destLngRad(latR: Double, lngR: Double, relDist: Double, brgR: Double,
      lat2R: Double): Double =
    lngR + Math.atan2(
      Math.sin(brgR) * Math.sin(relDist) * Math.cos(latR),
      Math.cos(relDist) - Math.sin(latR) * Math.sin(lat2R))

  /**
   * Project two aircraft forward along their tracks and return the
   * haversine distance between the projected points (km). Mirrors
   * DistFilterBolt's computeLatLong + computeDist composition exactly,
   * including the degrees round-trip between the two stages.
   */
  def projectedDistKm(
      lat1: Double, lng1: Double, trak1: Double, distKm1: Double,
      lat2: Double, lng2: Double, trak2: Double, distKm2: Double): Double = {
    val p1LatR = destLatRad(Math.toRadians(lat1), distKm1 / EarthRadiusKm, Math.toRadians(trak1))
    val p1Lat = Math.toDegrees(p1LatR)
    val p1Lng = Math.toDegrees(destLngRad(
      Math.toRadians(lat1), Math.toRadians(lng1), distKm1 / EarthRadiusKm,
      Math.toRadians(trak1), p1LatR))
    val p2LatR = destLatRad(Math.toRadians(lat2), distKm2 / EarthRadiusKm, Math.toRadians(trak2))
    val p2Lat = Math.toDegrees(p2LatR)
    val p2Lng = Math.toDegrees(destLngRad(
      Math.toRadians(lat2), Math.toRadians(lng2), distKm2 / EarthRadiusKm,
      Math.toRadians(trak2), p2LatR))
    haversineKm(p1Lat, p1Lng, p2Lat, p2Lng)
  }
}
