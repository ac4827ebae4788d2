package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives over plain (lat, lon) double columns — the
  * subset of the reference's geospatial family (ref
  * expr/types/geospatial.py) that needs no geometry type: point
  * distance, bounding boxes, grid cells, and a cell-bucketed radius
  * join. Everything is pure column math (codegen'd builtins), so any
  * SQL engine can replicate the semantics — which is what puts these
  * under the DuckDB oracle without a spatial extension.
  *
  * Scale design: the radius join NEVER builds the cross product — both
  * sides bucket into integer grid cells (one narrow long column), the
  * probe side expands to its 3x3 neighborhood, and candidates come from
  * one equi-join shuffle before the exact haversine verify. Cell size
  * must satisfy `cellDeg >= radiusKm / (111 * cos(maxAbsLat))` so a
  * radius disc never spans more than the neighborhood.
  */
object Geo {

  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km (haversine). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val dphi = radians(lat2 - lat1) / 2
    val dlmb = radians(lon2 - lon1) / 2
    val a = pow(sin(dphi), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlmb), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Point-in-bounding-box predicate. */
  def inBbox(lat: Column, lon: Column, latMin: Double, latMax: Double,
      lonMin: Double, lonMax: Double): Column =
    lat.between(latMin, latMax) && lon.between(lonMin, lonMax)

  /** WGS-84 GEODESIC (spheroid) distance in METERS by Vincenty's
    * inverse formula — the geodesic tier the haversine family
    * approximates to ~0.5% (ref geospatial `distance` on a geography
    * type). The λ iteration is PINNED at `iters` rounds with no
    * convergence break: four rounds reach sub-millimeter agreement for
    * non-antipodal pairs, and a FIXED count means an oracle can mirror
    * the exact arithmetic by unrolling the loop (the same trick that
    * oracles the gradient-descent logreg). Expressions deliberately
    * use explicit `x*x` and `*π/180` forms so the SQL transcription
    * is operation-for-operation identical. Coincident points return
    * NaN from the 0/0 azimuth (callers filter; the oracle regime keys
    * the test points away from the reference point). */
  def vincentyM(lat1: Double, lon1: Double, lat2: Double, lon2: Double,
      iters: Int = 4): Double = {
    val a = 6378137.0
    val b = 6356752.314245
    val f = 1.0 / 298.257223563
    val u1 = math.atan((1 - f) * math.tan(lat1 * math.Pi / 180))
    val u2a = math.atan((1 - f) * math.tan(lat2 * math.Pi / 180))
    val el = (lon2 - lon1) * math.Pi / 180
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2a); val cosU2 = math.cos(u2a)
    var lam = el
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cos2Alpha = 0.0; var cos2Sm = 0.0
    var i = 0
    while (i < iters) {
      val sinLam = math.sin(lam); val cosLam = math.cos(lam)
      val t1 = cosU2 * sinLam
      val t2 = cosU1 * sinU2 - sinU1 * cosU2 * cosLam
      sinSigma = math.sqrt(t1 * t1 + t2 * t2)
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLam / sinSigma
      cos2Alpha = 1 - sinAlpha * sinAlpha
      cos2Sm = cosSigma - 2 * sinU1 * sinU2 / cos2Alpha
      val c = f / 16 * cos2Alpha * (4 + f * (4 - 3 * cos2Alpha))
      lam = el + (1 - c) * f * sinAlpha * (sigma + c * sinSigma *
        (cos2Sm + c * cosSigma * (-1 + 2 * cos2Sm * cos2Sm)))
      i += 1
    }
    val uu = cos2Alpha * (a * a - b * b) / (b * b)
    val bigA = 1 + uu / 16384 * (4096 + uu * (-768 + uu * (320 - 175 * uu)))
    val bigB = uu / 1024 * (256 + uu * (-128 + uu * (74 - 47 * uu)))
    val dSigma = bigB * sinSigma * (cos2Sm + bigB / 4 *
      (cosSigma * (-1 + 2 * cos2Sm * cos2Sm) - bigB / 6 * cos2Sm *
        (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2Sm * cos2Sm)))
    b * bigA * (sigma - dSigma)
  }

  /** WGS-84 DIRECT geodesic (destination point): start, initial
    * azimuth in degrees, distance in meters → (lat2, lon2) degrees by
    * Vincenty's direct formula. Like [[vincentyM]], the σ iteration is
    * PINNED at `iters` rounds with no convergence break so an oracle
    * can unroll the exact arithmetic; three rounds are sub-millimeter
    * for distances into the thousands of km (the iteration converges
    * quadratically from σ₀ = s/(bA)). Expressions use the same
    * explicit `x*x` / `*π/180` forms as the inverse solver so the SQL
    * transcription is operation-for-operation identical. */
  def vincentyDestination(lat1: Double, lon1: Double, azDeg: Double,
      distM: Double, iters: Int = 3): (Double, Double) = {
    val a = 6378137.0
    val b = 6356752.314245
    val f = 1.0 / 298.257223563
    val u1 = math.atan((1 - f) * math.tan(lat1 * math.Pi / 180))
    val su1 = math.sin(u1); val cu1 = math.cos(u1)
    val al1 = azDeg * math.Pi / 180
    val sa1 = math.sin(al1); val ca1 = math.cos(al1)
    val sg1 = math.atan2(math.tan(u1), ca1)
    val sal = cu1 * sa1
    val c2a = 1 - sal * sal
    val uu = c2a * (a * a - b * b) / (b * b)
    val ba = 1 + uu / 16384 * (4096 + uu * (-768 + uu * (320 - 175 * uu)))
    val bb = uu / 1024 * (256 + uu * (-128 + uu * (74 - 47 * uu)))
    val sig0 = distM / (b * ba)
    var sig = sig0
    var i = 0
    while (i < iters) {
      val tm = 2 * sg1 + sig
      val ds = bb * math.sin(sig) * (math.cos(tm) + bb / 4 *
        (math.cos(sig) * (-1 + 2 * math.cos(tm) * math.cos(tm)) - bb / 6 *
          math.cos(tm) * (-3 + 4 * math.sin(sig) * math.sin(sig)) *
          (-3 + 4 * math.cos(tm) * math.cos(tm))))
      sig = sig0 + ds
      i += 1
    }
    val tmf = 2 * sg1 + sig
    val ss = math.sin(sig); val cs = math.cos(sig)
    val tmp = su1 * ss - cu1 * cs * ca1
    val lat2 = math.atan2(su1 * cs + cu1 * ss * ca1,
      (1 - f) * math.sqrt(sal * sal + tmp * tmp))
    val lam = math.atan2(ss * sa1, cu1 * cs - su1 * ss * ca1)
    val cc = f / 16 * c2a * (4 + f * (4 - 3 * c2a))
    val el = lam - (1 - cc) * f * sal * (sig + cc * ss *
      (math.cos(tmf) + cc * cs * (-1 + 2 * math.cos(tmf) * math.cos(tmf))))
    (lat2 * 180 / math.Pi, lon1 + el * 180 / math.Pi)
  }

  /** Register the scalar geodesic functions for SQL/Column use. */
  def registerGeodesic(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("geo_vincenty_m",
      (lat1: Double, lon1: Double, lat2: Double, lon2: Double) =>
        vincentyM(lat1, lon1, lat2, lon2))
    spark.udf.register("geo_destination",
      (lat1: Double, lon1: Double, azDeg: Double, distM: Double) =>
        vincentyDestination(lat1, lon1, azDeg, distM))
  }

  /** Number of longitude cells; `cellDeg` must divide 360 so the
    * antimeridian wrap is seamless. */
  private def lonCellCount(cellDeg: Double): Long = {
    val n = 360.0 / cellDeg
    require(n == math.rint(n),
      s"cellDeg=$cellDeg must divide 360 evenly (longitude wraps)")
    n.toLong
  }

  /** Integer grid-cell id packed into one long — the bucketing/
    * partitioning key. Longitude cells wrap modulo 360/cellDeg so two
    * points on opposite sides of the ±180 antimeridian share/abut
    * cells (review-caught: an unwrapped grid silently missed
    * cross-meridian pairs). */
  def cellId(lat: Column, lon: Column, cellDeg: Double): Column = {
    val n = lonCellCount(cellDeg)
    (floor(lat / cellDeg).cast("long") + 1000L) * 100000L +
      pmod(floor(lon / cellDeg).cast("long"), lit(n))
  }

  /** The 3x3 neighborhood of a point's cell (probe-side expansion),
    * longitude wrapping at the antimeridian. */
  def neighborCells(lat: Column, lon: Column, cellDeg: Double): Column = {
    val n = lonCellCount(cellDeg)
    val latC = floor(lat / cellDeg).cast("long") + 1000L
    val lonC = floor(lon / cellDeg).cast("long")
    array((for (di <- -1 to 1; dj <- -1 to 1)
      yield (latC + di) * 100000L + pmod(lonC + dj, lit(n))): _*)
  }

  /** All pairs (a, b) within `radiusKm`, via grid-cell candidates +
    * exact haversine verify. Inputs: (idCol, latCol, lonCol) on both
    * sides (columns renamed a_/b_ in the output). One equi-join
    * shuffle on the cell id; candidate volume is the 3x3-cell
    * neighborhood density, not |A|x|B|. */
  def radiusJoin(a: DataFrame, b: DataFrame, idCol: String,
      latCol: String, lonCol: String, radiusKm: Double,
      cellDeg: Double): DataFrame = {
    val aa = a.select(col(idCol).as("a_id"), col(latCol).as("a_lat"),
      col(lonCol).as("a_lon"),
      cellId(col(latCol), col(lonCol), cellDeg).as("cell"))
    val bb = b.select(col(idCol).as("b_id"), col(latCol).as("b_lat"),
      col(lonCol).as("b_lon"),
      explode(neighborCells(col(latCol), col(lonCol), cellDeg))
        .as("cell"))
    aa.join(bb, "cell")
      .withColumn("dist_km", haversineKm(col("a_lat"), col("a_lon"),
        col("b_lat"), col("b_lon")))
      .filter(col("dist_km") <= radiusKm)
      .select(col("a_id"), col("b_id"), col("dist_km"))
  }
}
