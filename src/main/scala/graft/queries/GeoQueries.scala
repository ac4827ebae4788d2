package graft.queries

import graft.QueryDef
import graft.ops.Geo
import org.apache.spark.sql.functions._

/** Geospatial operators (SURVEY §2.5's deferred family, the
  * no-geometry-type subset): point distance, bounding boxes, and the
  * cell-bucketed radius join. Coordinates are derived deterministically
  * from integer keys with identical arithmetic in both engines, so the
  * DuckDB oracle checks the exact same points — no spatial extension
  * needed, because everything is pure column math.
  */
object GeoQueries {

  // identical derivation in Spark and SQL: lat in [-60, 60), lon in
  // [-180, 180), on a 0.01-degree lattice
  private def lat(key: org.apache.spark.sql.Column) =
    (key * 37 % 12000) / 100.0 - 60.0
  private def lon(key: org.apache.spark.sql.Column) =
    (key * 91 % 36000) / 100.0 - 180.0

  val defs: Seq[QueryDef] = Seq(

    // Haversine distance + bbox predicate, row-local codegen math.
    q("geo_distance",
      """SELECT c_custkey,
        |       round(2*6371.0088*asin(sqrt(pow(sin(radians(48.86 - lat)/2),2) +
        |             cos(radians(lat))*cos(radians(48.86))*pow(sin(radians(2.35 - lon)/2),2)))
        |             + 1e-9, 2) AS dist_km,
        |       lat BETWEEN -30 AND 30 AND lon BETWEEN -90 AND 90 AS in_box
        |FROM (SELECT c_custkey,
        |             ((c_custkey * 37) % 12000)/100.0 - 60.0 AS lat,
        |             ((c_custkey * 91) % 36000)/100.0 - 180.0 AS lon
        |      FROM customer)
        |ORDER BY c_custkey""") { c =>
      val pts = c.customer.select(col("c_custkey"),
        lat(col("c_custkey")).as("lat"), lon(col("c_custkey")).as("lon"))
      pts.select(col("c_custkey"),
          r2(Geo.haversineKm(col("lat"), col("lon"),
            lit(48.86), lit(2.35))).as("dist_km"),
          Geo.inBbox(col("lat"), col("lon"), -30, 30, -90, 90)
            .as("in_box"))
        .orderBy("c_custkey")
    },

    // Radius join: all (supplier, customer) pairs within 300 km via
    // 6-degree grid cells (one equi-join shuffle + exact haversine
    // verify — never |S|x|C|); the oracle IS the brute-force cross
    // join, so completeness of the cell candidates is exactly what the
    // hash compare checks.
    q("geo_radius_join",
      """WITH c AS (SELECT c_custkey id, ((c_custkey * 37) % 12000)/100.0 - 60.0 lat,
        |                  ((c_custkey * 91) % 36000)/100.0 - 180.0 lon FROM customer),
        |s AS (SELECT s_suppkey id, ((s_suppkey * 37) % 12000)/100.0 - 60.0 lat,
        |             ((s_suppkey * 91) % 36000)/100.0 - 180.0 lon FROM supplier),
        |p AS (SELECT s.id a_id, c.id b_id,
        |        2*6371.0088*asin(sqrt(pow(sin(radians(c.lat - s.lat)/2),2) +
        |          cos(radians(s.lat))*cos(radians(c.lat))*pow(sin(radians(c.lon - s.lon)/2),2))) d
        |      FROM s, c)
        |SELECT a_id, b_id, round(d + 1e-9, 2) AS dist_km
        |FROM p WHERE d <= 300 ORDER BY a_id, b_id""") { c =>
      val cust = c.customer.select(col("c_custkey").as("id"),
        lat(col("c_custkey")).as("lat"), lon(col("c_custkey")).as("lon"))
      val supp = c.supplier.select(col("s_suppkey").as("id"),
        lat(col("s_suppkey")).as("lat"), lon(col("s_suppkey")).as("lon"))
      Geo.radiusJoin(supp, cust, "id", "lat", "lon",
          radiusKm = 300.0, cellDeg = 6.0)
        .select(col("a_id"), col("b_id"), r2(col("dist_km")).as("dist_km"))
        .orderBy("a_id", "b_id")
    }
  )
}
