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
    },

    // GEOMETRY-typed subset (ref expr/types/geospatial.py): per-row WKT
    // rectangles built from supplier keys run through the real parse +
    // shoelace / ring-length / centroid kernels; the oracle computes
    // the same measures with closed-form rectangle arithmetic — so the
    // geometry pipeline (WKT text → parse → kernel) is what's checked.
    q("geo_geom_measures",
      """SELECT s_suppkey,
        |       round(w * h + 1e-9, 4) AS area,
        |       round(2 * (w + h) + 1e-9, 4) AS perim,
        |       round(x + w / 2 + 1e-9, 4) AS cx,
        |       round(y + h / 2 + 1e-9, 4) AS cy
        |FROM (SELECT s_suppkey,
        |             (s_suppkey % 50) * 1.0 AS x, ((s_suppkey * 3) % 50) * 1.0 AS y,
        |             1.0 + (s_suppkey % 7) AS w, 1.0 + ((s_suppkey * 5) % 11) AS h
        |      FROM supplier)
        |ORDER BY s_suppkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      val g = c.supplier.select(col("s_suppkey"),
          (col("s_suppkey") % 50).cast("double").as("x"),
          (col("s_suppkey") * 3 % 50).cast("double").as("y"),
          (lit(1.0) + col("s_suppkey") % 7).as("w"),
          (lit(1.0) + col("s_suppkey") * 5 % 11).as("h"))
        .withColumn("wkt", concat(lit("POLYGON(("),
          col("x"), lit(" "), col("y"), lit(", "),
          col("x") + col("w"), lit(" "), col("y"), lit(", "),
          col("x") + col("w"), lit(" "), col("y") + col("h"), lit(", "),
          col("x"), lit(" "), col("y") + col("h"), lit(", "),
          col("x"), lit(" "), col("y"), lit("))")))
      g.select(col("s_suppkey"),
          r4(callUDF("st_area", col("wkt"))).as("area"),
          r4(callUDF("st_perimeter", col("wkt"))).as("perim"),
          r4(callUDF("st_centroid_x", col("wkt"))).as("cx"),
          r4(callUDF("st_centroid_y", col("wkt"))).as("cy"))
        .orderBy("s_suppkey")
    },

    // Point-in-polygon via ray casting against a fixed triangle whose
    // edges contain NO lattice points (vertices chosen with coprime
    // edge deltas), so the strict-interior predicate agrees exactly
    // with the oracle's three cross-product sign tests.
    q("geo_geom_contains",
      """SELECT c_custkey,
        |       (40-0)*(y-1) - (2-1)*(x-0) > 0 AND
        |       (11-40)*(y-2) - (39-2)*(x-40) > 0 AND
        |       (0-11)*(y-39) - (1-39)*(x-11) > 0 AS inside
        |FROM (SELECT c_custkey, (c_custkey % 41) * 1.0 AS x,
        |             ((c_custkey * 7) % 41) * 1.0 AS y
        |      FROM customer)
        |ORDER BY c_custkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      c.customer.select(col("c_custkey"),
          (col("c_custkey") % 41).cast("double").as("x"),
          (col("c_custkey") * 7 % 41).cast("double").as("y"))
        .select(col("c_custkey"),
          callUDF("st_contains",
            lit("POLYGON((0 1, 40 2, 11 39, 0 1))"),
            col("x"), col("y")).as("inside"))
        .orderBy("c_custkey")
    }
  )
}
