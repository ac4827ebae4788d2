package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WKT geometry kernels: parse, measures, predicates — checked against
  * hand-computed values, including the cases plain bbox math gets
  * wrong (concave polygons, holes, point-to-segment projection). */
class GeometrySpec extends SparkSpec {

  import Geometry._

  test("WKT parse round-trips the three supported types and rejects " +
    "malformed input") {
    assert(parseWkt("POINT(3.5 -2)").kind == "POINT")
    assert(parseWkt("LINESTRING(0 0, 3 4)").rings.head.length == 2)
    val poly = parseWkt(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(poly.rings.length == 2)
    intercept[IllegalArgumentException](parseWkt("CIRCLE(0 0, 5)"))
    intercept[IllegalArgumentException](
      parseWkt("POLYGON((0 0, 1 0, 1 1))")) // unclosed ring
  }

  test("area: shoelace with holes subtracted; perimeter; npoints") {
    val sq = parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(area(sq) == 16.0)
    assert(perimeter(sq) == 16.0)
    val holed = parseWkt(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
    assert(area(holed) == 16.0 - 4.0)
    // 3-4-5 triangle
    val tri = parseWkt("POLYGON((0 0, 3 0, 0 4, 0 0))")
    assert(area(tri) == 6.0)
    assert(perimeter(tri) == 12.0)
  }

  test("centroid: square center; hole pulls the centroid away") {
    val (cx, cy) = centroid(parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"))
    assert(math.abs(cx - 2.0) < 1e-12 && math.abs(cy - 2.0) < 1e-12)
    // off-center hole at (1,1)-(2,2): centroid moves toward (4,4) side
    val (hx, hy) = centroid(parseWkt(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"))
    assert(hx > 2.0 && hy > 2.0)
    // exact: (16*2 - 1*1.5)/15
    assert(math.abs(hx - (32.0 - 1.5) / 15.0) < 1e-12)
  }

  test("contains: ray casting handles CONCAVE polygons and holes " +
    "(where bbox containment lies)") {
    // C-shaped concave polygon: notch on the right side
    val c = parseWkt(
      "POLYGON((0 0, 4 0, 4 1, 1 1, 1 3, 4 3, 4 4, 0 4, 0 0))")
    assert(contains(c, 0.5, 2.0)) // in the spine
    assert(!contains(c, 2.5, 2.0)) // in the notch — INSIDE the bbox
    assert(contains(c, 2.0, 0.5)) // in the lower arm
    val holed = parseWkt(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
    assert(contains(holed, 0.5, 0.5))
    assert(!contains(holed, 2.0, 2.0)) // inside the hole
  }

  test("distance: point-segment projection, not vertex distance; " +
    "zero inside a polygon") {
    val d = distance(parseWkt("POINT(2 2)"), parseWkt("LINESTRING(0 0, 4 0)"))
    assert(math.abs(d - 2.0) < 1e-12) // foot of perpendicular, mid-segment
    val dOff = distance(parseWkt("POINT(6 3)"),
      parseWkt("LINESTRING(0 0, 4 0)"))
    assert(math.abs(dOff - math.hypot(2, 3)) < 1e-12) // clamps to endpoint
    assert(distance(parseWkt("POINT(1 1)"),
      parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")) == 0.0)
    val dOut = distance(parseWkt("POINT(5 2)"),
      parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"))
    assert(math.abs(dOut - 1.0) < 1e-12)
  }

  test("registered st_* functions work from SQL over a DataFrame") {
    val sp = spark
    import sp.implicits._
    Geometry.register(sp)
    val df = Seq((1, 0.5, 0.5), (2, 2.5, 2.0), (3, 10.0, 10.0))
      .toDF("id", "x", "y")
    df.createOrReplaceTempView("pts")
    val out = sp.sql(
      """SELECT id,
        |  st_contains('POLYGON((0 0, 4 0, 4 1, 1 1, 1 3, 4 3, 4 4, 0 4, 0 0))', x, y) AS c,
        |  st_distance(st_point(x, y), 'POINT(0 0)') AS d
        |FROM pts ORDER BY id""".stripMargin).collect()
    assert(out(0).getBoolean(1) === true) // interior of the lower arm
    assert(out(1).getBoolean(1) === false) // notch
    assert(math.abs(out(2).getDouble(2) - math.hypot(10, 10)) < 1e-12)
  }
}
