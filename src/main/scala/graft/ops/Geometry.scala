package graft.ops

import org.apache.spark.sql.{Column, SparkSession}

/** Geometry-typed geospatial subset (ref expr/types/geospatial.py —
  * the family [[Geo]]'s lat/lon column math cannot reach): WKT
  * geometries (POINT / LINESTRING / POLYGON with holes) parsed into a
  * compact ring representation, with planar measures and predicates
  * implemented from the standard computational-geometry formulas:
  *
  *  - `st_area`      shoelace over the outer ring minus hole rings
  *  - `st_perimeter` / `st_length`  ring / path length
  *  - `st_centroid`  area-weighted polygon centroid (path midpoint-
  *                   weighted for linestrings, the point itself else)
  *  - `st_contains(poly, point)` ray casting — works for CONCAVE
  *                   simple polygons and respects holes
  *  - `st_distance`  point↔point, point↔segment-path minimum
  *  - `st_envelope`  (xmin, ymin, xmax, ymax) struct
  *  - `st_npoints` / `st_geometry_type` / `st_x` / `st_y` / `st_point`
  *
  * Geometries travel as WKT STRING columns: portable (any engine or
  * the DuckDB oracle can produce them with string concatenation), and
  * the parse cost is paid inside the scalar function exactly once per
  * call site. These are JVM scalar UDFs, not codegen Expressions — the
  * right trade for branch-heavy geometry kernels (the reference runs
  * them through a geometry library for the same reason); they ride
  * whole-stage codegen as black-box calls, stay partition-local, and
  * never shuffle.
  *
  * Scale: every function is a narrow scalar — a 100 TB scan of WKT
  * columns maps straight through; the spatial-JOIN shapes (radius /
  * bbox joins) live in [[Geo]] where the cell-bucketed equi-join
  * already avoids cross products.
  */
object Geometry {

  // ------------------------------------------------------------ model

  /** A geometry = type tag + rings (polygon: outer ++ holes;
    * linestring/point: one ring). Coordinates as (x, y). */
  final case class Geom(kind: String, rings: Seq[Array[(Double, Double)]])

  // ------------------------------------------------------------ parse

  /** Parse the WKT subset POINT/LINESTRING/POLYGON. Loud failure on
    * anything else — silently-wrong geometry is worse than an error. */
  def parseWkt(wkt: String): Geom = {
    val s = wkt.trim
    val open = s.indexOf('(')
    require(open > 0, s"bad WKT: '$wkt'")
    val kind = s.substring(0, open).trim.toUpperCase
    val body = s.substring(open, s.length)
    def coords(t: String): Array[(Double, Double)] =
      t.split(",").map { pair =>
        val xy = pair.trim.split("\\s+")
        require(xy.length == 2, s"bad WKT coordinate '$pair' in '$wkt'")
        (xy(0).toDouble, xy(1).toDouble)
      }
    kind match {
      case "POINT" =>
        Geom("POINT", Seq(coords(body.stripPrefix("(").stripSuffix(")"))))
      case "LINESTRING" =>
        Geom("LINESTRING",
          Seq(coords(body.stripPrefix("(").stripSuffix(")"))))
      case "POLYGON" =>
        val inner = body.trim.stripPrefix("(").stripSuffix(")")
        val rings = inner.split("\\)\\s*,\\s*\\(")
          .map(r => coords(r.stripPrefix("(").stripSuffix(")")))
        rings.foreach(r => require(r.length >= 4 &&
          r.head == r.last, s"polygon ring must close: '$wkt'"))
        Geom("POLYGON", rings.toSeq)
      case other =>
        throw new IllegalArgumentException(s"unsupported WKT type $other")
    }
  }

  // ---------------------------------------------------------- kernels

  /** Signed shoelace area of one closed ring. */
  private def ringArea(r: Array[(Double, Double)]): Double = {
    var a = 0.0
    var i = 0
    while (i < r.length - 1) {
      a += r(i)._1 * r(i + 1)._2 - r(i + 1)._1 * r(i)._2
      i += 1
    }
    a / 2.0
  }

  private def pathLength(r: Array[(Double, Double)]): Double = {
    var l = 0.0
    var i = 0
    while (i < r.length - 1) {
      l += math.hypot(r(i + 1)._1 - r(i)._1, r(i + 1)._2 - r(i)._2)
      i += 1
    }
    l
  }

  /** Ray casting (odd-even rule) for one ring. On-edge points count as
    * inside for horizontal-ray boundary crossings — documented OGC
    * boundary ambiguity; the specs test strict interiors. */
  private def ringContains(r: Array[(Double, Double)], x: Double,
      y: Double): Boolean = {
    var inside = false
    var i = 0
    var j = r.length - 2 // last point == first point
    while (i < r.length - 1) {
      val (xi, yi) = r(i); val (xj, yj) = r(j)
      if ((yi > y) != (yj > y) &&
        x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  def area(g: Geom): Double = g.kind match {
    case "POLYGON" =>
      math.abs(ringArea(g.rings.head)) -
        g.rings.tail.map(r => math.abs(ringArea(r))).sum
    case _ => 0.0
  }

  def perimeter(g: Geom): Double = g.kind match {
    case "POLYGON" => g.rings.map(pathLength).sum
    case "LINESTRING" => pathLength(g.rings.head)
    case _ => 0.0
  }

  def centroid(g: Geom): (Double, Double) = g.kind match {
    case "POINT" => g.rings.head.head
    case "LINESTRING" =>
      val r = g.rings.head
      var (cx, cy, w) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < r.length - 1) {
        val len = math.hypot(r(i + 1)._1 - r(i)._1, r(i + 1)._2 - r(i)._2)
        cx += (r(i)._1 + r(i + 1)._1) / 2 * len
        cy += (r(i)._2 + r(i + 1)._2) / 2 * len
        w += len
        i += 1
      }
      if (w == 0) r.head else (cx / w, cy / w)
    case "POLYGON" =>
      // area-weighted centroid of the outer ring minus the holes
      var (cx, cy, w) = (0.0, 0.0, 0.0)
      g.rings.zipWithIndex.foreach { case (r, idx) =>
        val a0 = ringArea(r)
        val sign = if (idx == 0) 1.0 else -1.0
        var (sx, sy) = (0.0, 0.0)
        var i = 0
        while (i < r.length - 1) {
          val cross = r(i)._1 * r(i + 1)._2 - r(i + 1)._1 * r(i)._2
          sx += (r(i)._1 + r(i + 1)._1) * cross
          sy += (r(i)._2 + r(i + 1)._2) * cross
          i += 1
        }
        val aAbs = math.abs(a0)
        // sx/(6*a0) is the ring centroid; weight by |area| and sign
        if (a0 != 0.0) {
          cx += sign * aAbs * (sx / (6 * a0))
          cy += sign * aAbs * (sy / (6 * a0))
          w += sign * aAbs
        }
      }
      require(w != 0.0, "degenerate polygon centroid")
      (cx / w, cy / w)
  }

  def contains(poly: Geom, x: Double, y: Double): Boolean = {
    require(poly.kind == "POLYGON", s"st_contains needs POLYGON, got ${poly.kind}")
    ringContains(poly.rings.head, x, y) &&
      poly.rings.tail.forall(h => !ringContains(h, x, y))
  }

  /** Minimum planar distance between two geometries (point↔point and
    * point↔path/ring; path↔path falls back to vertex-to-path min —
    * exact for the non-crossing case, documented approximation else). */
  def distance(a: Geom, b: Geom): Double = {
    def segDist(px: Double, py: Double, ax: Double, ay: Double,
        bx: Double, by: Double): Double = {
      val (dx, dy) = (bx - ax, by - ay)
      val l2 = dx * dx + dy * dy
      val t = if (l2 == 0) 0.0
        else math.max(0.0, math.min(1.0,
          ((px - ax) * dx + (py - ay) * dy) / l2))
      math.hypot(px - (ax + t * dx), py - (ay + t * dy))
    }
    def pointToGeom(x: Double, y: Double, g: Geom): Double = g.kind match {
      case "POINT" =>
        val (gx, gy) = g.rings.head.head
        math.hypot(x - gx, y - gy)
      case _ =>
        if (g.kind == "POLYGON" && contains(g, x, y)) 0.0
        else g.rings.map { r =>
          if (r.length == 1) math.hypot(x - r.head._1, y - r.head._2)
          else (0 until r.length - 1).map(i =>
            segDist(x, y, r(i)._1, r(i)._2, r(i + 1)._1, r(i + 1)._2)).min
        }.min
    }
    (a.kind, b.kind) match {
      case ("POINT", _) =>
        val (x, y) = a.rings.head.head; pointToGeom(x, y, b)
      case (_, "POINT") =>
        val (x, y) = b.rings.head.head; pointToGeom(x, y, a)
      case _ =>
        // vertex-to-other minimum from both sides
        (a.rings.flatten.map { case (x, y) => pointToGeom(x, y, b) } ++
          b.rings.flatten.map { case (x, y) => pointToGeom(x, y, a) }).min
    }
  }

  def envelope(g: Geom): (Double, Double, Double, Double) = {
    val pts = g.rings.flatten
    (pts.map(_._1).min, pts.map(_._2).min,
      pts.map(_._1).max, pts.map(_._2).max)
  }

  // ----------------------------------------------------- registration

  /** Register the `st_*` functions for SQL and Column use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_point",
      (x: Double, y: Double) => s"POINT($x $y)")
    spark.udf.register("st_x",
      (wkt: String) => parseWkt(wkt).rings.head.head._1)
    spark.udf.register("st_y",
      (wkt: String) => parseWkt(wkt).rings.head.head._2)
    spark.udf.register("st_area", (wkt: String) => area(parseWkt(wkt)))
    spark.udf.register("st_perimeter",
      (wkt: String) => perimeter(parseWkt(wkt)))
    spark.udf.register("st_length",
      (wkt: String) => perimeter(parseWkt(wkt)))
    spark.udf.register("st_centroid_x",
      (wkt: String) => centroid(parseWkt(wkt))._1)
    spark.udf.register("st_centroid_y",
      (wkt: String) => centroid(parseWkt(wkt))._2)
    spark.udf.register("st_contains",
      (poly: String, x: Double, y: Double) =>
        contains(parseWkt(poly), x, y))
    spark.udf.register("st_distance",
      (a: String, b: String) => distance(parseWkt(a), parseWkt(b)))
    spark.udf.register("st_npoints",
      (wkt: String) => parseWkt(wkt).rings.map(_.length).sum)
    spark.udf.register("st_geometry_type",
      (wkt: String) => parseWkt(wkt).kind)
    spark.udf.register("st_xmin", (wkt: String) => envelope(parseWkt(wkt))._1)
    spark.udf.register("st_ymin", (wkt: String) => envelope(parseWkt(wkt))._2)
    spark.udf.register("st_xmax", (wkt: String) => envelope(parseWkt(wkt))._3)
    spark.udf.register("st_ymax", (wkt: String) => envelope(parseWkt(wkt))._4)
  }

  /** Column helpers mirroring the SQL registrations. */
  object columns {
    import org.apache.spark.sql.functions.callUDF
    def stArea(wkt: Column): Column = callUDF("st_area", wkt)
    def stPerimeter(wkt: Column): Column = callUDF("st_perimeter", wkt)
    def stContains(poly: Column, x: Column, y: Column): Column =
      callUDF("st_contains", poly, x, y)
    def stDistance(a: Column, b: Column): Column =
      callUDF("st_distance", a, b)
  }
}
