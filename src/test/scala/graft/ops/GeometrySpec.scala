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
    // cross-overlap (plus sign): NEITHER polygon holds a vertex of the
    // other, yet they overlap — distance must be 0, not the vertex min
    val wide = parseWkt("POLYGON((0 2, 6 2, 6 4, 0 4, 0 2))")
    val tall = parseWkt("POLYGON((2 0, 4 0, 4 6, 2 6, 2 0))")
    assert(distance(wide, tall) == 0.0)
    // disjoint rectangles: diagonal corner gap
    assert(math.abs(distance(
      parseWkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))"),
      parseWkt("POLYGON((5 6, 7 6, 7 8, 5 8, 5 6))")) -
      math.hypot(3, 4)) < 1e-12)
  }

  test("segment intersection: proper cross, endpoint touch, collinear " +
    "overlap, parallel and collinear-disjoint") {
    assert(segsIntersect((0, 0), (4, 4), (0, 4), (4, 0))) // proper X
    assert(segsIntersect((0, 0), (4, 0), (4, 0), (8, 3))) // endpoint touch
    assert(segsIntersect((0, 0), (4, 0), (2, 0), (6, 0))) // collinear overlap
    assert(!segsIntersect((0, 0), (4, 0), (5, 0), (8, 0))) // collinear gap
    assert(!segsIntersect((0, 0), (4, 0), (0, 1), (4, 1))) // parallel
    assert(segsIntersect((0, 0), (4, 0), (2, -1), (2, 3))) // T crossing
  }

  test("intersects/disjoint/within on rectangles: overlap, nesting, " +
    "disjoint, and the containment-without-edge-crossing case") {
    def rect(x: Double, y: Double, w: Double, h: Double) = parseWkt(
      s"POLYGON(($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))")
    val a = rect(0, 0, 4, 4)
    assert(intersects(a, rect(2, 2, 4, 4))) // overlap
    assert(intersects(a, rect(1, 1, 2, 2))) // nested: NO edge crossing
    assert(intersects(rect(1, 1, 2, 2), a)) // ...both directions
    assert(disjoint(a, rect(5, 5, 2, 2)))
    assert(intersects(a, rect(4, 0, 2, 4))) // shared edge (closed semantics)
    assert(within(rect(1, 1, 2, 2), a))
    assert(!within(rect(2, 2, 4, 4), a)) // partial overlap
    assert(!within(rect(5, 5, 2, 2), a)) // disjoint
    assert(!within(a, rect(1, 1, 2, 2))) // container not within content
    // point and line operands
    assert(intersects(parseWkt("POINT(2 2)"), a))
    assert(intersects(parseWkt("LINESTRING(-1 2, 5 2)"), a))
    assert(disjoint(parseWkt("POINT(9 9)"), a))
  }

  test("convex clipping: intersection area matches rectangle overlap " +
    "arithmetic; empty when disjoint; union/difference by " +
    "inclusion-exclusion") {
    def rect(x: Double, y: Double, w: Double, h: Double) = parseWkt(
      s"POLYGON(($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))")
    val a = rect(0, 0, 4, 4)
    val b = rect(2.5, 1.5, 4, 4)
    assert(math.abs(intersectionArea(a, b) - 1.5 * 2.5) < 1e-12)
    assert(math.abs(unionArea(a, b) - (16 + 16 - 3.75)) < 1e-12)
    assert(math.abs(differenceArea(a, b) - (16 - 3.75)) < 1e-12)
    assert(toWkt(intersectionConvex(a, rect(9, 9, 2, 2))) == "POLYGON EMPTY")
    // POLYGON EMPTY round-trips so compositions like
    // st_area(st_intersection(a, b)) work on disjoint inputs
    val empty = parseWkt("POLYGON EMPTY")
    assert(empty.kind == "POLYGON" && empty.rings.isEmpty)
    assert(area(empty) == 0.0 && perimeter(empty) == 0.0)
    intercept[IllegalArgumentException](contains(empty, 0, 0))
    intercept[IllegalArgumentException](envelope(empty))
    // triangle ∩ square, clockwise-wound input (winding normalized):
    // hypotenuse x+y=4 cuts the (1,3)-(3,3)-(3,1) corner (area 2) off
    // the 3×3 square
    val tri = parseWkt("POLYGON((0 0, 0 4, 4 0, 0 0))") // CW
    assert(math.abs(intersectionArea(tri, rect(0, 0, 3, 3)) - 7.0) < 1e-12)
    // the GEOMETRY-producing path stays convex-only (a concave
    // intersection can be several polygons)
    val concave = parseWkt("POLYGON((0 0, 4 0, 4 4, 2 1, 0 4, 0 0))")
    intercept[IllegalArgumentException](intersectionConvex(concave, a))
  }

  test("general (slab) intersection area: concave inputs, holes, " +
    "collinear shared boundaries, multi-piece intersections") {
    def rect(x: Double, y: Double, w: Double, h: Double) = parseWkt(
      s"POLYGON(($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))")
    // concave W-shape (area 16 - notch 3: notch triangle (1,4)-(2,1)-(3,4))
    val concave = parseWkt("POLYGON((0 0, 4 0, 4 4, 3 4, 2 1, 1 4, 0 4, 0 0))")
    val notch = math.abs((3.0 - 1.0) * 3.0 / 2)
    assert(math.abs(area(concave) - (16 - notch)) < 1e-12)
    // whole concave polygon inside a big rectangle
    assert(math.abs(intersectionArea(concave, rect(-1, -1, 10, 10))
      - (16 - notch)) < 1e-12)
    // clip to the top half y>=2: the notch splits the intersection into
    // TWO pieces — left piece + right piece. Notch edges hit y=2 at
    // x = 2±1/3: top band is 4×2 minus notch-above-2 (trapezoid between
    // y=2 and y=4, widths 2/3*? ) — compute by slab independence:
    // notch area above y=2 = total notch minus part below 2
    // notch tip (2,1); at y=2 half-width = 1/3; area below y=2 =
    // triangle with base 2/3, height 1 = 1/3. Above = 3 - 1/3 = 8/3.
    val top = rect(0, 2, 4, 2)
    assert(math.abs(intersectionArea(concave, top) - (8 - 8.0 / 3)) < 1e-12)
    // donut: square with square hole; intersect with rect covering left
    // half -> half the ring area
    val donut = parseWkt(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
    assert(math.abs(area(donut) - 12) < 1e-12)
    assert(math.abs(intersectionArea(donut, rect(0, 0, 2, 4)) - 6) < 1e-12)
    // two donuts offset: hole-over-hole overlap
    val donut2 = parseWkt(
      "POLYGON((2 0, 6 0, 6 4, 2 4, 2 0), (3 1, 5 1, 5 3, 3 3, 3 1))")
    // overlap strip x in [2,4]: full rect 2x4=8 minus a's hole part
    // (x in [2,3]: 1x2=2) minus b's hole part (x in [3,4]: 1x2=2) = 4
    assert(math.abs(intersectionArea(donut, donut2) - 4) < 1e-12)
    // identical polygons: intersection = self area (boundaries fully
    // collinear — zero proper crossings; the degenerate regime)
    assert(math.abs(intersectionArea(concave, concave) - (16 - notch)) < 1e-12)
    // stacked rectangles sharing only side-segment collinearity
    val lo = rect(0, 0, 4, 4); val hi = rect(0, 2, 4, 4)
    assert(math.abs(intersectionArea(lo, hi) - 8) < 1e-12)
    // touch-only contact measures exactly zero
    assert(intersectionArea(rect(0, 0, 2, 2), rect(2, 0, 2, 2)) == 0.0)
    assert(intersectionArea(rect(0, 0, 2, 2), rect(2, 2, 2, 2)) == 0.0)
    // non-rectilinear: unit right triangles overlapping in a quad
    val t1 = parseWkt("POLYGON((0 0, 4 0, 0 4, 0 0))")
    val t2 = parseWkt("POLYGON((4 4, 0 4, 4 0, 4 4))")
    assert(intersectionArea(t1, t2) == 0.0) // shared diagonal only
    val t3 = parseWkt("POLYGON((0 0, 4 0, 4 4, 0 0))")
    // t1 ∩ t3: below both x+y<=4 (t1) and y<=x (t3): triangle
    // (0,0),(4,0),(2,2) area 4
    assert(math.abs(intersectionArea(t1, t3) - 4) < 1e-12)
    // union/difference inherit generality
    assert(math.abs(unionArea(lo, hi) - (16 + 16 - 8)) < 1e-12)
    assert(math.abs(differenceArea(lo, hi) - 8) < 1e-12)
  }

  test("touches/overlaps/covers/crosses: boundary contact vs interior " +
    "overlap vs containment, and line-area crossing") {
    def rect(x: Double, y: Double, w: Double, h: Double) = parseWkt(
      s"POLYGON(($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))")
    val a = rect(0, 0, 4, 4)
    assert(touches(a, rect(4, 0, 2, 4)))   // shared edge
    assert(touches(a, rect(4, 4, 2, 2)))   // corner point
    assert(!touches(a, rect(2, 2, 4, 4)))  // proper overlap
    assert(!touches(a, rect(5, 5, 1, 1)))  // disjoint
    assert(overlaps(a, rect(2, 2, 4, 4)))
    assert(!overlaps(a, rect(4, 0, 2, 4))) // touch only
    assert(!overlaps(a, rect(1, 1, 2, 2))) // contained, not overlaps
    assert(covers(a, rect(1, 1, 2, 2)) && coveredBy(rect(1, 1, 2, 2), a))
    assert(!covers(rect(1, 1, 2, 2), a))
    assert(crosses(parseWkt("LINESTRING(-1 2, 5 2)"), a))   // through
    assert(crosses(parseWkt("LINESTRING(2 2, 9 2)"), a))    // in → out
    assert(!crosses(parseWkt("LINESTRING(1 1, 3 3)"), a))   // within
    assert(!crosses(parseWkt("LINESTRING(0 5, 4 5)"), a))   // outside
    assert(!crosses(parseWkt("LINESTRING(0 4, 4 4)"), a))   // along edge
    // interiors overlapping while boundaries meet only COLLINEARLY
    // (no proper crossing, no vertex strictly inside — advisor r4):
    val stacked = rect(0, 2, 4, 4) // shares side segments with a
    assert(overlaps(a, stacked) && overlaps(stacked, a))
    assert(!touches(a, stacked) && !touches(stacked, a))
    // identical polygons: equal, hence neither overlaps nor touches
    val a2 = rect(0, 0, 4, 4)
    assert(!overlaps(a, a2) && !touches(a, a2))
    assert(covers(a, a2) && coveredBy(a, a2))
    // narrower strip sharing a's left edge, interiors overlap
    val strip = rect(0, 1, 2, 2)
    assert(!touches(a, strip))
    assert(!overlaps(a, strip)) // contained: within, not overlaps
  }

  test("contains_properly, is_valid, SRID bookkeeping, and the " +
    "multi-polygon union area") {
    def rect(x: Double, y: Double, w: Double, h: Double) = parseWkt(
      s"POLYGON(($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))")
    val a = rect(0, 0, 4, 4)
    // proper containment excludes ALL boundary contact
    assert(containsProperly(a, rect(1, 1, 2, 2)))
    assert(!containsProperly(a, rect(0, 1, 2, 2)))   // shares left edge
    assert(!containsProperly(a, rect(1, 1, 3, 2)))   // touches right edge
    assert(!containsProperly(a, a))                  // self: boundary contact
    assert(containsProperly(a, parseWkt("POINT(2 2)")))
    assert(!containsProperly(a, parseWkt("POINT(0 2)"))) // on boundary
    assert(!containsProperly(a, parseWkt("POINT(9 9)")))

    // validity: good shapes pass, degenerate shapes fail
    assert(isValid(a))
    assert(isValid(parseWkt("POLYGON EMPTY")))
    assert(isValid(parseWkt("POINT(1 2)")))
    assert(isValid(parseWkt("LINESTRING(0 0, 1 1, 2 0)")))
    assert(!isValid(parseWkt("LINESTRING(0 0, 0 0)"))) // zero-length seg
    // bowtie: self-crossing ring
    assert(!isValid(parseWkt("POLYGON((0 0, 4 0, 0 4, 4 4, 0 0))")))
    // collinear backtrack spike
    assert(!isValid(parseWkt("POLYGON((0 0, 4 0, 2 0, 2 2, 0 2, 0 0))")))
    // hole outside shell
    assert(!isValid(parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), " +
      "(5 5, 6 5, 6 6, 5 6, 5 5))")))
    // hole inside another hole
    assert(!isValid(parseWkt("POLYGON((0 0, 9 0, 9 9, 0 9, 0 0), " +
      "(1 1, 6 1, 6 6, 1 6, 1 1), (2 2, 3 2, 3 3, 2 3, 2 2))")))
    // proper donut is valid
    assert(isValid(parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), " +
      "(1 1, 3 1, 3 3, 1 3, 1 1))")))

    // SRID travels via EWKT/EWKB; kernels ignore it
    val (srid, bare) = splitSrid("SRID=4326;POINT(1 2)")
    assert(srid == 4326 && bare == "POINT(1 2)")
    assert(orderingEquals(parseWkt("SRID=4326;POINT(1 2)"),
      parseWkt("POINT(1 2)")))
    val ewkb = toEwkb(a, 3857)
    assert(wkbSrid(ewkb) == 3857 && wkbSrid(toWkb(a)) == 0)
    assert(geoEquals(fromWkb(ewkb), a))

    // union of many: 2x2 grid of unit squares + one overlapping 2x2
    // square + a duplicate = 4 + (4 - overlap 4... all inside grid)
    val grid = for { i <- 0 to 1; j <- 0 to 1 } yield rect(i, j, 1, 1)
    assert(math.abs(multiUnionArea(grid) - 4.0) < 1e-12)
    assert(math.abs(multiUnionArea(grid :+ rect(0, 0, 2, 2)) - 4.0) < 1e-12)
    assert(math.abs(multiUnionArea(
      Seq(rect(0, 0, 2, 2), rect(1, 1, 2, 2), rect(1, 1, 2, 2))) -
      (4 + 4 - 1)) < 1e-12)
    // disjoint pieces simply add; empty input is zero
    assert(math.abs(multiUnionArea(
      Seq(rect(0, 0, 1, 1), rect(5, 5, 2, 2))) - 5.0) < 1e-12)
    assert(multiUnionArea(Nil) == 0.0)
    // concave members work too (slab kernel is shape-agnostic)
    val tri = parseWkt("POLYGON((0 0, 4 0, 0 4, 0 0))")
    assert(math.abs(multiUnionArea(Seq(tri, rect(0, 0, 4, 4))) - 16) < 1e-12)
  }

  test("line referencing: locate point, substring across a corner, " +
    "start/end/point_n") {
    val l = parseWkt("LINESTRING(0 0, 4 0, 4 3)") // total length 7
    assert(math.abs(lineLocatePoint(l, 2, -1) - 2.0 / 7) < 1e-12)
    assert(math.abs(lineLocatePoint(l, 5, 3) - 1.0) < 1e-12) // past the end
    val sub = lineSubstring(l, 0.25, 0.75) // 1.75 → 5.25 along the path
    val expected = Array((1.75, 0.0), (4.0, 0.0), (4.0, 1.25))
    assert(sub.rings.head.length == 3 &&
      sub.rings.head.zip(expected).forall { case ((ax, ay), (bx, by)) =>
        math.abs(ax - bx) < 1e-12 && math.abs(ay - by) < 1e-12 })
    assert(math.abs(perimeter(sub) - 3.5) < 1e-12)
    assert(startPoint(l) == ((0.0, 0.0)) && endPoint(l) == ((4.0, 3.0)))
    assert(pointN(l, 2) == ((4.0, 0.0)))
    intercept[IllegalArgumentException](pointN(l, 4))
  }

  test("simplify: Douglas-Peucker drops collinear/low-deviation points, " +
    "keeps real corners; closed rings stay closed") {
    val l = parseWkt("LINESTRING(0 0, 1 0.01, 2 0, 2 2)")
    assert(simplify(l, 0.1).rings.head.sameElements(
      Array((0.0, 0.0), (2.0, 0.0), (2.0, 2.0))))
    assert(simplify(l, 0.001).rings.head.length == 4) // below tolerance
    val ring = simplify(parseWkt(
      "POLYGON((0 0, 2 0.01, 4 0, 4 4, 0 4, 0 0))"), 0.1).rings.head
    assert(ring.head == ring.last && ring.length >= 4)
    assert(!ring.contains((2.0, 0.01)))
    // aggressive tolerance on a symmetric square: the ring must stay
    // legal (>= 4 points) and parseable, never a degenerate 3-point
    // "polygon" (review-caught collapse)
    val hard = simplify(parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"), 3.0)
    assert(hard.rings.head.length >= 4)
    assert(area(parseWkt(toWkt(hard))) > 0.0)
  }

  test("azimuth: cardinal directions in PostGIS north-clockwise " +
    "convention; max_distance attained at far corners") {
    assert(math.abs(azimuth(0, 0, 0, 5) - 0.0) < 1e-12)           // north
    assert(math.abs(azimuth(0, 0, 5, 0) - math.Pi / 2) < 1e-12)   // east
    assert(math.abs(azimuth(0, 0, 0, -5) - math.Pi) < 1e-12)      // south
    assert(math.abs(azimuth(0, 0, -5, 0) - 3 * math.Pi / 2) < 1e-12)
    val a = parseWkt("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")
    val b = parseWkt("POLYGON((3 4, 4 4, 4 5, 3 5, 3 4))")
    assert(math.abs(maxDistance(a, b) - math.hypot(4, 5)) < 1e-12)
    assert(dFullyWithin(a, b, math.hypot(4, 5) + 0.001))
    assert(!dFullyWithin(a, b, 6.0))
  }

  test("buffer n-gon area matches the closed form; geo_equals is " +
    "rotation/winding invariant; ordering_equals is not") {
    val buf = bufferPoint(3, 4, 2.5, 32)
    assert(math.abs(area(buf) -
      0.5 * 32 * 2.5 * 2.5 * math.sin(2 * math.Pi / 32)) < 1e-12)
    val p1 = parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    val p2 = parseWkt("POLYGON((4 4, 0 4, 0 0, 4 0, 4 4))") // rotated
    val p3 = parseWkt("POLYGON((0 0, 0 4, 4 4, 4 0, 0 0))") // reversed
    assert(geoEquals(p1, p2) && geoEquals(p1, p3))
    assert(!orderingEquals(p1, p2))
    assert(orderingEquals(p1, parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")))
    assert(!geoEquals(p1, parseWkt("POLYGON((0 0, 5 0, 5 4, 0 4, 0 0))")))
    // hole ORDER is storage, not geometry: same shell, holes listed in
    // swapped order (one also rotated/reversed) still equal (advisor r4)
    val h1 = parseWkt("POLYGON((0 0, 9 0, 9 9, 0 9, 0 0), " +
      "(1 1, 2 1, 2 2, 1 2, 1 1), (5 5, 6 5, 6 6, 5 6, 5 5))")
    val h2 = parseWkt("POLYGON((0 0, 9 0, 9 9, 0 9, 0 0), " +
      "(6 5, 6 6, 5 6, 5 5, 6 5), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(geoEquals(h1, h2) && geoEquals(h2, h1))
    // but a DIFFERENT hole set still differs, and a duplicate hole
    // cannot satisfy two distinct holes (matching is one-to-one)
    val h3 = parseWkt("POLYGON((0 0, 9 0, 9 9, 0 9, 0 0), " +
      "(1 1, 2 1, 2 2, 1 2, 1 1), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(!geoEquals(h1, h3) && !geoEquals(h3, h1))
    // flip + as_text round-trip
    assert(toWkt(flip(parseWkt("LINESTRING(1 2, 3 4)"))) ==
      "LINESTRING(2 1, 4 3)")
  }

  test("WKB round-trips all kinds (incl. holes and EMPTY), reads both " +
    "byte orders, rejects malformed input") {
    Seq("POINT(3.5 -2)", "LINESTRING(0 0, 3 4, 3 9)",
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "POLYGON EMPTY").foreach { w =>
      val g = parseWkt(w)
      assert(orderingEquals(fromWkb(toWkb(g)), g), w)
    }
    // big-endian variant of POINT(1 2) decodes too
    val be = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    be.put(0.toByte).putInt(1).putDouble(1.0).putDouble(2.0)
    assert(fromWkb(be.array()).rings.head.head == ((1.0, 2.0)))
    // standard little-endian byte layout is exactly 21 bytes for a point
    assert(toWkb(parseWkt("POINT(1 2)")).length == 21)
    intercept[IllegalArgumentException](fromWkb(Array[Byte](1, 9, 0, 0, 0)))
    intercept[IllegalArgumentException](fromWkb(Array[Byte](7)))
    // truncated ring payload fails the length guard, not with a
    // BufferUnderflow from a hostile length prefix
    val bad = java.nio.ByteBuffer.allocate(9)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.put(1.toByte).putInt(2).putInt(Int.MaxValue)
    intercept[IllegalArgumentException](fromWkb(bad.array()))
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

  test("web-mercator transform: known vectors, round trip, refusal") {
    // equator origin maps to the mercator origin (ln(tan(π/4)) is FP
    // noise of ~1e-9 m, not exactly 0 — π/4 isn't representable)
    val (ox, oy) = Geometry.transformPoint(0, 0, 4326, 3857)
    assert(ox == 0.0 && math.abs(oy) < 1e-8)
    // lon 180° → half the projected world width (πR)
    val (wx, _) = Geometry.transformPoint(180, 0, 4326, 3857)
    assert(math.abs(wx - 20037508.342789244) < 1e-6)
    // canonical 45°N northing
    val (_, y45) = Geometry.transformPoint(0, 45, 4326, 3857)
    assert(math.abs(y45 - 5621521.486192) < 1e-5, s"y45=$y45")
    // round trip recovers coordinates to FP noise
    val (mx, my) = Geometry.transformPoint(12.4924, 41.8902, 4326, 3857)
    val (bx, by2) = Geometry.transformPoint(mx, my, 3857, 4326)
    assert(math.abs(bx - 12.4924) < 1e-9 && math.abs(by2 - 41.8902) < 1e-9)
    // geometry-level transform preserves ring structure
    val g = Geometry.transform(
      Geometry.parseWkt("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"), 4326, 3857)
    assert(g.kind == "POLYGON" && g.rings.head.length == 5)
    intercept[IllegalArgumentException](
      Geometry.transformPoint(0, 0, 4326, 27700)) // needs a proj db
  }

  test("multi-geometry split and additive measures") {
    val mp = "MULTIPOLYGON(((0 0, 2 0, 2 2, 0 2, 0 0)), " +
      "((10 0, 13 0, 13 1, 10 1, 10 0), (11 0.2, 12 0.2, 12 0.8, 11 0.8, 11 0.2)))"
    val parts = Geometry.geometries(mp)
    assert(parts.length == 2)
    assert(Geometry.parseWkt(parts(0)).kind == "POLYGON")
    // part 2 keeps its hole: area 3 − 0.6
    assert(math.abs(Geometry.area(Geometry.parseWkt(parts(1))) - 2.4) < 1e-12)
    val ml = Geometry.geometries("MULTILINESTRING((0 0, 1 0), (5 5, 5 7))")
    assert(ml == Seq("LINESTRING(0 0, 1 0)", "LINESTRING(5 5, 5 7)"))
    val mpt = Geometry.geometries("MULTIPOINT((1 2), (3 4))")
    assert(mpt == Seq("POINT(1 2)", "POINT(3 4)"))
    val gc = Geometry.geometries(
      "GEOMETRYCOLLECTION(POINT(1 1), LINESTRING(0 0, 2 2))")
    assert(gc.length == 2 && gc.head.startsWith("POINT"))
    // single geometries are their own 1-element split
    assert(Geometry.geometries("POLYGON((0 0, 1 0, 1 1, 0 0))").length == 1)
    // registered additive measures sum parts; geometry_n bounds-checks
    // (spatial-join test below reuses this session registration)
    val sp = spark
    Geometry.register(sp)
    import sp.implicits._
    val row = Seq((1L, mp)).toDF("id", "wkt")
    row.createOrReplaceTempView("multis")
    val got = sp.sql(
      """SELECT st_area(wkt) a, st_n_geometries(wkt) n,
        |       st_area(st_geometry_n(wkt, 2)) a2, st_npoints(wkt) np
        |FROM multis""".stripMargin).collect().head
    assert(math.abs(got.getDouble(0) - 6.4) < 1e-12)
    assert(got.getInt(1) == 2 && math.abs(got.getDouble(2) - 2.4) < 1e-12)
    assert(got.getInt(3) == 15)
    val oob = intercept[org.apache.spark.SparkException](
      sp.sql("SELECT st_geometry_n(wkt, 3) FROM multis").collect())
    assert(oob.getMessage.contains("out of") ||
      oob.getCause.getMessage.contains("out of"))
  }

  test("line merge: sews scrambled/reversed parts, keeps degree-3 " +
    "junctions split, closes cycles") {
    // a 3-segment path emitted out of order with a flipped middle
    val merged = Geometry.lineMerge(
      "MULTILINESTRING((2 0, 3 1), (1 5, 0 0), (1 5, 2 0))")
    assert(merged == "LINESTRING(0 0, 1 5, 2 0, 3 1)", merged)
    // a T junction (degree 3 at (1,0)) must stay split
    val tee = Geometry.lineMerge(
      "MULTILINESTRING((0 0, 1 0), (1 0, 2 0), (1 0, 1 5))")
    assert(tee.startsWith("MULTILINESTRING("), tee)
    assert(Geometry.geometries(tee).length == 3, tee)
    // a closed triangle merges into one ring-like chain
    val cycle = Geometry.lineMerge(
      "MULTILINESTRING((0 0, 4 0), (4 0, 2 3), (2 3, 0 0))")
    val g = Geometry.parseWkt(cycle)
    assert(g.kind == "LINESTRING" && g.rings.head.length == 4 &&
      g.rings.head.head == g.rings.head.last, cycle)
    // single linestring passes through unchanged (canonical orientation)
    assert(Geometry.lineMerge("LINESTRING(5 5, 0 0)") ==
      "LINESTRING(0 0, 5 5)")
  }

  test("cell-bucketed intersects join finds EXACTLY the brute-force " +
    "pairs and plans one equi-join, not a cross product") {
    val sp = spark
    import sp.implicits._
    Geometry.register(sp)
    val rnd = new scala.util.Random(11)
    def rects(n: Int, offset: Long) = (1 to n).map { i =>
      val x = rnd.nextDouble * 40; val y = rnd.nextDouble * 40
      val w = 0.5 + rnd.nextDouble * 6; val h = 0.5 + rnd.nextDouble * 6
      (offset + i,
        s"POLYGON(($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))",
        x, y, w, h)
    }
    val as = rects(40, 0)
    val bs = rects(60, 1000)
    val aDf = as.map(t => (t._1, t._2)).toDF("id", "wkt")
    val bDf = bs.map(t => (t._1, t._2)).toDF("id", "wkt")
    // cell size below, at, and above the envelope scale — all complete
    for (cell <- Seq(2.0, 7.0, 50.0)) {
      val got = Geometry.intersectsJoin(aDf, bDf, "id", "wkt", cell)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (ai, _, ax, ay, aw, ah) <- as
        (bi, _, bx, by, bw, bh) <- bs
        if ax <= bx + bw && bx <= ax + aw && ay <= by + bh && by <= ay + ah
      } yield (ai, bi)).toSet
      assert(got == want,
        s"cell=$cell missing=${(want -- got).take(3)} " +
          s"extra=${(got -- want).take(3)}")
    }
    val plan = Geometry.intersectsJoin(aDf, bDf, "id", "wkt", 7.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"spatial join must not degrade to a cross product:\n$plan")
  }
}
