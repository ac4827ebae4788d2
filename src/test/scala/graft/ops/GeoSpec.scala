package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {

  test("haversine matches known city distances") {
    val sp = spark
    import sp.implicits._
    // Paris (48.8566, 2.3522) — Berlin (52.52, 13.405) ≈ 877.46 km
    val d = Seq((48.8566, 2.3522, 52.52, 13.405))
      .toDF("la1", "lo1", "la2", "lo2")
      .select(Geo.haversineKm(col("la1"), col("lo1"), col("la2"),
        col("lo2")))
      .collect()(0).getDouble(0)
    assert(math.abs(d - 877.46) < 1.0)
    // zero distance to self; symmetry
    val z = Seq((10.0, 20.0)).toDF("la", "lo")
      .select(Geo.haversineKm(col("la"), col("lo"), col("la"), col("lo")))
      .collect()(0).getDouble(0)
    assert(z == 0.0)
  }

  test("cell-bucketed radius join finds EXACTLY the brute-force pairs") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("id"),
        ((col("c_custkey") * 37 % 12000) / 100.0 - 60.0).as("lat"),
        ((col("c_custkey") * 91 % 36000) / 100.0 - 180.0).as("lon"))
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey").as("id"),
        ((col("s_suppkey") * 37 % 12000) / 100.0 - 60.0).as("lat"),
        ((col("s_suppkey") * 91 % 36000) / 100.0 - 180.0).as("lon"))

    val viaCells = Geo.radiusJoin(supp, cust, "id", "lat", "lon",
      radiusKm = 300.0, cellDeg = 6.0)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val brute = supp.as("a").crossJoin(cust.as("b"))
      .withColumn("d", Geo.haversineKm(col("a.lat"), col("a.lon"),
        col("b.lat"), col("b.lon")))
      .filter(col("d") <= 300.0)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(viaCells == brute,
      s"cell candidates must be complete: missing ${brute.diff(viaCells)}")
    assert(brute.nonEmpty, "fixture must produce pairs")
  }

  test("radius join finds pairs straddling the antimeridian") {
    val sp = spark
    import sp.implicits._
    // ~22 km apart across lon ±180 — unwrapped grids miss this pair
    val a = Seq((1L, 0.0, 179.9)).toDF("id", "lat", "lon")
    val b = Seq((2L, 0.0, -179.9)).toDF("id", "lat", "lon")
    val pairs = Geo.radiusJoin(a, b, "id", "lat", "lon", 50.0, 6.0)
      .collect()
    assert(pairs.length == 1 && pairs(0).getDouble(2) < 30.0,
      "longitude cells must wrap at the antimeridian")
  }

  test("Vincenty geodesic: canonical WGS-84 test vector, haversine " +
    "agreement, symmetry") {
    // Vincenty's own published test line: Flinders Peak → Buninyong,
    // s = 54972.271 m (Geodetic Datum of Australia technical manual)
    val d = Geo.vincentyM(-37.95103342, 144.42486789,
      -37.65282114, 143.92649553)
    assert(math.abs(d - 54972.271) < 0.01, s"got $d")
    // symmetry
    val r = Geo.vincentyM(-37.65282114, 143.92649553,
      -37.95103342, 144.42486789)
    assert(math.abs(d - r) < 1e-6)
    // spheroid vs sphere: within ~0.6% of haversine over random pairs
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val (la1, lo1) = (rnd.nextDouble * 120 - 60, rnd.nextDouble * 340 - 170)
      val (la2, lo2) = (la1 + rnd.nextDouble * 20 - 10,
        lo1 + rnd.nextDouble * 20 - 10)
      val vm = Geo.vincentyM(la1, lo1, la2, lo2)
      val hk = 2 * 6371.0088 * math.asin(math.sqrt(
        math.pow(math.sin(math.toRadians(la2 - la1) / 2), 2) +
          math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
            math.pow(math.sin(math.toRadians(lo2 - lo1) / 2), 2))) * 1000
      if (hk > 1000) // skip near-coincident (relative error unstable)
        assert(math.abs(vm - hk) / hk < 0.006,
          s"($la1,$lo1)->($la2,$lo2): vincenty $vm vs haversine $hk")
    }
  }

  test("the radius join plans one equi-join shuffle, not a cross join") {
    val sp = spark
    import sp.implicits._
    val a = Seq((1L, 10.0, 10.0)).toDF("id", "lat", "lon")
    val b = Seq((2L, 10.1, 10.1)).toDF("id", "lat", "lon")
    val plan = Geo.radiusJoin(a, b, "id", "lat", "lon", 50.0, 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"radius join must not degrade to a cross product:\n$plan")
  }

  test("Vincenty direct: canonical Flinders Peak → Buninyong vector; " +
    "direct/inverse round-trip closes") {
    // the worked example from Vincenty (1975) / Geoscience Australia:
    // start -37°57'03.72030\" 144°25'29.52440\", azimuth 306°52'05.37\",
    // s = 54 972.271 m → -37°39'10.15610\" 143°55'35.38390\"
    val lat1 = -(37 + 57 / 60.0 + 3.72030 / 3600)
    val lon1 = 144 + 25 / 60.0 + 29.52440 / 3600
    val az = 306 + 52 / 60.0 + 5.37 / 3600
    val (lat2, lon2) = Geo.vincentyDestination(lat1, lon1, az, 54972.271)
    val expLat = -(37 + 39 / 60.0 + 10.15610 / 3600)
    val expLon = 143 + 55 / 60.0 + 35.38390 / 3600
    assert(math.abs(lat2 - expLat) < 1e-7 && math.abs(lon2 - expLon) < 1e-7,
      s"got ($lat2, $lon2), expected ($expLat, $expLon)")
    // direct then inverse must reproduce the distance (sub-mm)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 25) {
      val la = rnd.nextDouble * 120 - 60
      val lo = rnd.nextDouble * 340 - 170
      val a = rnd.nextDouble * 360
      val d = 1000 + rnd.nextDouble * 999000
      val (dla, dlo) = Geo.vincentyDestination(la, lo, a, d)
      val back = Geo.vincentyM(la, lo, dla, dlo)
      assert(math.abs(back - d) < 1e-3,
        s"($la,$lo) az=$a d=$d -> ($dla,$dlo), inverse $back")
    }
  }

  test("spherical polygon area: small quads approach the planar value, " +
    "holes subtract, non-polygons are zero") {
    import graft.ops.Geometry
    // 0.1° × 0.1° quad at the equator ≈ (0.1·111.195 km)² planar
    val eq = Geometry.parseWkt(
      "POLYGON((10 0, 10.1 0, 10.1 0.1, 10 0.1, 10 0))")
    val got = Geometry.sphericalAreaM2(eq)
    val planar = math.pow(0.1 * math.Pi / 180 * 6371008.8, 2)
    assert(math.abs(got - planar) / planar < 0.01, s"$got vs $planar")
    // at 60°N the same lon span shrinks by ~cos(60°) = 0.5
    val north = Geometry.parseWkt(
      "POLYGON((10 60, 10.1 60, 10.1 60.1, 10 60.1, 10 60))")
    val ratio = Geometry.sphericalAreaM2(north) / got
    assert(math.abs(ratio - 0.5) < 0.01, s"cos-lat ratio $ratio")
    // a hole removes exactly its own spherical area
    val holed = Geometry.parseWkt(
      "POLYGON((10 0, 10.1 0, 10.1 0.1, 10 0.1, 10 0), " +
        "(10.02 0.02, 10.08 0.02, 10.08 0.08, 10.02 0.08, 10.02 0.02))")
    val hole = Geometry.parseWkt(
      "POLYGON((10.02 0.02, 10.08 0.02, 10.08 0.08, 10.02 0.08, 10.02 0.02))")
    assert(math.abs(Geometry.sphericalAreaM2(holed) -
      (got - Geometry.sphericalAreaM2(hole))) < 1e-6)
    assert(Geometry.sphericalAreaM2(
      Geometry.parseWkt("LINESTRING(0 0, 1 1)")) == 0.0)
  }
}
