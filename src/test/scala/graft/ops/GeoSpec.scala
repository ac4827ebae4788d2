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
}
