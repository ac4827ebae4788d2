package graft.rel

import graft.SparkSpec
import graft.api.GraftSession
import graft.ml.{LinearRegression, Pipeline, StandardScaler}
import graft.udf.{Builtins, FunctionCatalog, Udwf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import java.nio.file.Files

/** UDXF/UDWF/ML as first-class algebra nodes: plans containing them
  * serialize, hash, build, cache, and execute — the r2 parity gap
  * ("xorq can build an ML pipeline; graft cannot") closed. */
class UdxfMlRelSpec extends SparkSpec {

  private val steps = Seq(ScaleSpec("l_quantity", "qs"),
    LinRegSpec("qs", "l_extendedprice", "pred"))
  private def li: Rel = ScanParquet(s"$sfDir/lineitem.parquet")

  test("FitRel lowers to a lazy model table matching the eager fit") {
    val model = new Lower(spark).lower(FitRel(li, steps))
    assert(model.columns.toSeq == Seq("step", "param", "value", "blob"))
    val got = model.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

    val eager = Pipeline(Seq(
      StandardScaler("l_quantity", "qs"),
      LinearRegression("qs", "l_extendedprice", "pred")))
      .fit(spark.read.parquet(s"$sfDir/lineitem.parquet"))
    val Seq(sc, lr) = eager.steps
    assert(math.abs(got(("0:scale(l_quantity->qs)", "mu")) -
      sc.params("mu")) < 1e-9)
    assert(math.abs(got(("0:scale(l_quantity->qs)", "sigma")) -
      sc.params("sigma")) < 1e-9)
    assert(math.abs(got(("1:linreg(l_extendedprice~qs->pred)", "slope")) -
      lr.params("slope")) < 1e-6)
    assert(math.abs(got(("1:linreg(l_extendedprice~qs->pred)", "intercept")) -
      lr.params("intercept")) < 1e-6)
  }

  test("TransformRel(FitRel) predictions equal the eager pipeline") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val deferred = new Lower(spark)
      .lower(TransformRel(li, FitRel(li, steps), steps))
      .select(col("l_orderkey"), col("l_linenumber"), col("pred"))
      .orderBy("l_orderkey", "l_linenumber").collect()
    val eager = Pipeline(Seq(
      StandardScaler("l_quantity", "qs"),
      LinearRegression("qs", "l_extendedprice", "pred"))).fit(df)
      .transform(df)
      .select(col("l_orderkey"), col("l_linenumber"), col("pred"))
      .orderBy("l_orderkey", "l_linenumber").collect()
    assert(deferred.length == eager.length)
    deferred.zip(eager).foreach { case (d, e) =>
      assert(math.abs(d.getDouble(2) - e.getDouble(2)) < 1e-6)
    }
  }

  test("MinMaxSpec scales into [0,1] and chains with linreg") {
    val mmSteps = Seq(MinMaxSpec("l_quantity", "qn"),
      LinRegSpec("qn", "l_extendedprice", "pred"))
    val out = new Lower(spark)
      .lower(TransformRel(li, FitRel(li, mmSteps), mmSteps))
    val r = out.agg(org.apache.spark.sql.functions.min("qn"),
      org.apache.spark.sql.functions.max("qn"),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).collect()(0)
    assert(math.abs(r.getDouble(0) - 0.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(RelJson.parse(RelJson.write(FitRel(li, mmSteps))) ==
      FitRel(li, mmSteps))
  }

  test("a model is a relation: Cache(FitRel) hits on the second " +
    "execute and the transform reads the artifact") {
    val root = Files.createTempDirectory("graft_model_cache_").toString
    val g = new GraftSession(spark, storages = Map("default" ->
      new graft.cache.ParquetDirStorage(spark, root)))
    val plan = TransformRel(li, Cache(FitRel(li, steps), "default",
      "snapshot"), steps)
    val first = g.execute(plan).agg(count(lit(1))).collect()(0).getLong(0)
    val second = g.execute(plan).agg(count(lit(1))).collect()(0).getLong(0)
    assert(first == second)
    assert(g.cacheManager.misses == 1 && g.cacheManager.hits == 1)
  }

  test("EstimatorSpec (arbitrary-estimator fit): deferred equals eager, " +
    "the plan round-trips JSON, and the model bytes live in the blob " +
    "column of the model relation") {
    val estSteps = Seq(EstimatorSpec("gaussian_nb",
      Seq("l_quantity", "l_discount"), "cls", "pred_cls"))
    val prep = Project(li, Seq(
      "l_orderkey" -> RCol("l_orderkey"),
      "l_linenumber" -> RCol("l_linenumber"),
      "l_quantity" -> RCol("l_quantity"),
      "l_discount" -> RCol("l_discount"),
      "cls" -> RRaw("CASE l_returnflag WHEN 'A' THEN 0.0 " +
        "WHEN 'N' THEN 1.0 ELSE 2.0 END")))
    assert(RelJson.parse(RelJson.write(FitRel(prep, estSteps))) ==
      FitRel(prep, estSteps))

    val model = new Lower(spark).lower(FitRel(prep, estSteps))
    val mrow = model.collect()
    assert(mrow.length == 1 && mrow(0).getString(1) == "model")
    assert(mrow(0).isNullAt(2) && mrow(0).getString(3).nonEmpty,
      "estimator model must serialize into the blob cell")

    val deferred = new Lower(spark)
      .lower(TransformRel(prep, FitRel(prep, estSteps), estSteps))
      .select(col("l_orderkey"), col("l_linenumber"), col("pred_cls"))
      .orderBy("l_orderkey", "l_linenumber").collect()
    val df = new Lower(spark).lower(prep)
    val eager = graft.ml.Pipeline(Seq(graft.ml.EstimatorStep(
      graft.ml.GaussianNB, Seq("l_quantity", "l_discount"), "cls",
      "pred_cls"))).fit(df).transform(df)
      .select(col("l_orderkey"), col("l_linenumber"), col("pred_cls"))
      .orderBy("l_orderkey", "l_linenumber").collect()
    assert(deferred.length == eager.length && deferred.nonEmpty)
    deferred.zip(eager).foreach { case (d, e) =>
      assert(d.getDouble(2) == e.getDouble(2))
    }
  }

  test("a fitted estimator model is a relation: Cache(FitRel(est)) " +
    "round-trips through the parquet artifact and serves the transform") {
    val estSteps = Seq(EstimatorSpec("gaussian_nb",
      Seq("l_quantity"), "cls", "pred_cls"))
    val prep = Project(li, Seq(
      "l_orderkey" -> RCol("l_orderkey"),
      "l_quantity" -> RCol("l_quantity"),
      "cls" -> RRaw("CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END")))
    val root = Files.createTempDirectory("graft_est_cache_").toString
    val g = new GraftSession(spark, storages = Map("default" ->
      new graft.cache.ParquetDirStorage(spark, root)))
    val plan = TransformRel(prep, Cache(FitRel(prep, estSteps), "default",
      "snapshot"), estSteps)
    val first = g.execute(plan)
      .select(col("l_orderkey"), col("pred_cls"))
      .orderBy("l_orderkey").collect()
    val second = g.execute(plan)
      .select(col("l_orderkey"), col("pred_cls"))
      .orderBy("l_orderkey").collect()
    assert(first.toSeq == second.toSeq && first.nonEmpty)
    assert(g.cacheManager.misses == 1 && g.cacheManager.hits == 1,
      "second execute must read the cached model artifact")
  }

  test("the iterative logreg estimator learns a separable boundary") {
    val sp = spark
    import sp.implicits._
    val df = sp.range(0, 201).select(
      (col("id").cast("double") - 100.0).divide(10.0).as("x"))
      .withColumn("y", (col("x") > 0).cast("double"))
    val fitted = graft.ml.Pipeline(Seq(graft.ml.EstimatorStep(
      graft.ml.LogisticRegressionGD(200, 0.5), Seq("x"), "y", "p")))
      .fit(df)
    val scored = fitted.transform(df)
      .withColumn("pred", (col("p") > 0.5).cast("double"))
    val acc = graft.ml.Metrics.classification(
      scored.select(col("y").cast("int").as("y"),
        col("pred").cast("int").as("p")), "y", "p")
      .collect()(0).getDouble(0)
    assert(acc >= 0.99, s"separable data must be learned, accuracy $acc")
  }

  test("ridge estimator: alpha=0 recovers an exact linear relation; " +
    "alpha shrinks weights toward zero; builtin name resolves") {
    // y = 3 + 2u - 5v exactly, on a deterministic non-degenerate grid
    val xs = (for (i <- 0 until 20; j <- 0 until 20)
      yield Array(i.toDouble, j * 0.5)).toArray
    val ys = xs.map(r => 3.0 + 2.0 * r(0) - 5.0 * r(1))
    val ols = graft.ml.RidgeRegression(0.0)
    val m0 = ols.deserialize(ols.fit(xs, ys))
      .asInstanceOf[graft.ml.RidgeRegression#Model]
    assert(math.abs(m0.w(0) - 2.0) < 1e-9 &&
      math.abs(m0.w(1) + 5.0) < 1e-9 && math.abs(m0.b - 3.0) < 1e-9)
    assert(math.abs(ols.predict(m0, Array(7.0, 1.5)) -
      (3.0 + 14.0 - 7.5)) < 1e-9)
    val shrunk = graft.ml.RidgeRegression(1e6)
    val m1 = shrunk.deserialize(shrunk.fit(xs, ys))
      .asInstanceOf[graft.ml.RidgeRegression#Model]
    assert(math.abs(m1.w(0)) < math.abs(m0.w(0)) &&
      math.abs(m1.w(1)) < math.abs(m0.w(1)))
    assert(graft.ml.Estimators.builtin("ridge(10.0)")
      .contains(graft.ml.RidgeRegression(10.0)))
    // singular (constant) feature with alpha=0 fails loudly
    val const = xs.map(r => Array(1.0, r(1)))
    intercept[IllegalArgumentException](ols.fit(const, ys))
  }

  test("kmeans estimator: separates blobs, deterministic under input " +
    "permutation, low-coordinate blob gets cluster 0") {
    val blobA = (0 until 30).map(i => Array(0.0 + i % 3, 0.0 + i % 2))
    val blobB = (0 until 30).map(i => Array(10.0 + i % 3, 10.0 + i % 2))
    val xs = (blobA ++ blobB).toArray
    val ys = Array.fill(xs.length)(0.0)
    val km = graft.ml.KMeansEstimator(2, 10)
    val m = km.deserialize(km.fit(xs, ys))
    assert(blobA.forall(p => km.predict(m, p.toArray) == 0.0))
    assert(blobB.forall(p => km.predict(m, p.toArray) == 1.0))
    // multiset-determinism: reversed input produces the same model bytes
    val m2 = km.deserialize(km.fit(xs.reverse, ys))
    assert(blobA.forall(p => km.predict(m2, p.toArray) == 0.0) &&
      blobB.forall(p => km.predict(m2, p.toArray) == 1.0))
    assert(graft.ml.Estimators.builtin("kmeans(2,10)")
      .contains(graft.ml.KMeansEstimator(2, 10)))
    // k larger than distinct points: still total, predicts valid ids
    val tiny = Array(Array(1.0), Array(2.0))
    val m3 = km.deserialize(graft.ml.KMeansEstimator(5, 3).fit(
      tiny, Array(0.0, 0.0)))
    assert(graft.ml.KMeansEstimator(5, 3).predict(m3, Array(1.0)) >= 0.0)
    // NaN rows are dropped (public fit contract matches the UDAF skip;
    // an unfiltered NaN breaks the sort's strict weak ordering)
    val mNaN = km.deserialize(km.fit(
      xs :+ Array(Double.NaN, 1.0), ys :+ 0.0))
    assert(blobA.forall(p => km.predict(mNaN, p.toArray) == 0.0) &&
      blobB.forall(p => km.predict(mNaN, p.toArray) == 1.0))
  }

  test("a null feature cell yields a null prediction, not a task crash") {
    val sp = spark
    import sp.implicits._
    val train = Seq((0.0, 0.0), (1.0, 0.0), (10.0, 1.0), (11.0, 1.0))
      .toDF("x", "y")
    val fitted = graft.ml.Pipeline(Seq(graft.ml.EstimatorStep(
      graft.ml.GaussianNB, Seq("x"), "y", "p"))).fit(train)
    val score = Seq((1, Option(0.5)), (2, Option.empty[Double]))
      .toDF("id", "x")
    val got = fitted.transform(score).orderBy("id").collect()
    assert(got(0).getDouble(2) == 0.0)
    assert(got(1).isNullAt(2),
      "null feature must produce a null prediction")
  }

  test("UdxfRel executes via the catalog; contract drift and missing " +
    "names fail fast") {
    val u = Builtins.docStats
    val node = UdxfRel(
      Project(ScanParquet(s"$sfDir/documents.parquet"),
        Seq("doc_id" -> RCol("doc_id"), "text" -> RCol("text"))),
      u.name,
      FunctionCatalog.ddl(u.schemaIn.fields.toSeq),
      FunctionCatalog.ddl(u.schemaOut.fields.toSeq))
    val out = new Lower(spark, Map.empty, Builtins.catalog).lower(node)
    assert(out.columns.toSeq == Seq("doc_id", "n_chars", "n_tokens", "head"))
    assert(out.count() ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())

    // missing from catalog
    intercept[IllegalArgumentException] {
      new Lower(spark).lower(node)
    }
    // declared contract drifted from the registered implementation
    val drifted = node.copy(schemaOut = Seq("doc_id" -> "BIGINT"))
    intercept[IllegalArgumentException] {
      new Lower(spark, Map.empty, Builtins.catalog).lower(drifted)
    }
  }

  test("UdwfRel applies a registered window evaluator") {
    val w = Udwf(
      partitionBy = Seq("l_returnflag"), orderBy = Seq("l_orderkey"),
      outName = "running_share", outType = DoubleType,
      evaluate = rows => {
        val total = rows.map(_.getAs[Double]("l_quantity")).sum
        var acc = 0.0
        rows.map { r => acc += r.getAs[Double]("l_quantity"); acc / total }
      })
    val cat = FunctionCatalog.empty.withUdwf("running_share", w)
    val node = UdwfRel(
      Project(li, Seq("l_returnflag" -> RCol("l_returnflag"),
        "l_orderkey" -> RCol("l_orderkey"),
        "l_quantity" -> RCol("l_quantity"))),
      "running_share", Seq("l_returnflag"), Seq("l_orderkey"),
      "running_share", "DOUBLE")
    val out = new Lower(spark, Map.empty, cat).lower(node)
    val last = out.orderBy(col("l_returnflag"), col("l_orderkey"))
      .groupBy("l_returnflag").agg(max(col("running_share")).as("m"))
      .collect()
    last.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))

    // declared window contract must match the registered one
    intercept[IllegalArgumentException] {
      new Lower(spark, Map.empty, cat)
        .lower(node.copy(orderBy = Seq("l_quantity")))
    }

    // declared evaluation mode and params must match the registration
    intercept[IllegalArgumentException] {
      new Lower(spark, Map.empty, cat)
        .lower(node.copy(mode = "evaluate_all_with_rank"))
    }
    intercept[IllegalArgumentException] {
      new Lower(spark, Map.empty, cat)
        .lower(node.copy(params = Seq("alpha" -> "0.5")))
    }
  }

  test("a plan with UDXF + fitted pipeline builds, loads by hash, and " +
    "re-executes equal results (Cli run path)") {
    val buildsDir = Files.createTempDirectory("graft_builds_ml_").toString
    val u = Builtins.docStats
    val plan = Sort(
      TransformRel(
        UdxfRel(
          Project(ScanParquet(s"$sfDir/documents.parquet"),
            Seq("doc_id" -> RCol("doc_id"), "text" -> RCol("text"))),
          u.name,
          FunctionCatalog.ddl(u.schemaIn.fields.toSeq),
          FunctionCatalog.ddl(u.schemaOut.fields.toSeq)),
        FitRel(
          UdxfRel(
            Project(ScanParquet(s"$sfDir/documents.parquet"),
              Seq("doc_id" -> RCol("doc_id"), "text" -> RCol("text"))),
            u.name,
            FunctionCatalog.ddl(u.schemaIn.fields.toSeq),
            FunctionCatalog.ddl(u.schemaOut.fields.toSeq)),
          Seq(LinRegSpec("n_tokens", "n_chars", "pred_chars"))),
        Seq(LinRegSpec("n_tokens", "n_chars", "pred_chars"))),
      Seq(SortKey(RCol("doc_id"), asc = true, nullsFirst = true)))

    val art = graft.build.Build.save(plan, buildsDir)
    val loaded = graft.build.Build.load(buildsDir, art.hash)
    assert(loaded == plan)

    val g = new GraftSession(spark, functions = Builtins.catalog)
    val direct = g.execute(plan).collect()
    val viaArtifact = g.execute(loaded).collect()
    assert(direct.toSeq == viaArtifact.toSeq)
    assert(direct.nonEmpty)
  }
}
