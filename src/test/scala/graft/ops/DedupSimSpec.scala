package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSimSpec extends SparkSpec {

  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("minhash LSH finds every exact duplicate (jaccard 1 pairs)") {
    val sp = spark
    import sp.implicits._
    // plant exact dups: copy 5 docs under new ids
    val dups = docs.limit(5)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val corpus = docs.unionByName(dups)
    val pairs = TextDedup.minhashDedupPairs(corpus, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = docs.limit(5).select("doc_id").as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    assert(expected.subsetOf(pairs),
      s"missed exact-dup pairs: ${expected.diff(pairs)}")
  }

  test("minhashCrossPairs finds exact train-side copies of eval docs " +
    "(bipartite LSH, no self-pairs)") {
    val sp = spark
    import sp.implicits._
    // eval = 5 real docs; train = the rest plus verbatim copies of 3
    // eval docs under new ids (the leakage the cross pass must catch)
    val evalDocs = docs.orderBy("doc_id").limit(5)
    val evalIds = evalDocs.select("doc_id").as[Long].collect().toSet
    val leaked = evalDocs.limit(3)
      .withColumn("doc_id", col("doc_id") + 2000000L)
    val train = docs.filter(!col("doc_id").isin(evalIds.toSeq: _*))
      .unionByName(leaked)
    val pairs = TextDedup.minhashCrossPairs(train, evalDocs, "doc_id",
      "text", shingleN = 3, k = 32, bands = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = evalDocs.limit(3).select("doc_id").as[Long].collect()
      .map(id => (id + 2000000L, id)).toSet
    assert(expected.subsetOf(pairs),
      s"missed leaked pairs: ${expected.diff(pairs)}")
    assert(pairs.forall { case (a, b) => a != b })
  }

  test("sub-shingle-length docs still dedup via the whole-doc fallback") {
    val sp = spark
    import sp.implicits._
    // 2-token docs (< shingleN=3): the r2 shingler emitted zero
    // shingles for these, so identical short docs could never pair
    val short = Seq(
      (1L, "hello world"), (2L, "hello world"), (3L, "goodbye moon"),
      (4L, "completely different text that is long enough to shingle ok"))
      .toDF("doc_id", "text")
    val pairs = TextDedup.minhashDedupPairs(short, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("multi-table ANN recall beats single-table on the same corpus") {
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("n_id"),
      col("embedding").as("n_vec"))
    val bf = VectorSim.topKBruteForce(queries, corpus, 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(tables: Int): Double = {
      val ann = VectorSim.topKAnn(queries, corpus, 3, planes = 6,
        probeHamming = 2, tables = tables)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      bf.intersect(ann).size.toDouble / bf.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"more tables must not lose recall ($r1 -> $r4)")
    assert(r4 >= 0.8, s"4-table recall contract: got $r4")
  }

  test("IVF ANN: recall ≥ 0.8 vs exact top-k; quantizer is " +
    "deterministic across trainings; candidates come from a cell " +
    "equi-join, not a cross product") {
    graft.functions.GraftFunctions.register(spark)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb
      .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
    val cents = VectorSim.kmeansCentroids(corpus, col("n_vec"),
      k = 8, iters = 5)
    // same data, fresh training → same model up to float summation
    // order of the per-cell means (shuffle merge order is not a
    // guaranteed order; exact-bytes equality would be flaky on a
    // multi-partition corpus)
    val cents2 = VectorSim.kmeansCentroids(corpus, col("n_vec"),
      k = 8, iters = 5)
    assert(cents.length == cents2.length)
    cents.zip(cents2).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"centroid drift $x vs $y") }
    }

    val bf = VectorSim.topKBruteForce(queries, corpus, 3, native = true)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = VectorSim.topKAnnIvf(queries, corpus, 3, cents, nprobe = 5,
      native = true)
    val got = ivf.select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(got).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall $recall below contract")

    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"IVF candidates must flow through the cell equi-join:\n$plan")
  }

  test("IVF quantizer: ragged vectors neither poison training nor win " +
    "the argmin") {
    val sp = spark
    import sp.implicits._
    // 60 well-formed 4-dim vectors + one 5-dim straggler
    val rows = (0 until 60).map(i => (i.toLong,
      Seq(math.sin(i * 1.0), math.cos(i * 2.0),
        math.sin(i * 3.0), math.cos(i * 5.0)))) :+
      (99L, Seq(1.0, 1.0, 1.0, 1.0, 1.0))
    val df = rows.toDF("id", "vec")
    val cents = VectorSim.kmeansCentroids(df, col("vec"), k = 4, iters = 3)
    assert(cents.forall(_.length == 4),
      "a ragged vector must not leak phantom dimensions into centroids")
    // the ragged vector ranks every cell at +inf — it must not land
    // FIRST (NULL would sort first; coalesce sends it last, cell ties
    // broken ascending, so it still gets cell 0 but via +inf, and a
    // well-formed vector's argmin is unaffected)
    val celled = df.select(col("id"),
      element_at(VectorSim.nearestCells(col("vec"), cents, 1), 1).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(celled.values.toSet.size > 1,
      "well-formed vectors must spread across cells, not collapse to one")
  }

  test("embeddingDedupPairs (LSH self-join, no broadcast) equals the " +
    "brute-force pair set, and topKAnn's shuffle path equals its " +
    "broadcast path") {
    val corpus = emb.select(col("vec_id").as("id"),
      col("embedding").as("vec"))
    val brute = emb.select(col("vec_id").as("a_id"),
        col("embedding").as("a_vec"))
      .join(emb.select(col("vec_id").as("b_id"),
        col("embedding").as("b_vec")), col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        VectorSim.cosine(col("a_vec"), col("b_vec")).as("cos"))
      .filter(col("cos") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorSim.embeddingDedupPairs(corpus, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute,
      s"missed: ${brute.diff(lsh)}; extra: ${lsh.diff(brute)}")

    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val full = emb.select(col("vec_id").as("n_id"),
      col("embedding").as("n_vec"))
    def ann(bcast: Boolean) = VectorSim.topKAnn(queries, full, 3,
        planes = 6, probeHamming = 2, tables = 4, broadcastProbes = bcast)
      .select("q_id", "rank", "n_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ann(bcast = false) == ann(bcast = true),
      "shuffle-join and broadcast-join ANN must agree exactly")
  }

  test("semanticDedup: within-cell near-dups drop the higher id; " +
    "cross-cell similarity never pairs; anchors broadcast") {
    val sp = spark
    import sp.implicits._
    // 2-D unit-ish vectors: cell 0 ≈ x-axis, cell 1 ≈ y-axis
    val anchors = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("aid", "avec")
    val corpus = Seq(
      (10L, Seq(1.0f, 0.01f)),   // cell 0
      (11L, Seq(1.0f, 0.02f)),   // cell 0, near-dup of 10 → dropped
      (12L, Seq(0.9f, 0.45f)),   // cell 0 (closer to x), far from 10/11
      (20L, Seq(0.01f, 1.0f)),   // cell 1
      (21L, Seq(0.02f, 1.0f)))   // cell 1, near-dup of 20 → dropped
      .toDF("id", "vec")
    val out = VectorSim.semanticDedup(corpus, anchors, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out(10L) == ((0L, true)) && out(11L) == ((0L, false)),
      s"got $out")
    assert(out(20L) == ((1L, true)) && out(21L) == ((1L, false)))
    // 12 is cosine-close to neither 10 nor 11 at 0.95 → kept
    assert(out(12L)._2, s"got $out")
    // every input id appears exactly once
    assert(out.keySet == Set(10L, 11L, 12L, 20L, 21L))
  }

  test("dedup guards: bands must divide k; idCol named 'id' works") {
    val sp = spark
    import sp.implicits._
    val d = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ee"))
      .toDF("id", "text")
    // bands > k would bucket EVERYTHING together (silent O(n^2))
    intercept[IllegalArgumentException] {
      TextDedup.minhashDedupPairs(d, "id", "text", k = 8, bands = 16)
    }
    intercept[IllegalArgumentException] {
      TextDedup.minhashDedupPairs(d, "id", "text", k = 20, bands = 16)
    }
    // the most natural id-column name must not be an ambiguous join
    val pairs = TextDedup.minhashDedupPairs(d, "id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("jaccard is exact on known sets") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(TextDedup.jaccard(col("x"), col("y"))).collect()(0)
      .getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12) // |{b,c}| / |{a,b,c,d}|
  }

  test("simhash of identical token streams is identical; disjoint " +
    "streams differ") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "zeta omega theta lambda sigma epsilon delta gamma beta alpha"))
      .toDF("id", "text")
    val sims = TextDedup.simhashAgg(df, "id",
        split(col("text"), " "), 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(sims(1L) != sims(3L))
    val dist = spark.range(1).select(
      TextDedup.hamming(lit(sims(1L)), lit(sims(3L))).as("d"))
      .collect()(0).getInt(0)
    assert(dist > 0 && dist <= 32)
  }

  test("cosine matches a hand computation and is symmetric") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Seq(1.0f, 0.0f, 1.0f), Seq(1.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val c1 = df.select(VectorSim.cosine(col("a"), col("b"))).collect()(0)
      .getDouble(0)
    val c2 = df.select(VectorSim.cosine(col("b"), col("a"))).collect()(0)
      .getDouble(0)
    assert(math.abs(c1 - 0.5) < 1e-12) // 1 / (sqrt2 * sqrt2)
    assert(c1 == c2)
  }

  test("brute-force top-k is deterministic, self-excluding, and ranked") {
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("n_id"),
      col("embedding").as("n_vec"))
    val top = VectorSim.topKBruteForce(queries, corpus, 5).collect()
    assert(top.length == 15)
    assert(!top.exists(r => r.getLong(0) == r.getLong(2)),
      "a vector must not be its own neighbor")
    top.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b - 1e-9 },
        "cosine must be non-increasing in rank")
    }
  }

  test("ANN candidates are a subset of the corpus and respect k") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("n_id"),
      col("embedding").as("n_vec"))
    val ann = VectorSim.topKAnn(queries, corpus, 3, planes = 6,
      probeHamming = 2).collect()
    assert(ann.groupBy(_.getLong(0)).values.forall(_.length <= 3))
  }
}
