package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Randomized invariants for the mergeable-sketch operators — the
  * guarantees the oracled queries rely on, exercised over generated
  * inputs rather than the fixed corpora:
  *  - Bloom: NO false negatives, ever (the semi-join equality hinges on
  *    this).
  *  - Misra-Gries: every key with frequency > n/capacity survives the
  *    sketch regardless of partitioning (the candidate-superset
  *    guarantee the exact recount builds on).
  *  - TopK: equals the brute-force sort on random multisets.
  * Sampling follows the RelJsonFuzzSpec style (raw scalacheck Gen with
  * a deterministic seed walk — scalatestplus is not on the classpath).
  */
class SketchPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    var seed = rng.Seed(20260814L)
    val out = Seq.newBuilder[A]
    var got = 0
    while (got < n) {
      g.apply(params, seed).foreach { a => out += a; got += 1 }
      seed = seed.next
    }
    out.result()
  }

  test("bloom: no false negatives over random key sets (15 cases)") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1000000L, 1000000L))
      .map(_.take(300))
    samples(gen, 15).foreach { ks =>
      val df = spark.createDataFrame(ks.map(Tuple1(_))).toDF("k")
      val bits = Bloom.buildBits(df, col("k"), mBits = 1 << 14)
      val pass = df.filter(Bloom.mightContain(col("k"), bits)).count()
      assert(pass === ks.size.toLong,
        "every inserted key must pass membership")
    }
  }

  test("misra-gries: heavy keys survive any partitioning (10 cases)") {
    val gen = for {
      hot <- Gen.chooseNum(1, 4)
      coldN <- Gen.chooseNum(50, 300)
      parts <- Gen.chooseNum(1, 9)
    } yield (hot, coldN, parts)
    samples(gen, 10).foreach { case (hot, coldN, parts) =>
      val rows =
        (0 until hot).flatMap(h => Seq.fill(coldN)(s"hot_$h")) ++
          (0 until coldN).map(i => s"cold_$i")
      val df = spark.createDataFrame(rows.map(Tuple1(_))).toDF("k")
        .repartition(parts)
      val cap = 32
      val n = rows.size
      val cands = HeavyHitters.candidates(df, col("k"), cap)
        .collect().map(_.getString(0)).toSet
      rows.groupBy(identity).foreach { case (k, xs) =>
        if (xs.size > n.toDouble / cap)
          assert(cands.contains(k), s"lost heavy key $k (${xs.size}/$n)")
      }
    }
  }

  test("topk: equals brute force on random multisets (15 cases)") {
    val gen = for {
      n <- Gen.chooseNum(1, 300)
      k <- Gen.chooseNum(1, 12)
      vals <- Gen.listOfN(n, Gen.chooseNum(-50, 50))
    } yield (k, vals)
    samples(gen, 15).foreach { case (k, vals) =>
      val rows = vals.zipWithIndex.map { case (v, i) =>
        ("g", v.toDouble, s"id$i")
      }
      val df = spark.createDataFrame(rows).toDF("g", "v", "id")
      val got = TopK.perKey(df.repartition(4), col("g"), col("v"),
          col("id"), k)
        .orderBy("rank")
        .collect().map(r => (r.getDouble(2), r.getString(3))).toSeq
      val want = rows.map(t => (t._2, t._3))
        .sortBy(t => (-t._1, t._2)).take(k)
      assert(got === want)
    }
  }

  test("kmv bottom-k: the fold is a pure function of the multiset — " +
    "order, duplication, and partition merge shape are invisible " +
    "(12 cases)") {
    val gen = for {
      n <- Gen.chooseNum(1, 400)
      ks <- Gen.listOfN(n, Gen.chooseNum(0L, 1L << 32))
      m <- Gen.chooseNum(2, 16)
      cut <- Gen.chooseNum(0, n)
    } yield (ks, m, cut)
    samples(gen, 12).foreach { case (ks, m, cut) =>
      val want = ks.distinct.sorted.take(m)
      // sequential fold, any order
      val seq1 = ks.foldLeft(List.empty[Long])(Kmv.insert(_, _, m))
      val seqR = ks.reverse.foldLeft(List.empty[Long])(Kmv.insert(_, _, m))
      assert(seq1 === want, "in-order fold != distinct bottom-m")
      assert(seqR === want, "reversed fold != distinct bottom-m")
      // duplication is absorbed
      val dup = (ks ++ ks).foldLeft(List.empty[Long])(Kmv.insert(_, _, m))
      assert(dup === want, "duplicated multiset drifted")
      // aggregator merge of an arbitrary split == the whole fold
      val agg = new Kmv.BottomKAgg(m)
      val (a, b) = ks.splitAt(cut)
      val pa = a.foldLeft(agg.zero)(agg.reduce)
      val pb = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(pa, pb)) === want,
        "partial-merge != whole-multiset fold")
      // merge-of-sketches == sketch-of-union (the shippable property)
      assert(Kmv.merge(Seq(pa, pb), m) === want,
        "Kmv.merge drifted from the union bottom-m")
      // estimate: exact (hash-lattice) under capacity
      if (want.size < m)
        assert(Kmv.estimate(want, m) === want.size.toLong)
    }
  }

  test("kmv theta set-ops: estimates land in the k-driven error " +
    "envelope on random overlapping sets (10 cases, r14 verdict #6)") {
    def hash(k: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val m = 256
    // RSE of a bottom-k estimator ~ 1/sqrt(m-2); set-op estimates
    // inherit the union's sampling noise, so bound every component
    // against the UNION size with a 5-sigma envelope
    val tol = 5.0 / math.sqrt(m - 2.0)
    val gen = for {
      na <- Gen.chooseNum(2000, 8000)
      nb <- Gen.chooseNum(2000, 8000)
      ov <- Gen.chooseNum(0, math.min(na, nb))
      tag <- Gen.chooseNum(0, 1 << 20)
    } yield (na, nb, ov, tag)
    samples(gen, 10).foreach { case (na, nb, ov, tag) =>
      // A = [0, na), B = [na-ov, na-ov+nb) over tagged key strings —
      // disjoint-by-construction outside the ov-sized overlap
      val aKeys = (0 until na).map(i => s"k${tag}_$i")
      val bKeys = (na - ov until na - ov + nb).map(i => s"k${tag}_$i")
      val ska = aKeys.map(hash).foldLeft(List.empty[Long])(
        Kmv.insert(_, _, m))
      val skb = bKeys.map(hash).foldLeft(List.empty[Long])(
        Kmv.insert(_, _, m))
      val (ie, ae, be, ue) = Kmv.setOpEstimates(ska, skb, m)
      val exactInter = ov.toLong
      val exactAOnly = (na - ov).toLong
      val exactBOnly = (nb - ov).toLong
      val exactUnion = (na + nb - ov).toLong
      val envelope = tol * exactUnion
      assert(math.abs(ie - exactInter) <= envelope,
        s"inter est $ie vs $exactInter (envelope $envelope)")
      assert(math.abs(ae - exactAOnly) <= envelope,
        s"a-only est $ae vs $exactAOnly (envelope $envelope)")
      assert(math.abs(be - exactBOnly) <= envelope,
        s"b-only est $be vs $exactBOnly (envelope $envelope)")
      assert(math.abs(ue - exactUnion) <= envelope,
        s"union est $ue vs $exactUnion (envelope $envelope)")
      // partition identity: the three parts tile the union sample
      // exactly BEFORE scaling; after the per-component round each
      // term carries ≤0.5 of rounding, so the sum drifts ≤2 total
      assert(math.abs(ie + ae + be - ue) <= 2,
        s"partition identity broken beyond rounding: $ie+$ae+$be vs $ue")
    }
  }
}
