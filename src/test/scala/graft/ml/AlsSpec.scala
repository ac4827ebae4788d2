package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AlsSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def rmse(pred: org.apache.spark.sql.DataFrame): Double =
    pred.agg(sqrt(avg(pow(col("pred") - col("r"), 2)))).head.getDouble(0)

  test("recovers an exactly rank-2 rating matrix to near-zero error") {
    // r(u,i) = p_u · q_i for planted factors
    val pu = Map(1L -> (1.0, 0.5), 2L -> (2.0, -1.0), 3L -> (0.5, 2.0),
      4L -> (1.5, 1.0))
    val qi = Map(10L -> (1.0, 1.0), 20L -> (2.0, 0.5), 30L -> (0.5, -1.0),
      40L -> (1.0, 2.0), 50L -> (3.0, 0.0))
    val ratings = (for { (u, p) <- pu.toSeq; (i, q) <- qi.toSeq }
      yield (u, i, p._1 * q._1 + p._2 * q._2)).toDF("u", "i", "r")
    val (users, items) = Als.fit(ratings, lambda = 1e-6, iters = 8)
    val e = rmse(Als.predict(ratings, users, items))
    assert(e < 1e-3, s"rank-2 matrix should reconstruct, rmse=$e")
  }

  test("more iterations do not worsen the fit") {
    val ratings = (for { u <- 1L to 12L; i <- 1L to 9L if (u + i) % 3 != 0 }
      yield (u, i, ((u * 31 + i * 17) % 23 + 1).toDouble)).toDF("u", "i", "r")
    val e1 = { val (us, it) = Als.fit(ratings, 0.1, 1)
      rmse(Als.predict(ratings, us, it)) }
    val e4 = { val (us, it) = Als.fit(ratings, 0.1, 4)
      rmse(Als.predict(ratings, us, it)) }
    assert(e4 <= e1 + 1e-9, s"iter 4 rmse $e4 > iter 1 rmse $e1")
  }

  test("cold entities: every rated user and item gets factors") {
    val ratings = Seq((1L, 10L, 3.0), (2L, 10L, 4.0), (1L, 20L, 2.0))
      .toDF("u", "i", "r")
    val (users, items) = Als.fit(ratings, 0.1, 2)
    assert(users.count() == 2 && items.count() == 2)
    assert(Als.predict(ratings, users, items).count() == 3)
  }

  test("parameter guards") {
    val df = Seq((1L, 1L, 1.0)).toDF("u", "i", "r")
    intercept[IllegalArgumentException] { Als.fit(df, 0.1, 0) }
    intercept[IllegalArgumentException] { Als.fit(df, -1.0, 2) }
  }
}
