package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftRulesSpec extends SparkSpec {

  private def pairs = {
    val p = spark.read.parquet(s"$sfDir/part.parquet").limit(60)
      .select(col("p_name").as("a"))
    p.crossJoin(p.select(col("a").as("b")))
  }

  test("rule injects the length guard and preserves results exactly") {
    GraftFunctions.register(spark)
    GraftRules.register(spark)
    val q = pairs.filter(expr("graft_jaro_winkler(a, b) >= 0.9"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least(") &&
      optimized.contains("greatest("), optimized.take(600))
    // soundness: identical rows vs the un-guarded evaluation computed
    // through a projection (no threshold filter for the rule to match)
    val want = pairs
      .withColumn("jw", expr("graft_jaro_winkler(a, b)"))
      .filter(col("jw") >= 0.9).drop("jw")
    assert(q.exceptAll(want).isEmpty && want.exceptAll(q).isEmpty)
    assert(q.count() === want.count())
  }

  test("idempotent under the optimizer's fixpoint loop") {
    GraftFunctions.register(spark)
    GraftRules.register(spark)
    val q = pairs.filter(expr("graft_jaro_winkler(a, b) >= 0.92"))
    // would throw 'Max iterations reached' if the rewrite re-fired
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.sliding("graft_jaro_winkler".length)
      .count(_ == "graft_jaro_winkler") <= 2, plan.take(600))
    assert(q.count() >= 0)
  }

  test("vacuous thresholds (c <= 0.8) are left alone") {
    GraftFunctions.register(spark)
    GraftRules.register(spark)
    val q = pairs.filter(expr("graft_jaro_winkler(a, b) >= 0.5"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("least("), plan.take(600))
  }

  test("guard is mathematically implied: brute-force over random strings") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    def str() = (0 until rnd.nextInt(12))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    import org.apache.spark.unsafe.types.UTF8String
    (0 until 5000).foreach { _ =>
      val (a, b) = (str(), str())
      val jw = JaroWinkler.compute(UTF8String.fromString(a),
        UTF8String.fromString(b))
      for (c <- Seq(0.85, 0.9, 0.95)) {
        if (jw >= c) {
          val (s, t) = (math.min(a.length, b.length).toDouble,
            math.max(a.length, b.length).toDouble)
          assert(s >= (5 * c - 4) * t,
            s"guard would wrongly prune ('$a','$b') jw=$jw c=$c")
        }
      }
    }
  }

  test("levenshtein <= k gets the |len diff| <= k guard, results exact") {
    GraftRules.register(spark)
    val q = pairs.filter(expr("levenshtein(a, b) <= 2"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("abs(") && plan.contains("length("),
      plan.take(600))
    val want = pairs.withColumn("d", expr("levenshtein(a, b)"))
      .filter(col("d") <= 2).drop("d")
    assert(q.exceptAll(want).isEmpty && want.exceptAll(q).isEmpty)
  }

  test("extensions class applies cleanly (cluster-deploy injection path)") {
    // buildOptimizerRules is private[sql]; the runtime path above tests
    // the rule's behavior — here we pin that the spark.sql.extensions
    // entry point itself is wellformed and registers without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtensions().apply(ext)
  }
}
