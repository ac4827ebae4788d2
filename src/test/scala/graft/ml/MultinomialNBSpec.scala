package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** MultinomialNB semantics: sklearn's Laplace-smoothed count model —
  * hand-computed class sums, argmax with smallest-class tie-break,
  * loud rejection of negative/non-finite features, and builtin-registry
  * resolution (so a deserialized plan naming it runs anywhere). */
class MultinomialNBSpec extends AnyFunSuite {

  private val xs = Array(
    Array(1.0, 0.0), Array(2.0, 1.0), // class 0: sums [3,1], total 4
    Array(0.0, 3.0), Array(1.0, 4.0)) // class 1: sums [1,7], total 8
  private val ys = Array(0.0, 0.0, 1.0, 1.0)

  test("fit statistics match the hand-computed smoothed log model") {
    val m = MultinomialNB.deserialize(MultinomialNB.fit(xs, ys))
      .asInstanceOf[MultinomialNB.Model]
    assert(m.classes.toSeq == Seq(0.0, 1.0))
    assert(m.logPriors.forall(p => math.abs(p - math.log(0.5)) < 1e-12))
    // θ_cj = (S_cj + 1) / (S_c + d)
    assert(math.abs(m.featLogProb(0)(0) - math.log(4.0 / 6)) < 1e-12)
    assert(math.abs(m.featLogProb(0)(1) - math.log(2.0 / 6)) < 1e-12)
    assert(math.abs(m.featLogProb(1)(0) - math.log(2.0 / 10)) < 1e-12)
    assert(math.abs(m.featLogProb(1)(1) - math.log(8.0 / 10)) < 1e-12)
  }

  test("predict argmaxes the smoothed scores; ties keep the smallest class") {
    val m = MultinomialNB.deserialize(MultinomialNB.fit(xs, ys))
    assert(MultinomialNB.predict(m, Array(3.0, 0.0)) == 0.0)
    assert(MultinomialNB.predict(m, Array(0.0, 5.0)) == 1.0)
    // all-zero counts → scores equal the (equal) log priors → tie → class 0
    assert(MultinomialNB.predict(m, Array(0.0, 0.0)) == 0.0)
  }

  test("negative or non-finite features fail loud at fit") {
    val bad = Array(Array(1.0, -2.0))
    val e = intercept[IllegalArgumentException] {
      MultinomialNB.fit(bad, Array(0.0))
    }
    assert(e.getMessage.contains("non-negative"))
    intercept[IllegalArgumentException] {
      MultinomialNB.fit(Array(Array(Double.NaN)), Array(0.0))
    }
  }

  test("resolvable from the builtin estimator registry by name") {
    assert(Estimators.builtin("multinomial_nb").contains(MultinomialNB))
    assert(Estimators.builtinNames.contains("multinomial_nb"))
  }
}
