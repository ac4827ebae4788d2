package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit checks for Explain.collapseReprints — pure string-in/string-out,
  * no Spark session. The r13 driver-ADVICE regression is the focus: a
  * skip run must be DEPTH-bounded, so a sibling branch opening at the
  * same-or-shallower connector column survives even when its line
  * carries no (id). */
class ExplainCollapseSpec extends AnyFunSuite {

  test("a reused subtree collapses to its first line + tag") {
    val plan = Seq(
      "* Project (5)",
      "+- * Join (4)",
      "   :- * Scan parquet (1)",
      "   :  +- ReusedChild (2)",
      "   +- * Filter (3)",
      "      +- * Scan parquet (1)",
      "         +- ReusedChild (2)",
      "").mkString("\n")
    val out = Explain.collapseReprints(plan)
    assert(out.contains("[reused: see (1) above]"))
    // the reprint's body line is gone; the FIRST occurrence stays
    assert(out.linesIterator.count(_.contains("ReusedChild (2)")) == 1)
    assert(out.contains("reprinted subtree lines collapsed"))
  }

  test("depth bound (ADVICE r13): a sibling branch at shallower " +
    "indentation is NOT swallowed by a skip run even without an id") {
    val plan = Seq(
      "* Union (9)",
      ":- * Scan parquet (1)",
      ":  +- Child (2)",
      ":- * Scan parquet (1)", // reused -> starts a skip at depth 0
      ":  +- Child (2)", // part of the reused subtree -> dropped
      "+- SiblingNoId extra", // same-depth connector, NO id: must stay
      "   +- Leaf (7)",
      "").mkString("\n")
    val out = Explain.collapseReprints(plan)
    assert(out.contains("[reused: see (1) above]"))
    assert(out.contains("SiblingNoId extra"),
      "sibling branch without an id was swallowed by the skip run")
    assert(out.contains("Leaf (7)"))
    // exactly one dropped line (the reused child)
    assert(out.contains("[1 reprinted subtree lines collapsed"))
  }

  test("two adjacent reused runs both get tagged (a seen id at the " +
    "skip depth ends the previous run)") {
    val plan = Seq(
      "* Join (9)",
      ":- * Scan parquet (1)",
      ":- * Scan other (2)",
      "+- * Join (8)",
      "   :- * Scan parquet (1)",
      "   :- * Scan other (2)",
      "").mkString("\n")
    val out = Explain.collapseReprints(plan)
    assert(out.contains("[reused: see (1) above]"))
    assert(out.contains("[reused: see (2) above]"),
      "the second same-depth reused sibling must start its own " +
        "tagged run, not be dropped inside the first")
  }

  test("detail sections pass through untouched") {
    val plan = Seq(
      "(1) Scan parquet",
      "Output [2]: [a, b]",
      "PushedFilters: [IsNotNull(a)]",
      "").mkString("\n")
    val out = Explain.collapseReprints(plan)
    assert(out.trim == plan.trim)
    assert(!out.contains("[reused"))
  }
}
