package graft

import graft.queries.WidthNotes
import graft.queries.WidthNotes.{Decimal38, DoubleLattice, LongCarrier, Width}
import org.scalatest.funsuite.AnyFunSuite

/** The arithmetic-width class check (r14 verdict #3): the PlanAudit
  * stance — EXECUTE the claim, don't trust the comment — applied to
  * integer width. Two rounds in a row the driver found an SF²-product
  * Long-overflow cliff by hand (stat_page_trend r13, stat_kuiper
  * r14-adjacent); this spec makes the width claim a declared,
  * machine-evaluated datum for the whole stat family:
  *
  *  1. COMPLETENESS — every `stat_*` registry query must carry a
  *     [[WidthNotes.Width]] declaration (and no declaration may go
  *     stale); a new stat query fails here until it declares.
  *  2. EXECUTED SCALE VARIABLE — each declared driving table is
  *     counted at sf0.001 AND sf0.01; the ratio must be ~SF-linear
  *     (3..20×), proving the magnitude model's n is a real scale
  *     variable, not a saturating grid.
  *  3. HEADROOM AT 10× SMOKE — maxAbs = perUnit · n01^degree,
  *     evaluated at the MEASURED sf0.01 cardinality, must keep a
  *     ≥[[WidthNotes.Headroom]]× margin under the declared carrier's
  *     limit.
  *  4. DISCLOSURE — a declaration whose carrier gives out before
  *     [[WidthNotes.TargetMult]] (the 100 TB regime) must carry a
  *     nonempty caveat naming the cliff and the widening; a
  *     caveat-free note CLAIMS the full target scale and fails if the
  *     model contradicts it.
  *
  * The sanity test reproduces the PRE-FIX stat_page_trend shape (a
  * BIGINT product of two SF-linear terms) and shows the check rejects
  * it by name, while the shipped DECIMAL(38) note passes — the same
  * prove-the-checker-catches-it pattern as PlanAuditSpec's window
  * sanity test.
  */
class WidthAuditSpec extends AnyFunSuite {

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  private def haveData =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf001)) &&
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf01))

  /** Parquet row count without a SparkSession: footer metadata. */
  private def rows(dir: String, table: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = p.getFileSystem(conf)
    val files: Seq[org.apache.hadoop.fs.Path] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
      else Seq(p)
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  test("completeness: every stat_* registry query declares a width " +
    "note, and no note is stale") {
    val statQueries = SparkEntry.queries.keySet.filter(_.startsWith("stat_"))
    val declared = WidthNotes.notes.keySet
    val missing = statQueries -- declared
    val stale = declared -- statQueries
    assert(missing.isEmpty,
      s"stat queries without a width declaration: " +
        s"${missing.toSeq.sorted.mkString(", ")} — add a " +
        "WidthNotes.Width entry stating the widest integer " +
        "intermediate's (driving, degree, perUnit, carrier)")
    assert(stale.isEmpty,
      s"width notes for queries no longer in the registry: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("executed width audit: measured driving cardinality at 10x " +
    "smoke keeps the declared headroom under each carrier limit, " +
    "and sub-target carriers disclose their cliff") {
    assume(haveData, "smoke testdata not present")
    val n001 = collection.mutable.Map.empty[String, Long]
    val n01 = collection.mutable.Map.empty[String, Long]
    val problems = Seq.newBuilder[String]
    WidthNotes.notes.toSeq.sortBy(_._1).foreach { case (name, w) =>
      val a = n001.getOrElseUpdate(w.driving, rows(sf001, w.driving))
      val b = n01.getOrElseUpdate(w.driving, rows(sf01, w.driving))
      // the scale variable must be real: sf0.001 -> sf0.01 is a 10x
      // data step, so an SF-linear table grows ~10x (3..20 tolerates
      // rounding in the generators); a saturating relation here would
      // invalidate the whole magnitude model
      if (b < a * 3 || b > a * 20)
        problems += s"$name: driving table ${w.driving} grew " +
          s"$a -> $b from sf0.001 to sf0.01 — not an SF-linear " +
          "scale variable; the width model cannot extrapolate on it"
      val maxAbs = BigDecimal(w.perUnit) * BigDecimal(b).pow(w.degree)
      if (maxAbs * WidthNotes.Headroom > w.carrier.limit)
        problems += s"$name: declared widest intermediate " +
          s"~${maxAbs.toDouble} at sf0.01 is within " +
          s"${WidthNotes.Headroom}x of the ${w.carrier.name} limit " +
          s"${w.carrier.limit.toDouble} — the carrier is already " +
          "exhausted at oracle scale"
      val safe = WidthNotes.scaleSafeMult(w, b)
      if (safe < WidthNotes.TargetMult && w.caveat.trim.isEmpty)
        problems += f"$name: carrier ${w.carrier.name} gives out at " +
          f"~$safe%.3g x sf0.01 (< ${WidthNotes.TargetMult}%.0g = " +
          "the 100 TB target) but the note carries NO caveat — " +
          "either widen the carrier or disclose the cliff and the " +
          "widening path"
      if (safe >= WidthNotes.TargetMult && w.caveat.trim.nonEmpty)
        problems += f"$name: caveat declared but the model clears " +
          f"the target (safe to ~$safe%.3g x) — stale caveat or " +
          "understated (degree, perUnit); make the note honest"
    }
    val out = problems.result()
    assert(out.isEmpty, out.mkString("\n"))
  }

  test("sanity: the pre-fix stat_page_trend shape — a BIGINT product " +
    "of two SF-linear terms — is rejected by name, while the " +
    "shipped DECIMAL(38) note passes (r14 verdict #3)") {
    assume(haveData, "smoke testdata not present")
    val nOrders = rows(sf01, "orders")
    // pre-fix: the cross-multiplied rank products s_a·n_b ran in
    // BIGINT — cents-sum × count = SF² on the Long carrier (the exact
    // shape ADVICE r13 flagged at StatQueries' page_trend, fixed by
    // the HUGEINT/DECIMAL(38,0) carry)
    val preFix = Width("orders", 2, 5e7, WidthNotes.LongCarrier)
    val safePre = WidthNotes.scaleSafeMult(preFix, nOrders)
    assert(safePre < WidthNotes.TargetMult,
      s"the audit must reject the pre-fix Long carry (safe mult " +
        s"$safePre); if this passes, the check has no teeth")
    // the pre-fix shape could not even ship with a caveat-free note:
    // the headroom assertion fires well before 100 TB
    assert(safePre < 1e3,
      s"pre-fix page_trend should die around SF~13 (mult ~1.3e3), " +
        s"got $safePre")
    // the SHIPPED note (DECIMAL(38) carry) clears the target
    val shipped = WidthNotes.notes("stat_page_trend")
    assert(shipped.carrier == WidthNotes.Decimal38)
    assert(WidthNotes.scaleSafeMult(shipped, nOrders) >=
      WidthNotes.TargetMult,
      "the shipped DECIMAL(38) page_trend carry must clear 100 TB")
    // and the carrier ladder is strictly widening
    assert(DoubleLattice.limit < LongCarrier.limit &&
      LongCarrier.limit < Decimal38.limit)
  }
}
