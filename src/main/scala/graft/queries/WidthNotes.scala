package graft.queries

/** Arithmetic-WIDTH declarations for the rank/stat query family —
  * the class check behind r14 verdict #3: the driver found two
  * SF²-product Long-overflow cliffs by hand in consecutive rounds
  * (stat_page_trend, stat_kuiper), so the width claim every stat
  * query's comment makes ("EXACT BIGINTs", "carried through
  * DECIMAL(38,0)", "exact on the 2^53 double lattice") is now a
  * DECLARED, MACHINE-EVALUATED datum instead of prose. Each `stat_*`
  * registry query declares the WIDEST integer intermediate its
  * arithmetic produces as a magnitude model
  *
  *   maxAbs(n) = perUnit · n^degree
  *
  * where n is the row count of the `driving` table, together with the
  * CARRIER that holds it (BIGINT / the 2^53 exact-double lattice /
  * DECIMAL(38,0)). WidthAuditSpec EXECUTES the model: it counts the
  * driving table at sf0.001 and sf0.01 (the scale variable must be
  * real, not assumed), evaluates maxAbs at the measured 10×-smoke
  * cardinality, asserts a ≥[[WidthNotes.Headroom]]× margin against
  * the carrier limit, and derives the SCALE multiple at which the
  * margin runs out ([[WidthNotes.scaleSafeMult]]). A query whose
  * carrier gives out before [[WidthNotes.TargetMult]] (the 100 TB
  * regime, SF ~1e5 = 1e7 × sf0.01) MUST disclose that in `caveat` —
  * silence claims the full target scale. New stat queries fail the
  * spec's completeness sweep until they declare a note.
  *
  * The registry is DATA about the queries, not test code: it ships in
  * main so the declared envelope travels with the library (the same
  * stance as the PlanAudit BNLJ allowlist bounds).
  */
object WidthNotes {

  sealed trait Carrier {
    def limit: BigDecimal
    def name: String
  }
  /** Spark BIGINT / DuckDB BIGINT: 2⁶³−1 (ANSI overflow throws). */
  case object LongCarrier extends Carrier {
    val limit = BigDecimal(Long.MaxValue); val name = "BIGINT"
  }
  /** IEEE double holding EXACT integers: the 2⁵³ lattice — used where
    * a comment claims "exactly-representable double" sums. */
  case object DoubleLattice extends Carrier {
    val limit = BigDecimal(9007199254740992L); val name = "double-2^53"
  }
  /** DECIMAL(38,0) / DuckDB HUGEINT-via-DECIMAL: 10³⁸−1. */
  case object Decimal38 extends Carrier {
    val limit = BigDecimal(10).pow(38) - 1; val name = "DECIMAL(38,0)"
  }

  /** One query's width model: widest integer ≈ perUnit · n^degree on
    * `carrier`, n = rows(driving). `caveat` documents the cliff when
    * the carrier gives out before the 100 TB target (empty = the
    * model clears TargetMult with Headroom to spare — enforced). */
  final case class Width(
      driving: String,
      degree: Int,
      perUnit: Double,
      carrier: Carrier,
      caveat: String = "") {
    require(degree >= 0 && perUnit > 0, s"bad width model $this")
  }

  /** Safety margin the model must keep at the evaluated scale. */
  val Headroom: Double = 4.0

  /** sf0.01 → ~100 TB (TPC-H SF ~1e5): the multiple a caveat-free
    * declaration must survive. */
  val TargetMult: Double = 1e7

  /** How many × beyond the measured sf0.01 cardinality the carrier
    * holds with [[Headroom]] to spare: the m solving
    * Headroom · perUnit · (n·m)^degree = limit. Infinite for
    * degree 0. */
  def scaleSafeMult(w: Width, n01: Long): Double =
    if (w.degree == 0) Double.PositiveInfinity
    else math.pow(
      (w.carrier.limit / (Headroom * w.perUnit)).toDouble,
      1.0 / w.degree) / n01

  // Shorthand
  private val L = LongCarrier
  private val D = Decimal38
  private val F = DoubleLattice

  /** The declarations. perUnit provenance (value-domain upper bounds
    * of the testdata generators, engine-independent): event value
    * cents ≤ 5e4; order total cents ≤ 5e7; extended-price cents ≤
    * 1.05e7 (net ≤ 1.2e7 after (1−disc)(1+tax)); quantity ≤ 50
    * (cents 5e3); discount/tax lattice ≤ 10/8 hundredths. Degrees:
    * 1 = plain counts/sums; 2 = products of two SF-linear terms
    * (rank·count, cum·n); 3+ = the brunner/cvm-style prefix
    * machines. */
  val notes: Map[String, Width] = Map(
    // counts / plain sums — degree 1
    "stat_ab_ttest" -> Width("events", 1, 5e4, L),
    "stat_trimmed_mean" -> Width("events", 1, 5e4, L),
    "stat_overdispersion" -> Width("events", 1, 1e4, L),
    "stat_wilson_ci" -> Width("events", 1, 1, L),
    "stat_mann_kendall" -> Width("events", 1, 5e4, L),
    "stat_friedman" -> Width("lineitem", 1, 100, L),
    "stat_nemenyi" -> Width("lineitem", 1, 100, L),
    "stat_capture_recapture" -> Width("events", 1, 1, L),
    "stat_weibull_fit" -> Width("events", 1, 100, L),
    "stat_chi2" -> Width("events", 1, 1, L),
    "stat_mcnemar" -> Width("events", 1, 1, L),
    "stat_sprt" -> Width("events", 1, 3e6, L),
    "stat_fisher_exact" -> Width("lineitem", 1, 1, L),
    "stat_wilcoxon_signed" -> Width("events", 1, 5e4, L),
    "stat_cochran_armitage" -> Width("events", 1, 100, L),
    "stat_permutation_test" -> Width("events", 1, 5e4, L),
    "stat_hill_tail" -> Width("orders", 1, 100, L),
    "stat_kaplan_meier" -> Width("events", 1, 1, L),
    "stat_bootstrap_ci" -> Width("events", 1, 5e4, L),
    "stat_benford" -> Width("orders", 1, 1, L),
    "stat_theil_sen" -> Width("events", 1, 5e4, L),
    "stat_cox_ph" -> Width("events", 1, 1, L),
    "stat_power_analysis" -> Width("events", 0, 1e6, L),
    "stat_qq_arms" -> Width("lineitem", 1, 5e3, L),
    "stat_gini" -> Width("customer", 1, 1, L),
    "stat_anova" -> Width("lineitem", 1, 2500, L),
    "stat_runs_test" -> Width("events", 1, 1, L),
    "stat_survival_rmst" -> Width("events", 1, 1, L),
    "stat_jonckheere" -> Width("lineitem", 2, 1, L,
      "pairwise count·cum products are SF2; BIGINT passes 2^63 near " +
        "SF~250 — widen the U accumulators to DECIMAL(38) beyond"),
    "stat_logrank" -> Width("events", 1, 1, L),
    "stat_mood_median" -> Width("orders", 1, 1, L),
    "stat_cochran_q" -> Width("events", 1, 1, L),
    "stat_fdr_bh" -> Width("events", 1, 1, L),
    "stat_hodges_lehmann" -> Width("orders", 1, 1e3, L),
    "stat_sign_test" -> Width("orders", 1, 1, L),
    "stat_quade" -> Width("events", 1, 100, L),
    "stat_lorenz_curve" -> Width("customer", 1, 5e8, L,
      "total-revenue cents in BIGINT pass 2^63 near SF~3e4; widen " +
        "the cumulative value sums to DECIMAL(38) beyond"),
    // plain BIGINT cents sums over money columns — the carrier holds
    // to SF 3e3..1e4, short of the 100 TB target: disclosed
    "stat_meta_fixed" -> Width("orders", 1, 5e7, L,
      "BIGINT order-cents sums pass 2^63 near SF~1e4; the existing " +
        "DECIMAL(38) second-moment path is the widening template"),
    "stat_equivalence_tost" -> Width("lineitem", 1, 1.2e7, L,
      "BIGINT net-price-cents sums pass 2^63 near SF~3e3; widen " +
        "first moments to DECIMAL(38) beyond"),
    "stat_bland_altman" -> Width("orders", 1, 5e7, L,
      "BIGINT cents-difference sums pass 2^63 near SF~1e4; widen to " +
        "DECIMAL(38) beyond"),
    "stat_levene" -> Width("orders", 1, 5e7, L,
      "BIGINT |x-med| cents sums pass 2^63 near SF~1e4; the " +
        "DECIMAL(38) second-moment path is the widening template"),
    "stat_grubbs" -> Width("orders", 1, 5e7, L,
      "BIGINT cents sums pass 2^63 near SF~1e4; widen to " +
        "DECIMAL(38) beyond"),
    "stat_kendall_tau" -> Width("orders", 1, 5e7, L,
      "BIGINT per-nation cents sums pass 2^63 near SF~1e4 (their " +
        "sign-only cross-products already go through signum)"),
    "stat_bartlett" -> Width("orders", 1, 5e7, L,
      "BIGINT per-group cents sums pass 2^63 near SF~1e4; the " +
        "DECIMAL(38) Svv path is the widening template"),
    "stat_breusch_pagan" -> Width("orders", 2, 2.5e15, D,
      "DECIMAL(38) moment cross-products (sx*sy ~ (cents*n)^2) pass " +
        "38 digits near SF~7e4 — rescale cents to dollars beyond"),
    // SF² products / rank sums — degree 2
    "stat_ks_2sample" -> Width("lineitem", 2, 1, L,
      "the exact D numerator c0*n1 - c1*n0 is SF2; BIGINT passes " +
        "2^63 near SF~500 (disclosed in the query doc) — quantize " +
        "or widen to DECIMAL(38) beyond"),
    "stat_kruskal_wallis" -> Width("lineitem", 2, 2, L,
      "doubled-midrank rank sums ~2n^2 pass 2^63 near SF~180; widen " +
        "sr2 to DECIMAL(38) beyond"),
    "stat_dunn" -> Width("lineitem", 2, 2, L,
      "same doubled-midrank machinery as stat_kruskal_wallis: rank " +
        "sums ~2n^2 pass 2^63 near SF~180"),
    "stat_mannwhitney" -> Width("events", 2, 0.5, F,
      "rank-sum exactness on the 2^53 double lattice holds to " +
        "~SF70; beyond, quantize ranks or carry DECIMAL(38)"),
    "stat_spearman" -> Width("lineitem", 2, 0.5, F,
      "midrank products on the 2^53 double lattice hold to ~SF10; " +
        "beyond, the Positional midranks need DECIMAL(38) moments"),
    // DECIMAL(38)-carried SF²⁺ machines — the page_trend/kuiper class
    "stat_kuiper" -> Width("lineitem", 2, 1, D),
    "stat_page_trend" -> Width("orders", 2, 5e7, D),
    "stat_cliffs_delta" -> Width("lineitem", 2, 1, D),
    "stat_wasserstein" -> Width("lineitem", 2, 50, D),
    "stat_energy_distance" -> Width("lineitem", 2, 1.2e7, D),
    "stat_brunner_munzel" -> Width("lineitem", 3, 4, D),
    "stat_ansari_bradley" -> Width("lineitem", 3, 4, D),
    "stat_mood_scale" -> Width("lineitem", 3, 2, D),
    "stat_cramers_v" -> Width("lineitem", 4, 1, D,
      "the squared deviation d^2 is SF^4; 38 digits hold to ~SF370 " +
        "— rescale the contingency counts beyond"),
    "stat_cramer_von_mises" -> Width("lineitem", 5, 1, D,
      "the (a+b)*(cumA*m - cumB*n)^2 integrand is SF^5; 38 digits " +
        "hold to ~SF5 — beyond, run the identical machine on the " +
        "quantized value histogram (counts in coarser units)"),
    "stat_cvm" -> Width("lineitem", 5, 1, D,
      "cnt*(cumx*ny - cumy*nx)^2 is SF^5; 38 digits hold to ~SF5 — " +
        "quantize the histogram counts beyond"),
    "stat_anderson_darling" -> Width("lineitem", 5, 1, D,
      "l*(nt*m1 - n1*b)^2 is SF^5; 38 digits hold to ~SF5 — " +
        "quantize the histogram counts beyond"),
    // r15 additions
    "stat_welch_anova" -> Width("lineitem", 1, 2500, L),
    "stat_bartels_rank" -> Width("orders", 1, 2.1e4, L),
    "stat_tukey_hsd" -> Width("lineitem", 1, 2500, L),
    "stat_mad" -> Width("orders", 1, 1, L),
    "stat_jarque_bera" -> Width("orders", 1, 6.25e30, D,
      "4th-power cents sums exhaust DECIMAL(38) near SF~3; skewness/" +
        "kurtosis are scale-invariant — quantize cents to dollars " +
        "(or coarser) beyond and the statistics are unchanged"),
  )
}
