package graft

/** Plan-shape audit over the bench headliners: none of them may plan a
  * CartesianProduct — the non-broadcast cross-product shuffle that
  * marks an unbucketized range/theta join or a missing equi-condition
  * (the r1-era failure mode the bucketized interval/band joins exist to
  * prevent). BroadcastNestedLoopJoin over 1-row scalar aggregates is
  * the documented acceptable pattern and is NOT flagged here.
  */
class PlanAuditSpec extends SparkSpec {

  test("no bench headliner plans a CartesianProduct") {
    val offenders = SparkEntry.benchQueries.flatMap { d =>
      val df = d.fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(d.name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("registry-wide plan sweep at smoke scale: no CartesianProduct; " +
    "every BroadcastNestedLoopJoin builds from a bounded relation; " +
    "every unpartitioned window runs over an aggregated relation") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    import org.apache.spark.sql.catalyst.plans.logical
    // The one corpus-scale shape the CartesianProduct check cannot see
    // (r9 verdict #4): a theta-join whose small side fits the broadcast
    // threshold AT SMOKE SCALE plans BroadcastNestedLoopJoin, not
    // CartesianProduct — at 100× the build side no longer fits and the
    // plan degrades. A BNLJ is scale-safe only when its build side is
    // structurally bounded: every leaf path passes through a
    // grouping-free (1-row) aggregate or a limit/top-k. Queries whose
    // BNLJ build side is a model-sized relation the code explicitly
    // broadcast()-hints (k-row fits whose size is an algorithm
    // constant, reviewed by hand) go on the allowlist; any NEW query
    // with an unlisted unbounded BNLJ fails this sweep.
    val allowlist: Set[String] = Set(
      // a<b pair join over the whole corpus BY DESIGN — the query's
      // own scaladoc marks it the ORACLE-regime formulation;
      // dedup_embedding_lsh / embeddingDedupPairs is the corpus-scale
      // path for the same contract
      "dedup_embedding",
      // build side is the distinct-calendar-days grid — bounded by
      // the TIME RANGE of the data (days × 256 HLL registers /
      // rolling-window day pairs), not by corpus row count
      "agg_hll_sliding",
      "events_rolling_dau",
      // DOMAIN-bounded grouping keys the structural check cannot see:
      // o_orderstatus has 3 values, the isotonic/calibration bins are
      // least(floor(.),9)-capped at 10, nations number 25 — each build
      // is an aggregate over a fixed-cardinality attribute domain
      "gov_t_closeness", "ml_isotonic_calibration", "stat_kendall_tau",
      // lang-domain class model (k ≈ 6 languages): the NB class grid
      // is a grouped aggregate over the language attribute domain
      "ml_naive_bayes",
      // o_orderpriority has exactly 5 values: the (value × group)
      // lattice's group side is an aggregate over that fixed domain
      "stat_jonckheere",
      "stat_dunn", // pair walk over the 3-value returnflag group relation
      "stat_nemenyi", // pair walk over the 5-priority rank-sum relation
      // SERIES/GRID-sized builds (the documented ts_acf stance): these
      // relations are bounded by the TIME RANGE (daily series, lag
      // grids, backtest folds, order-stat picks at rn=1 / top-decile,
      // decile grids, candidate rankings, score-lattice histograms) —
      // model-sized at any corpus scale, invisible to the structural
      // bound because the cardinality comes from the value domain
      "ml_conformal", "ml_learning_curve", "rank_borda_condorcet",
      "stat_hill_tail", "stat_lorenz_curve", "stat_mann_kendall",
      "stat_permutation_test", "ts_acf", "ts_pacf", "ts_ljung_box",
      "ts_backtest", "ts_page_hinkley",
      // the operator under test IS a cross join (nation × region
      // dimension tables — the rel algebra's CrossJoin node)
      "join_cross")
    def bounded(p: SparkPlan): Boolean = p match {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      // NOTE deliberately NO bare LocalLimitExec case (ADVICE r10): a
      // per-partition limit scales with the partition count, so it
      // bounds nothing at 1000 executors — only a GlobalLimit /
      // CollectLimit / TakeOrdered ancestor (matched above/below, and
      // always planned ABOVE its LocalLimit) makes a limit structural.
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
        true
      // spark.range(k) — cardinality is a plan-time literal
      case r: org.apache.spark.sql.execution.RangeExec
        if r.range.numElements <= BigInt(100000) => true
      case other =>
        other.children.nonEmpty && other.children.forall(bounded)
    }
    // Window audit (the third scale-killer shape): `Window.orderBy`
    // with NO partition spec moves its ENTIRE input to one task —
    // fine on a day-grid / rank / model relation (an Aggregate or a
    // limit of the corpus, the documented ts_acf stance), fatal on a
    // raw corpus scan (the Positional device exists for those).
    def boundedBelow(p: logical.LogicalPlan): Boolean = p match {
      case _: logical.Aggregate => true
      case _: logical.GlobalLimit => true
      // NO bare LocalLimit and NO Sample cases (ADVICE r10): a
      // per-partition limit scales with partition count and a sample
      // is a constant FRACTION of the corpus — an unpartitioned
      // window over either is exactly the single-task scale-killer
      // this sweep exists to exclude. (GlobalLimit always plans above
      // its LocalLimit, so real limits still match.)
      case r: logical.Range => r.numElements <= BigInt(100000)
      case l: logical.LocalRelation => l.data.size <= 100000
      case leaf if leaf.children.isEmpty => false
      case other => other.children.forall(boundedBelow)
    }
    // rank_bradley_terry's final ranking window reads the
    // localCheckpoint'd k-item strength model (k = #event types, the
    // MM fit's output) — a LogicalRDD leaf the structural check
    // cannot see through; model-sized by construction (reviewed)
    val windowAllowlist: Set[String] = Set("rank_bradley_terry")
    // ONE df build per query serves all THREE plan checks (building a
    // df can run side-effect jobs — source writes, model-fit
    // collects — acceptable at sf0.001; assertions are on final plans)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val df = fn(spark, sfDir)
        val sparkPlan = df.queryExecution.sparkPlan
        val cart =
          if (sparkPlan.toString.contains("CartesianProduct")) Some(name)
          else None
        val badBnlj = sparkPlan.collect {
          case j: BroadcastNestedLoopJoinExec =>
            val build =
              if (j.buildSide == BuildLeft) j.left else j.right
            if (bounded(build) || allowlist(name)) None
            else Some(s"$name: unbounded BNLJ build side:\n$build")
        }.flatten
        val badWin = df.queryExecution.optimizedPlan.collect {
          case w: logical.Window if w.partitionSpec.isEmpty &&
            !boundedBelow(w.child) && !windowAllowlist(name) =>
            s"$name: unpartitioned window over unaggregated input:\n" +
              w.child.treeString.linesIterator.take(6).mkString("\n")
        }
        spark.catalog.clearCache()
        (cart, badBnlj, badWin)
    }
    val carts = rows.flatMap(_._1)
    val bnljs = rows.flatMap(_._2)
    val wins = rows.flatMap(_._3)
    assert(carts.isEmpty,
      s"cartesian products in: ${carts.mkString(", ")}")
    assert(bnljs.isEmpty,
      s"unbounded BNLJ build sides:\n${bnljs.mkString("\n")}")
    assert(wins.isEmpty,
      s"unpartitioned windows over raw input:\n${wins.mkString("\n")}")
  }

  test("filter + projection pushdown reach the parquet scan on " +
    "representative filter-over-scan queries (r10 verdict #6)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // The one plan property the sweep above cannot see: a wrapper
    // regression (an opaque UDF in a filter, a schema-erasing
    // round-trip, a barrier misplaced before the filter) silently
    // turns a pruned, filter-pushed scan into a full-table read —
    // invisible at sf0.001, a 10×-bytes regression at 100 TB. Each
    // named query filters a base table on a scan-supported predicate
    // and projects a strict column subset, so its plan MUST show (a)
    // at least one parquet scan with non-empty PushedFilters and (b)
    // every base-table scan reading fewer columns than the table
    // carries. Checked on the pre-AQE sparkPlan (scan nodes are
    // stable there; AQE only re-plans exchanges).
    val expectPushdown = Seq(
      "agg_basic",        // lineitem: l_shipdate <= filter
      "rel_filter",       // algebra Filter lowering over lineitem
      "join_inner",       // orderkey IsNotNull into both sides
      "join_asof",        // events/orders scans under the asof union
      "dedup_minhash_lsh", // documents: text IsNotNull
      "sim_topk")         // embeddings: vec IsNotNull
    val problems = expectPushdown.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val scans = df.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s
      }
      spark.catalog.clearCache()
      val pushed = scans.exists(s =>
        s.metadata.get("PushedFilters").exists(f => f != "[]" &&
          f.nonEmpty))
      val unpruned = scans.filter(s =>
        s.requiredSchema.fields.length >=
          s.relation.dataSchema.fields.length &&
          s.relation.dataSchema.fields.length > 1)
      (if (scans.isEmpty) Seq(s"$name: no parquet scan found") else Nil) ++
        (if (!pushed && scans.nonEmpty)
          Seq(s"$name: no scan carries a pushed filter") else Nil) ++
        unpruned.map(s => s"$name: unpruned scan reads all " +
          s"${s.relation.dataSchema.fields.length} columns of " +
          s.relation.location.rootPaths.headOption.fold("?")(_.getName))
    }
    assert(problems.isEmpty,
      s"pushdown regressions:\n${problems.mkString("\n")}")
  }

  test("ml_pr_curve plans no single-partition window over the score " +
    "relation (Positional cumsum path, r7 ask #5)") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = SparkEntry.queries("ml_pr_curve")(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: logical.Window => w
    }
    assert(windows.nonEmpty, "expected the bucketed cumsum windows")
    windows.foreach { w =>
      val ordersScore = w.orderSpec.exists(_.child.references
        .exists(_.name == "score"))
      if (ordersScore)
        assert(w.partitionSpec.nonEmpty,
          s"window over score must be bucket-partitioned:\n$w")
    }
  }
}
