package graft

import org.apache.spark.sql.execution.SparkPlan

/** 100 TB plan-shape regression guard: no graded query may compile to a
  * cartesian product or broadcast-nested-loop join, except the three
  * documented quadratic correctness baselines (each of which has a
  * graded linear-in-N counterpart: LSH/IVF candidates into the same
  * verify tail). A refactor that silently degrades a join to NLJ fails
  * here, not at 100 TB.
  *
  * The io_ and stream_ query families execute side effects (file
  * writes, streaming replay) at construction time, so they are
  * exercised by their own specs and the DuckDB gate instead;
  * everything else is planned without execution.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // sim_cosine_pairs / sim_topk_bruteforce / dedup_ann_recall: exact
  // correctness baselines whose non-equi join has a BOUNDED side (a
  // ≤100-id query set / the ≤1000-vector exact subset), so the
  // nested-loop is O(|Q|·N) or O(cap²), never O(N²) in corpus size.
  // dedup_embedding_clusters: same bounded-subset baseline, but its
  // join executes during construction (the CC tail's driver path
  // collects), so the returned plan can't show it either way.
  // sim_ann_ivf: its two nested-loop joins broadcast the FIXED-SIZE
  // centroid table (nlist is independent of N), so they are linear in
  // N — the exemption is justified, not a smell.
  // sketch_theta_intersect: its two nested-loop joins attach ONE-ROW
  // scalar tables (the global theta and the exact-intersection count)
  // to the sample aggregate — a broadcast of exactly one row each, the
  // plan-side equivalent of bm25Topk's driver-scalar literal.
  // sim_mips_topk: bounded-query-set exact baseline like
  // sim_topk_bruteforce — O(|Q|·N) with |Q| fixed, never O(N²).
  // text_source_drift: its cross join completes the |sources| × 50
  // (distinct-sources × top-50-vocab) grid — a product of two BOUNDED
  // aggregates, constant-size at any corpus scale.
  // sketch_ams_f2: one cross join of two ONE-ROW global aggregates
  // (exact F2 × estimated F2) — the scalar-attach pattern.
  // stats_bootstrap_ci: two cross joins attaching the ONE-ROW ci_lo /
  // ci_hi order-statistic rows to the one-row point aggregate — scalar
  // attach again; every input is a global aggregate, nothing scales
  // with N.
  // q56_funnel: two cross joins of ONE-ROW stage-count aggregates —
  // the same scalar-attach shape.
  // sketch_cms_merge: one cross join of the ONE-ROW cell-compare
  // aggregate with the ONE-ROW top-user estimate row — scalar attach.
  // sim_binary_sign_ann: bounded-query-set exact Hamming baseline like
  // sim_topk_bruteforce — O(|Q|·N) with |Q| ≤ 100, never O(N²).
  // sketch_theta_anotb: same shape as sketch_theta_intersect — its
  // nested-loop joins attach the ONE-ROW theta scalar and the ONE-ROW
  // exact-difference count; the data joins (anti over ≤ k hashes) are
  // hash joins.
  // sim_matryoshka: bounded-query-set coarse scan like
  // sim_topk_bruteforce — O(|Q|·N) with |Q| ≤ 100, never O(N²); the
  // full-dim rerank touches only |Q|·20 candidates.
  // geo_knn: bounded-query-set exact spatial scan — same O(|Q|·N)
  // baseline pattern (|Q| ≤ 100 enforced by the absolute qid < 15000
  // cap, sf-independent); the linear path is geo_grid_join's cells.
  // sim_threshold_sweep: bounded-subset exact pair scan (cap² with the
  // cap enforced by a require) — the dedup_embedding_clusters shape.
  private val quadraticBaselines = Set(
    "sim_cosine_pairs", "sim_topk_bruteforce", "dedup_embedding_clusters",
    "sim_ann_ivf", "dedup_ann_recall", "sketch_theta_intersect",
    "sim_mips_topk", "text_source_drift", "sketch_ams_f2",
    "stats_bootstrap_ci", "q56_funnel", "sketch_cms_merge",
    "sim_binary_sign_ann", "sketch_theta_anotb", "sim_matryoshka",
    "geo_knn", "sim_threshold_sweep",
    // sim_mmr: candidate generation joins a BOUNDED query set (every
    // 100th vector below the absolute 20000 cap, |Q| ≤ 200 at any sf)
    // against the corpus — O(|Q|·N) like sim_topk_bruteforce; the MMR
    // tail itself is ≤8 rows per query.
    "sim_mmr",
    // graph_mst: one cross join of two ONE-ROW aggregates (forest
    // totals × component count) — the documented scalar-join pattern.
    "graph_mst")

  private val sideEffecting = (n: String) =>
    n.startsWith("io_") || n.startsWith("stream_")

  private def offenders(plan: SparkPlan): Seq[String] = {
    val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
    plan.collect {
      case p if bad.exists(p.nodeName.contains) => p.nodeName
    }
  }

  test("no graded query plans a cartesian or nested-loop join") {
    val checked = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(quadraticBaselines)
      .filterNot(sideEffecting)
    assert(checked.size >= 40, s"guard lost coverage: only $checked")
    val failures = checked.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // sparkPlan, not executedPlan: AQE wraps the executed plan in an
      // AdaptiveSparkPlanExec whose collect() sees no children, which
      // would make this guard vacuously green.
      val found = offenders(df.queryExecution.sparkPlan)
      if (found.nonEmpty) Some(s"$name -> ${found.mkString(",")}") else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // Unpartitioned windows move ALL rows to one task — acceptable only
  // when the windowed table is bounded (calendar days, digit cells,
  // replicate/vocab/source cardinality), the query is a documented
  // exact-statistic total sort whose scaladoc names the approximate /
  // partitioned alternative, or the single-partition rank is the graded
  // miniature of a repartitionByRange order (scaladoc says so). Every
  // query below carries that justification; anything new fails the
  // guard until it is either repartitioned or justified here.
  //   stats_gini_concentration / stats_ks_test / stats_mannwhitney:
  //     exact-rank statistics over the reduced per-entity table —
  //     documented total sorts, approx alternative named in scaladoc.
  //   stats_chi2 / stats_benford / stats_spearman: windows over
  //     digit/contingency-cell/rank tables of constant cardinality.
  //   stats_bootstrap_ci: order-statistic rank over the ≤200-row
  //     replicate table.
  //   stats_autocorr / stats_cusum / q26_gapfill / q53_rolling_slope:
  //     lag/lead/rank over the ≤31-row calendar-day series.
  //   stats_logrank: suffix-sum risk sets over the ≤31-row lifetime
  //     table (the per-user horizon is a driver scalar since r7).
  //   q51_decile_profile / q63_rfm: exact decile/quintile ntiles over
  //     the per-customer rollup — exact quantile boundaries are a
  //     total order by definition; reduced table, documented.
  //   pipe_vocab_topk / pipe_bpe_merges / text_zipf: rank over the
  //     aggregated token/pair vocabulary — vocabulary-bounded, not
  //     corpus-bounded.
  //   pipe_temperature_mix / pipe_token_budget: scalar-total and rank
  //     over the per-SOURCE rollup (|sources| is a handful).
  //   pipe_curriculum: rank over a limit(100) prefix.
  //   pipe_interleave / pipe_sorted_batches: deterministic training
  //     ORDER builders — the single-partition rank is the graded
  //     miniature of the repartitionByRange order the scaladoc
  //     prescribes at scale (interleave also caps at 60 positions).
  private val singlePartitionWindowBaselines = Set(
    "stats_gini_concentration", "stats_ks_test", "stats_mannwhitney",
    "stats_chi2", "stats_benford", "stats_spearman", "stats_bootstrap_ci",
    "stats_autocorr", "stats_cusum", "q26_gapfill", "q53_rolling_slope",
    "stats_logrank", "q51_decile_profile", "q63_rfm",
    "pipe_vocab_topk", "pipe_bpe_merges", "text_zipf",
    "pipe_temperature_mix", "pipe_token_budget", "pipe_curriculum",
    "pipe_interleave", "pipe_sorted_batches")

  private def unpartitionedWindows(plan: SparkPlan): Seq[String] =
    plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w.nodeName
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
          if w.partitionSpec.isEmpty => w.nodeName
    }

  test("only justified queries plan a single-partition window") {
    val checked = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(sideEffecting)
    val offendersFound = checked.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val found = unpartitionedWindows(df.queryExecution.sparkPlan)
      if (found.nonEmpty) Some(name) else None
    }.toSet
    val unlisted = offendersFound -- singlePartitionWindowBaselines
    assert(unlisted.isEmpty,
      s"new single-partition windows slipped in (justify or repartition): " +
        unlisted.toSeq.sorted.mkString(", "))
    val stale = singlePartitionWindowBaselines -- offendersFound
    assert(stale.isEmpty,
      s"stale single-partition-window exemptions (drop them): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("the quadratic baselines really are the only nested-loop plans") {
    // inverse guard: if one of them stops being quadratic, promote it
    // out of the exemption list instead of carrying a stale exemption.
    // Only the two whose join is visible in the returned plan qualify
    // (see the exemption comment for the other two).
    Seq("sim_cosine_pairs", "sim_topk_bruteforce").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      assert(offenders(df.queryExecution.sparkPlan).nonEmpty,
        s"$name no longer plans a nested-loop join — drop its exemption")
    }
  }
}
