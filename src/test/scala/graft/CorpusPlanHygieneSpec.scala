package graft

/** Corpus-wide physical-plan hygiene: every registered query's executed
  * plan, audited mechanically — the per-operator pins in PlanShapeSpec
  * catch regressions in the operators they name; this suite catches the
  * operator nobody pinned.
  *
  *  - `CartesianProduct` (the NON-broadcast cartesian — both sides
  *    partitioned, quadratic work per partition pair) must never
  *    appear. Zero occurrences across the corpus today; any future one
  *    is an accidental non-equi join that would be a 100 TB killer.
  *  - `BroadcastNestedLoopJoin` always broadcasts one side, so it is
  *    legitimate exactly where that side is intrinsically tiny (a
  *    single query vector, a one-row total, an nProbe cluster list, a
  *    mixture-sized dim). Those users are whitelisted BY NAME — a new
  *    BNLJ outside the list means a join lost its equi key silently.
  */
class CorpusPlanHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plans legitimately contain a BroadcastNestedLoopJoin
    * (tiny broadcast side by construction; audited 2026-08).
    */
  private val bnljWhitelist = Set(
    "q_ann_batch",      // broadcast query-vector set vs corpus scores
    "q_rrf",            // broadcast query vectors + one-row avgdl/totals
    "q_graph_ann",      // broadcast query-vector set vs corpus scores
    "q_ann_filtered",   // broadcast query-vector set vs corpus scores
    "q_ann_ivf",        // broadcast nProbe cluster list
    "q_ann_recall",     // broadcast probe ranks grid (Q x nCentroids)
    "q_ann_recall_sampled", // broadcast sampled query set + probe grid
    "q_ivf_cost",       // broadcast query-vector set vs corpus scores
    "q_ann_topk",       // broadcast single query vector
    "q_bm25",           // broadcast one-row corpus totals + avgdl
    "q_burstiness",     // broadcast one-row corpus doc count N
    "q_acf",            // calendar census x broadcast <= 7-row lag grid
    "q_changepoint",    // calendar census x broadcast one-row totals
    "q_cooc",           // broadcast one-row corpus doc count N
    "q_dsir",           // broadcast one-row target/raw census totals
    "q_ks_drift",       // value grid x broadcast bounded source census
    "q_hard_neg",       // broadcast query-vector set vs corpus scores
    "q_heaps",          // 4-row fraction dim x <= 8-row bucket censuses
    "q_coverage",       // sources x broadcast 4-row k grid
    "q_integrity",      // broadcast one-row expected-totals relation
    "q_interarrival",   // range join on a 64-row broadcast bucket dim
    "q_jsd",            // sources x broadcast top-V bucket grid
    "q_kanon",          // broadcast one-row record total
    "q_label_balance",  // broadcast one-row totals + one-row summary
    "q_ldiv",           // broadcast one-row record total
    "q_basket",         // broadcast one-row order total
    "q_dow",            // broadcast one-row grand total
    "q_lorenz",         // one-row totals x 3-row broadcast cut grid
    "q_survival",       // broadcast one-row censoring horizon
    "q_cusum",          // broadcast one-row (D, T) totals
    "q_autocorr",       // daily census x broadcast 3-row lag grid
    "q_zorder",         // 192-row zone maps x broadcast 16-row probes
    "q_fk_audit",       // five 1-row audit aggregates cross-joined
    "q_heavy",          // broadcast one-row corpus token total N
    "q_theilsen",       // calendar-bounded daily census self-pairs
    "q_mann_kendall",   // calendar-bounded census self-pairs + one-rows
    "q_good_turing",    // broadcast one-row totals (T, V, N1)
    "q_cramers_v",      // levels x levels grid + one-row totals
    "q_kendall_tau",    // daily census self-pairs + one-row C/D/tie rows
    "q_benford",        // broadcast one-row total into the 9-digit grid
    "q_gap_census",     // one-row summary x calendar-bounded histogram
    "q_runs_test",      // broadcast one-row median into the day census
    "q_levene",         // broadcast one-row global (N,k,Z,SS,U) census
    "q_cuped",          // broadcast one-row median-day boundary
    "q_kmv_overlap",    // broadcast tiny source-pair grid
    "q_qte",            // census x broadcast 4-row quantile grid
    "q_power",          // welch census x broadcast 4-row delta grid
    "q_did",            // broadcast one-row median-day boundary
    "q_dedup_yield",    // four one-row legs x broadcast corpus total
    "q_fano",           // broadcast one-row user-total summary
    "q_hill",           // one-row threshold/total/sum relations joined
    "q_retention_slope", // offset grid x cohort census + pair slopes
    "q_semdedup_sweep", // broadcast 4-row eps grid x vector profile
    "q_cluster_stability", // three one-row pair-count relations joined
    "q_lsh_recall",     // three one-row pair-count relations joined
    "q_rfm",            // one-row as-of date x 4-row quintile edge grids
    "q_ab_test",        // broadcast one-row arm-totals relation
    "q_shrinkage",      // two broadcast one-row global-fit relations
    "q_mips",           // broadcast single query vector + one-row tau
    "q_norm_census",    // broadcast one-row total
    "q_pca",            // broadcast one-row rescale max per round
    "q_skipgram",       // broadcast one-row pair total
    "q_lm_score",       // broadcast one-row vocab-size V
    "q_kn_score",       // broadcast one-row V and B model constants
    "q_mix",            // broadcast one-row bottleneck-source argmin
    "q_mrl_recall",     // broadcast query-vector set + 3-row dim grid
    "q_mrr",            // broadcast query-vector set vs corpus scores
    "q_ndcg",           // broadcast query-vector set vs corpus scores
    "q_sq_search",      // broadcast query-vector set vs corpus scores
    "q_ppl_buckets",    // broadcast one-row vocab-size V (via lmScore)
    "q_psi",            // 9-row broadcast decile edges + one-row total
    "q_score_calibration", // 9-row broadcast decile edges over census
    "q_pq_recall",      // broadcast query-vector set vs corpus (truth)
    "q_pq_rerank",      // broadcast single query vector (rerank stage)
    "q_pq_serve",       // broadcast single query vector (rerank stage)
    "q_range_join",     // pure range join on a broadcast bucket dim
    "q_resample",       // users x broadcast span-days grid (<= 31 rows)
    "q_tfidf",          // broadcast one-row corpus doc count N
    "q_topk_per_label") // broadcast single query vector

  test("no CartesianProduct anywhere; BNLJ only in whitelisted queries") {
    val offendersCart = Seq.newBuilder[String]
    val offendersBnlj = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) offendersCart += name
      if (p.contains("BroadcastNestedLoopJoin") &&
        !bnljWhitelist(name)) offendersBnlj += name
      spark.catalog.clearCache()
    }
    assert(offendersCart.result().isEmpty,
      s"non-broadcast cartesian product in: ${offendersCart.result()}")
    assert(offendersBnlj.result().isEmpty,
      "unexpected BroadcastNestedLoopJoin (a join lost its equi key?) " +
        s"in: ${offendersBnlj.result()}")
  }
}
