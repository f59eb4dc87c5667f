package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchQueries
import graft.sources.Tables

/** HLL approx-distinct: the one sketch without a DuckDB oracle (register
  * layouts are engine-specific), so its contract is asserted here — the
  * documented error bound and the mergeable-summary property.
  */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_hll: estimate within 3-sigma of the register sketch's rsd") {
    val rows = SketchQueries.qHll(spark, dir).collect()
    assert(rows.nonEmpty)
    // m = 256 registers → rsd ≈ 1.04/√m = 6.5 % (linear counting
    // serves the small-range groups well inside that)
    val bound =
      (3 * 1.04 / math.sqrt(SketchQueries.HllM.toDouble) * 1e6).toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("err_ppm") <= bound,
        s"${r.getString(0)}: approx=${r.getAs[Long]("approx_users")} " +
          s"exact=${r.getAs[Long]("exact_users")}")
    }
  }

  test("q_hll_census: z_int identity against the T20 register " +
    "relation, duplication invariance, small-range switch") {
    import sqlImplicits._
    val out = SketchQueries.qHllCensus(spark, dir).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, dir)
    // z_int recomputed from the shared register kernel, per group
    val regs = SketchQueries.hllRegistersGrouped(
        ev.select(col("event_type"), col("user_id")), "event_type")
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    out.foreach { r =>
      val g = regs(r.getAs[String]("event_type"))
      val zObs = g.map(x => 1L << (53 - x.getAs[Long]("rho")).toInt).sum
      val zInt = (SketchQueries.HllM - g.length) *
        9007199254740992L + zObs
      assert(r.getAs[Long]("z_int") === zInt)
      assert(r.getAs[Long]("n_buckets") === g.length.toLong)
      assert(r.getAs[Long]("v_zero") ===
        SketchQueries.HllM - g.length)
      // the small-range switch: integer-exact decision
      val expectLc = r.getAs[Long]("est_users") <=
        5L * SketchQueries.HllM / 2L &&
        r.getAs[Long]("n_buckets") < SketchQueries.HllM
      assert(r.getAs[Long]("use_lc") === (if (expectLc) 1L else 0L))
    }
    // the estimate is a function of the REGISTER FILE only: feeding
    // every event twice changes nothing (element-wise max absorbs)
    val doubled = Tables.events(spark, dir)
    val est2 = SketchQueries.hllRegistersGrouped(
        doubled.unionAll(doubled)
          .select(col("event_type"), col("user_id")), "event_type")
      .collect().groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(x => (x.getAs[Long]("bucket"),
        x.getAs[Long]("rho"))).toSet).toMap
    val est1 = regs.view.mapValues(_.map(x =>
      (x.getAs[Long]("bucket"), x.getAs[Long]("rho"))).toSet).toMap
    assert(est1 === est2)
  }

  test("q_hll: estimate is partitioning-invariant (sketches merge)") {
    // HLL registers combine by element-wise max — associative and
    // commutative — so the served estimate cannot depend on how rows
    // were split across partitions (each partition contributes one
    // partial register file, never its keys)
    val ev = Tables.events(spark, dir)
    def est(parts: Int): Map[String, Long] =
      SketchQueries.hllServing(
          ev.repartition(parts)
            .select(col("event_type"), col("user_id")), "event_type")
        .collect()
        .map(r => r.getAs[String]("event_type") ->
          r.getAs[Long]("est_users")).toMap
    assert(est(1) === est(17))
  }

  test("q_hll plans partial sketch aggregation below the shuffle") {
    val plan = SketchQueries.qHll(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"),
      s"expected map-side partial register maxima:\n$plan")
  }

  test("q_bloom: no false negatives, claimed dominates actual, " +
    "deterministic") {
    val out = SketchQueries.qBloom(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("claimed"),
        r.getAs[Long]("actual"), r.getAs[Long]("false_positive")))
    assert(out.nonEmpty, "eval split must be non-empty")
    // THE Bloom guarantee: a member is never missed
    assert(out.forall(o => o._3 == 0L || o._2 == 1L),
      s"false negative found: ${out.filter(o => o._3 == 1L && o._2 == 0L).toSeq}")
    // claimed >= actual pointwise; fp flag consistent
    assert(out.forall(o => o._2 >= o._3))
    assert(out.forall(o => o._4 == (if (o._2 == 1L && o._3 == 0L) 1L
      else 0L)))
    // the sketch is a pure function of the corpus — byte-identical rerun
    val again = SketchQueries.qBloom(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("claimed"),
        r.getAs[Long]("actual"), r.getAs[Long]("false_positive")))
    assert(out.toSeq === again.toSeq)
  }

  test("q_bloom plans the filter as a mergeable partial-agg summary") {
    val plan = SketchQueries.qBloom(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_bit_or"),
      s"word partials must OR map-side (mergeable summary):\n$plan")
  }

  test("q_kmv: estimator within 5-sigma, exact branch below k, " +
    "deterministic reruns") {
    val rows = SketchQueries.qKmv(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("kth_min"), r.getAs[Long]("est"),
        r.getAs[Long]("err_ppm")))
    assert(rows.nonEmpty)
    // KMV relative error std ≈ 1/sqrt(k-2); 5 sigma at k=64 ≈ 63.5%
    val sigma5 = 5.0 / math.sqrt(SketchQueries.KmvK - 2.0)
    rows.foreach { case (s, n, kth, est, _) =>
      if (n < SketchQueries.KmvK) {
        assert(est === n, s"$s below k must take the exact branch")
        assert(kth === 0L, s"$s below k has no k-th minimum")
      } else {
        assert(kth > 0L)
        assert(math.abs(est - n) <= sigma5 * n,
          s"$s estimate $est vs exact $n exceeds 5 sigma")
      }
    }
    // the estimator must actually fire somewhere in this corpus
    assert(rows.exists(_._2 >= SketchQueries.KmvK))
    val rerun = SketchQueries.qKmv(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("est")))
    assert(rerun.toSeq ===
      rows.map(t => (t._1, t._4)).toSeq) // md5 determinism
  }

  test("q_qsketch: below-capacity group reads exact type-1 quantiles " +
    "(hand-computed)") {
    import spark.implicits._
    // 10 rows < k=256 => sample = population, est == exact
    val ev = (1 to 10).map(i => (i.toLong, "a", i * 1.0)).toDF(
      "event_id", "event_type", "value")
    val r = SketchQueries.quantileSketchCensus(ev).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n") === 10L)
    assert(row.getAs[Long]("k_used") === 10L)
    // cents 100..1000; type-1 rank idx = (p*(n-1)) div 100:
    // p10 -> idx 0 -> 100; p50 -> idx 4 -> 500; p90 -> idx 8 -> 900;
    // p99 -> idx 8 -> 900
    assert(row.getAs[Long]("est_p10") === 100L)
    assert(row.getAs[Long]("est_p50") === 500L)
    assert(row.getAs[Long]("est_p90") === 900L)
    assert(row.getAs[Long]("est_p99") === 900L)
    assert(row.getAs[Long]("exact_p50") === 500L)
    assert(row.getAs[Long]("abs_err_p50") === 0L)
  }

  test("q_qsketch: shard samples merge EXACTLY into the direct sample " +
    "(bottom-k semilattice)") {
    val ev = Tables.events(spark, dir)
      .select("event_id", "event_type", "value")
    val direct = SketchQueries.qsSample(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // 4 shards by event_id — each builds its own bounded sketch; the
    // merge is union + re-take bottom-k, and must reproduce the direct
    // sketch bit-for-bit (KLL's randomized compactor cannot pin this)
    val shards = (0 until 4).map(s =>
      SketchQueries.qsSample(ev.filter(col("event_id") % 4 === s)))
    val merged = SketchQueries.qsBottomK(shards.reduce(_ union _))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(merged === direct)
  }

  test("q_qsketch: p50 estimate lands within the sampling-error rank " +
    "band on real data") {
    val out = SketchQueries.qQuantileSketch(spark, dir).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out.foreach { r =>
      val t = r.getString(0)
      val n = r.getAs[Long]("n")
      val est = r.getAs[Long]("est_p50")
      val rank = ev.count(e => e._1 == t && e._2 <= est).toLong
      // sample-quantile rank error: sigma = n*sqrt(p(1-p)/k) = n/32 at
      // k=256, p=.5; assert within ~6.4 sigma = 0.2n
      assert(math.abs(rank - n / 2) <= math.max(n / 5, 2L),
        s"$t: est_p50 rank $rank vs n/2 ${n / 2}")
    }
  }

  test("joinCardCensus: exact branch below capacity, sketch estimate " +
    "in the sampling band above it, deterministic") {
    import spark.implicits._
    def keys(r: Range) = r.map(_.toLong).toDF("k")
    // small: 40 vs 40 keys, 20 overlap — everything under k = 64, so
    // every branch degrades to exact
    // big: 1000 vs 1000 keys, 500 overlap of a 1500-key union — the
    // sketch actually estimates; ρ ~ Binomial(64, 1/3)/64 and the
    // union KMV carries ~12% relative error, so a generous 5-sigma
    // band is [150, 1200]
    val pairs = Seq(
      ("big", keys(1 to 1000), keys(501 to 1500)),
      ("small", keys(1 to 40), keys(21 to 60)))
    val out = SketchQueries.joinCardCensus(pairs).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_inter_exact"),
        r.getAs[Long]("k_used"), r.getAs[Long]("est_inter")))
    val small = out.find(_._1 == "small").get
    assert(small === ("small", 40L, 40L, 20L, 60L, 20L))
    val big = out.find(_._1 == "big").get
    assert((big._2, big._3, big._4, big._5) === (1000L, 1000L, 500L, 64L))
    assert(big._6 >= 150L && big._6 <= 1200L,
      s"big est_inter ${big._6} outside the sampling band")
    val rerun = SketchQueries.joinCardCensus(pairs).collect()
      .map(r => r.toSeq)
    assert(rerun.toSeq === SketchQueries.joinCardCensus(pairs)
      .collect().map(_.toSeq).toSeq)
  }

  test("q_qsketch plans the sample as WindowGroupLimit " +
    "(capacity-bounded partials)") {
    val ev = Tables.events(spark, dir)
      .select("event_id", "event_type", "value")
    val p = SketchQueries.qsSample(ev)
      .queryExecution.executedPlan.toString
    val limits = "WindowGroupLimit".r.findAllIn(p).length
    assert(limits >= 2,
      s"expected partial+final WindowGroupLimit around the Exchange:\n$p")
  }

  test("mgStep: hand-computed summarize — subtract the rank-17 value, " +
    "keep the positive 16") {
    import sqlImplicits._
    // 18 counters 20..3 in one group: rank-17 value is 4, so survivors
    // are the 16 counters > 4, each decremented by 4
    val rows = (0 until 18).map(i => (0L, f"t$i%02d", 20L - i))
      .toDF("bucket", "token", "c")
    val got = SketchQueries.mgStep(rows, col("bucket"))
      .orderBy(desc("c"), col("token"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    val want = (0 until 16).map(i => (f"t$i%02d", 16L - i))
    assert(got === want)
  }

  test("mgStep: ties with the rank-17 value collapse to zero " +
    "(value-threshold is tie-proof)") {
    import sqlImplicits._
    // 20 counters: 3 heavies (100) + 17 tied at 5 — the rank-17 value
    // is 5, every tied counter drops, survivors are exactly the heavies
    val rows = ((0 until 3).map(i => (0L, s"h$i", 100L)) ++
      (0 until 17).map(i => (0L, f"s$i%02d", 5L)))
      .toDF("bucket", "token", "c")
    val got = SketchQueries.mgStep(rows, col("bucket"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("h0", 95L), ("h1", 95L), ("h2", 95L)))
  }

  test("q_heavy: MG guarantee — every counter underestimates by at " +
    "most N/(k+1), and every token above the bound survives") {
    import sqlImplicits._
    // dominant tokens + uniform background noise tokens
    val docs = (0 until 60).map { i =>
      (i.toLong, s"alpha beta n${i % 37} m${i % 29} x$i")
    }.toDF("doc_id", "text")
    val out = SketchQueries.heavyHittersCensus(docs).collect()
    assert(out.length <= SketchQueries.MgK)
    val bound = out.head.getAs[Long]("bound")
    out.foreach { r =>
      val err = r.getAs[Long]("err")
      assert(err >= 0 && err <= bound,
        s"${r.getString(0)}: err=$err bound=$bound")
      assert(r.getAs[Long]("true_count") - r.getAs[Long]("mg_count")
        === err)
    }
    // alpha and beta each have true count 60 > bound = 300/17 = 17 —
    // the MG guarantee says they MUST be in the summary
    val kept = out.map(_.getString(0)).toSet
    assert(kept.contains("alpha") && kept.contains("beta"))
  }

  test("q_heavy: summary is partitioning-invariant (bucket identity " +
    "is a token function, not a layout function)") {
    val direct = SketchQueries.qHeavyHitters(spark, dir)
      .collect().map(_.toSeq).toSeq
    val shuffled = SketchQueries.heavyHittersCensus(
      Tables.documents(spark, dir).select("doc_id", "text")
        .repartition(17))
      .collect().map(_.toSeq).toSeq
    assert(direct === shuffled)
  }

  // --- deployment (audit-free) serving forms: pinned equal to the
  // audit queries on overlapping columns, with the plan shape the
  // Scaladoc claims (the StorageLayoutSpec precedent) ---

  test("bloomServing: (doc_id, claimed) identical to the audit form; " +
    "the only join is the broadcast filter (no exact-membership join)") {
    val docs = Tables.documents(spark, dir)
    val audit = SketchQueries.qBloom(spark, dir)
      .select("doc_id", "claimed").collect().map(_.toSeq).toSeq
    val serving = SketchQueries.bloomServing(docs)
    assert(serving.collect().map(_.toSeq).toSeq === audit)
    val plan = serving.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"serving form must join only the broadcast filter words:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("joinCardServing: sketch columns identical to the audit form; " +
    "the audit materializes the hash relation once (no base-table " +
    "scan per consumer) while serving scans the base tables directly") {
    val sketchCols = Seq("pair", "n_a", "n_b", "est_a", "est_b",
      "k_used", "est_union", "n_match", "est_inter")
    val audit = SketchQueries.qJoinCard(spark, dir)
      .select(sketchCols.map(col): _*).collect().map(_.toSeq).toSeq
    def pairs = Seq(
      ("cust",
        Tables.orders(spark, dir).select(col("o_custkey").as("k")),
        Tables.customer(spark, dir).select(col("c_custkey").as("k"))),
      ("part",
        Tables.lineitem(spark, dir).select(col("l_partkey").as("k")),
        Tables.part(spark, dir).select(col("p_partkey").as("k"))),
      ("supp",
        Tables.lineitem(spark, dir).select(col("l_suppkey").as("k")),
        Tables.supplier(spark, dir).select(col("s_suppkey").as("k"))))
    val serving = SketchQueries.joinCardServing(pairs)
    assert(serving.collect().map(_.toSeq).toSeq === audit)
    def scans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collectLeaves()
        .count(_.toString.contains("parquet"))
    val s = scans(serving)
    val a = scans(SketchQueries.qJoinCard(spark, dir))
    // the audit form eagerly materializes jcHashes (r17): every
    // consumer reads the checkpointed relation, so its plan holds NO
    // parquet leaves — the base tables were scanned exactly once, at
    // materialization. The serving form keeps raw scans (its own spec
    // pins the single-derivation plan).
    assert(a === 0, s"audit must read only the materialized hash " +
      s"relation (got $a parquet scans)")
    assert(s > 0, s"serving must scan the base tables directly")
  }

  test("qsEstimates(qsSample(...)): estimate columns identical to the " +
    "audit census; no exact-census pass (fewer events scans)") {
    val ev = Tables.events(spark, dir)
      .select("event_id", "event_type", "value")
    val estCols = "event_type" +: "k_used" +:
      SketchQueries.QsPs.map(p => s"est_p$p")
    val audit = SketchQueries.quantileSketchCensus(ev)
      .select(estCols.map(col): _*).orderBy("event_type")
      .collect().map(_.toSeq).toSeq
    val serving = SketchQueries.qsEstimates(SketchQueries.qsSample(ev))
      .orderBy("event_type")
    assert(serving.collect().map(_.toSeq).toSeq === audit)
    def scans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collectLeaves()
        .count(_.toString.contains("parquet"))
    val s = scans(serving)
    val a = scans(SketchQueries.quantileSketchCensus(ev))
    assert(s < a, s"serving scans $s must be < audit scans $a")
  }

  test("kmvServing: sketch columns (kth_min, est) identical to the " +
    "audit census; the exact-count relation never enters the plan") {
    val docs = Tables.documents(spark, dir)
    val audit = SketchQueries.qKmv(spark, dir)
      .select("source", "kth_min", "est").orderBy("source")
      .collect().map(_.toSeq).toSeq
    val serving = SketchQueries.kmvServing(docs)
      .select("source", "kth_min", "est").orderBy("source")
    assert(serving.collect().map(_.toSeq).toSeq === audit)
    // the audit joins the exact per-source distinct count back to the
    // hash relation (its prefix filter and err_ppm need it); serving
    // works off the <= k-row bottom-k state alone
    val plan = serving.queryExecution.executedPlan.toString
    assert(!plan.contains("n_exact"),
      s"serving form must not build the exact-count relation:\n" +
        plan.take(4000))
  }

  test("hllServing: sketch columns identical to the audit census; " +
    "zero exact-distinct aggregates in the plan") {
    val sketchCols = Seq("event_type", "n_buckets", "v_zero", "z_int",
      "est_users", "use_lc")
    val audit = SketchQueries.qHllCensus(spark, dir)
      .select(sketchCols.map(col): _*).collect().map(_.toSeq).toSeq
    val serving = SketchQueries.hllServing(
      Tables.events(spark, dir).select(col("event_type"),
        col("user_id")), "event_type")
    assert(serving.collect().map(_.toSeq).toSeq === audit)
    val plan = serving.queryExecution.executedPlan.toString
    assert(!plan.contains("exact_users") && !plan.contains("distinct"),
      s"serving form must not pay the exact count_distinct side:\n" +
        plan.take(4000))
  }

  test("kmvOverlap: below k the whole pipeline is exact — est_inter " +
    "equals the audit intersection on every pair") {
    import sqlImplicits._
    // every source far below k = 64 distinct shingles -> all four
    // estimates take the exact branch, so inclusion-exclusion is an
    // identity: est_inter == n_inter_exact
    // A: tokens a..h -> shingles {a..e, b..f, c..g, d..h} (4)
    // B: shares A's suffix (c..h) -> shingles {c..g, d..h} + own
    // C: disjoint
    val docs = Seq(
      (1L, "a b c d e f g h", "A"),
      (2L, "c d e f g h", "B"),
      (3L, "z y x w v u t s", "C")).toDF("doc_id", "text", "source")
    val out = SketchQueries.kmvOverlap(docs).collect()
      .map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b"), r.getAs[Long]("est_a"),
        r.getAs[Long]("est_b"), r.getAs[Long]("est_union"),
        r.getAs[Long]("est_inter"), r.getAs[Long]("n_inter_exact")))
    // A has 4 shingles, B 2 (both shared with A), C 4 disjoint
    assert(out.toSeq === Seq(
      ("A", "B", 4L, 2L, 4L, 2L, 2L),
      ("A", "C", 4L, 4L, 8L, 0L, 0L),
      ("B", "C", 2L, 4L, 6L, 0L, 0L)))
    // at / past k the estimator branch engages: union state caps at k
    val big = (0 until 2).map { s =>
      (s.toLong, (0 until 100).map(i => s"w${s * 60 + i}")
        .mkString(" "), s"S$s")
    }.toDF("doc_id", "text", "source")
    val b = SketchQueries.kmvOverlap(big).collect()
    assert(b.length === 1)
    val r = b.head
    assert(r.getAs[Long]("n_union_state") === SketchQueries.KmvK)
    assert(r.getAs[Long]("est_inter") ===
      math.max(0L, r.getAs[Long]("est_a") + r.getAs[Long]("est_b") -
        r.getAs[Long]("est_union")))
  }
}
