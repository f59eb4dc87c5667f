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

  test("q_hll: estimate within 3-sigma of the configured rsd") {
    val rows = SketchQueries.qHll(spark, dir).collect()
    assert(rows.nonEmpty)
    val bound = (3 * SketchQueries.HllRsd * 1e6).toLong // 60k ppm
    rows.foreach { r =>
      assert(r.getAs[Long]("err_ppm") <= bound,
        s"${r.getString(0)}: approx=${r.getAs[Long]("approx_users")} " +
          s"exact=${r.getAs[Long]("exact_users")}")
    }
  }

  test("q_hll: estimate is partitioning-invariant (sketches merge)") {
    // HLL registers combine by element-wise max — associative and
    // commutative — so the merged estimate cannot depend on how rows
    // were split across partitions (each partition contributes one
    // partial sketch, never its keys)
    val ev = Tables.events(spark, dir)
    def est(parts: Int): Map[String, Long] =
      ev.repartition(parts)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), SketchQueries.HllRsd)
          .as("a"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est(1) === est(17))
  }

  test("q_hll plans partial sketch aggregation below the shuffle") {
    val plan = SketchQueries.qHll(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      s"expected map-side partial HLL sketches:\n$plan")
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
}
