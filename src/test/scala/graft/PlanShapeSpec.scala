package graft

import graft.operators.{SimilarityOps, TextOps}
import graft.sources.Tables

/** Physical-plan shape pins for the training-mix operators — the scale
  * claims in SURVEY §2.10 asserted on plans, not taken on faith.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("quantizeInt8 is shuffle-free (fold + posexplode projection)") {
    val p = plan(SimilarityOps.quantizeInt8(Tables.embeddings(spark, dir)))
    assert(!p.contains("Exchange"), s"expected no shuffle:\n$p")
  }

  test("tokenCounts is shuffle-free (pure projection)") {
    val p = plan(TextOps.tokenCounts(
      Tables.documents(spark, dir).select("doc_id", "text")))
    assert(!p.contains("Exchange"), s"expected no shuffle:\n$p")
  }

  test("packSequences shuffles once, on the shard key") {
    val p = plan(TextOps.packSequences(
      Tables.documents(spark, dir).select("doc_id", "text"), 8, 2048L))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected exactly one shard shuffle:\n$p")
    assert(p.contains("hashpartitioning(shard"),
      s"the one shuffle must be on shard:\n$p")
  }

  test("sign-LSH signature stage is shuffle-free (per-row expression)") {
    val p = plan(SimilarityOps.signLshSignatures(
      Tables.embeddings(spark, dir), SimilarityOps.ScaleLshPlanes))
    assert(!p.contains("Exchange"), s"expected no shuffle:\n$p")
    assert(!p.contains("Generate"), s"expected no explode:\n$p")
  }

  test("sampleSplit aggregates with map-side partials") {
    val p = plan(TextOps.sampleSplit(Tables.documents(spark, dir), 80, 10))
    assert(p.contains("partial_count") || p.contains("partial"),
      s"expected partial aggregation before the shuffle:\n$p")
  }
}
