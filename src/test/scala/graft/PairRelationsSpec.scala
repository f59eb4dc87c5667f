package graft

import graft.operators.{PairRelations, TextOps}
import graft.sources.Tables

/** The shared pair-relation layer: one build per (session, dir,
  * params), identical results to a self-contained build, and graceful
  * recompute after an external clearCache.
  */
class PairRelationsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir).select("doc_id", "text")

  test("memoizes per (session, dir, params); results match fresh build") {
    val a = PairRelations.ngramPairs(spark, dir, docs, 5, 1000L, 800000L)
    val b = PairRelations.ngramPairs(spark, dir, docs, 5, 1000L, 800000L)
    assert(a eq b, "second lookup must return the memoized DataFrame")
    val memoized = a.orderBy("d1", "d2").collect()

    val fresh = TextOps.ngramJaccardPairs(docs, 5, 1000L, 800000L)
      .orderBy("d1", "d2").collect()
    assert(memoized.toSeq === fresh.toSeq)

    // different params -> different relation
    val other = PairRelations.ngramPairs(spark, dir, docs, 5, 1000L, 900000L)
    assert(!(other eq a))
  }

  test("recomputes correctly after catalog clearCache") {
    val before = PairRelations.ngramPairs(spark, dir, docs, 5, 1000L,
      800000L).orderBy("d1", "d2").collect()
    spark.catalog.clearCache()
    val after = PairRelations.ngramPairs(spark, dir, docs, 5, 1000L,
      800000L).orderBy("d1", "d2").collect()
    assert(before.toSeq === after.toSeq)
  }
}
