package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.functions.Hashing.md5Long
import graft.sources.Tables

/** Count-min sketch as a first-class, oracle-checked operator.
  *
  * A CMS with fixed universal-hash rows is fully deterministic, so
  * unlike HLL/approx_percentile (whose implementations differ per
  * engine) it CAN be verified against DuckDB: both engines build the
  * same d×w counter table and read the same point estimates.
  *
  * Scale shape: building the sketch is d tiny hash-aggregations over
  * the stream (the shuffle carries (bucket, partial-count) pairs — at
  * most d×w rows per map partition, independent of input size); the
  * probe side joins each key against d ≤w-row broadcast tables. This is
  * the mergeable-summary pattern: per-partition sketches sum
  * cell-wise, which is exactly what partial aggregation does here.
  *
  * Uses the first `Depth` [[Hashing.MinhashSeeds]] rows over the md5
  * key hash; estimates upper-bound true counts (min over rows).
  */
object SketchQueries {

  val Depth = 4
  val Width = 256

  private val p = Hashing.MinhashP

  /** Per-user true count vs CMS estimate over `events.user_id`. */
  def qCms(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select((md5Long(col("user_id").cast("string")) % p).as("h"),
        col("user_id"))
    val keys = ev.groupBy("user_id", "h")
      .agg(count(lit(1)).as("true_n"))
    val joined = (0 until Depth).foldLeft(keys) { (acc, j) =>
      val (a, b) = Hashing.MinhashSeeds(j)
      val sketch = ev
        .groupBy((((lit(a) * col("h") + lit(b)) % p) % Width)
          .as(s"bucket$j"))
        .agg(count(lit(1)).as(s"c$j"))
      acc.withColumn(s"bucket$j",
          ((lit(a) * col("h") + lit(b)) % p) % Width)
        .join(broadcast(sketch), s"bucket$j")
    }
    joined.select(col("user_id"), col("true_n"),
        least((0 until Depth).map(j => col(s"c$j")): _*).as("cms_est"))
      .orderBy("user_id")
  }

  private val cmsOracle: String = {
    def bucket(j: Int, h: String): String = {
      val (a, b) = Hashing.MinhashSeeds(j)
      s"((($a * $h + $b) % $p) % $Width)"
    }
    val h = s"${Hashing.md5LongSql("CAST(user_id AS VARCHAR)")} % $p"
    val sketches = (0 until Depth).map { j =>
      s"""sk$j AS (
         |  SELECT ${bucket(j, "h")} AS bucket, count(*) AS c
         |  FROM ev_h GROUP BY 1
         |)""".stripMargin
    }.mkString(",\n")
    val joins = (0 until Depth).map { j =>
      s"JOIN sk$j s$j ON ${bucket(j, "u.h")} = s$j.bucket"
    }.mkString("\n")
    val leastExpr = (0 until Depth).map(j => s"s$j.c").mkString(", ")
    s"""WITH ev_h AS (SELECT $h AS h, user_id FROM events),
       |u AS (SELECT user_id, h, count(*) AS true_n
       |      FROM ev_h GROUP BY 1, 2),
       |$sketches
       |SELECT u.user_id, u.true_n, least($leastExpr) AS cms_est
       |FROM u
       |$joins
       |ORDER BY u.user_id""".stripMargin
  }

  /** HLL relative standard deviation: 0.02 needs 2^14 registers — the
    * accuracy/space point a production rollup would pick (±2% on
    * billions of distincts from a ~16 KB sketch per group).
    */
  val HllRsd = 0.02

  /** HyperLogLog++ approx-distinct users per event type, next to the
    * exact distinct count and the absolute error in parts-per-million.
    *
    * The one sketch family that canNOT be oracle-checked: HLL register
    * layouts and bias tables are implementation-specific, so DuckDB's
    * approx_count_distinct returns a *different* estimate for the same
    * set. The driver records a rows-only check (the M3 precedent); the
    * ScalaTest spec asserts the documented error bound and that the
    * estimate is partitioning-invariant (register merge = element-wise
    * max, so partial sketches combine associatively — the mergeable-
    * summary property that makes HLL the 100 TB distinct-count rollup:
    * each partition ships one 16 KB sketch, never its keys).
    */
  def qHll(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), HllRsd).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"))
      .withColumn("err_ppm",
        floor(abs(col("approx_users") - col("exact_users")) *
          lit(1000000L) / greatest(col("exact_users"), lit(1L))))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cms" -> (qCms _),
    "q_hll" -> (qHll _))

  /** q_hll has no oracle entry by design — see [[qHll]]. */
  val oracles: Map[String, String] = Map(
    "q_cms" -> cmsOracle)
}
