package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization for intra-query shared relations.
  *
  * A `.cache()`d relation with several downstream consumers is lazy:
  * when the scheduler submits independent consumer stages concurrently,
  * each cache-miss recomputes the shared subtree (the cache fills per
  * partition, racily — the round-16 stage profile showed the winnow
  * kernel and the md5 shingle pass re-running in up to six concurrent
  * stages of one query), and every consumer re-carries the full logical
  * subtree through analysis/optimization. `localCheckpoint(eager=true)`
  * materializes the relation exactly once, up front, and replaces the
  * subtree with the materialized rows: measured 4-5x on the dedup audit
  * family at sf0.1 (OPTIMIZATION_r16.md §shared-relations).
  *
  * Trade-off (deliberate, documented): localCheckpoint truncates
  * lineage, so losing an executor mid-query fails the query instead of
  * recomputing the lost partitions — acceptable for bounded intra-query
  * intermediates (every site here is candidate- or census-bounded); a
  * deployment wanting lineage-free fault tolerance for a multi-hour
  * query swaps in reliable `checkpoint()` to cluster storage — one
  * word, same plan shape. Storage level is MEMORY_AND_DISK, the same
  * class as the `.cache()` it replaces, and the blocks are dropped by
  * the same session hygiene (`getPersistentRDDs ... unpersist`) the
  * bench already runs between measurements.
  */
object Materialize {
  def shared(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)

  /** Pin an explosion-prone equi-join input at session parallelism on
    * the join key. AQE's partition coalescing is BYTE-based: it sees
    * the tiny pre-join shuffle bytes, not the quadratic join fan-out
    * behind them, and collapses the join stage to 1-3 tasks (measured
    * r16: contaminationFrom's overlap join ran 5.9 CPU-seconds on 3
    * tasks at sf0.1 — the whole query serialized on one explosion
    * stage). A repartition with an EXPLICIT partition count is exempt
    * from AQE coalescing, so the fan-out keeps at least one task per
    * core at every scale. The pin reads the session's own dials
    * (defaultParallelism / spark.sql.shuffle.partitions), never a
    * constant, so it scales with the cluster; at 100 TB the join's
    * shuffle bytes exceed the advisory size and AQE would not have
    * coalesced anyway. Trade-off (documented): an explicit-origin
    * exchange opts out of AQE skew-join splitting for that join —
    * every pinned join here is df-capped on its key, which is the
    * operator's own skew bound.
    */
  def pinned(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    df.repartition(n, org.apache.spark.sql.functions.col(key))
  }

  /** Run independent driver-side build steps concurrently (guide §2.6,
    * overlap independent jobs): Spark's scheduler runs many jobs at
    * once — build loops like "train one k-means codebook per PQ
    * subspace" or "run the beam sweep per width" were sequential only
    * because the driver blocked on each step's collect/checkpoint
    * before submitting the next. Results combine in INPUT order, so
    * output is bit-identical to the sequential loop; only the job
    * submission overlaps. A dedicated pool, not the global
    * ForkJoinPool: the steps block on collect(), which would starve
    * nested parallel collections sharing the common pool.
    *
    * The pool is CAPPED at [[MaxConcurrentJobs]] driver threads
    * (guide §2.6: "2-3 jobs in flight is plenty" — the cap leaves
    * headroom for short steps while bounding a future caller with a
    * large list; excess items queue on the fixed pool). On failure the
    * pool is shut down with `shutdownNow()` so losing futures are
    * interrupted instead of running on in the background.
    */
  val MaxConcurrentJobs = 8

  def concurrently[A, B](xs: Seq[A])(f: A => B): Seq[B] =
    if (xs.lengthCompare(2) < 0) xs.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(xs.length, MaxConcurrentJobs))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          xs.map(x => scala.concurrent.Future(f(x)))),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdownNow()
    }
}
