package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.Sbs1

/** Structured Streaming ingest: the reference's entire Python hot loop
  * (dump1090-postgres.py:160-244) re-expressed as a declarative stream.
  *
  *   socket source → SBS-1 parse projection → watermarked dedup →
  *   date-partitioned Parquet sink
  *
  * Mapping to the reference, piece by piece (SURVEY.md §2.1/§2.7):
  *  - S1/S2: `format("socket")` delivers newline-delimited UTF-8 lines —
  *    including correct handling of records torn across recv() buffers,
  *    which the reference drops (§2.9.2).
  *  - S4/T1: `current_timestamp()` inside the parse projection stamps
  *    each micro-batch once — same granularity semantics as the
  *    reference's one `datetime.now()` per recv batch.
  *  - T5: the PK `(transmission_type, parsed_time, hex_ident)` becomes
  *    `dropDuplicates` on those columns; the watermark bounds the dedup
  *    state store (the reference instead crashes on PK violation, §2.9.3).
  *  - S7: the sink is append-only columnar Parquet partitioned by ingest
  *    date — the BRIN-index time-pruning intent (create_schema.sql:141)
  *    becomes partition pruning + row-group min/max skipping. A JDBC
  *    parity sink is one `foreachBatch(_.write.jdbc(...))` away and
  *    deliberately not defaulted (no PG in this environment).
  *  - T6: the reference's dial-retry policy (10 attempts × 5 s,
  *    Dockerfile:17-18) lives in [[runSupervised]] — the socket source
  *    fails the query on disconnect; the supervisor restarts it. The
  *    checkpoint + idempotent parquet sink make restarts exactly-once.
  *
  * Scale: ingest is embarrassingly parallel until the dedup (a shuffle
  * on the PK columns, state partitioned the same way); the sink writes
  * one file per partition per batch. At 100 TB/day you would bump
  * shuffle partitions + compact small files periodically — both config,
  * not code changes.
  */
object Ingest {

  /** Env-var defaults mirror the reference's Dockerfile:7-18 contract. */
  case class Config(
      host: String = sys.env.getOrElse("DUMP1090_HOST", "localhost"),
      port: Int = sys.env.getOrElse("DUMP1090_PORT", "30003").toInt,
      sinkDir: String,
      checkpointDir: String,
      connectAttemptLimit: Int =
        sys.env.getOrElse("CONNECT_ATTEMPT_LIMIT", "10").toInt,
      connectAttemptDelayMs: Long =
        (sys.env.getOrElse("CONNECT_ATTEMPT_DELAY", "5.0").toDouble * 1000).toLong,
      dedupWatermark: String = "10 minutes")

  /** The unbounded parsed stream (23-column ADS-B frame), read through
    * the custom DSv2 source ([[Sbs1SourceProvider]]) so the reference's
    * dial-retry policy lives *inside* the source — a peer disconnect
    * no longer fails the query. (The built-in `socket` source remains a
    * drop-in: `format("socket")` + [[runSupervised]].)
    */
  def stream(spark: SparkSession, cfg: Config): DataFrame =
    Sbs1.parse(
      spark.readStream.format("sbs1")
        .option("host", cfg.host).option("port", cfg.port)
        .option("connectAttemptLimit", cfg.connectAttemptLimit)
        .option("connectAttemptDelayMs", cfg.connectAttemptDelayMs)
        .load())

  /** PK-intent dedup with bounded state. `parsed_time` is processing
    * time (monotone per micro-batch), so the watermark only ever evicts
    * state that can no longer collide.
    */
  def deduped(parsed: DataFrame, watermark: String): DataFrame =
    parsed.withWatermark("parsed_time", watermark)
      .dropDuplicates("transmission_type", "parsed_time", "hex_ident")

  /** Start the ingest query (non-blocking). */
  def start(spark: SparkSession, cfg: Config): StreamingQuery =
    deduped(stream(spark, cfg), cfg.dedupWatermark)
      .withColumn("ingest_date", to_date(col("parsed_time")))
      .writeStream.format("parquet")
      .option("path", cfg.sinkDir)
      .option("checkpointLocation", cfg.checkpointDir)
      .partitionBy("ingest_date")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

  /** Archive backfill: stream SBS-1 line files (plain or compressed)
    * through the same parse/dedup/sink pipeline with an AvailableNow
    * trigger — process everything present, then stop. Restarting with
    * the same checkpoint after new files land resumes exactly-once
    * (file-source offsets + idempotent parquet commits), which is the
    * catch-up/backfill pattern a 100 TB log store needs.
    */
  def backfill(spark: SparkSession, archiveDir: String,
               cfg: Config): StreamingQuery =
    deduped(Sbs1.parse(spark.readStream.text(archiveDir)),
        cfg.dedupWatermark)
      .withColumn("ingest_date", to_date(col("parsed_time")))
      .writeStream.format("parquet")
      .option("path", cfg.sinkDir)
      .option("checkpointLocation", cfg.checkpointDir)
      .partitionBy("ingest_date")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Bucketed analytical sink — the third S7 sink shape beside the
    * date-partitioned parquet sink and the JDBC parity sink: each
    * micro-batch appends into [[graft.sources.AdsbStore]]'s
    * `bucketBy(hex_ident)` catalog layout, so the serving views (the
    * flights plan above all) stay EXCHANGE-FREE over a store that
    * grows one batch at a time. Dedup happens upstream of the sink
    * (same as the parquet path); a crash-replayed batch re-appends
    * identical rows, which the flights DISTINCT absorbs — and
    * periodic per-bucket compaction is
    * [[Maintenance.compactBucketed]] unchanged.
    */
  def startBucketed(spark: SparkSession, cfg: Config, table: String,
                    nBuckets: Int = 8): StreamingQuery =
    deduped(stream(spark, cfg), cfg.dedupWatermark)
      .writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (df: DataFrame, _: Long) =>
        graft.sources.AdsbStore.append(df, table, nBuckets)
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

  /** JDBC parity sink (S7): the reference's row-at-a-time PostgreSQL
    * INSERT loop becomes one batched, partition-parallel JDBC append
    * per micro-batch — `foreachBatch` + `DataFrameWriter.jdbc`, the
    * documented pattern for exactly-the-reference's-sink semantics
    * (dump1090-postgres.py:110-116, minus the 1-row-per-commit quirk
    * §2.9.1). Works against any JDBC database; integration-tested on
    * embedded Derby (no PostgreSQL in this environment).
    */
  def startJdbc(spark: SparkSession, cfg: Config, url: String,
                table: String,
                props: java.util.Properties = new java.util.Properties())
  : StreamingQuery =
    deduped(stream(spark, cfg), cfg.dedupWatermark)
      .writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (df: DataFrame, _: Long) =>
        writeJdbcBatch(df, url, table, props)
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

  /** One micro-batch → JDBC append. JDBC has no TIMESTAMP_NTZ / the
    * reference column is timestamptz, so parsed_time goes back to LTZ.
    */
  def writeJdbcBatch(df: DataFrame, url: String, table: String,
                     props: java.util.Properties): Unit =
    df.withColumn("parsed_time", col("parsed_time").cast("timestamp"))
      .write.mode("append").jdbc(url, table, props)

  /** The exact `Properties` a PostgreSQL deployment passes to
    * [[startJdbc]], mirroring the reference's connection options
    * (dump1090-postgres.py:144-150): its `options='-c search_path=…'`
    * becomes the pgJDBC `currentSchema` parameter and its
    * `application_name` maps 1:1. This environment has no PostgreSQL
    * (the sink is integration-tested on embedded Derby, which ignores
    * unknown properties), so this helper IS the documented deployment
    * contract: `startJdbc(spark, cfg, "jdbc:postgresql://host/db",
    * "dump1090.dump1090", pgProperties(user, pass))`.
    */
  def pgProperties(user: String, password: String,
                   searchPath: String = "dump1090",
                   applicationName: String = "dump1090-db-stream")
  : java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("currentSchema", searchPath)
    p.setProperty("ApplicationName", applicationName)
    // append-only firehose: batched inserts, no generated-key fetch
    p.setProperty("reWriteBatchedInserts", "true")
    p
  }

  /** Reference retry policy (dump1090-postgres.py:181-198, :220-237):
    * re-dial up to `connectAttemptLimit` times with a fixed delay; a
    * successful (re)connection resets the budget. Returns when the
    * attempt budget is exhausted — the reference `sys.exit()`s there.
    *
    * `start()` is non-blocking and always "succeeds" even against an
    * unreachable feed (the failure surfaces later in awaitTermination),
    * so the budget must NOT reset on start() returning: only evidence
    * that the feed actually worked — a completed micro-batch that
    * ingested rows — counts as the reference's "successful connection".
    * Otherwise a persistently-down feed would oscillate 0→1→0 and
    * retry forever.
    */
  def runSupervised(spark: SparkSession, cfg: Config): Unit = {
    import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}
    import org.apache.spark.sql.streaming.StreamingQueryListener
    var attempts = 0
    var stoppedGracefully = false
    while (!stoppedGracefully && attempts < cfg.connectAttemptLimit) {
      // rows-ingested evidence via a listener, which observes EVERY
      // progress update — `recentProgress` is a bounded ring (~100
      // entries), so a feed that ingested rows and then idled through
      // 100+ empty micro-batches before failing would read as
      // never-progressed and spuriously burn the attempt budget
      val progressed = new AtomicBoolean(false)
      val qid = new AtomicReference[java.util.UUID]()
      val listener = new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.id == qid.get && e.progress.numInputRows > 0)
            progressed.set(true)
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      try {
        val q = start(spark, cfg)
        qid.set(q.id)
        try {
          q.awaitTermination() // throws on source error
          stoppedGracefully = true // explicit q.stop(): do not restart
        } catch {
          case e: Exception =>
            // belt-and-braces: covers a final progress event still in
            // flight on the (async) listener bus at failure time
            if (q.recentProgress.exists(_.numInputRows > 0))
              progressed.set(true)
            throw e
        }
      } catch {
        case _: Exception =>
          attempts = if (progressed.get) 1 else attempts + 1
          Thread.sleep(cfg.connectAttemptDelayMs)
      } finally {
        spark.streams.removeListener(listener)
      }
    }
  }
}
