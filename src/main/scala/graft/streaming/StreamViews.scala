package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming variants of the analytical views — the T3 extension
  * (SURVEY.md §2.7): the reference keys everything on processing time
  * and runs its views as batch SQL over the sink; these run the same
  * aggregations *on the stream itself* with event-time windows and
  * watermarked state.
  *
  * State sizing at 100 TB/day: both aggregations key on
  * (window, hex_ident[, callsign]) — state rows are bounded by
  * (active aircraft × windows inside the watermark), not by input
  * volume, and the watermark evicts each window as it closes.
  */
object StreamViews {

  /** Position fixes per aircraft per tumbling window (streaming
    * counterpart of `locations` rollups like README.md:259-263).
    */
  def fixesPerWindow(parsed: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    parsed
      .filter(col("lat").isNotNull)
      .withWatermark("parsed_time", watermark)
      .groupBy(window(col("parsed_time"), windowLen), col("hex_ident"))
      .agg(count(lit(1)).as("n_fixes"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("hex_ident"), col("n_fixes"))

  /** Stream-static enrichment: join the live fix stream against a
    * static registry dimension (aircraft type/operator keyed by
    * hex_ident). The static side is broadcast to every micro-batch —
    * no stream state, no shuffle of the stream; re-reading the dim per
    * batch is how reference-data updates propagate.
    */
  def enriched(parsed: DataFrame, registry: DataFrame): DataFrame =
    parsed.join(broadcast(registry), Seq("hex_ident"), "left")

  /** Streaming exact dedup of a document stream by content hash — the
    * ingest-time half of the dedup family ([[graft.operators.TextOps]]):
    * first occurrence wins, duplicates arriving within the watermark
    * horizon are dropped, and state holds one (hash) key per distinct
    * doc inside the horizon rather than the documents themselves.
    */
  def dedupDocs(docs: DataFrame, eventTimeCol: String,
                watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_sha", sha2(col("text").cast("binary"), 256))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicates("content_sha")

  /** Flight legs via the built-in `session_window` (gap-based): the
    * declarative counterpart of the custom `flatMapGroupsWithState`
    * legs in [[FlightSessions]] — the preference-order demonstration:
    * built-in session state (RocksDB-capable, watermark-evicted) over
    * hand-rolled state unless per-event emission semantics are needed.
    * State per key = one open session per active aircraft.
    */
  def flightSessions(parsed: DataFrame, gap: String = "30 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    parsed
      .filter(col("lat").isNotNull)
      .withWatermark("parsed_time", watermark)
      .groupBy(session_window(col("parsed_time"), gap), col("hex_ident"))
      .agg(count(lit(1)).as("n_fixes"),
        min("parsed_time").as("first_fix"),
        max("parsed_time").as("last_fix"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("hex_ident"), col("n_fixes"), col("first_fix"),
        col("last_fix"))

  /** Streaming sliding-window actives — the streaming twin of the
    * batch DAU/WAU census ([[graft.operators.RelationalQueries
    * .qActiveUsers]]): distinct actives per sliding window over an
    * event stream. Exact distinct is not frame-decomposable and a
    * streaming agg cannot hold per-user state per window at scale, so
    * the streaming path is the SKETCH path the batch operator's docs
    * point to: `approx_count_distinct` keeps one mergeable HLL sketch
    * per open window (X18's register-merge property — partial sketches
    * from every micro-batch OR together), state bounded by (windows
    * inside the watermark) × sketch size, independent of user count.
    * The batch path over the sink remains the exact reconciliation.
    */
  def slidingActives(events: DataFrame, windowLen: String = "7 days",
                     slide: String = "1 day",
                     watermark: String = "1 day",
                     rsd: Double = 0.02): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide))
      .agg(approx_count_distinct(col("user_id"), rsd)
        .as("active_users"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("active_users"))

  /** T8: STREAM-STREAM interval join — the reference's flights band
    * join (`create_schema.sql:116-124`: positions matched to callsign
    * reports of the same aircraft within ±10 minutes) lifted onto the
    * live stream itself: position fixes are enriched with every
    * callsign report of the same `hex_ident` in the `lookback` window
    * BEHIND the fix. Both sides are unbounded streams, so this is the
    * genuine stream-stream join (not stream-static): Spark buffers
    * each side's rows in state until the other side's watermark passes
    * the interval bound, then evicts — the time-range condition is
    * what makes state GC possible at all (an unconstrained
    * stream-stream equi-join would buffer forever).
    *
    * State sizing at scale: per aircraft, only rows inside
    * (watermark + lookback) are retained — bounded by event RATE ×
    * horizon, independent of stream length. The join key (`hex_ident`)
    * is the shuffle key on both sides, so each aircraft's buffers
    * co-locate on one task.
    */
  def callsignEnrichedFixes(parsed: DataFrame,
                            lookback: String = "10 minutes",
                            watermark: String = "10 minutes")
  : DataFrame = {
    val pos = parsed.filter(col("lat").isNotNull)
      .select(col("hex_ident"), col("parsed_time").as("pos_time"),
        col("lat"), col("lon"))
      .withWatermark("pos_time", watermark)
    val cs = parsed
      .filter(col("callsign").isNotNull && col("callsign") =!= "")
      .select(col("hex_ident").as("cs_hex"),
        col("callsign"), col("parsed_time").as("cs_time"))
      .withWatermark("cs_time", watermark)
    pos.join(cs,
        col("hex_ident") === col("cs_hex") &&
          col("cs_time") >= col("pos_time") -
            expr(s"INTERVAL $lookback") &&
          col("cs_time") <= col("pos_time"))
      .select(col("hex_ident"), col("callsign"), col("pos_time"),
        col("cs_time"), col("lat"), col("lon"))
  }

  /** Streaming `callsigns` view (create_schema.sql:85-93 semantics):
    * first/last-seen per (callsign, hex_ident) per tumbling day.
    */
  def callsigns(parsed: DataFrame,
                watermark: String = "10 minutes"): DataFrame =
    parsed
      .filter(col("callsign").isNotNull && col("callsign") =!= "")
      .withWatermark("parsed_time", watermark)
      .groupBy(window(col("parsed_time"), "1 day"),
        col("callsign"), col("hex_ident"))
      .agg(min(col("parsed_time")).as("first_seen"),
        max(col("parsed_time")).as("last_seen"))
      .select(col("window.start").cast("date").as("date_seen"),
        col("callsign"), col("hex_ident"), col("first_seen"),
        col("last_seen"))
}
