package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** One user event as consumed by the attribution operator. */
case class UserEvent(user_id: Long, event_id: Long, event_type: String,
                     ts: Timestamp)

/** Bounded per-user touch buffer: (epoch micros, event id, type). */
case class TouchBuffer(touches: List[(Long, Long, String)])

/** One attributed conversion, emitted exactly once per purchase. */
case class AttributedPurchase(user_id: Long, purchase_id: Long,
                              purchase_ts: Timestamp,
                              first_touch: String, last_touch: String)

/** Streaming first/last-touch attribution — the stateful twin of the
  * batch census ([[graft.operators.RelationalQueries.attributionCensus]],
  * R36): the batch version re-scans history with a user-keyed band
  * join; this one carries a small bounded touch buffer per active user
  * and attributes each purchase exactly once, at arrival.
  *
  * Semantics match R36 for in-order data WHILE a user's touches inside
  * the lookback window stay within `maxTouches`: beyond the cap the
  * OLDEST touches are evicted, so first_touch can diverge from the
  * batch census even for in-order data (the eviction spec pins exactly
  * this behavior). Within the cap, a purchase is attributed to the
  * STRICTLY-earlier touches within the lookback window; first =
  * min(ts, event_id), last = max(ts, event_id) — same-instant ties
  * break toward the smaller/larger id, identically to the batch
  * operator (the spec pins batch parity on the R36 fixture). Rows
  * inside a micro-batch are processed in (ts, event_id) order, so
  * intra-batch ordering does not depend on arrival interleaving. A
  * touch that arrives AFTER its purchase was processed cannot
  * retro-attribute — at-arrival semantics, the documented streaming
  * contract (the batch census is the replayable source of truth).
  *
  * State is bounded two ways: the buffer keeps only touches within
  * `windowDays` of the newest event seen for that user, capped at
  * `maxTouches` most recent (a bot spraying clicks cannot grow state
  * past the cap); an event-time timeout drops the whole buffer once
  * the watermark passes last activity + window — state is bounded by
  * users active within the watermark horizon, not by stream length.
  */
object StreamingAttribution {

  val MaxTouches = 64

  def attributed(events: Dataset[UserEvent], windowDays: Int = 7,
                 watermark: String = "1 day",
                 maxTouches: Int = MaxTouches)
      : Dataset[AttributedPurchase] = {
    val spark = events.sparkSession
    import spark.implicits._
    val windowUs = windowDays * 86400000000L
    val windowMs = windowDays * 86400000L

    def fn(user: Long, rows: Iterator[UserEvent],
           state: GroupState[TouchBuffer])
        : Iterator[AttributedPurchase] = {
      if (!rows.hasNext) { // event-time timeout: horizon passed
        state.remove()
        return Iterator.empty
      }
      val sorted = rows.toSeq
        .sortBy(e => (e.ts.getTime, e.event_id))
      var buf = state.getOption.map(_.touches).getOrElse(Nil)
      val out = List.newBuilder[AttributedPurchase]
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000L
        if (e.event_type == "purchase") {
          val eligible = buf.filter { case (tus, _, _) =>
            tus < us && tus >= us - windowUs
          }
          if (eligible.nonEmpty) {
            val f = eligible.minBy { case (tus, id, _) => (tus, id) }
            val l = eligible.maxBy { case (tus, id, _) => (tus, id) }
            out += AttributedPurchase(user, e.event_id, e.ts, f._3, l._3)
          }
        } else {
          buf = ((us, e.event_id, e.event_type) :: buf)
            .filter { case (tus, _, _) => tus >= us - windowUs }
            .sortBy { case (tus, id, _) => (-tus, -id) }
            .take(maxTouches)
        }
      }
      val lastMs = sorted.last.ts.getTime // ms — setTimeoutTimestamp takes ms
      state.update(TouchBuffer(buf))
      state.setTimeoutTimestamp(lastMs + windowMs)
      out.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
