package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{StreamingAttribution, UserEvent}

/** Stateful streaming attribution: batch parity on the R36 fixture,
  * cross-batch state carry, window pruning, and the touch-buffer cap.
  */
class StreamingAttributionSpec extends SparkSpec {
  import sqlImplicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def collect(name: String) = spark.sql(
    s"SELECT user_id, purchase_id, first_touch, last_touch FROM $name")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getString(3))).toSet

  test("batch parity on the R36 fixture: first/last picks, " +
    "same-instant id tiebreaks, strictly-earlier window, drops") {
    val ms = MemoryStream[UserEvent](spark)
    val q = StreamingAttribution.attributed(ms.toDS(), windowDays = 7,
      watermark = "0 seconds")
      .writeStream.format("memory").queryName("attr1")
      .outputMode("append").start()
    try {
      ms.addData(
        UserEvent(1L, 0L, "view", t("2024-01-01 10:00:00")),
        UserEvent(1L, 1L, "click", t("2024-01-02 10:00:00")),
        UserEvent(1L, 2L, "purchase", t("2024-01-03 10:00:00")),
        UserEvent(2L, 3L, "click", t("2024-01-01 10:00:00")),
        UserEvent(2L, 4L, "purchase", t("2024-01-20 10:00:00")),
        UserEvent(3L, 5L, "view", t("2024-01-05 10:00:00")),
        UserEvent(3L, 6L, "click", t("2024-01-05 10:00:00")),
        UserEvent(3L, 7L, "purchase", t("2024-01-05 11:00:00")),
        UserEvent(4L, 8L, "signup", t("2024-01-06 09:00:00")),
        UserEvent(4L, 9L, "purchase", t("2024-01-06 09:00:00")))
      q.processAllAvailable()
      // matches RelationalQueries.attributionCensus on the same rows:
      // u1 view/click, u3 view/click (same-instant ids 5 < 6), u2
      // outside the window, u4's only touch is AT the purchase instant
      assert(collect("attr1") === Set(
        (1L, 2L, "view", "click"),
        (3L, 7L, "view", "click")))
    } finally q.stop()
  }

  test("state carries across micro-batches and prunes past the window") {
    val ms = MemoryStream[UserEvent](spark)
    val q = StreamingAttribution.attributed(ms.toDS(), windowDays = 7,
      watermark = "0 seconds")
      .writeStream.format("memory").queryName("attr2")
      .outputMode("append").start()
    try {
      // batch 1: an old touch (will age out) and a recent one
      ms.addData(
        UserEvent(9L, 10L, "view", t("2024-01-01 10:00:00")),
        UserEvent(9L, 11L, "click", t("2024-01-06 10:00:00")))
      q.processAllAvailable()
      // batch 2: the purchase on 01-09 sees click (3 days back) but
      // NOT view (8 days back — pruned by the window filter)
      ms.addData(UserEvent(9L, 12L, "purchase", t("2024-01-09 10:00:00")))
      q.processAllAvailable()
      assert(collect("attr2") === Set((9L, 12L, "click", "click")))
    } finally q.stop()
  }

  test("touch buffer caps at maxTouches most recent") {
    val ms = MemoryStream[UserEvent](spark)
    val q = StreamingAttribution.attributed(ms.toDS(), windowDays = 7,
      watermark = "0 seconds", maxTouches = 2)
      .writeStream.format("memory").queryName("attr3")
      .outputMode("append").start()
    try {
      // three touches, cap 2 -> the OLDEST (view, 10:00) is evicted;
      // first among retained = click@11:00, last = signup@12:00
      ms.addData(
        UserEvent(5L, 20L, "view", t("2024-01-01 10:00:00")),
        UserEvent(5L, 21L, "click", t("2024-01-01 11:00:00")),
        UserEvent(5L, 22L, "signup", t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      ms.addData(UserEvent(5L, 23L, "purchase", t("2024-01-01 13:00:00")))
      q.processAllAvailable()
      assert(collect("attr3") === Set((5L, 23L, "click", "signup")))
    } finally q.stop()
  }
}
