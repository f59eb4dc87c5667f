package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{Fix, FlightSessions}

/** Stateful streaming sessionization: legs close on in-stream gaps and
  * on event-time timeout (aircraft leaves coverage), exactly once each.
  */
class FlightSessionsSpec extends SparkSpec {
  import sqlImplicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("flight legs close on gap and on event-time timeout") {
    val ms = MemoryStream[Fix](spark)
    val q = FlightSessions.legs(ms.toDS(), gapMinutes = 10, "0 seconds")
      .writeStream.format("memory").queryName("legs")
      .outputMode("append").start()
    try {
      // leg 1: three fixes 09:00-09:10; then 25 min silence; leg 2 opens
      ms.addData(
        Fix("AAA", t("2024-01-01 09:00:00")),
        Fix("AAA", t("2024-01-01 09:05:00")),
        Fix("AAA", t("2024-01-01 09:10:00")))
      q.processAllAvailable()
      ms.addData(Fix("AAA", t("2024-01-01 09:35:00"))) // gap > 10 min
      q.processAllAvailable()
      // another aircraft advances the watermark far past AAA's timeout,
      // so AAA's open leg 2 times out and closes
      ms.addData(Fix("BBB", t("2024-01-01 11:00:00")))
      q.processAllAvailable()
      ms.addData(Fix("BBB", t("2024-01-01 12:00:00")))
      q.processAllAvailable()

      val legs = spark.sql(
        "SELECT hex_ident, CAST(leg_start AS STRING), " +
          "CAST(leg_end AS STRING), n_fixes FROM legs")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
      assert(legs.contains(
        ("AAA", "2024-01-01 09:00:00", "2024-01-01 09:10:00", 3L)),
        s"gap-closed leg missing from $legs")
      assert(legs.contains(
        ("AAA", "2024-01-01 09:35:00", "2024-01-01 09:35:00", 1L)),
        s"timeout-closed leg missing from $legs")
    } finally q.stop()
  }
}
