package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Sbs1
import graft.streaming.Ingest

/** JDBC parity sink against embedded Derby (the PostgreSQL stand-in
  * shipped with Spark): stream of raw SBS-1 lines → parse → foreachBatch
  * JDBC append → read back over JDBC.
  */
class JdbcSinkSpec extends SparkSpec {
  import sqlImplicits._

  test("streaming foreachBatch JDBC sink appends parsed batches") {
    val url = "jdbc:derby:memory:graftJdbc;create=true"
    val table = "adsb_messages"
    val ms = MemoryStream[String](spark)
    val parsed = Sbs1.parse(ms.toDF(),
      parsedTime = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
        .cast("timestamp_ntz"))
    val q = parsed.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        Ingest.writeJdbcBatch(df, url, table,
          new java.util.Properties())
      }
      .start()
    try {
      ms.addData(Sbs1.sampleLines: _*)
      q.processAllAvailable()
      val back = spark.read.jdbc(url, table, new java.util.Properties())
      assert(back.count() === 6, "6 of 14 sample lines survive the gates")
      assert(back.columns.length === 23)
      // Derby stores StringType as CLOB (not SQL-comparable): check rows
      // client-side
      val rows = back.select("hex_ident", "altitude").collect()
        .map(r => r.getString(0) -> r.get(1)).toMap
      assert(rows("4CA2D6") === 37000)
    } finally q.stop()
  }

  test("pgProperties maps the reference's connection options") {
    // dump1090-postgres.py:144-150: search_path option + application_name
    val p = Ingest.pgProperties("ingest", "secret")
    assert(p.getProperty("currentSchema") === "dump1090")
    assert(p.getProperty("ApplicationName") === "dump1090-db-stream")
    assert(p.getProperty("user") === "ingest")
    assert(p.getProperty("reWriteBatchedInserts") === "true")
    // Derby ignores the pg-specific properties (and scopes tables to
    // the user's schema), so the same Properties object must remain
    // usable against the integration-test database
    val url = "jdbc:derby:memory:graftJdbcProps;create=true"
    Seq((1L, "x")).toDF("id", "v").write.mode("overwrite")
      .jdbc(url, "props_probe", Ingest.pgProperties("ingest", "secret"))
    assert(spark.read.jdbc(url, "props_probe",
      Ingest.pgProperties("ingest", "secret")).count() === 1)
  }
}
