package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.Sbs1

/** Parser conformance against the reference's implicit test corpus — the 14
  * sample SBS-1 lines at README.md:82-94 (all 6 message types, all 8
  * transmission types) plus the drop semantics of dump1090-postgres.py:
  * arity gate (:102), ''->NULL (:107-109), strict-cast drop (:118-123).
  */
class Sbs1Spec extends SparkSpec {
  import sqlImplicits._

  val corpus: Seq[String] = Seq(
    "SEL,,496,2286,4CA4E5,27215,2010/02/19,18:06:07.710,2010/02/19,18:06:07.710,RYR1427",
    "ID,,496,7162,405637,27928,2010/02/19,18:06:07.115,2010/02/19,18:06:07.115,EZY691A",
    "AIR,,496,5906,400F01,27931,2010/02/19,18:06:07.128,2010/02/19,18:06:07.128",
    "STA,,5,179,400AE7,10103,2008/11/28,14:58:51.153,2008/11/28,14:58:51.153,RM",
    "CLK,,496,-1,,-1,2010/02/19,18:18:19.036,2010/02/19,18:18:19.036",
    "MSG,1,145,256,7404F2,11267,2008/11/28,23:48:18.611,2008/11/28,23:53:19.161,RJA1118,,,,,,,,,,,",
    "MSG,2,496,603,400CB6,13168,2008/10/13,12:24:32.414,2008/10/13,12:28:52.074,,,0,76.4,258.3,54.05735,-4.38826,,,,,,0",
    "MSG,3,496,211,4CA2D6,10057,2008/11/28,14:53:50.594,2008/11/28,14:58:51.153,,37000,,,51.45735,-1.02826,,,0,0,0,0",
    "MSG,4,496,469,4CA767,27854,2010/02/19,17:58:13.039,2010/02/19,17:58:13.368,,,288.6,103.2,,,-832,,,,,",
    "MSG,5,496,329,394A65,27868,2010/02/19,17:58:12.644,2010/02/19,17:58:13.368,,10000,,,,,,,0,,0,0",
    "MSG,6,496,237,4CA215,27864,2010/02/19,17:58:12.846,2010/02/19,17:58:13.368,,33325,,,,,,0271,0,0,0,0",
    "MSG,7,496,742,51106E,27929,2011/03/06,07:57:36.523,2011/03/06,07:57:37.054,,3775,,,,,,,,,,0",
    "MSG,8,496,194,405F4E,27884,2010/02/19,17:58:13.244,2010/02/19,17:58:13.368,,,,,,,,,,,,0")

  val ts = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
  lazy val parsed =
    Sbs1.parse(corpus.toDF("value"), parsedTime = ts).cache()

  test("schema matches the canonical 23-column frame") {
    assert(parsed.columns.toSeq ===
      AdsbSchema.schema.fields.map(_.name).toSeq)
  }

  test("only the 6 valid MSG rows survive (arity + strict-cast gates)") {
    // SEL/ID/AIR/STA/CLK: 10-11 fields -> arity drop.
    // MSG,2 sample: 23 fields -> arity drop (README sample has extra field).
    // MSG,4: ground_speed 288.6 / track 103.2 fail integer cast -> drop.
    val kept = parsed.select("transmission_type").as[Int].collect().sorted
    assert(kept === Array(1, 3, 5, 6, 7, 8))
  }

  test("MSG,1: callsign kept, all numerics NULL") {
    val r = parsed.filter($"transmission_type" === 1).collect().head
    assert(r.getAs[String]("callsign") === "RJA1118")
    assert(r.getAs[String]("hex_ident") === "7404F2")
    Seq("altitude", "ground_speed", "track", "lat", "lon", "vertical_rate",
        "alert", "emergency", "spi", "is_on_ground").foreach { c =>
      assert(r.isNullAt(r.fieldIndex(c)), s"$c should be null")
    }
  }

  test("MSG,3: typed values parse (single-precision lat/lon, date fields)") {
    val r = parsed.filter($"transmission_type" === 3).collect().head
    assert(r.getAs[Int]("altitude") === 37000)
    assert(r.getAs[Float]("lat") === 51.45735f)
    assert(r.getAs[Float]("lon") === -1.02826f)
    assert(r.getAs[java.sql.Date]("generated_date").toString === "2008-11-28")
    assert(r.getAs[String]("generated_time") === "14:53:50.594")
    assert(r.getAs[Int]("is_on_ground") === 0)
    // empty string -> NULL, not ''
    assert(r.isNullAt(r.fieldIndex("callsign")))
  }

  test("MSG,6: squawk stays text; vertical_rate NULL when empty") {
    val r = parsed.filter($"transmission_type" === 6).collect().head
    assert(r.getAs[String]("squawk") === "0271")
    assert(r.isNullAt(r.fieldIndex("vertical_rate")))
  }

  test("MSG,7: negative-free int parse; altitude 3775") {
    val r = parsed.filter($"transmission_type" === 7).collect().head
    assert(r.getAs[Int]("altitude") === 3775)
  }

  test("strict cast: fractional int field drops row; float field keeps it") {
    val rows = Seq(
      // vertical_rate is real: -832.5 is fine
      "MSG,4,1,1,ABC123,1,2020/01/01,00:00:00.000,2020/01/01,00:00:00.000,,,,,,,-832.5,,,,,",
      // altitude is integer: 100.5 must drop the row
      "MSG,4,1,1,ABC124,1,2020/01/01,00:00:00.000,2020/01/01,00:00:00.000,,100.5,,,,,,,,,,",
      // bad date must drop the row
      "MSG,4,1,1,ABC125,1,2020-01-01,00:00:00.000,2020/01/01,00:00:00.000,,,,,,,,,,,,")
    val out = Sbs1.parse(rows.toDF("value"), parsedTime = ts)
    assert(out.select("hex_ident").as[String].collect().toSeq === Seq("ABC123"))
    assert(out.collect().head.getAs[Float]("vertical_rate") === -832.5f)
  }

  test("NOT NULL constraint columns drop the row when empty") {
    val rows = Seq(
      // missing hex_ident
      "MSG,4,1,1,,1,2020/01/01,00:00:00.000,2020/01/01,00:00:00.000,,,,,,,,,,,,",
      // missing transmission_type
      "MSG,,1,1,ABC123,1,2020/01/01,00:00:00.000,2020/01/01,00:00:00.000,,,,,,,,,,,,")
    assert(Sbs1.parse(rows.toDF("value"), parsedTime = ts).count() === 0)
  }

  test("trailing \\r is stripped before parsing") {
    val row = "MSG,8,1,1,ABC123,1,2020/01/01,00:00:00.000,2020/01/01,00:00:00.000,,,,,,,,,,,,0\r"
    val out = Sbs1.parse(Seq(row).toDF("value"), parsedTime = ts)
    assert(out.select("is_on_ground").as[Int].collect().toSeq === Seq(0))
  }
}
