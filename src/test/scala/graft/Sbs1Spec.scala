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

  val corpus: Seq[String] = Sbs1.sampleLines

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

  test("readArchive ingests plain and gzipped line files identically") {
    val dir = java.nio.file.Files.createTempDirectory("sbs1-archive")
    val plain = dir.resolve("day1.sbs")
    java.nio.file.Files.writeString(plain,
      graft.sources.Sbs1.sampleLines.mkString("", "\n", "\n"))
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("day2.sbs.gz")))
    gz.write(graft.sources.Sbs1.sampleLines.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    gz.close()
    val out = graft.sources.Sbs1.readArchive(spark, dir.toString)
    assert(out.count() === 12, "6 valid lines from each of the two files")
    assert(out.columns.length === 23)
  }
}
