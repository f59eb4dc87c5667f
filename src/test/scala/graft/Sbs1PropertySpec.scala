package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.Sbs1

/** Property tests for the SBS-1 parser (SURVEY.md §5.2.2): generated
  * corpora are drawn with a FIXED seed (deterministic CI), formatted to
  * CSV, and pushed through one parse call per property.
  */
class Sbs1PropertySpec extends SparkSpec {
  import sqlImplicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val genInt = Gen.chooseNum(-99999, 99999).map(_.toString)
  private val genFloat = for {
    a <- Gen.chooseNum(-180, 180); b <- Gen.chooseNum(0, 99999)
  } yield s"$a.$b"
  private val genDate = for {
    y <- Gen.chooseNum(2000, 2030); m <- Gen.chooseNum(1, 12)
    d <- Gen.chooseNum(1, 28)
  } yield f"$y%04d/$m%02d/$d%02d"
  private val genTime = for {
    h <- Gen.chooseNum(0, 23); m <- Gen.chooseNum(0, 59)
    s <- Gen.chooseNum(0, 59); ms <- Gen.chooseNum(0, 999)
  } yield f"$h%02d:$m%02d:$s%02d.$ms%03d"
  private val genHex = Gen.listOfN(6, Gen.hexChar).map(_.mkString.toUpperCase)
  private val genText = Gen.alphaNumStr.map(_.take(8))
  private def opt(g: Gen[String]): Gen[String] =
    Gen.frequency(3 -> g, 1 -> Gen.const(""))

  /** A fully valid 22-field MSG row (required fields always present). */
  private val genValidRow: Gen[Seq[String]] = for {
    tt <- Gen.chooseNum(1, 8)
    sid <- opt(genText); aid <- opt(genText)
    hex <- genHex; fid <- opt(genText)
    gd <- genDate; gt <- genTime
    ld <- opt(genDate); lt <- opt(genTime)
    cs <- opt(genText)
    alt <- opt(genInt); gs <- opt(genInt); trk <- opt(genInt)
    lat <- opt(genFloat); lon <- opt(genFloat); vr <- opt(genFloat)
    sq <- opt(genText)
    al <- opt(genInt); em <- opt(genInt); spi <- opt(genInt)
    gnd <- opt(genInt)
  } yield Seq("MSG", tt.toString, sid, aid, hex, fid, gd, gt, ld, lt, cs,
    alt, gs, trk, lat, lon, vr, sq, al, em, spi, gnd)

  private def parseLines(lines: Seq[String]) =
    Sbs1.parse(lines.toDF("value"),
      parsedTime = org.apache.spark.sql.functions
        .lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))

  test("valid 22-field rows always survive and round-trip typed values") {
    val rows = draw(Gen.listOfN(120, genValidRow), 42L)
    val out = parseLines(rows.map(_.mkString(","))).collect()
    assert(out.length === rows.length)
    val byKey = out.map(r => (r.getAs[String]("hex_ident"),
      r.getAs[Int]("transmission_type"),
      r.getAs[String]("generated_time")) -> r).toMap
    rows.foreach { f =>
      val r = byKey((f(4), f(1).toInt, f(7)))
      assert(Option(r.getAs[Integer]("altitude")).map(_.toString)
        === Some(f(11)).filter(_.nonEmpty),
        s"altitude round-trip for $f")
      assert(Option(r.getAs[java.lang.Float]("lat")).map(_.floatValue)
        === Some(f(14)).filter(_.nonEmpty).map(_.toFloat),
        s"lat round-trip for $f")
      assert(Option(r.getAs[String]("callsign"))
        === Some(f(10)).filter(_.nonEmpty), s"callsign nullify for $f")
    }
  }

  test("wrong arity is always dropped (shorter and longer)") {
    val rows = draw(Gen.listOfN(60, genValidRow), 7L)
    val mutated = rows.zipWithIndex.map { case (f, i) =>
      if (i % 2 == 0) f.dropRight(1) else f :+ "extra"
    }
    assert(parseLines(mutated.map(_.mkString(","))).count() === 0L)
  }

  test("non-integer text in an integer column drops the row (PG 22P02)") {
    val rows = draw(Gen.listOfN(60, genValidRow), 11L)
    val mutated = rows.map(f => f.updated(12, "288.6")) // ground_speed
    assert(parseLines(mutated.map(_.mkString(","))).count() === 0L)
  }

  test("parser never throws on arbitrary junk; survivors are 22-field") {
    val junk = draw(Gen.listOfN(150,
      Gen.asciiPrintableStr.map(_.take(60).replace("\n", " "))), 13L)
    val out = parseLines(junk).collect() // must not throw (ANSI mode on)
    out.foreach { r =>
      assert(r.getAs[String]("hex_ident") != null)
      assert(r.getAs[Integer]("transmission_type") != null)
    }
  }
}
