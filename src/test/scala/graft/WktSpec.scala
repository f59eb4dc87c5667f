package graft

import org.apache.spark.sql.functions.col

import graft.functions.Wkt

/** Fixed-6-decimal WKT rendering: the sign/pad edge cases that would
  * silently corrupt coordinates if the integer divmod were wrong.
  */
class WktSpec extends SparkSpec {
  import sqlImplicits._

  test("fixed6: sign, zero-pad, and floor semantics") {
    val cases = Seq(
      (1.5, "1.500000"),
      (0.0, "0.000000"),
      (-0.75, "-0.750000"),
      (-0.0000004, "-0.000001"),  // floor toward -inf
      (51.45735, "51.457350"),
      (-1.02826, "-1.028260"),
      (180.0, "180.000000"),
      (-180.0, "-180.000000"))
    val out = cases.map(_._1).toDF("v")
      .select(Wkt.fixed6(col("v"))).collect().map(_.getString(0))
    assert(out.toSeq === cases.map(_._2))
  }

  test("point/line WKT shapes") {
    val out = Seq((1.25, -2.5, 3.0, 4.125)).toDF("x1", "y1", "x2", "y2")
      .select(
        Wkt.point(col("x1"), col("y1")).as("p"),
        Wkt.line(col("x1"), col("y1"), col("x2"), col("y2")).as("l"))
      .collect().head
    assert(out.getString(0) === "POINT (1.250000 -2.500000)")
    assert(out.getString(1) ===
      "LINESTRING (1.250000 -2.500000, 3.000000 4.125000)")
  }
}
