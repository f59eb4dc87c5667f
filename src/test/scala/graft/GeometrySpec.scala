package graft

import java.nio.file.Files

import graft.functions.{Geometry, GLineString, GPoint, Wkt}

class GeometrySpec extends SparkSpec {
  import sqlImplicits._

  test("geometry UDT round-trips through Dataset and parquet with SRID") {
    val geoms: Seq[(Long, Geometry)] = Seq(
      1L -> GPoint(Geometry.Wgs84, -77.035, 38.89),
      2L -> GPoint(3857, 0.0, -1.5),
      3L -> GLineString(Geometry.Wgs84,
        Array(-77.0, -77.1), Array(38.9, 38.95)))
    val ds = geoms.toDF("id", "geom")
    val back = ds.collect().map(r => r.getLong(0) ->
      r.getAs[Geometry](1)).toMap
    geoms.foreach { case (id, g) => assert(back(id) === g, s"id $id") }
    // parquet round-trip: the UDT's struct storage is a first-class
    // columnar type; SRID survives the file format
    val dir = Files.createTempDirectory("graft-geom").toString
    ds.write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Geometry](1)).toMap
    geoms.foreach { case (id, g) => assert(fromDisk(id) === g, s"id $id") }
  }

  test("ewkt carries the SRID prefix; wkt matches the columnar emission") {
    val p = GPoint(Geometry.Wgs84, -77.035, 38.89)
    assert(p.ewkt === "SRID=4326;POINT (-77.035000 38.890000)")
    val l = GLineString(Geometry.Wgs84, Array(-77.0, -77.1),
      Array(38.9, 38.95))
    assert(l.wkt === "LINESTRING (-77.000000 38.900000, -77.100000 38.950000)")
    // typed rendering ≡ the oracle-checked columnar rendering, char for
    // char (both build from floor(1e6·v) integers)
    val coords = Seq((-77.0351234, 38.8899999), (0.5, -0.5), (179.999999, -89.000001))
    val viaColumn = coords.toDF("x", "y")
      .select(Wkt.point($"x", $"y")).collect().map(_.getString(0))
    val viaTyped = coords.map { case (x, y) =>
      GPoint(Geometry.Wgs84, x, y).wkt }
    assert(viaColumn.toSeq === viaTyped)
  }

  test("a geometry column groups and joins like any value") {
    val ds = Seq(
      (1L, GPoint(Geometry.Wgs84, 1.0, 2.0): Geometry),
      (2L, GPoint(Geometry.Wgs84, 1.0, 2.0): Geometry),
      (3L, GPoint(3857, 1.0, 2.0): Geometry)).toDF("id", "geom")
    // same coords, different SRID -> different groups: the tag is part
    // of the value, which is the point of carrying it
    val grouped = ds.groupBy("geom").count().collect()
    assert(grouped.length === 2)
    assert(grouped.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L))
  }
}
