package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Minimal SRID-tagged geometry values — the last PostGIS semantic the
  * reference's output shapes carry (`ST_SetSRID(ST_MakePoint(...),
  * 4326)`, reference/README.md:261-272) that plain WKT text drops.
  *
  * [[Wkt]] covers the *interchange* story (`ST_AsText` strings, oracle-
  * checkable); this UDT covers the *typed* story: a geometry column
  * whose SRID travels with the value through Datasets, shuffles, and
  * parquet round-trips, so a pipeline cannot silently mix CRSs. It is
  * deliberately not a full geometry engine — point and linestring (the
  * two shapes the reference emits), EWKT rendering, no spatial
  * predicates. Catalyst stores it as its `sqlType` struct; all relational
  * operations on the column (group, join keys via WKT text, parquet)
  * work unchanged.
  */
@SQLUserDefinedType(udt = classOf[GeometryUDT])
sealed trait Geometry extends Serializable {
  def srid: Int
  def wkt: String
  /** PostGIS-style extended WKT: `SRID=4326;POINT (...)`. */
  final def ewkt: String = s"SRID=$srid;$wkt"
}

object Geometry {
  /** WGS-84 — the reference's fixed CRS (README.md:261). */
  val Wgs84 = 4326

  /** Fixed 6-decimal rendering from floor(1e6·v) — the same integer
    * arithmetic as [[Wkt.fixed6]], so typed and columnar WKT agree
    * character-for-character.
    */
  private[functions] def fixed6(v: Double): String = {
    val m = math.floor(v * 1000000.0).toLong
    val a = math.abs(m)
    (if (m < 0) "-" else "") + (a / 1000000L) + "." + "%06d".format(a % 1000000L)
  }
}

/** A point; coordinate order (x, y) = (lon, lat), as in ST_MakePoint. */
case class GPoint(srid: Int, x: Double, y: Double) extends Geometry {
  def wkt: String =
    s"POINT (${Geometry.fixed6(x)} ${Geometry.fixed6(y)})"
}

/** A linestring over (x, y) vertices, as in ST_MakeLine. */
case class GLineString(srid: Int, xs: Array[Double], ys: Array[Double])
  extends Geometry {
  require(xs.length == ys.length, "xs/ys must pair up")
  def wkt: String = xs.indices
    .map(i => s"${Geometry.fixed6(xs(i))} ${Geometry.fixed6(ys(i))}")
    .mkString("LINESTRING (", ", ", ")")
  // Array fields need value equality for Dataset comparisons
  override def equals(o: Any): Boolean = o match {
    case g: GLineString =>
      srid == g.srid && xs.sameElements(g.xs) && ys.sameElements(g.ys)
    case _ => false
  }
  override def hashCode(): Int =
    (srid, xs.toSeq, ys.toSeq).hashCode()
}

/** Catalyst storage: (kind, srid, interleaved coords) — a flat struct,
  * so the column shuffles/sorts/writes like any nested value.
  */
class GeometryUDT extends UserDefinedType[Geometry] {

  override def sqlType: DataType = StructType(Seq(
    StructField("kind", ByteType, nullable = false),
    StructField("srid", IntegerType, nullable = false),
    StructField("coords", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  override def serialize(g: Geometry): Any = g match {
    case GPoint(srid, x, y) =>
      InternalRow(1.toByte, srid, new GenericArrayData(Array(x, y)))
    case GLineString(srid, xs, ys) =>
      val coords = new Array[Double](xs.length * 2)
      var i = 0
      while (i < xs.length) {
        coords(2 * i) = xs(i); coords(2 * i + 1) = ys(i); i += 1
      }
      InternalRow(2.toByte, srid, new GenericArrayData(coords))
  }

  override def deserialize(datum: Any): Geometry = {
    val row = datum.asInstanceOf[InternalRow]
    val (kind, srid) = (row.getByte(0), row.getInt(1))
    val coords = row.getArray(2).asInstanceOf[ArrayData].toDoubleArray()
    kind match {
      case 1 => GPoint(srid, coords(0), coords(1))
      case 2 =>
        val n = coords.length / 2
        val xs = new Array[Double](n)
        val ys = new Array[Double](n)
        var i = 0
        while (i < n) { xs(i) = coords(2 * i); ys(i) = coords(2 * i + 1); i += 1 }
        GLineString(srid, xs, ys)
    }
  }

  override def userClass: Class[Geometry] = classOf[Geometry]

  override def typeName: String = "geometry"
}
