package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WKT emission for the PostGIS output shapes the reference produces
  * (`ST_SetSRID(ST_MakePoint(lon, lat), 4326)` / `ST_MakeLine(...)`,
  * reference/README.md:259-272) — the "geometry is an output shape"
  * contract (SURVEY.md §2.6 F5/F6) upgraded to `ST_AsText`-style
  * strings (`POINT (x y)` / `LINESTRING (x1 y1, x2 y2)`) that a GIS
  * consumer can ingest directly.
  *
  * Coordinates print at fixed 6-decimal precision assembled from the
  * micro-unit integer `floor(1e6·v)`: double→string formatting is a
  * place engines legitimately disagree (Java shortest-round-trip vs C++
  * printf), so the text is built with exact integer arithmetic that the
  * DuckDB oracle mirrors literally ([[fixed6Sql]]). 1e-6° is ~0.11 m at
  * the equator — GIS-precision-adequate and cross-engine exact.
  */
object Wkt {

  /** Fixed 6-decimal rendering of v via floor(1e6·v): sign, integer
    * part, '.', zero-padded 6-digit fraction. Pure codegen expressions.
    */
  def fixed6(v: Column): Column = {
    val m = floor(v * lit(1000000.0)).cast("long")
    val a = abs(m)
    concat(when(m < 0, lit("-")).otherwise(lit("")),
      (a / lit(1000000L)).cast("long").cast("string"), lit("."),
      lpad((a % lit(1000000L)).cast("string"), 6, "0"))
  }

  def point(x: Column, y: Column): Column =
    concat(lit("POINT ("), fixed6(x), lit(" "), fixed6(y), lit(")"))

  def line(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    concat(lit("LINESTRING ("), fixed6(x1), lit(" "), fixed6(y1),
      lit(", "), fixed6(x2), lit(" "), fixed6(y2), lit(")"))

  // ------------------------------------------------- DuckDB SQL mirrors

  /** Identical integer-arithmetic rendering in DuckDB SQL. */
  def fixed6Sql(e: String): String = {
    val m = s"CAST(floor(($e) * 1000000.0) AS BIGINT)"
    s"(CASE WHEN $m < 0 THEN '-' ELSE '' END || " +
      s"CAST(abs($m) // 1000000 AS VARCHAR) || '.' || " +
      s"lpad(CAST(abs($m) % 1000000 AS VARCHAR), 6, '0'))"
  }

  def pointSql(x: String, y: String): String =
    s"('POINT (' || ${fixed6Sql(x)} || ' ' || ${fixed6Sql(y)} || ')')"

  def lineSql(x1: String, y1: String, x2: String, y2: String): String =
    s"('LINESTRING (' || ${fixed6Sql(x1)} || ' ' || ${fixed6Sql(y1)} || " +
      s"', ' || ${fixed6Sql(x2)} || ' ' || ${fixed6Sql(y2)} || ')')"
}
