package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's three analytical views re-expressed as DataFrame
  * transforms over the canonical ADS-B frame (graft.AdsbSchema.schema).
  *
  * Source semantics: reference create_schema.sql:85-93 (callsigns),
  * :101-108 (locations), :116-124 (flights). These are plain declarative
  * plans — Catalyst handles predicate pushdown / column pruning / partial
  * aggregation; no custom rules needed (SURVEY.md §4.3).
  */
object Views {

  /** Per-(callsign, hex_ident, day) first/last-seen aggregate.
    * `callsign <> ''` uses SQL 3-valued logic: NULL callsigns are excluded
    * too, exactly like the PG view (create_schema.sql:92).
    *
    * Scale note: group key includes hex_ident (high cardinality) → partial
    * (map-side) aggregation collapses the daily duplicates before the
    * shuffle; output is tiny relative to input.
    */
  def callsigns(adsb: DataFrame): DataFrame =
    adsb.filter(col("callsign") =!= "")
      .groupBy(col("callsign"), col("hex_ident"),
               to_date(col("parsed_time")).as("date_seen"))
      .agg(max(col("parsed_time")).as("last_seen"),
           min(col("parsed_time")).as("first_seen"))

  /** Position fixes: filter + 5-column projection (create_schema.sql:101-108).
    * Both the filter and the projection reach the parquet scan
    * (PushedFilters / ReadSchema) — verified in plan tests.
    */
  def locations(adsb: DataFrame): DataFrame =
    adsb.filter(col("lat").isNotNull)
      .select("hex_ident", "parsed_time", "lon", "lat", "altitude")

  /** Positions enriched with callsign via an equi + time-band join, then
    * DISTINCT (create_schema.sql:116-124):
    *
    *   l JOIN cs ON l.hex_ident = cs.hex_ident
    *             AND l.parsed_time <= cs.last_seen  + '00:10:00'
    *             AND l.parsed_time >= cs.first_seen - '00:10:00'
    *
    * Physical shape: hash/sort-merge on the equi key `hex_ident` with the
    * band as a residual filter — the band never becomes a cross product.
    * `callsigns` output is orders of magnitude smaller than positions, so
    * AQE broadcast-joins it at realistic sizes; at 100 TB both sides
    * should be bucketed by hex_ident so the join is shuffle-free.
    */
  def flights(locations: DataFrame, callsigns: DataFrame): DataFrame =
    locations.alias("l")
      .join(callsigns.alias("cs"),
        expr("""l.hex_ident = cs.hex_ident
                AND l.parsed_time <= cs.last_seen  + INTERVAL 10 MINUTES
                AND l.parsed_time >= cs.first_seen - INTERVAL 10 MINUTES"""))
      .select(col("l.hex_ident"), col("l.parsed_time"), col("l.lon"),
              col("l.lat"), col("l.altitude"), col("cs.callsign"))
      .distinct()

  /** flights straight from the fact table. */
  def flights(adsb: DataFrame): DataFrame =
    flights(locations(adsb), callsigns(adsb))

  /** S9 parity (create_schema.sql:85-124 `CREATE OR REPLACE VIEW`):
    * register the fact table and all three views as temp views so the
    * SQL surface works verbatim — `spark.sql("SELECT ... FROM
    * callsigns WHERE callsign LIKE 'FDX%'")`. The Analyzer expands view
    * references exactly like PostgreSQL's rewriter (SURVEY.md §3).
    */
  def register(adsb: DataFrame): Unit = {
    adsb.createOrReplaceTempView("adsb_messages")
    callsigns(adsb).createOrReplaceTempView("callsigns")
    locations(adsb).createOrReplaceTempView("locations")
    flights(adsb).createOrReplaceTempView("flights")
  }

  /** Full `CREATE OR REPLACE VIEW` parity: the reference's views persist
    * in the DATABASE (create_schema.sql:85-124), not in one connection's
    * session — any later client sees them. The Spark equivalent is a
    * catalog (non-temp) view over a saved table: view definitions live
    * in the external catalog shared by every session of the warehouse
    * (and in the metastore across restarts when one is configured), so a
    * `spark.newSession()` — a fresh "connection" — resolves them with no
    * re-registration. Bodies are the reference's SQL re-expressed
    * verbatim, views-over-views like the PG schema (`flights` reads the
    * `locations`/`callsigns` VIEWS, not the fact table).
    */
  def registerPersistent(spark: org.apache.spark.sql.SparkSession,
                         factTable: String): Unit = {
    spark.sql(
      s"""CREATE OR REPLACE VIEW callsigns AS
         |SELECT callsign, hex_ident,
         |       to_date(parsed_time) AS date_seen,
         |       max(parsed_time) AS last_seen,
         |       min(parsed_time) AS first_seen
         |FROM $factTable
         |WHERE callsign <> ''
         |GROUP BY callsign, hex_ident, to_date(parsed_time)""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE VIEW locations AS
         |SELECT hex_ident, parsed_time, lon, lat, altitude
         |FROM $factTable
         |WHERE lat IS NOT NULL""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE VIEW flights AS
        |SELECT DISTINCT l.hex_ident, l.parsed_time, l.lon, l.lat,
        |       l.altitude, cs.callsign
        |FROM locations l
        |JOIN callsigns cs
        |  ON l.hex_ident = cs.hex_ident
        | AND l.parsed_time <= cs.last_seen  + INTERVAL 10 MINUTES
        | AND l.parsed_time >= cs.first_seen - INTERVAL 10 MINUTES""".stripMargin)
  }
}
