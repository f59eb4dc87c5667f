package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's query corpus (views + README ad-hoc queries) run over the
  * driver's `events` table, which is mapped onto the canonical ADS-B shape so
  * the DuckDB oracle can check the exact same operator pipeline.
  *
  * Mapping (deterministic, exercises the same operator shapes):
  *   user_id    -> hex_ident  (cast to string)
  *   event_type -> callsign   ('view' mapped to '' so the callsigns-view
  *                             `<> ''` filter actually filters)
  *   ts         -> parsed_time
  *   value      -> lat        (NULL for 'error' rows so the locations-view
  *                             IS NOT NULL filter actually filters)
  *   value/2-30 -> lon
  *   event_id   -> altitude   ((event_id % 400) * 100)
  *
  * Every query here has a verbatim-equivalent DuckDB oracle in
  * [[AdsbQueries.oracles]]; the shared adapter is the `WITH adsb AS ...`
  * prefix. `CAST(ts AS TIMESTAMP)` in the oracle truncates DuckDB's
  * nanosecond timestamps to the microseconds Spark works in.
  */
object AdsbQueries {

  /** events.parquet -> canonical ADS-B frame (subset of columns the views
    * touch). Single place both the Spark side and the oracle SQL mirror.
    */
  def eventsAsAdsb(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(spark, dir).select(
      col("user_id").cast("string").as("hex_ident"),
      when(col("event_type") === "view", lit("")).otherwise(col("event_type"))
        .as("callsign"),
      col("ts").as("parsed_time"),
      when(col("event_type") === "error", lit(null).cast("double"))
        .otherwise(col("value")).as("lat"),
      (col("value") / 2.0 - 30.0).as("lon"),
      (col("event_id") % 400 * 100).cast("int").as("altitude"))

  private val adsbCte =
    """WITH adsb AS (
      |  SELECT CAST(user_id AS VARCHAR) AS hex_ident,
      |         CASE WHEN event_type = 'view' THEN '' ELSE event_type END AS callsign,
      |         CAST(ts AS TIMESTAMP) AS parsed_time,
      |         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS lat,
      |         value / 2.0 - 30.0 AS lon,
      |         CAST(event_id % 400 * 100 AS INTEGER) AS altitude
      |  FROM events
      |)""".stripMargin

  private val callsignsCte =
    """, callsigns AS (
      |  SELECT callsign, hex_ident, CAST(parsed_time AS DATE) AS date_seen,
      |         max(parsed_time) AS last_seen, min(parsed_time) AS first_seen
      |  FROM adsb WHERE callsign <> '' GROUP BY 1, 2, 3
      |), callsigns_iso AS (
      |  SELECT callsign, hex_ident, strftime(date_seen, '%Y-%m-%d') AS date_seen,
      |         last_seen, first_seen
      |  FROM callsigns
      |)""".stripMargin

  private val locationsCte =
    """, locations AS (
      |  SELECT hex_ident, parsed_time, lon, lat, altitude
      |  FROM adsb WHERE lat IS NOT NULL
      |)""".stripMargin

  // ---------------------------------------------------------------- queries

  /** DATE columns parquet-roundtrip as python `date` objects while DuckDB
    * hands the driver datetimes — emit ISO strings at the query edge so the
    * hash compare is representation-proof. Grouping still happens on the
    * real DateType inside the view.
    */
  private def dateAsIso(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, date_format(col(c), "yyyy-MM-dd"))

  /** A1/P3/P8: callsigns view (create_schema.sql:85-93). */
  def qCallsigns(spark: SparkSession, dir: String): DataFrame =
    dateAsIso(Views.callsigns(eventsAsAdsb(spark, dir)), "date_seen")
      .orderBy("callsign", "hex_ident", "date_seen")

  /** P1/P2: locations view (create_schema.sql:101-108). */
  def qLocations(spark: SparkSession, dir: String): DataFrame =
    Views.locations(eventsAsAdsb(spark, dir))
      .orderBy("hex_ident", "parsed_time", "altitude")

  /** J1/A2/F3: flights band-join view (create_schema.sql:116-124). */
  def qFlights(spark: SparkSession, dir: String): DataFrame =
    Views.flights(eventsAsAdsb(spark, dir))
      .orderBy("hex_ident", "parsed_time", "callsign")

  /** P5/L1: LIKE-prefix filter over the callsigns view (README.md:210-214).
    * LIMIT made deterministic with a full ORDER BY (SURVEY.md §5.2).
    */
  def qFdx(spark: SparkSession, dir: String): DataFrame =
    dateAsIso(Views.callsigns(eventsAsAdsb(spark, dir)), "date_seen")
      .filter(col("callsign").like("p%"))
      .select("callsign", "hex_ident", "date_seen", "first_seen", "last_seen")
      .orderBy("callsign", "hex_ident", "date_seen")
      .limit(5)

  /** P4: track one aircraft through the locations view (README.md:235-238). */
  def qTrackOne(spark: SparkSession, dir: String): DataFrame =
    Views.locations(eventsAsAdsb(spark, dir))
      .filter(col("hex_ident") === "7")
      .orderBy("parsed_time", "altitude")
      .limit(10)

  /** L1: most recent 5 raw messages (README.md:182-184), ordered for
    * determinism.
    */
  def qRecent5(spark: SparkSession, dir: String): DataFrame =
    eventsAsAdsb(spark, dir)
      .orderBy(col("parsed_time").desc, col("hex_ident"), col("altitude"))
      .limit(5)

  /** P6/F2/F5: points seen in a 24h window (README.md:259-263). `now()` is
    * parameterized to a literal for determinism; the PostGIS point becomes
    * its (lon, lat) coordinate pair — geometry is an output shape, not a
    * type (SURVEY.md §2.6 F5).
    */
  def qPoints24h(spark: SparkSession, dir: String): DataFrame = {
    val now = lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
    Views.locations(eventsAsAdsb(spark, dir))
      .filter(col("parsed_time")
        .between(now - expr("INTERVAL 24 HOURS"), now))
      .select(col("hex_ident"), col("lon").as("x"), col("lat").as("y"))
      .orderBy("hex_ident", "x", "y")
  }

  /** W1-W3/P7/F6: per-aircraft trajectory segments (README.md:266-273).
    * row_number + lead over (partition by hex_ident order by parsed_time);
    * ST_MakeLine(geom, geom2) becomes the flat 4-coordinate segment.
    * One shuffle on hex_ident feeds a single Window node computing both
    * functions.
    */
  def qLines(spark: SparkSession, dir: String): DataFrame = {
    // lon added as tiebreaker: equal-timestamp fixes would otherwise make
    // lead() nondeterministic between Spark and the oracle
    val w = Window.partitionBy(col("hex_ident"))
      .orderBy(col("parsed_time"), col("lon"))
    Views.locations(eventsAsAdsb(spark, dir))
      .select(col("hex_ident"), col("parsed_time"), col("lon"), col("lat"))
      .withColumn("num", row_number().over(w).cast("long"))
      .withColumn("x2", lead(col("lon"), 1).over(w))
      .withColumn("y2", lead(col("lat"), 1).over(w))
      .filter(col("y2").isNotNull)
      .select(col("hex_ident"), col("num"), col("lon").as("x"),
              col("lat").as("y"), col("x2"), col("y2"))
      .orderBy("hex_ident", "num")
  }

  /** F5 as true WKT: the 24h points with an `ST_AsText`-style
    * `POINT (x y)` column ([[graft.functions.Wkt]]) — closes the GIS-
    * consumer gap left by the coordinate-pair shape of [[qPoints24h]].
    */
  def qPointsWkt(spark: SparkSession, dir: String): DataFrame = {
    val now = lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
    Views.locations(eventsAsAdsb(spark, dir))
      .filter(col("parsed_time")
        .between(now - expr("INTERVAL 24 HOURS"), now))
      .select(col("hex_ident"), col("lon").as("x"), col("lat").as("y"),
        graft.functions.Wkt.point(col("lon"), col("lat")).as("wkt"))
      .orderBy("hex_ident", "x", "y")
  }

  /** F6 as true WKT: trajectory segments as `LINESTRING (x1 y1, x2 y2)`
    * strings — [[qLines]]'s 4-coordinate shape for GIS consumers.
    */
  def qLinesWkt(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("hex_ident"))
      .orderBy(col("parsed_time"), col("lon"))
    Views.locations(eventsAsAdsb(spark, dir))
      .select(col("hex_ident"), col("parsed_time"), col("lon"), col("lat"))
      .withColumn("num", row_number().over(w).cast("long"))
      .withColumn("x2", lead(col("lon"), 1).over(w))
      .withColumn("y2", lead(col("lat"), 1).over(w))
      .filter(col("y2").isNotNull)
      .select(col("hex_ident"), col("num"),
        graft.functions.Wkt.line(col("lon"), col("lat"),
          col("x2"), col("y2")).as("wkt"))
      .orderBy("hex_ident", "num")
  }

  /** S2-S6/§2.9.6: the full parse pipeline over the reference's 14-line
    * sample corpus (README.md:82-94). Of 14 lines exactly 6 survive the
    * arity / strict-cast / NOT-NULL gates; the oracle is the hand-derived
    * VALUES table from FIXTURES.md §A. parsed_time parameterized for
    * determinism (the stream stamps current_timestamp per micro-batch).
    */
  def qParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ts = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
      .cast("timestamp_ntz")
    val parsed = graft.sources.Sbs1.parse(
      graft.sources.Sbs1.sampleLines.toDF("value"), parsedTime = ts)
    dateAsIso(dateAsIso(parsed, "generated_date"), "logged_date")
      .orderBy("transmission_type")
  }

  /** Trajectory kinematics: per-aircraft leg length and derived speed
    * from consecutive fixes (lag over the same hex_ident shuffle as
    * q_lines). Distance is planar in degree units — deliberately pure
    * arithmetic (sub/mul/sqrt are IEEE-deterministic cross-engine;
    * haversine's trig is libm-dependent). Zero-dt legs (shared batch
    * stamps) are filtered on both sides.
    */
  def qSpeed(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("hex_ident"))
      .orderBy(col("parsed_time"), col("lon"))
    import graft.functions.Hashing.micro
    Views.locations(eventsAsAdsb(spark, dir))
      .select(col("hex_ident"), col("parsed_time"), col("lon"), col("lat"))
      .withColumn("x0", lag(col("lon"), 1).over(w))
      .withColumn("y0", lag(col("lat"), 1).over(w))
      .withColumn("t0", lag(col("parsed_time"), 1).over(w))
      .filter(col("t0").isNotNull && col("parsed_time") > col("t0"))
      .withColumn("dist_micro", micro(sqrt(
        (col("lon") - col("x0")) * (col("lon") - col("x0")) +
          (col("lat") - col("y0")) * (col("lat") - col("y0")))))
      .withColumn("dt_micros",
        expr("timestampdiff(MICROSECOND, t0, parsed_time)"))
      .withColumn("speed_micro", micro(
        sqrt((col("lon") - col("x0")) * (col("lon") - col("x0")) +
          (col("lat") - col("y0")) * (col("lat") - col("y0"))) /
          (col("dt_micros") / lit(1000000.0))))
      .select("hex_ident", "parsed_time", "dist_micro", "dt_micros",
        "speed_micro")
      .orderBy("hex_ident", "parsed_time", "dist_micro")
  }

  private val qSpeedOracle =
    """, legs AS (
      |  SELECT hex_ident, parsed_time, lon, lat,
      |    lag(lon) OVER w AS x0, lag(lat) OVER w AS y0,
      |    lag(parsed_time) OVER w AS t0
      |  FROM locations
      |  WINDOW w AS (PARTITION BY hex_ident ORDER BY parsed_time, lon)
      |)
      |SELECT hex_ident, parsed_time,
      |  CAST(floor(1000000.0 * (sqrt((lon - x0) * (lon - x0)
      |       + (lat - y0) * (lat - y0)))) AS BIGINT) AS dist_micro,
      |  date_diff('microsecond', t0, parsed_time) AS dt_micros,
      |  CAST(floor(1000000.0 * (sqrt((lon - x0) * (lon - x0)
      |       + (lat - y0) * (lat - y0))
      |       / (date_diff('microsecond', t0, parsed_time) / 1000000.0)))
      |    AS BIGINT) AS speed_micro
      |FROM legs
      |WHERE t0 IS NOT NULL AND parsed_time > t0
      |ORDER BY hex_ident, parsed_time, dist_micro""".stripMargin

  private val qParseOracle: String = {
    // 23-column expected rows for the 6 surviving MSG lines
    def r(t: Int, sid: String, aid: String, hex: String, fid: String,
          gd: String, gt: String, ld: String, lt: String, cs: String,
          alt: String, lat: String, lon: String, sq: String, al: String,
          em: String, spi: String, gnd: String) =
      s"('MSG', $t, '$sid', '$aid', '$hex', '$fid', '$gd', '$gt', '$ld', " +
        s"'$lt', $cs, $alt, NULL, NULL, $lat, $lon, NULL, $sq, $al, $em, " +
        s"$spi, $gnd)"
    val rows = Seq(
      r(1, "145", "256", "7404F2", "11267", "2008-11-28", "23:48:18.611",
        "2008-11-28", "23:53:19.161", "'RJA1118'", "NULL", "NULL", "NULL",
        "NULL", "NULL", "NULL", "NULL", "NULL"),
      r(3, "496", "211", "4CA2D6", "10057", "2008-11-28", "14:53:50.594",
        "2008-11-28", "14:58:51.153", "NULL", "37000", "51.45735",
        "-1.02826", "NULL", "0", "0", "0", "0"),
      r(5, "496", "329", "394A65", "27868", "2010-02-19", "17:58:12.644",
        "2010-02-19", "17:58:13.368", "NULL", "10000", "NULL", "NULL",
        "NULL", "0", "NULL", "0", "0"),
      r(6, "496", "237", "4CA215", "27864", "2010-02-19", "17:58:12.846",
        "2010-02-19", "17:58:13.368", "NULL", "33325", "NULL", "NULL",
        "'0271'", "0", "0", "0", "0"),
      r(7, "496", "742", "51106E", "27929", "2011-03-06", "07:57:36.523",
        "2011-03-06", "07:57:37.054", "NULL", "3775", "NULL", "NULL",
        "NULL", "NULL", "NULL", "NULL", "0"),
      r(8, "496", "194", "405F4E", "27884", "2010-02-19", "17:58:13.244",
        "2010-02-19", "17:58:13.368", "NULL", "NULL", "NULL", "NULL",
        "NULL", "NULL", "NULL", "NULL", "0"))
    s"""SELECT message_type, CAST(transmission_type AS INTEGER) AS transmission_type,
       |  session_id, aircraft_id, hex_ident, flight_id,
       |  generated_date, generated_time, logged_date, logged_time,
       |  CAST(callsign AS VARCHAR) AS callsign,
       |  CAST(altitude AS INTEGER) AS altitude,
       |  CAST(ground_speed AS INTEGER) AS ground_speed,
       |  CAST(track AS INTEGER) AS track,
       |  CAST(lat AS REAL) AS lat, CAST(lon AS REAL) AS lon,
       |  CAST(vertical_rate AS REAL) AS vertical_rate,
       |  CAST(squawk AS VARCHAR) AS squawk,
       |  CAST(alert AS INTEGER) AS alert,
       |  CAST(emergency AS INTEGER) AS emergency,
       |  CAST(spi AS INTEGER) AS spi,
       |  CAST(is_on_ground AS INTEGER) AS is_on_ground,
       |  TIMESTAMP '2020-01-01 00:00:00' AS parsed_time
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")}
       |) v(message_type, transmission_type, session_id, aircraft_id,
       |    hex_ident, flight_id, generated_date, generated_time,
       |    logged_date, logged_time, callsign, altitude, ground_speed,
       |    track, lat, lon, vertical_rate, squawk, alert, emergency, spi,
       |    is_on_ground)
       |ORDER BY transmission_type""".stripMargin
  }

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q_parse" -> qParseOracle,
    "q_speed" -> s"$adsbCte $locationsCte $qSpeedOracle",
    "q_callsigns" ->
      s"""$adsbCte $callsignsCte
         |SELECT * FROM callsigns_iso ORDER BY callsign, hex_ident, date_seen""".stripMargin,
    "q_locations" ->
      s"""$adsbCte $locationsCte
         |SELECT * FROM locations ORDER BY hex_ident, parsed_time, altitude""".stripMargin,
    "q_flights" ->
      s"""$adsbCte $callsignsCte $locationsCte
         |SELECT DISTINCT l.hex_ident, l.parsed_time, l.lon, l.lat, l.altitude, cs.callsign
         |FROM locations l JOIN callsigns cs
         |  ON l.hex_ident = cs.hex_ident
         | AND l.parsed_time <= cs.last_seen  + INTERVAL 10 MINUTE
         | AND l.parsed_time >= cs.first_seen - INTERVAL 10 MINUTE
         |ORDER BY l.hex_ident, l.parsed_time, cs.callsign""".stripMargin,
    "q_fdx" ->
      s"""$adsbCte $callsignsCte
         |SELECT callsign, hex_ident, date_seen, first_seen, last_seen
         |FROM callsigns_iso WHERE callsign LIKE 'p%'
         |ORDER BY callsign, hex_ident, date_seen LIMIT 5""".stripMargin,
    "q_track_one" ->
      s"""$adsbCte $locationsCte
         |SELECT * FROM locations WHERE hex_ident = '7'
         |ORDER BY parsed_time, altitude LIMIT 10""".stripMargin,
    "q_recent5" ->
      s"""$adsbCte
         |SELECT * FROM adsb
         |ORDER BY parsed_time DESC, hex_ident, altitude LIMIT 5""".stripMargin,
    "q_points_24h" ->
      s"""$adsbCte $locationsCte
         |SELECT hex_ident, lon AS x, lat AS y FROM locations
         |WHERE parsed_time BETWEEN TIMESTAMP '2024-01-02 00:00:00' - INTERVAL 24 HOUR
         |                      AND TIMESTAMP '2024-01-02 00:00:00'
         |ORDER BY hex_ident, x, y""".stripMargin,
    "q_lines" ->
      s"""$adsbCte $locationsCte
         |SELECT * FROM (
         |  SELECT hex_ident,
         |         row_number() OVER w AS num,
         |         lon AS x, lat AS y,
         |         lead(lon) OVER w AS x2,
         |         lead(lat) OVER w AS y2
         |  FROM locations
         |  WINDOW w AS (PARTITION BY hex_ident ORDER BY parsed_time, lon)
         |) q WHERE y2 IS NOT NULL
         |ORDER BY hex_ident, num""".stripMargin,
    "q_points_wkt" ->
      s"""$adsbCte $locationsCte
         |SELECT hex_ident, lon AS x, lat AS y,
         |  ${graft.functions.Wkt.pointSql("lon", "lat")} AS wkt
         |FROM locations
         |WHERE parsed_time BETWEEN TIMESTAMP '2024-01-02 00:00:00' - INTERVAL 24 HOUR
         |                      AND TIMESTAMP '2024-01-02 00:00:00'
         |ORDER BY hex_ident, x, y""".stripMargin,
    "q_lines_wkt" ->
      s"""$adsbCte $locationsCte
         |SELECT hex_ident, num,
         |  ${graft.functions.Wkt.lineSql("x", "y", "x2", "y2")} AS wkt
         |FROM (
         |  SELECT hex_ident,
         |         row_number() OVER w AS num,
         |         lon AS x, lat AS y,
         |         lead(lon) OVER w AS x2,
         |         lead(lat) OVER w AS y2
         |  FROM locations
         |  WINDOW w AS (PARTITION BY hex_ident ORDER BY parsed_time, lon)
         |) q WHERE y2 IS NOT NULL
         |ORDER BY hex_ident, num""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_parse"      -> (qParse _),
    "q_speed"      -> (qSpeed _),
    "q_callsigns"  -> (qCallsigns _),
    "q_locations"  -> (qLocations _),
    "q_flights"    -> (qFlights _),
    "q_fdx"        -> (qFdx _),
    "q_track_one"  -> (qTrackOne _),
    "q_recent5"    -> (qRecent5 _),
    "q_points_24h" -> (qPoints24h _),
    "q_lines"      -> (qLines _),
    "q_points_wkt" -> (qPointsWkt _),
    "q_lines_wkt"  -> (qLinesWkt _))
}
