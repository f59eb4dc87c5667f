package graft

import org.apache.spark.sql.types._

/** Canonical ADS-B message schema.
  *
  * Mirrors the reference's single fact table `adsb.adsb_messages`
  * (reference: create_schema.sql:52-77). Types follow SURVEY.md §1.2:
  * lat/lon/vertical_rate are PG `real` (float4) → FloatType;
  * alert/emergency/spi/is_on_ground are stored as integers (0/-1/1 in the
  * wild) despite being documented as booleans → IntegerType;
  * generated_time/logged_time stay text (SBS-1 carries millis verbatim);
  * parsed_time is processing time stamped at ingest.
  */
object AdsbSchema {

  /** Raw SBS-1 field order (22 fields per record), reference
    * dump1090-postgres.py:95-98 (column list) and README.md:96-134.
    */
  val sbs1Fields: Seq[String] = Seq(
    "message_type", "transmission_type", "session_id", "aircraft_id",
    "hex_ident", "flight_id", "generated_date", "generated_time",
    "logged_date", "logged_time", "callsign", "altitude", "ground_speed",
    "track", "lat", "lon", "vertical_rate", "squawk", "alert", "emergency",
    "spi", "is_on_ground")

  /** Ingested-table schema = sbs1 fields typed + parsed_time (23 cols). */
  val schema: StructType = StructType(Seq(
    StructField("message_type",      StringType),
    StructField("transmission_type", IntegerType, nullable = false),
    StructField("session_id",        StringType),
    StructField("aircraft_id",       StringType),
    StructField("hex_ident",         StringType,  nullable = false),
    StructField("flight_id",         StringType),
    StructField("generated_date",    DateType,    nullable = false),
    StructField("generated_time",    StringType,  nullable = false),
    StructField("logged_date",       DateType),
    StructField("logged_time",       StringType),
    StructField("callsign",          StringType),
    StructField("altitude",          IntegerType),
    StructField("ground_speed",      IntegerType),
    StructField("track",             IntegerType),
    StructField("lat",               FloatType),
    StructField("lon",               FloatType),
    StructField("vertical_rate",     FloatType),
    StructField("squawk",            StringType),
    StructField("alert",             IntegerType),
    StructField("emergency",         IntegerType),
    StructField("spi",               IntegerType),
    StructField("is_on_ground",      IntegerType),
    StructField("parsed_time",       TimestampType, nullable = false)))

  /** Typed row for Dataset[AdsbMessage] use in tests / typed pipelines. */
  final case class AdsbMessage(
    message_type: Option[String],
    transmission_type: Int,
    session_id: Option[String],
    aircraft_id: Option[String],
    hex_ident: String,
    flight_id: Option[String],
    generated_date: java.sql.Date,
    generated_time: String,
    logged_date: Option[java.sql.Date],
    logged_time: Option[String],
    callsign: Option[String],
    altitude: Option[Int],
    ground_speed: Option[Int],
    track: Option[Int],
    lat: Option[Float],
    lon: Option[Float],
    vertical_rate: Option[Float],
    squawk: Option[String],
    alert: Option[Int],
    emergency: Option[Int],
    spi: Option[Int],
    is_on_ground: Option[Int],
    parsed_time: java.sql.Timestamp)
}
