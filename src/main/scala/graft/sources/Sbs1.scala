package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.AdsbSchema

/** SBS-1 ("BaseStation") line parser as a pure Catalyst expression pipeline.
  *
  * Reproduces the reference ingest semantics (dump1090-postgres.py:92-131)
  * without a UDF, so Catalyst can prune / push through the projection:
  *
  *   - strip a trailing `\r` per record             (py:100)
  *   - split on `,`; DROP any record != 22 fields   (py:101-102)
  *   - empty string fields become NULL              (py:107-109)
  *   - strict PG-style casts: a row whose *non-null* text fails the cast of
  *     its target column is DROPPED (PG 22P02 rollback path, py:118-123) —
  *     a plain Spark cast would instead keep the row with a null, which is
  *     the wrong semantics (SURVEY.md §2.9.6)
  *   - rows violating a NOT NULL column (transmission_type, hex_ident,
  *     generated_date, generated_time) are dropped too (the reference would
  *     crash on PG 23502; we keep the stream alive — SURVEY.md §2.9.3)
  *   - `parsed_time` = processing-time stamp appended as the 23rd column
  *     (py:103,206-207); injectable for deterministic tests.
  *
  * Everything is built from `org.apache.spark.sql.functions` so the whole
  * parse stays inside WholeStageCodegen on the scan projection.
  */
object Sbs1 {

  /** The reference's implicit parser-conformance corpus: the 14 sample SBS-1
    * lines at README.md:82-94 — all 6 message types, all 8 transmission
    * types. Only 6 lines survive the reference's gates (FIXTURES.md §A).
    */
  val sampleLines: Seq[String] = Seq(
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

  /** PG `integer` text coercion accepts only optionally-signed digit runs
    * (with surrounding whitespace); `288.6` fails — unlike Spark's lax cast.
    */
  private val pgIntRe = "^\\s*[+-]?\\d+\\s*$"

  private def emptyToNull(c: Column): Column =
    when(c === "", lit(null)).otherwise(c)

  /** Typed value for one SBS-1 field + whether PG would accept it.
    * try_cast/try_to_date (null on failure, even under ANSI mode) model the
    * PG error: a *non-null* input whose typed value comes back null means
    * PG would have raised, so the row is dropped.
    */
  private def typed(name: String, c: Column): (Column, Column) = {
    val intCols   = Set("transmission_type", "altitude", "ground_speed",
                        "track", "alert", "emergency", "spi", "is_on_ground")
    val floatCols = Set("lat", "lon", "vertical_rate")
    val dateCols  = Set("generated_date", "logged_date")
    name match {
      case n if intCols(n) =>
        // the rlike gate rejects what PG integer rejects ('288.6'); the
        // try_cast additionally nulls out-of-range values (PG would error)
        val v = when(c.rlike(pgIntRe), c.try_cast("int"))
        (v.as(n), c.isNull || v.isNotNull)
      case n if floatCols(n) =>
        val v = c.try_cast("float")
        (v.as(n), c.isNull || v.isNotNull)
      case n if dateCols(n) =>
        val v = try_to_date(c, "yyyy/MM/dd")
        (v.as(n), c.isNull || v.isNotNull)
      case n => (c.as(n), lit(true))
    }
  }

  /** Batch re-ingest of archived SBS-1 logs: line files (plain or
    * compressed — Spark's text source decodes .gz etc. transparently)
    * through the exact same parse projection as the live stream. A
    * directory of daily archives becomes the fact table in one call;
    * at scale, point this at the partitioned log store and write the
    * result with `partitionBy(ingest_date)` like the streaming sink.
    */
  def readArchive(spark: org.apache.spark.sql.SparkSession, path: String,
                  parsedTime: Column = current_timestamp()): DataFrame =
    parse(spark.read.text(path), parsedTime = parsedTime)

  /** Parse a DataFrame of raw SBS-1 lines (`rawCol`: StringType) into the
    * canonical 23-column ADS-B frame, dropping invalid records exactly as
    * the reference does.
    *
    * @param parsedTime processing-time stamp; defaults to
    *                   `current_timestamp()` (per-micro-batch semantics,
    *                   matching the reference's per-recv-batch stamp).
    */
  def parse(raw: DataFrame, rawCol: String = "value",
            parsedTime: Column = current_timestamp()): DataFrame = {
    // split with limit -1 keeps trailing empty fields (MSG,1 ends in ",,,")
    val parts = split(regexp_replace(col(rawCol), "\r$", ""), ",", -1)
    // input columns ride along so `parsedTime` may reference one (e.g. a
    // per-record event time in tests/streams); the final projection
    // drops them
    val withParts = raw.select(col("*"), parts.as("p"))

    // functions.get (not apply) — null on out-of-bounds instead of the
    // ANSI-mode INVALID_ARRAY_INDEX error for short (non-22-field) records
    val fields = AdsbSchema.sbs1Fields.zipWithIndex.map { case (n, i) =>
      typed(n, emptyToNull(get(col("p"), lit(i))))
    }
    val cols   = fields.map(_._1)
    val casts  = fields.map(_._2)

    val arityOk = size(col("p")) === lit(22)
    val notNullOk = Seq("transmission_type", "hex_ident", "generated_date",
                        "generated_time")
      .map(n => emptyToNull(get(col("p"),
        lit(AdsbSchema.sbs1Fields.indexOf(n)))).isNotNull)
      .reduce(_ && _)
    val valid = casts.foldLeft(arityOk && notNullOk)(_ && _)

    withParts
      .select((cols :+ parsedTime.as("parsed_time")) :+ valid.as("__valid"): _*)
      .filter(col("__valid"))
      .drop("__valid")
  }
}
