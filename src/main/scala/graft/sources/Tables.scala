package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, TimestampType}

/** Central loader for the driver's parquet tables.
  *
  * Two timestamp normalizations keep Spark bit-identical to the DuckDB
  * oracle (which evaluates naive TIMESTAMP at microsecond precision):
  *
  *  1. `events.ts` is physically INT64 TIMESTAMP(NANOS) — Spark 4 refuses
  *     the type outright, so it is read through
  *     `spark.sql.legacy.parquet.nanosAsLong` and floor-divided to micros
  *     (exactly DuckDB's `CAST(ts AS TIMESTAMP)` truncation).
  *  2. All TimestampType (LTZ) columns are cast to TIMESTAMP_NTZ under the
  *     UTC session, so written parquet carries isAdjustedToUTC=false like
  *     DuckDB's output and no tz-aware/naive skew can enter the compare.
  */
object Tables {

  /** Names of ns-precision epoch columns per table (post-nanosAsLong they
    * surface as LongType).
    */
  private val nanosCols = Map("events" -> Set("ts"))

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val ns = nanosCols.getOrElse(name, Set.empty)
    df.schema.fields.foldLeft(df) {
      case (d, StructField(c, LongType, _, _)) if ns(c) =>
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000"))
          .cast("timestamp_ntz"))
      case (d, StructField(c, TimestampType, _, _)) =>
        d.withColumn(c, col(c).cast("timestamp_ntz"))
      case (d, _) => d
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
}
