package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's query id from
  * SURVEY.md §2; `oracleSql` carries the DuckDB-equivalent SQL for each.
  * Column names are aliased identically on both sides (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the full `flights` pipeline (scan -> project -> filter ->
    * cast -> group/min-max -> interval band join -> distinct) — the
    * reference's entire relational surface in one plan (SURVEY.md §7.5).
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    AdsbQueries.qFlights(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (ADS-B surface)
    * and §2.10 (training-data pipeline extensions).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AdsbQueries.queries ++ TextQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      RelationalQueries.queries ++ SketchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    AdsbQueries.oracles ++ TextQueries.oracles ++
      SimilarityQueries.oracles ++ MultimodalQueries.oracles ++
      RelationalQueries.oracles ++ SketchQueries.oracles
}
