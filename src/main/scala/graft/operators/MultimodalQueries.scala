package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources.Tables

/** Driver-contract queries + oracles for [[MultimodalOps]].
  *
  * `q_media_meta` / `q_media_frames` are fully oracle-checked (payload
  * bytes are the UTF-8 text, so DuckDB can mirror every byte-level value
  * through string functions). `q_media_features` intentionally ships
  * WITHOUT an oracle: its body is the imperative `mapPartitions` decode
  * path that SQL cannot express — the driver records the weaker
  * rows-only check, which is exactly the documented contract for
  * non-SQL-expressible operators.
  */
object MultimodalQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  def qMediaMeta(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.mediaMeta(docs(spark, dir)).orderBy("doc_id")

  def qMediaFrames(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.mediaFrames(docs(spark, dir))
      .orderBy("doc_id", "frame_idx")

  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.mediaFeatures(docs(spark, dir)).orderBy("doc_id")

  def qMediaDedup(spark: SparkSession, dir: String): DataFrame =
    MultimodalOps.mediaDedupCensus(docs(spark, dir)).orderBy("format")

  private val fmtCase =
    """CASE source WHEN 'src0' THEN 'png' WHEN 'src1' THEN 'jpeg'
      |            WHEN 'src2' THEN 'wav' WHEN 'src3' THEN 'mp4'
      |            ELSE 'bin' END""".stripMargin

  // byte_len / frame counts are BYTE math on both sides:
  // octet_length(encode(text)) is the UTF-8 byte count, mirroring the
  // engine's length(payload). The frame-slice oracle below still slices
  // characters (this DuckDB build cannot substring BLOBs), which equals
  // byte slicing only for ASCII — a limitation of the TEST ORACLE, not
  // of the engine; the test corpus is ASCII-only by construction.
  private val byteLenSql = "octet_length(encode(text))"

  private val nFramesSql =
    s"CASE WHEN $byteLenSql >= 16 THEN ($byteLenSql - 16) // 32 + 1 ELSE 0 END"

  private val mediaMetaOracle =
    s"""SELECT doc_id,
       |  $fmtCase AS format,
       |  CAST(16 + (doc_id & 63) * 4 AS BIGINT) AS width,
       |  CAST(16 + ((doc_id >> 3) & 63) * 4 AS BIGINT) AS height,
       |  CAST(greatest(1, (16 + (doc_id & 63) * 4) >> 1) AS BIGINT)
       |    AS resized_width,
       |  CAST(greatest(1, (16 + ((doc_id >> 3) & 63) * 4) >> 1) AS BIGINT)
       |    AS resized_height,
       |  CAST($byteLenSql AS BIGINT) AS byte_len,
       |  sha256(text) AS sha,
       |  CAST($nFramesSql AS BIGINT) AS n_frames
       |FROM documents ORDER BY doc_id""".stripMargin

  private val mediaFramesOracle =
    s"""SELECT doc_id, CAST(g.i AS BIGINT) AS frame_idx,
       |  sha256(substr(text, CAST(g.i * 32 + 1 AS BIGINT), 16)) AS frame_sha
       |FROM documents, unnest(range(0, $nFramesSql)) AS g(i)
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** M4: blob-level CTE (count + len per (format, sha)), then the
    * per-format census UNION the ALL row, which re-groups by sha so a
    * cross-format duplicate counts once distinct.
    */
  private val mediaDedupOracle =
    s"""WITH blobs AS (
       |  SELECT $fmtCase AS format, sha256(text) AS sha,
       |    count(*) AS c, max(CAST($byteLenSql AS BIGINT)) AS len
       |  FROM documents GROUP BY 1, 2
       |),
       |fmt AS (
       |  SELECT format, CAST(sum(c) AS BIGINT) AS n_blobs,
       |    count(*) AS n_distinct_blobs,
       |    CAST(sum(c) - count(*) AS BIGINT) AS dup_blobs,
       |    CAST(sum(c * len) AS BIGINT) AS total_bytes,
       |    CAST(sum((c - 1) * len) AS BIGINT) AS reclaim_bytes
       |  FROM blobs GROUP BY 1
       |),
       |g AS (
       |  SELECT sha, CAST(sum(c) AS BIGINT) AS c, max(len) AS len
       |  FROM blobs GROUP BY 1
       |),
       |allrow AS (
       |  SELECT 'ALL' AS format, CAST(sum(c) AS BIGINT) AS n_blobs,
       |    count(*) AS n_distinct_blobs,
       |    CAST(sum(c) - count(*) AS BIGINT) AS dup_blobs,
       |    CAST(sum(c * len) AS BIGINT) AS total_bytes,
       |    CAST(sum((c - 1) * len) AS BIGINT) AS reclaim_bytes
       |  FROM g
       |)
       |SELECT * FROM fmt UNION ALL SELECT * FROM allrow
       |ORDER BY format""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta"     -> (qMediaMeta _),
    "q_media_frames"   -> (qMediaFrames _),
    "q_media_features" -> (qMediaFeatures _),
    "q_media_dedup"    -> (qMediaDedup _))

  val oracles: Map[String, String] = Map(
    "q_media_meta"   -> mediaMetaOracle,
    "q_media_frames" -> mediaFramesOracle,
    "q_media_dedup"  -> mediaDedupOracle)
}
