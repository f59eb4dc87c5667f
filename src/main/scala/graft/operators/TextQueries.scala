package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.sources.Tables

/** Driver-contract queries + DuckDB oracle SQL for the text-analysis and
  * deduplication operators ([[TextOps]]).
  *
  * Every oracle mirrors the Spark expression tree term-for-term (same
  * association order, same integer/double promotion points), so floating
  * point results are bit-identical and all scores travel as integer
  * micro-units. The MinHash/SimHash oracle SQL is *generated* from the
  * same seed constants the Spark side uses ([[Hashing.MinhashSeeds]]).
  */
object TextQueries {

  val ShingleN = 5
  val MaxShingleDf = 1000L
  val NgramJacMin = 800000L   // Jaccard >= 0.8
  val MinhashJacMin = 700000L // verified Jaccard >= 0.7
  val SimhashMaxHamming = 3
  val ContMicroMin = 900000L  // containment >= 0.9

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select("doc_id", "text")

  // ------------------------------------------------------------- queries

  def qTokenStats(spark: SparkSession, dir: String): DataFrame =
    TextOps.tokenStats(docs(spark, dir)).orderBy("doc_id")

  def qLangId(spark: SparkSession, dir: String): DataFrame =
    TextOps.langId(docs(spark, dir)).orderBy("doc_id")

  def qLangConfusion(spark: SparkSession, dir: String): DataFrame =
    TextOps.langConfusion(Tables.documents(spark, dir))
      .orderBy("lang", "lang_pred")

  def qLangMix(spark: SparkSession, dir: String): DataFrame =
    TextOps.langMixCensus(Tables.documents(spark, dir))

  def qTokLen(spark: SparkSession, dir: String): DataFrame =
    TextOps.tokenLenCensus(Tables.documents(spark, dir))

  def qSimhashHist(spark: SparkSession, dir: String): DataFrame =
    TextOps.simhashHammingHist(docs(spark, dir), SimhashMaxHamming)

  def qDedupYield(spark: SparkSession, dir: String): DataFrame =
    TextOps.dedupYield(Tables.documents(spark, dir), ShingleN,
      MinhashJacMin, SimhashMaxHamming, TextOps.PrefixDupTokens)

  /** D34 oracle: the minhash chain verbatim, the simhash chain
    * s_-prefixed (the D29 renaming precedent), group legs inline.
    */
  private lazy val dedupYieldOracle: String = {
    val bitSums = (0 until Hashing.SimhashBits).map(b =>
      s"CAST(sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END)" +
        s" AS BIGINT) AS s$b")
      .mkString(",\n    ")
    val simExpr = (0 until Hashing.SimhashBits).map(b =>
      s"(CASE WHEN s$b >= 0 THEN 1 ELSE 0 END) * ${1L << b}")
      .mkString(" + ")
    val pk = Hashing.md5LongSql(
      "list_aggregate(string_split(text, ' ')[1:8], 'string_agg', ' ')")
    s"""$minhashScoredCtes,
       |s_tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |  FROM documents
       |),
       |s_th AS (SELECT doc_id,
       |         ${h60("t")} % ${Hashing.SimhashMod} AS h FROM s_tok),
       |s_bs AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM s_th GROUP BY doc_id
       |),
       |s_sim AS (SELECT doc_id, CAST($simExpr AS BIGINT) AS simhash
       |          FROM s_bs),
       |s_bands AS (
       |  SELECT doc_id, simhash, k.k,
       |    (simhash >> (8 * k.k)) & 255 AS band
       |  FROM s_sim, (VALUES (0), (1), (2), (3)) k(k)
       |),
       |s_pr AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |         a.simhash AS sh1, b.simhash AS sh2
       |  FROM s_bands a JOIN s_bands b
       |    ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id
       |),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
       |        FROM documents),
       |ex AS (
       |  SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_flagged
       |  FROM (SELECT count(*) AS n FROM documents
       |        GROUP BY sha256(text))
       |  WHERE n >= 2
       |),
       |op AS (
       |  SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_flagged
       |  FROM (SELECT count(*) AS n
       |        FROM (SELECT $pk AS pk FROM documents) GROUP BY pk)
       |  WHERE n >= 2
       |),
       |mhd AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_flagged FROM (
       |    SELECT DISTINCT doc FROM (
       |      SELECT d1 AS doc FROM scored
       |      WHERE jac_micro >= $MinhashJacMin
       |      UNION ALL
       |      SELECT d2 AS doc FROM scored
       |      WHERE jac_micro >= $MinhashJacMin
       |    )
       |  )
       |),
       |shd AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_flagged FROM (
       |    SELECT DISTINCT doc FROM (
       |      SELECT d1 AS doc FROM s_pr
       |      WHERE bit_count(xor(sh1, sh2)) <= $SimhashMaxHamming
       |      UNION ALL
       |      SELECT d2 AS doc FROM s_pr
       |      WHERE bit_count(xor(sh1, sh2)) <= $SimhashMaxHamming
       |    )
       |  )
       |),
       |u AS (
       |  SELECT 'exact' AS detector, n_flagged FROM ex
       |  UNION ALL SELECT 'minhash', n_flagged FROM mhd
       |  UNION ALL SELECT 'opener', n_flagged FROM op
       |  UNION ALL SELECT 'simhash', n_flagged FROM shd
       |)
       |SELECT u.detector, u.n_flagged, t.n_docs,
       |  CAST((1000000 * u.n_flagged) // t.n_docs AS BIGINT)
       |    AS flagged_ppm
       |FROM u, tot t ORDER BY detector""".stripMargin
  }

  /** D33 oracle: the q_dedup_simhash chain through the candidate
    * relation, then the histogram census.
    */
  private val simhashHistOracle: String = {
    val bitSums = (0 until Hashing.SimhashBits).map(b =>
      s"CAST(sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END)" +
        s" AS BIGINT) AS s$b")
      .mkString(",\n    ")
    val simExpr = (0 until Hashing.SimhashBits).map(b =>
      s"(CASE WHEN s$b >= 0 THEN 1 ELSE 0 END) * ${1L << b}")
      .mkString(" + ")
    s"""WITH tok2 AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |  FROM documents
       |),
       |th AS (SELECT doc_id,
       |       ${h60("t")} % ${Hashing.SimhashMod} AS h FROM tok2),
       |bs AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM th GROUP BY doc_id
       |),
       |sim AS (SELECT doc_id, CAST($simExpr AS BIGINT) AS simhash
       |        FROM bs),
       |bands AS (
       |  SELECT doc_id, simhash, k.k,
       |    (simhash >> (8 * k.k)) & 255 AS band
       |  FROM sim, (VALUES (0), (1), (2), (3)) k(k)
       |),
       |pr AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |         a.simhash AS sh1, b.simhash AS sh2
       |  FROM bands a JOIN bands b
       |    ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id
       |),
       |g AS (
       |  SELECT CAST(bit_count(xor(sh1, sh2)) AS BIGINT) AS hamming
       |  FROM pr
       |),
       |c AS (
       |  SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM g GROUP BY 1
       |)
       |SELECT hamming, n_pairs,
       |  CAST(sum(n_pairs) OVER (ORDER BY hamming
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS cum_pairs,
       |  hamming <= $SimhashMaxHamming AS within_bar
       |FROM c ORDER BY hamming""".stripMargin
  }

  /** X75 oracle: the (source, len) census, rank-picked p95, integer
    * floor divisions.
    */
  private val tokLenOracle =
    s"""WITH tl AS (
       |  SELECT source, CAST(length(t) AS BIGINT) AS len
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t
       |        FROM documents)
       |),
       |cen AS (
       |  SELECT source, len, CAST(count(*) AS BIGINT) AS cnt
       |  FROM tl GROUP BY 1, 2
       |),
       |base AS (
       |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |    CAST(sum(cnt * len) AS BIGINT) AS sum_len,
       |    CAST(max(len) AS BIGINT) AS max_len,
       |    CAST(sum(CASE WHEN len > ${TextOps.LongTokenLen}
       |             THEN cnt ELSE 0 END) AS BIGINT) AS n_long
       |  FROM cen GROUP BY 1
       |),
       |rk AS (
       |  SELECT source, len,
       |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY len
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum,
       |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM cen
       |),
       |p95 AS (
       |  SELECT source, CAST(min(len) AS BIGINT) AS p95_len FROM rk
       |  WHERE cum >= ((n - 1) * 19) // 20 + 1 GROUP BY 1
       |)
       |SELECT b.source, b.n_tokens,
       |  CAST((b.sum_len * 1000000) // b.n_tokens AS BIGINT)
       |    AS mean_len_micro,
       |  p.p95_len, b.max_len,
       |  CAST((1000000 * b.n_long) // b.n_tokens AS BIGINT)
       |    AS long_ppm
       |FROM base b JOIN p95 p USING (source)
       |ORDER BY source""".stripMargin

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    TextOps.fingerprints(docs(spark, dir), ShingleN).orderBy("doc_id")

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    TextOps.dedupExact(docs(spark, dir)).orderBy("keeper")

  /** The shared verified pair relation — q_dedup_ngram, q_curate, and
    * q_dedup_clusters all consume it; [[PairRelations]] computes it
    * once per session.
    */
  private def ngramPairs(spark: SparkSession, dir: String): DataFrame =
    PairRelations.ngramPairs(spark, dir, docs(spark, dir), ShingleN,
      MaxShingleDf, NgramJacMin)

  def qDedupNgram(spark: SparkSession, dir: String): DataFrame =
    ngramPairs(spark, dir).orderBy("d1", "d2")

  def qDedupWeights(spark: SparkSession, dir: String): DataFrame =
    TextOps.dedupWeights(Tables.documents(spark, dir),
      ngramPairs(spark, dir)).orderBy("source")

  def qDedupSources(spark: SparkSession, dir: String): DataFrame =
    TextOps.dedupProvenance(Tables.documents(spark, dir),
      ngramPairs(spark, dir)).orderBy("component")

  def qHeaps(spark: SparkSession, dir: String): DataFrame =
    TextOps.heapsCurve(docs(spark, dir)).orderBy("fraction_eighths")

  def qPrefixDup(spark: SparkSession, dir: String): DataFrame =
    TextOps.prefixDupCensus(Tables.documents(spark, dir),
      TextOps.PrefixDupTokens)

  def qShingleDf(spark: SparkSession, dir: String): DataFrame =
    TextOps.shingleDfCensus(docs(spark, dir), ShingleN, MaxShingleDf)

  /** D30 oracle: same md5 prefix key over the first 8 tokens. */
  private val prefixDupOracle = {
    val pk = Hashing.md5LongSql(
      "list_aggregate(string_split(text, ' ')[1:8], 'string_agg', ' ')")
    s"""WITH k AS (
       |  SELECT doc_id, source, $pk AS pk FROM documents
       |),
       |g AS (
       |  SELECT pk, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |    CAST(min(doc_id) AS BIGINT) AS exemplar
       |  FROM k GROUP BY 1
       |)
       |SELECT pk, n_docs, n_sources, exemplar FROM g
       |WHERE n_docs >= 2 ORDER BY n_docs DESC, pk""".stripMargin
  }

  /** D31 oracle: binary-string-length buckets (exact floor(log₂)+1,
    * no floating log), even-product halving, census-window cumulative.
    * Lazy: tokCte/shCte are declared further down the object body.
    */
  private lazy val shingleDfOracle =
    s"""$tokCte $shCte,
       |dfs AS (
       |  SELECT sh, CAST(count(*) AS BIGINT) AS df FROM shs GROUP BY 1
       |),
       |b AS (
       |  SELECT df, CAST(length(printf('%b', df)) AS BIGINT) AS bucket
       |  FROM dfs
       |),
       |g AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(sum(df) AS BIGINT) AS occ_mass,
       |    CAST(sum((df * (df - 1)) // 2) AS BIGINT) AS pair_mass,
       |    CAST(sum(CASE WHEN df <= $MaxShingleDf THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_under_cap
       |  FROM b GROUP BY 1
       |)
       |SELECT bucket, CAST(power(2, bucket - 1) AS BIGINT) AS lo,
       |  CAST(power(2, bucket) AS BIGINT) - 1 AS hi,
       |  n_grams, occ_mass, pair_mass, n_under_cap,
       |  CAST(sum(pair_mass) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS cum_pair_mass
       |FROM g ORDER BY bucket""".stripMargin

  /** G1: PageRank iterations over the verified dup-pair graph. A
    * constant — the oracle unrolls exactly this many CTE rounds, so
    * the count is part of the cross-engine contract (the
    * [[SimilarityOps.KmRounds]] discipline).
    */
  val PrIters = 5

  def qPagerank(spark: SparkSession, dir: String): DataFrame =
    TextOps.dupPageRank(ngramPairs(spark, dir), PrIters)
      .orderBy("doc_id")

  def qTriangles(spark: SparkSession, dir: String): DataFrame =
    TextOps.dupTriangles(ngramPairs(spark, dir)).orderBy("doc_id")

  /** Below the corpus's distinct-term count so the count-desc/term-asc
    * boundary tie-break is exercised; C(V,2) bounds the census size.
    */
  val CoocTopV = 24

  def qCooc(spark: SparkSession, dir: String): DataFrame =
    TextOps.coocLift(docs(spark, dir), CoocTopV).orderBy("t1", "t2")

  def qKsDrift(spark: SparkSession, dir: String): DataFrame =
    TextOps.ksDrift(Tables.documents(spark, dir))
      .orderBy("source_a", "source_b")

  def qBurstiness(spark: SparkSession, dir: String): DataFrame =
    TextOps.burstinessCensus(docs(spark, dir), CoocTopV).orderBy("t")

  def qPsi(spark: SparkSession, dir: String): DataFrame =
    TextOps.psiDrift(Tables.documents(spark, dir)).orderBy("source")

  def qJsd(spark: SparkSession, dir: String): DataFrame =
    TextOps.jsdDrift(Tables.documents(spark, dir), CoocTopV)
      .orderBy("source_a", "source_b")

  def qMad(spark: SparkSession, dir: String): DataFrame =
    TextOps.madOutliers(Tables.documents(spark, dir)).orderBy("source")

  def qMsttr(spark: SparkSession, dir: String): DataFrame =
    TextOps.msttr(Tables.documents(spark, dir)).orderBy("source")

  def qEntropy(spark: SparkSession, dir: String): DataFrame =
    TextOps.entropyRate(Tables.documents(spark, dir)).orderBy("source")

  def qReadability(spark: SparkSession, dir: String): DataFrame =
    TextOps.readability(Tables.documents(spark, dir)).orderBy("source")

  def qCharclass(spark: SparkSession, dir: String): DataFrame =
    TextOps.charClasses(Tables.documents(spark, dir)).orderBy("source")

  def qSkipgram(spark: SparkSession, dir: String): DataFrame =
    TextOps.skipgramPmi(docs(spark, dir)).orderBy("x", "y")

  def qGini(spark: SparkSession, dir: String): DataFrame =
    TextOps.gini(Tables.documents(spark, dir)).orderBy("source")

  def qCoverage(spark: SparkSession, dir: String): DataFrame =
    TextOps.coverageCurve(Tables.documents(spark, dir))
      .orderBy("source", "k")

  /** Sample size for the X57 weighted draw — deep enough that both
    * heavy and light documents appear at sf0.001.
    */
  val WSampleN = 20

  def qWeightedSample(spark: SparkSession, dir: String): DataFrame =
    TextOps.weightedSample(Tables.documents(spark, dir), WSampleN)
      .orderBy("rank")

  def qWinsor(spark: SparkSession, dir: String): DataFrame =
    TextOps.winsorStats(Tables.documents(spark, dir)).orderBy("source")

  def qConcentration(spark: SparkSession, dir: String): DataFrame =
    TextOps.concentrationCensus(Tables.documents(spark, dir))
      .orderBy("basis")

  def qCorr(spark: SparkSession, dir: String): DataFrame =
    TextOps.corrCensus(Tables.documents(spark, dir)).orderBy("source")

  /** Small enough that the deterministic top-k query stays a real
    * multi-term query; large enough to mix positive and the classic
    * negative-idf common terms.
    */
  val Bm25QK = 5

  def qBm25(spark: SparkSession, dir: String): DataFrame =
    TextOps.bm25(docs(spark, dir), Bm25QK).orderBy("doc_id")

  def qNovelty(spark: SparkSession, dir: String): DataFrame =
    TextOps.noveltyScores(docs(spark, dir), ShingleN).orderBy("doc_id")

  def qZipf(spark: SparkSession, dir: String): DataFrame =
    TextOps.zipfCensus(docs(spark, dir)).orderBy("freq")

  def qGoodTuring(spark: SparkSession, dir: String): DataFrame =
    TextOps.goodTuringCensus(docs(spark, dir)).orderBy("r")

  def qRichness(spark: SparkSession, dir: String): DataFrame =
    TextOps.richnessCensus(docs(spark, dir))

  def qYuleK(spark: SparkSession, dir: String): DataFrame =
    TextOps.yuleK(Tables.documents(spark, dir)).orderBy("source")

  def qSplice(spark: SparkSession, dir: String): DataFrame =
    TextOps.spliceCoherence(Tables.documents(spark, dir))
      .orderBy("source")

  def qJacHist(spark: SparkSession, dir: String): DataFrame =
    TextOps.jaccardHistogram(docs(spark, dir), ShingleN, MaxShingleDf)
      .orderBy("bucket_lo_micro")

  def qMinhashCalib(spark: SparkSession, dir: String): DataFrame =
    TextOps.minhashCalibration(docs(spark, dir), ShingleN)
      .orderBy("n_match")

  def qDedupContain(spark: SparkSession, dir: String): DataFrame =
    TextOps.ngramContainmentPairs(docs(spark, dir), ShingleN,
      MaxShingleDf, ContMicroMin, NgramJacMin).orderBy("d1", "d2")

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    TextOps.minhashLshPairs(docs(spark, dir), ShingleN, MinhashJacMin)
      .orderBy("d1", "d2")

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    TextOps.simhashPairs(docs(spark, dir), SimhashMaxHamming)
      .orderBy("d1", "d2")

  /** D25 dials: verify on the first 256 chars (the O(cap²) cost cap),
    * keep pairs within 60 % relative edit distance.
    */
  val EditCapChars = 256
  val EditRelMax = 600000L

  def qDetectorDiff(spark: SparkSession, dir: String): DataFrame =
    TextOps.detectorDisagreement(docs(spark, dir), ShingleN,
      MinhashJacMin, SimhashMaxHamming).orderBy("verdict")

  def qEditDedup(spark: SparkSession, dir: String): DataFrame =
    TextOps.editDistancePairs(docs(spark, dir), ShingleN, EditCapChars,
      EditRelMax).orderBy("d1", "d2")

  def qLshRecall(spark: SparkSession, dir: String): DataFrame =
    TextOps.lshRecallAudit(docs(spark, dir), ShingleN, MaxShingleDf,
      MinhashJacMin)

  val RankDriftTopV = 20

  def qRankDrift(spark: SparkSession, dir: String): DataFrame =
    TextOps.rankDriftCensus(docs(spark, dir), RankDriftTopV)
      .orderBy("r0")

  val TfIdfK = 3
  val ChunkLen = 200
  val ChunkStride = 150

  def qTfIdf(spark: SparkSession, dir: String): DataFrame =
    TextOps.tfIdfTopTerms(docs(spark, dir), TfIdfK).orderBy("doc_id", "rn")

  def qChunks(spark: SparkSession, dir: String): DataFrame =
    TextOps.chunkDocs(docs(spark, dir), ChunkLen, ChunkStride)
      .orderBy("doc_id", "chunk_idx")

  val CurateQualityMin = 400000L // quality >= 0.4

  /** Chunk-level exact dedup — where exact dedup actually fires on this
    * corpus: near-duplicate documents share their unedited chunks, so
    * grouping chunk hashes finds real cross-document duplicate spans
    * (the fine-grained dedup granularity LLM pipelines use alongside
    * doc-level near-dup).
    */
  def qChunkDedup(spark: SparkSession, dir: String): DataFrame =
    TextOps.chunkDocs(docs(spark, dir), ChunkLen, ChunkStride)
      .groupBy("chunk_sha")
      .agg(count(lit(1)).as("n_copies"),
        min("doc_id").as("keeper"))
      .filter(col("n_copies") > 1)
      .orderBy("chunk_sha")

  def qBpeTrain(spark: SparkSession, dir: String): DataFrame =
    TextOps.bpeTrain(docs(spark, dir), TextOps.BpeMerges)

  def qBpeEncode(spark: SparkSession, dir: String): DataFrame =
    TextOps.bpeEncode(docs(spark, dir), TextOps.BpeMerges)

  def qFertility(spark: SparkSession, dir: String): DataFrame =
    TextOps.tokenizerFertility(
      Tables.documents(spark, dir).select("doc_id", "text", "lang"),
      TextOps.BpeMerges).orderBy("lang")

  def qCurate(spark: SparkSession, dir: String): DataFrame =
    TextOps.curate(docs(spark, dir), ShingleN, MaxShingleDf, NgramJacMin,
      CurateQualityMin, pairs = Some(ngramPairs(spark, dir)))
      .orderBy("lang_pred")

  /** X80: per-source curation waterfall (raw → quality → dedup). */
  def qCurationWaterfall(spark: SparkSession, dir: String): DataFrame =
    TextOps.curationWaterfall(
      Tables.documents(spark, dir).select("doc_id", "source", "text"),
      ShingleN, MaxShingleDf, NgramJacMin, CurateQualityMin,
      pairs = Some(ngramPairs(spark, dir)))

  // ------------------------------------------------------------- oracles

  /** Shared CTEs: tokenization + distinct 5-gram shingle sets. DuckDB
    * list slicing is inclusive (`toks[i:i+4]` = 5 elements); `range` is
    * end-exclusive, and the `greatest` guard empties it below 5 tokens
    * exactly like the Spark-side `when(size >= n)` guard.
    */
  private val tokCte =
    """WITH tok AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
      |)""".stripMargin

  private val shCte =
    """, shs AS (
      |  SELECT DISTINCT doc_id,
      |         list_aggregate(toks[i:i+4], 'string_agg', ' ') AS sh
      |  FROM tok, unnest(range(1, greatest(len(toks) - 3, 1))) AS g(i)
      |)""".stripMargin

  private def h60(e: String): String = Hashing.md5LongSql(e)

  private val stopFilter = "len(list_filter(toks, t -> t = 'the' OR t = 'a'))"

  private val qualityExpr =
    "0.5 * least(1.0, len(toks) / 200.0)" +
      " + 0.3 * (len(list_distinct(toks)) / len(toks))" +
      s" + 0.2 * (1.0 - ($stopFilter / len(toks)))"

  private val tokenStatsOracle =
    s"""$tokCte
       |SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |  ${Hashing.microSql("length(replace(text, ' ', '')) / len(toks)")}
       |    AS avg_token_len_micro,
       |  ${Hashing.microSql(s"$stopFilter / len(toks)")} AS stopword_micro,
       |  ${Hashing.microSql("len(list_distinct(toks)) / len(toks)")}
       |    AS distinct_micro,
       |  ${Hashing.microSql(qualityExpr)} AS quality_micro
       |FROM tok ORDER BY doc_id""".stripMargin

  // lang-ID SQL fragments, shared by q_lang_id and the curation oracle
  private def langCnt(sub: String): String = {
    val esc = sub.replace("'", "''")
    s"CAST((length(text) - length(replace(text, '$esc', ''))) / ${sub.length} AS BIGINT)"
  }
  private val langScoreDefs = TextOps.LangProfiles.map { case (l, evid) =>
    val e = evid.map { case (w, s) => s"$w * ${langCnt(s)}" }.mkString(" + ")
    s"($e) AS score_$l"
  }.mkString(",\n    ")
  private val langNames = TextOps.LangProfiles.map { case (l, _) => s"score_$l" }
  private val langBest = s"greatest(${langNames.mkString(", ")})"
  private val langTotal = langNames.mkString(" + ") + " + 1"
  private val langPred = TextOps.LangProfiles.map { case (l, _) =>
    s"WHEN score_$l >= $langBest THEN '$l'"
  }.mkString("CASE ", " ", " ELSE 'und' END")

  private val langIdOracle: String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    $langScoreDefs
       |  FROM documents
       |)
       |SELECT doc_id, $langPred AS lang_pred,
       |  ${Hashing.microSql(s"$langBest / ($langTotal)")} AS conf_micro
       |FROM s ORDER BY doc_id""".stripMargin

  /** X56 oracle: the same score/argmax fragments as q_lang_id, then
    * the (declared, predicted) census with a row-normalized fraction.
    */
  private val langConfusionOracle: String =
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    $langScoreDefs
       |  FROM documents
       |),
       |p AS (SELECT doc_id, lang, $langPred AS lang_pred FROM s),
       |c AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
       |      FROM p GROUP BY 1, 2),
       |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
       |      FROM c GROUP BY 1)
       |SELECT c.lang, c.lang_pred, c.n, t.n_lang,
       |  ${Hashing.microSql("c.n / t.n_lang")} AS frac_micro
       |FROM c JOIN t USING (lang)
       |ORDER BY lang, lang_pred""".stripMargin

  /** X74 oracle helpers: the q_lang_id replace-trick score fragments
    * parameterized by column, one set per half.
    */
  private def langCntOf(c: String, sub: String): String = {
    val esc = sub.replace("'", "''")
    s"CAST((length($c) - length(replace($c, '$esc', ''))) / " +
      s"${sub.length} AS BIGINT)"
  }
  private def langScoreDefsOf(c: String, sfx: String): String =
    TextOps.LangProfiles.map { case (l, evid) =>
      val e = evid.map { case (w, s) => s"$w * ${langCntOf(c, s)}" }
        .mkString(" + ")
      s"($e) AS score_${l}_$sfx"
    }.mkString(",\n    ")
  private def langPredOf(sfx: String): String = {
    val names = TextOps.LangProfiles.map { case (l, _) =>
      s"score_${l}_$sfx"
    }
    val best = s"greatest(${names.mkString(", ")})"
    TextOps.LangProfiles.map { case (l, _) =>
      s"WHEN score_${l}_$sfx >= $best THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
  }

  private val langMixOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS toks
       |  FROM documents
       |),
       |h AS (
       |  SELECT doc_id, source,
       |    coalesce(list_aggregate(toks[1:len(toks) // 2],
       |      'string_agg', ' '), '') AS ha,
       |    coalesce(list_aggregate(toks[len(toks) // 2 + 1:len(toks)],
       |      'string_agg', ' '), '') AS hb
       |  FROM tok
       |),
       |s AS (
       |  SELECT doc_id, source,
       |    ${langScoreDefsOf("ha", "a")},
       |    ${langScoreDefsOf("hb", "b")}
       |  FROM h
       |),
       |p AS (
       |  SELECT source, ${langPredOf("a")} AS lang_a,
       |    ${langPredOf("b")} AS lang_b
       |  FROM s
       |),
       |c AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN lang_a <> lang_b THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_mixed
       |  FROM p GROUP BY 1
       |)
       |SELECT source, n_docs, n_mixed,
       |  CAST((1000000 * n_mixed) // n_docs AS BIGINT) AS mixed_ppm
       |FROM c ORDER BY source""".stripMargin

  private val fingerprintOracle =
    s"""$tokCte $shCte,
       |m AS (
       |  SELECT doc_id, min(${h60("sh")}) AS min_shingle_hash
       |  FROM shs GROUP BY doc_id
       |)
       |SELECT d.doc_id, sha256(d.text) AS sha,
       |       COALESCE(m.min_shingle_hash, -1) AS min_shingle_hash
       |FROM documents d LEFT JOIN m USING (doc_id) ORDER BY doc_id""".stripMargin

  private val dedupExactOracle =
    """SELECT sha256(text) AS fingerprint,
      |       CAST(min(doc_id) AS BIGINT) AS keeper, count(*) AS n_docs
      |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin

  /** Shared n-gram inverted-index CTEs (also reused by the curation
    * pipeline oracle).
    */
  private val ngramCtes =
    s"""hs AS (SELECT doc_id, ${h60("sh")} AS h FROM shs),
       |keep AS (SELECT h FROM hs GROUP BY h HAVING count(*) <= $MaxShingleDf),
       |shf AS (SELECT s.doc_id, s.h FROM hs s JOIN keep USING (h)),
       |sz AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY 1),
       |it AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM shf a JOIN shf b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)""".stripMargin

  private val dedupNgramOracle =
    s"""$tokCte $shCte,
       |$ngramCtes
       |SELECT * FROM (
       |  SELECT d1, d2, inter, s1.n AS n1, s2.n AS n2,
       |    ${Hashing.microSql("inter / (s1.n + s2.n - inter)")} AS jac_micro
       |  FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |          JOIN sz s2 ON it.d2 = s2.doc_id
       |) WHERE jac_micro >= $NgramJacMin ORDER BY d1, d2""".stripMargin

  /** X40: cross-source duplication census over the same machinery and
    * bar as q_dedup_ngram.
    */
  def qSourceOverlap(spark: SparkSession, dir: String): DataFrame =
    TextOps.sourceOverlap(
      Tables.documents(spark, dir).select("doc_id", "text", "source"),
      ShingleN, MaxShingleDf, NgramJacMin)
      .orderBy("source_a", "source_b")

  private val sourceOverlapOracle =
    s"""$tokCte $shCte,
       |$ngramCtes,
       |jp AS (
       |  SELECT d1, d2 FROM (
       |    SELECT d1, d2,
       |      ${Hashing.microSql("inter / (s1.n + s2.n - inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |sdoc AS (SELECT doc_id, source FROM documents)
       |SELECT source_a, source_b, count(*) AS n_pairs,
       |  CAST(CASE WHEN source_a = source_b THEN 1 ELSE 0 END AS BIGINT)
       |    AS intra
       |FROM (
       |  SELECT least(a.source, b.source) AS source_a,
       |         greatest(a.source, b.source) AS source_b
       |  FROM jp JOIN sdoc a ON jp.d1 = a.doc_id
       |          JOIN sdoc b ON jp.d2 = b.doc_id
       |)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** G1 oracle: the verified pair graph (the q_dedup_ngram prefix),
    * then exactly [[PrIters]] unrolled rank rounds — every floor is a
    * single IEEE division of exact integers, so the trajectory is
    * bit-identical to the Spark loop.
    */
  private val pagerankOracle = {
    val rounds = (1 to PrIters).map { t =>
      s"""c$t AS (
         |  SELECT e.t AS node,
         |         sum(CAST(floor(r.r / e.deg) AS BIGINT)) AS c
         |  FROM edges e JOIN r${t - 1} r ON e.s = r.node GROUP BY 1
         |),
         |r$t AS (
         |  SELECT node,
         |    CAST(150000 + floor(850000 * c / 1000000.0) AS BIGINT) AS r
         |  FROM c$t
         |)""".stripMargin
    }.mkString(",\n")
    s"""$tokCte $shCte,
       |$ngramCtes,
       |jp AS (
       |  SELECT d1, d2 FROM (
       |    SELECT d1, d2,
       |      ${Hashing.microSql("inter / (s1.n + s2.n - inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |ed0 AS (SELECT d1 AS s, d2 AS t FROM jp
       |        UNION ALL SELECT d2, d1 FROM jp),
       |dg AS (SELECT s, count(*) AS deg FROM ed0 GROUP BY 1),
       |edges AS (SELECT e.s, e.t, d.deg FROM ed0 e JOIN dg d ON e.s = d.s),
       |r0 AS (SELECT s AS node, CAST(1000000 AS BIGINT) AS r FROM dg),
       |$rounds
       |SELECT r.node AS doc_id, CAST(d.deg AS BIGINT) AS deg,
       |       r.r AS rank_micro
       |FROM r$PrIters r JOIN dg d ON r.node = d.s
       |ORDER BY doc_id""".stripMargin
  }

  /** D20 oracle: the verified pair graph, wedges oriented by id
    * (x.d2 < y.d2 under a shared apex x.d1 = y.d1) closed by the
    * (b, c) edge — the same single-count discipline as the Spark
    * side; cc is one IEEE division of exact integers.
    */
  private val trianglesOracle =
    s"""$tokCte $shCte,
       |$ngramCtes,
       |jp AS (
       |  SELECT d1, d2 FROM (
       |    SELECT d1, d2,
       |      ${Hashing.microSql("inter / (s1.n + s2.n - inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |tri AS (
       |  SELECT x.d1 AS a, x.d2 AS b, y.d2 AS c
       |  FROM jp x JOIN jp y ON x.d1 = y.d1 AND x.d2 < y.d2
       |       JOIN jp e ON e.d1 = x.d2 AND e.d2 = y.d2
       |),
       |pn AS (
       |  SELECT doc_id, count(*) AS n_tri FROM (
       |    SELECT a AS doc_id FROM tri
       |    UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri)
       |  GROUP BY 1
       |),
       |dg AS (
       |  SELECT doc_id, count(*) AS deg FROM (
       |    SELECT d1 AS doc_id FROM jp UNION ALL SELECT d2 FROM jp)
       |  GROUP BY 1
       |)
       |SELECT doc_id, deg, n_tri,
       |  CASE WHEN deg >= 2
       |       THEN ${Hashing.microSql("2 * n_tri / (deg * (deg - 1))")}
       |       ELSE CAST(0 AS BIGINT) END AS cc_micro
       |FROM (
       |  SELECT dg.doc_id, dg.deg, COALESCE(pn.n_tri, 0) AS n_tri
       |  FROM dg LEFT JOIN pn USING (doc_id)
       |) ORDER BY doc_id""".stripMargin

  /** X43 oracle: same top-V cut (count desc, term asc), distinct
    * (doc, term) relation, id-ordered pair join; lift is one IEEE
    * division of exact integers.
    */
  private val coocOracle =
    s"""$tokCte,
       |occ AS (SELECT doc_id, unnest(toks) AS t FROM tok),
       |topv AS (
       |  SELECT t FROM (SELECT t, count(*) AS c FROM occ GROUP BY 1)
       |  ORDER BY c DESC, t LIMIT $CoocTopV
       |),
       |dt AS (SELECT DISTINCT o.doc_id, o.t FROM occ o JOIN topv USING (t)),
       |dfc AS (SELECT t, count(*) AS df FROM dt GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |pr AS (
       |  SELECT a.t AS t1, b.t AS t2, count(*) AS co
       |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.t < b.t
       |  GROUP BY 1, 2
       |)
       |SELECT t1, t2, co, d1.df AS df1, d2.df AS df2,
       |  ${Hashing.microSql("co * n_docs / (d1.df * d2.df)")}
       |    AS lift_micro
       |FROM pr JOIN dfc d1 ON pr.t1 = d1.t
       |        JOIN dfc d2 ON pr.t2 = d2.t, n
       |ORDER BY t1, t2""".stripMargin

  /** X45 oracle: idf micro-floored per term over an exact-integer
    * ratio (the lm_score ln discipline), per-(doc, term) contribution
    * floored, per-doc INTEGER sum; every fractional literal cast to
    * DOUBLE (bare literals are DECIMAL in DuckDB).
    */
  private val bm25Oracle = {
    val idfExpr = "ln((n_docs - df + CAST(0.5 AS DOUBLE)) / " +
      "(df + CAST(0.5 AS DOUBLE)))"
    s"""$tokCte,
       |occ AS (SELECT doc_id, unnest(toks) AS t FROM tok),
       |qt AS (
       |  SELECT t FROM (SELECT t, count(*) AS c FROM occ GROUP BY 1)
       |  ORDER BY c DESC, t LIMIT $Bm25QK
       |),
       |lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
       |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS tot,
       |               count(*) AS n_docs FROM lens),
       |tf AS (
       |  SELECT o.doc_id, o.t, count(*) AS tf
       |  FROM occ o JOIN qt USING (t) GROUP BY 1, 2
       |),
       |dfc AS (
       |  SELECT t, ${Hashing.microSql(idfExpr)} AS idf_micro
       |  FROM (SELECT t, count(*) AS df FROM tf GROUP BY 1), tot
       |),
       |avg AS (SELECT tot / n_docs AS avgdl FROM tot)
       |SELECT doc_id, count(*) AS n_terms,
       |  CAST(sum(w) AS BIGINT) AS score_micro
       |FROM (
       |  SELECT tf.doc_id,
       |    CAST(floor(d.idf_micro * (tf.tf * CAST(2.2 AS DOUBLE)) /
       |         (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) +
       |          CAST(0.75 AS DOUBLE) * (l.dl / a.avgdl))))
       |         AS BIGINT) AS w
       |  FROM tf JOIN dfc d USING (t)
       |       JOIN lens l ON tf.doc_id = l.doc_id, avg a
       |)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** X46 oracle: rank-picked integer bounds from the cumulative
    * census; winsorized sum over census rows; one division.
    */
  private val winsorOracle =
    s"""WITH vals AS (
       |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v
       |  FROM documents
       |),
       |cen AS (SELECT source, v, count(*) AS cnt FROM vals GROUP BY 1, 2),
       |cum AS (
       |  SELECT source, v, cnt,
       |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v)
       |         AS BIGINT) AS cum
       |  FROM cen
       |),
       |n AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n
       |      FROM cen GROUP BY 1),
       |tgt AS (
       |  SELECT source, n,
       |    CAST(floor((n - 1) * 50 / CAST(1000.0 AS DOUBLE))
       |         AS BIGINT) AS r_lo,
       |    CAST(floor((n - 1) * 950 / CAST(1000.0 AS DOUBLE))
       |         AS BIGINT) AS r_hi
       |  FROM n
       |),
       |lo AS (
       |  SELECT t.source, t.n, t.r_hi, c.v AS lo
       |  FROM tgt t JOIN cum c ON t.source = c.source
       |   AND t.r_lo >= c.cum - c.cnt AND t.r_lo < c.cum
       |),
       |bounds AS (
       |  SELECT l.source, l.n, l.lo, c.v AS hi
       |  FROM lo l JOIN cum c ON l.source = c.source
       |   AND l.r_hi >= c.cum - c.cnt AND l.r_hi < c.cum
       |)
       |SELECT cen.source, max(b.n) AS n, max(b.lo) AS lo,
       |  max(b.hi) AS hi,
       |  CAST(sum(CASE WHEN cen.v < b.lo THEN cen.cnt ELSE 0 END)
       |       AS BIGINT) AS n_clip_lo,
       |  CAST(sum(CASE WHEN cen.v > b.hi THEN cen.cnt ELSE 0 END)
       |       AS BIGINT) AS n_clip_hi,
       |  CAST(sum(cen.cnt * greatest(least(cen.v, b.hi), b.lo))
       |       AS BIGINT) AS wsum,
       |  ${Hashing.microSql(
            "sum(cen.cnt * greatest(least(cen.v, b.hi), b.lo))" +
            " / max(b.n)")} AS wmean_micro
       |FROM cen JOIN bounds b USING (source)
       |GROUP BY 1 ORDER BY source""".stripMargin

  /** X47 oracle: integer numerators; one division per statistic. */
  private val concentrationOracle = {
    def basis(c: String, label: String) =
      s"""SELECT '$label' AS basis, n_sources, total,
         |  ${Hashing.microSql("sq / (total * total)")} AS hhi_micro,
         |  ${Hashing.microSql("top / total")} AS top_share_micro
         |FROM (
         |  SELECT count(*) AS n_sources, CAST(sum($c) AS BIGINT) AS total,
         |    CAST(sum($c * $c) AS BIGINT) AS sq,
         |    CAST(max($c) AS BIGINT) AS top
         |  FROM per
         |)""".stripMargin
    s"""WITH per AS (
       |  SELECT source, count(*) AS docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
       |  FROM documents GROUP BY 1
       |)
       |${basis("docs", "docs")}
       |UNION ALL
       |${basis("toks", "tokens")}
       |ORDER BY basis""".stripMargin
  }

  /** X48 oracle: five exact integer power sums, two sqrts, one
    * division in fixed association.
    */
  private val corrOracle =
    s"""WITH xy AS (
       |  SELECT source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
       |      AS y
       |  FROM documents
       |),
       |s AS (
       |  SELECT source, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM xy GROUP BY 1
       |),
       |f AS (
       |  SELECT source, n,
       |    CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       |    CAST(n * sxx - sx * sx AS BIGINT) AS var_x,
       |    CAST(n * syy - sy * sy AS BIGINT) AS var_y
       |  FROM s
       |)
       |SELECT source, n, cov_num, var_x, var_y,
       |  CASE WHEN var_x > 0 AND var_y > 0
       |       THEN ${Hashing.microSql(
                "cov_num / (sqrt(var_x) * sqrt(var_y))")}
       |       ELSE CAST(0 AS BIGINT) END AS r_micro
       |FROM f ORDER BY source""".stripMargin

  /** X51 oracle: same rank-picked decile edges, bucket sums, Laplace
    * smoothing, and the fixed (p − q)·ln(p/q) tree micro-floored per
    * bucket with an integer per-source sum.
    */
  private val psiOracle =
    s"""WITH vals AS (
       |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v
       |  FROM documents
       |),
       |scen AS (SELECT source, v, count(*) AS cnt FROM vals GROUP BY 1, 2),
       |cen AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt
       |        FROM scen GROUP BY 1),
       |cum AS (SELECT v, cnt,
       |        CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
       |        FROM cen),
       |na AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM cen),
       |ed AS (
       |  SELECT t.i,
       |    CAST(floor((n_all - 1) * t.i / CAST(10.0 AS DOUBLE))
       |         AS BIGINT) AS r
       |  FROM na, unnest(range(1, 10)) AS t(i)
       |),
       |edges AS (
       |  SELECT e.i, c.v AS edge FROM ed e
       |  JOIN cum c ON e.r >= c.cum - c.cnt AND e.r < c.cum
       |),
       |bk AS (
       |  SELECT s.source, s.v, max(s.cnt) AS cnt,
       |    CAST(sum(CASE WHEN s.v > e2.edge THEN 1 ELSE 0 END)
       |         AS BIGINT) AS bucket
       |  FROM scen s CROSS JOIN edges e2 GROUP BY 1, 2
       |),
       |psb AS (SELECT source, bucket, CAST(sum(cnt) AS BIGINT) AS n_b
       |        FROM bk GROUP BY 1, 2),
       |st AS (SELECT source, CAST(sum(n_b) AS BIGINT) AS n_s
       |       FROM psb GROUP BY 1),
       |rb AS (SELECT bucket, CAST(sum(n_b) AS BIGINT) AS m_b
       |       FROM psb GROUP BY 1),
       |grid AS (
       |  SELECT st.source, st.n_s, gb.b AS bucket
       |  FROM st, unnest(range(0, 10)) AS gb(b)
       |),
       |terms AS (
       |  SELECT g.source, g.n_s,
       |    COALESCE(p.n_b, 0) + 1 AS sn, g.n_s + 10 AS sd,
       |    COALESCE(r.m_b, 0) + 1 AS rn, na.n_all + 10 AS rd
       |  FROM grid g
       |  LEFT JOIN psb p ON g.source = p.source AND g.bucket = p.bucket
       |  LEFT JOIN rb r ON g.bucket = r.bucket, na
       |),
       |tm AS (
       |  SELECT source, n_s,
       |    ${Hashing.microSql(
            "(sn / sd - rn / rd) * ln((sn / sd) / (rn / rd))")} AS term
       |  FROM terms
       |)
       |SELECT source, max(n_s) AS n_docs,
       |  CAST(sum(term) AS BIGINT) AS psi_micro
       |FROM tm GROUP BY 1 ORDER BY source""".stripMargin

  /** X53 oracle: both medians rank-picked off per-source cumulative
    * censuses (lower median, no interpolation), deviation census
    * re-aggregated, integer outlier compare; one division at the end.
    */
  private val madOracle =
    s"""WITH vals AS (
       |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v
       |  FROM documents
       |),
       |cen AS (SELECT source, v, CAST(count(*) AS BIGINT) AS cnt
       |        FROM vals GROUP BY 1, 2),
       |n AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n
       |      FROM cen GROUP BY 1),
       |cum AS (SELECT source, v, cnt,
       |        CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v)
       |             AS BIGINT) AS cum
       |        FROM cen),
       |med AS (
       |  SELECT c.source, c.v AS med
       |  FROM cum c JOIN n USING (source)
       |  WHERE CAST(floor((n.n - 1) / 2.0) AS BIGINT) >= c.cum - c.cnt
       |    AND CAST(floor((n.n - 1) / 2.0) AS BIGINT) < c.cum
       |),
       |dev AS (
       |  SELECT c.source, abs(c.v - m.med) AS v,
       |    CAST(sum(c.cnt) AS BIGINT) AS cnt
       |  FROM cen c JOIN med m USING (source) GROUP BY 1, 2
       |),
       |dcum AS (SELECT source, v, cnt,
       |         CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v)
       |              AS BIGINT) AS cum
       |         FROM dev),
       |mad AS (
       |  SELECT d.source, d.v AS mad
       |  FROM dcum d JOIN n USING (source)
       |  WHERE CAST(floor((n.n - 1) / 2.0) AS BIGINT) >= d.cum - d.cnt
       |    AND CAST(floor((n.n - 1) / 2.0) AS BIGINT) < d.cum
       |),
       |g AS (
       |  SELECT c.source, max(n.n) AS n, max(m.med) AS med,
       |    max(a.mad) AS mad,
       |    CAST(sum(CASE WHEN abs(c.v - m.med) > 3 * a.mad
       |                  THEN c.cnt ELSE 0 END) AS BIGINT) AS n_out
       |  FROM cen c JOIN med m USING (source) JOIN mad a USING (source)
       |       JOIN n USING (source)
       |  GROUP BY 1
       |)
       |SELECT source, n, med, mad, n_out,
       |  ${Hashing.microSql("n_out / n")} AS out_rate_micro
       |FROM g ORDER BY source""".stripMargin

  /** X54 oracle: segment identity from the token ordinal, exact
    * per-segment distinct counts, complete segments only; one
    * division Σtypes / (16 · n_segs).
    */
  private val msttrOracle =
    s"""WITH tok AS (
       |  SELECT source, doc_id, string_split(text, ' ') AS toks
       |  FROM documents
       |),
       |occ AS (
       |  SELECT source, doc_id,
       |    CAST(floor((g.i - 1) / 16.0) AS BIGINT) AS seg, toks[i] AS t
       |  FROM tok, unnest(range(1, len(toks) + 1)) AS g(i)
       |),
       |per AS (
       |  SELECT source, doc_id, seg, count(*) AS n_tok,
       |    CAST(count(DISTINCT t) AS BIGINT) AS types
       |  FROM occ GROUP BY 1, 2, 3
       |),
       |f AS (SELECT * FROM per WHERE n_tok = 16)
       |SELECT source, count(*) AS n_segs,
       |  CAST(sum(types) AS BIGINT) AS sum_types,
       |  ${Hashing.microSql("sum(types) / (16.0 * count(*))")}
       |    AS msttr_micro
       |FROM f GROUP BY 1 ORDER BY source""".stripMargin

  /** X57 oracle: the same salted-md5 uniform, the same log-domain
    * A-ES key ln(u)/w (one ln, one division — no pow), the same
    * (key DESC, doc_id) top-N.
    */
  private val weightedSampleOracle =
    s"""WITH k AS (
       |  SELECT doc_id, source,
       |    greatest(CAST(len(string_split(text, ' ')) AS BIGINT), 1)
       |      AS toks,
       |    greatest(${Hashing.md5LongSql(
            "'aes:' || CAST(doc_id AS VARCHAR)")}, 1) AS h
       |  FROM documents
       |),
       |keyed AS (
       |  SELECT doc_id, source, toks,
       |    ${Hashing.microSql(
            "ln(h / 1152921504606846976.0) / toks")} AS key_micro
       |  FROM k
       |)
       |SELECT * FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY key_micro DESC, doc_id)
       |              AS BIGINT) AS rank,
       |    doc_id, source, toks, key_micro
       |  FROM keyed
       |) WHERE rank <= $WSampleN ORDER BY rank""".stripMargin

  /** X55 oracle: same per-doc bigram windows, census-derived
    * conditional totals, the fixed (c_xy/T)·ln(c_x/c_xy) tree
    * micro-floored per bigram, integer per-source sum.
    */
  private val entropyOracle =
    s"""WITH bi AS (
       |  SELECT source, substr(text, g.i, 2) AS b
       |  FROM documents, unnest(range(1, len(text))) AS g(i)
       |),
       |cen AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c_xy
       |        FROM bi GROUP BY 1, 2),
       |cond AS (
       |  SELECT source, substr(b, 1, 1) AS x,
       |    CAST(sum(c_xy) AS BIGINT) AS c_x
       |  FROM cen GROUP BY 1, 2
       |),
       |tot AS (
       |  SELECT source, CAST(sum(c_xy) AS BIGINT) AS t_bigrams,
       |    CAST(count(*) AS BIGINT) AS n_distinct
       |  FROM cen GROUP BY 1
       |),
       |tm AS (
       |  SELECT c.source, t.t_bigrams, t.n_distinct,
       |    ${Hashing.microSql(
            "(c.c_xy / t.t_bigrams) * ln(d.c_x / c.c_xy)")} AS term
       |  FROM cen c
       |  JOIN cond d ON c.source = d.source AND substr(c.b, 1, 1) = d.x
       |  JOIN tot t ON c.source = t.source
       |)
       |SELECT source, max(t_bigrams) AS t_bigrams,
       |  max(n_distinct) AS n_distinct,
       |  CAST(sum(term) AS BIGINT) AS h_micro
       |FROM tm GROUP BY 1 ORDER BY source""".stripMargin

  /** X58 oracle: identical regex classes (ERE-safe in both engines),
    * per-doc sentence clamp, integer source totals, the same fixed
    * double tree micro-floored once.
    */
  private val readabilityOracle =
    s"""WITH d AS (
       |  SELECT source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
       |    greatest(CAST(1 AS BIGINT),
       |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
       |      AS s,
       |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
       |         AS BIGINT) AS sy
       |  FROM documents
       |),
       |g AS (
       |  SELECT source, CAST(sum(w) AS BIGINT) AS n_words,
       |    CAST(sum(s) AS BIGINT) AS n_sents,
       |    CAST(sum(sy) AS BIGINT) AS n_syll
       |  FROM d GROUP BY 1
       |)
       |SELECT source, n_words, n_sents, n_syll,
       |  ${Hashing.microSql(
          "206.835 - 1.015 * (n_words / n_sents)" +
            " - 84.6 * (n_syll / n_words)")} AS flesch_micro
       |FROM g ORDER BY source""".stripMargin

  /** X61 oracle: same regex classes, the symbol complement, four
    * source-total integer counts, three micro divisions.
    */
  private val charclassOracle =
    s"""WITH d AS (
       |  SELECT source, CAST(len(text) AS BIGINT) AS chars,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT)
       |      AS alpha,
       |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
       |      AS digit,
       |    CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS space
       |  FROM documents
       |),
       |g AS (
       |  SELECT source, CAST(sum(chars) AS BIGINT) AS n_chars,
       |    CAST(sum(alpha) AS BIGINT) AS alpha,
       |    CAST(sum(digit) AS BIGINT) AS digit,
       |    CAST(sum(space) AS BIGINT) AS space
       |  FROM d GROUP BY 1
       |)
       |SELECT source, n_chars, alpha, digit, space,
       |  n_chars - alpha - digit - space AS symbol,
       |  ${Hashing.microSql("alpha / n_chars")} AS alpha_micro,
       |  ${Hashing.microSql("digit / n_chars")} AS digit_micro,
       |  ${Hashing.microSql(
          "(n_chars - alpha - digit - space) / n_chars")} AS symbol_micro
       |FROM g ORDER BY source""".stripMargin

  /** X62 oracle: same top-V filter, position band self-join, pair-
    * relation marginals, and micro-floored ln tree.
    */
  private val skipgramOracle =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |),
       |occ AS (
       |  SELECT doc_id, CAST(g.i AS BIGINT) AS p, toks[i] AS t
       |  FROM tok, unnest(range(1, len(toks) + 1)) AS g(i)
       |),
       |top AS (
       |  SELECT t FROM (SELECT t, count(*) AS c FROM occ GROUP BY 1)
       |  ORDER BY c DESC, t LIMIT 50
       |),
       |ot AS (SELECT o.doc_id, o.p, o.t FROM occ o JOIN top USING (t)),
       |cen AS (
       |  SELECT a.t AS x, b.t AS y, CAST(count(*) AS BIGINT) AS c_xy
       |  FROM ot a JOIN ot b
       |    ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 2
       |  GROUP BY 1, 2
       |),
       |mx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x
       |       FROM cen GROUP BY 1),
       |my AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y
       |       FROM cen GROUP BY 1),
       |tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM cen)
       |SELECT c.x, c.y, c.c_xy, mx.c_x, my.c_y,
       |  ${Hashing.microSql(
          "ln((c.c_xy * tot.n) / (mx.c_x * my.c_y))")} AS pmi_micro
       |FROM cen c JOIN mx USING (x) JOIN my USING (y), tot
       |ORDER BY c.x, c.y""".stripMargin

  /** X59 oracle: same frequency-census closed form — tied counts
    * contribute c·m·(2a + m − n) where a = types with smaller counts;
    * one division num/(n·T) at the end.
    */
  private val giniOracle =
    s"""WITH occ AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS t
       |  FROM documents
       |),
       |cen AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
       |        FROM occ GROUP BY 1, 2),
       |fc AS (SELECT source, c, CAST(count(*) AS BIGINT) AS m
       |       FROM cen GROUP BY 1, 2),
       |cum AS (SELECT source, c, m,
       |        CAST(sum(m) OVER (PARTITION BY source ORDER BY c)
       |             AS BIGINT) AS cum
       |        FROM fc),
       |tot AS (SELECT source, CAST(sum(m) AS BIGINT) AS n,
       |          CAST(sum(c * m) AS BIGINT) AS t
       |        FROM fc GROUP BY 1),
       |ct AS (
       |  SELECT u.source, o.n, o.t,
       |    u.c * u.m * (2 * (u.cum - u.m) + u.m - o.n) AS contrib
       |  FROM cum u JOIN tot o USING (source)
       |)
       |SELECT source, max(n) AS n_types, max(t) AS n_tokens,
       |  ${Hashing.microSql("sum(contrib) / (max(n) * max(t))")}
       |    AS gini_micro
       |FROM ct GROUP BY 1 ORDER BY source""".stripMargin

  /** X60 oracle: same (count desc, type) rank cut at 1000, cumulative
    * over the cut prefix only, k clamped to the vocabulary.
    */
  private val coverageOracle =
    s"""WITH occ AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS t
       |  FROM documents
       |),
       |cen AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
       |        FROM occ GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
       |          CAST(sum(c) AS BIGINT) AS n_tokens
       |        FROM cen GROUP BY 1),
       |top AS (
       |  SELECT source, c, t,
       |    CAST(row_number() OVER
       |      (PARTITION BY source ORDER BY c DESC, t) AS BIGINT) AS rn
       |  FROM cen QUALIFY rn <= 1000
       |),
       |cc AS (
       |  SELECT source, rn,
       |    CAST(sum(c) OVER (PARTITION BY source ORDER BY c DESC, t)
       |         AS BIGINT) AS cum
       |  FROM top
       |),
       |ks AS (SELECT CAST(unnest([1, 10, 100, 1000]) AS BIGINT) AS k),
       |g AS (
       |  SELECT o.source, ks.k, least(ks.k, o.n_types) AS k_used,
       |    o.n_types, o.n_tokens
       |  FROM tot o, ks
       |)
       |SELECT g.source, g.k, g.k_used, g.n_types, g.n_tokens,
       |  ${Hashing.microSql("cc.cum / g.n_tokens")} AS cov_micro
       |FROM g JOIN cc ON g.source = cc.source AND g.k_used = cc.rn
       |ORDER BY g.source, g.k""".stripMargin

  /** X52 oracle: same top-V + residual-bucket support, Laplace +1
    * over V+1 buckets, the fixed ½·(p·ln(2p/(p+q)) + q·ln(2q/(p+q)))
    * tree micro-floored per bucket, integer per-pair sum.
    */
  private val jsdOracle = {
    val pa = "(sn_a / sd_a)"
    val pb = "(sn_b / sd_b)"
    s"""WITH occ AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS t
       |  FROM documents
       |),
       |scen AS (SELECT source, t, CAST(count(*) AS BIGINT) AS cnt
       |         FROM occ GROUP BY 1, 2),
       |topv AS (
       |  SELECT t FROM (
       |    SELECT t, CAST(sum(cnt) AS BIGINT) AS c FROM scen GROUP BY 1)
       |  ORDER BY c DESC, t LIMIT $CoocTopV
       |),
       |ns AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_s
       |       FROM scen GROUP BY 1),
       |intop AS (SELECT s.source, s.t, s.cnt
       |          FROM scen s JOIN topv USING (t)),
       |tm AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS top_mass
       |       FROM intop GROUP BY 1),
       |gridtop AS (
       |  SELECT n.source, n.n_s, tv.t, COALESCE(i.cnt, 0) AS cnt
       |  FROM ns n CROSS JOIN topv tv
       |  LEFT JOIN intop i ON n.source = i.source AND tv.t = i.t
       |),
       |rest AS (
       |  SELECT n.source, n.n_s, chr(1) || 'REST' AS t,
       |    n.n_s - COALESCE(tm.top_mass, 0) AS cnt
       |  FROM ns n LEFT JOIN tm USING (source)
       |),
       |buckets AS (
       |  SELECT * FROM gridtop UNION ALL SELECT * FROM rest),
       |pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    a.n_s AS n_a, b.n_s AS n_b,
       |    a.cnt + 1 AS sn_a, a.n_s + ${CoocTopV + 1} AS sd_a,
       |    b.cnt + 1 AS sn_b, b.n_s + ${CoocTopV + 1} AS sd_b
       |  FROM buckets a JOIN buckets b
       |    ON a.t = b.t AND a.source < b.source
       |),
       |tms AS (
       |  SELECT source_a, source_b, n_a, n_b,
       |    ${Hashing.microSql(
            s"0.5 * ($pa * ln(2.0 * $pa / ($pa + $pb)) + " +
            s"$pb * ln(2.0 * $pb / ($pa + $pb)))")} AS term
       |  FROM pairs
       |)
       |SELECT source_a, source_b, max(n_a) AS n_a, max(n_b) AS n_b,
       |  CAST(sum(term) AS BIGINT) AS jsd_micro
       |FROM tms GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin
  }

  /** X50 oracle: same top-V cut, (term, doc) partial counts, integer
    * numerators; one division per statistic.
    */
  private val burstinessOracle =
    s"""$tokCte,
       |occ AS (SELECT doc_id, unnest(toks) AS t FROM tok),
       |topv AS (
       |  SELECT t FROM (SELECT t, count(*) AS c FROM occ GROUP BY 1)
       |  ORDER BY c DESC, t LIMIT $CoocTopV
       |),
       |pd AS (
       |  SELECT o.t, o.doc_id, count(*) AS x
       |  FROM occ o JOIN topv USING (t) GROUP BY 1, 2
       |),
       |s AS (
       |  SELECT t, count(*) AS df, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM pd GROUP BY 1
       |),
       |n AS (SELECT count(*) AS n_docs FROM documents)
       |SELECT t, df, sx, n_docs,
       |  ${Hashing.microSql("sx / n_docs")} AS mean_micro,
       |  ${Hashing.microSql(
            "(n_docs * sxx - sx * sx) / (n_docs * sx)")} AS vmr_micro
       |FROM s, n ORDER BY t""".stripMargin

  /** X44 oracle: CDF differences carried as integer numerators over
    * the common denominator n₁·n₂; one IEEE division at the very end.
    */
  private val ksDriftOracle =
    s"""WITH vals AS (
       |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v
       |  FROM documents
       |),
       |cen AS (SELECT source, v, count(*) AS cnt FROM vals GROUP BY 1, 2),
       |grid AS (SELECT DISTINCT v FROM cen),
       |srcs AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n
       |         FROM cen GROUP BY 1),
       |filled AS (
       |  SELECT s.source, s.n, g.v, COALESCE(c.cnt, 0) AS cnt
       |  FROM grid g CROSS JOIN srcs s
       |  LEFT JOIN cen c ON c.source = s.source AND c.v = g.v
       |),
       |cum AS (
       |  SELECT source, n, v,
       |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v)
       |         AS BIGINT) AS cum
       |  FROM filled
       |),
       |pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    a.n AS n_a, b.n AS n_b,
       |    abs(a.cum * b.n - b.cum * a.n) AS num
       |  FROM cum a JOIN cum b ON a.v = b.v AND a.source < b.source
       |)
       |SELECT source_a, source_b, max(n_a) AS n_a, max(n_b) AS n_b,
       |  CAST(max(num) AS BIGINT) AS ks_num,
       |  ${Hashing.microSql("max(num) / (max(n_a) * max(n_b))")}
       |    AS ks_micro
       |FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** X42 oracle: gram → first doc_id, per-doc census; the division is
    * one IEEE op over exact integers on both engines.
    */
  private val noveltyOracle =
    s"""$tokCte $shCte,
       |hs AS (SELECT doc_id, ${h60("sh")} AS h FROM shs),
       |fi AS (SELECT h, min(doc_id) AS first_doc FROM hs GROUP BY 1)
       |SELECT doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN fi.first_doc = hs.doc_id THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_novel,
       |  ${Hashing.microSql(
             "sum(CASE WHEN fi.first_doc = hs.doc_id THEN 1 ELSE 0 END)" +
             " * 1.0 / count(*)")} AS novelty_micro
       |FROM hs JOIN fi USING (h)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** D15: asymmetric containment pairs over the same inverted index.
    * microSql divides by the true least() set size — the expression
    * tree mirrors the Spark side exactly (association order matters).
    */
  private val dedupContainOracle =
    s"""$tokCte $shCte,
       |$ngramCtes
       |SELECT *, jac_micro < $NgramJacMin AS jaccard_missed FROM (
       |  SELECT d1, d2, inter, s1.n AS n1, s2.n AS n2,
       |    ${Hashing.microSql("inter / least(s1.n, s2.n)")} AS cont_micro,
       |    ${Hashing.microSql("inter / (s1.n + s2.n - inter)")} AS jac_micro
       |  FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |          JOIN sz s2 ON it.d2 = s2.doc_id
       |) WHERE cont_micro >= $ContMicroMin ORDER BY d1, d2""".stripMargin

  /** X37: nested-fraction vocabulary growth — each word's minimum doc
    * bucket marks the first fraction it appears in; per-fraction
    * numbers are sums over the ≤ 8-row censuses (correlated scalar
    * subqueries here; the Spark side joins the same censuses).
    */
  private val heapsOracle = {
    val b = s"${Hashing.md5LongSql(
      "'heaps:' || CAST(doc_id AS VARCHAR)")} % 8"
    s"""$tokCte $shCte,
       |bk AS (
       |  SELECT doc_id, $b AS b, len(toks) AS n_tok FROM tok
       |),
       |wrd AS (
       |  SELECT bk.b, u.w FROM tok JOIN bk USING (doc_id),
       |    unnest(toks) AS u(w)
       |),
       |fi AS (SELECT w, min(b) AS mb FROM wrd GROUP BY 1),
       |fw AS (SELECT mb, count(*) AS new_words FROM fi GROUP BY 1),
       |shb AS (
       |  SELECT bk.b, s.sh FROM shs s JOIN bk USING (doc_id)
       |),
       |si AS (SELECT sh, min(b) AS mb FROM shb GROUP BY 1),
       |sw AS (SELECT mb, count(*) AS new_shingles FROM si GROUP BY 1),
       |pb AS (
       |  SELECT b, count(*) AS n_docs, sum(n_tok) AS n_tokens
       |  FROM bk GROUP BY 1
       |),
       |f(fraction_eighths) AS (VALUES (1), (2), (4), (8))
       |SELECT CAST(f.fraction_eighths AS BIGINT) AS fraction_eighths,
       |  CAST(COALESCE((SELECT sum(n_docs) FROM pb
       |    WHERE pb.b < f.fraction_eighths), 0) AS BIGINT) AS n_docs,
       |  CAST(COALESCE((SELECT sum(n_tokens) FROM pb
       |    WHERE pb.b < f.fraction_eighths), 0) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE((SELECT sum(new_words) FROM fw
       |    WHERE fw.mb < f.fraction_eighths), 0) AS BIGINT)
       |    AS n_distinct_words,
       |  CAST(COALESCE((SELECT sum(new_shingles) FROM sw
       |    WHERE sw.mb < f.fraction_eighths), 0) AS BIGINT)
       |    AS n_distinct_shingles
       |FROM f ORDER BY fraction_eighths""".stripMargin
  }

  /** X38: frequency-of-frequencies with top-down cumulative token
    * coverage; frequencies are distinct after grouping so DuckDB's
    * default RANGE frame equals the Spark ROWS frame.
    */
  private val zipfOracle =
    s"""$tokCte,
       |wc AS (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(toks) AS w FROM tok
       |  ) GROUP BY 1
       |),
       |census AS (
       |  SELECT freq, CAST(count(*) AS BIGINT) AS n_types,
       |         CAST(freq * count(*) AS BIGINT) AS n_tokens
       |  FROM wc GROUP BY 1
       |)
       |SELECT freq, n_types, n_tokens,
       |  CAST(sum(n_tokens) OVER (ORDER BY freq DESC) AS BIGINT)
       |    AS n_tokens_at_or_above
       |FROM census ORDER BY freq""".stripMargin

  /** X68: the N_c table turned into simple-GT estimators — r* and p₀
    * as positive integer floor-divisions, totals via CAST (DuckDB
    * sum(BIGINT) widens to HUGEINT; the q_heavy lesson).
    */
  private val goodTuringOracle =
    s"""$tokCte,
       |wc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS r FROM (
       |    SELECT unnest(toks) AS w FROM tok
       |  ) GROUP BY 1
       |),
       |ff AS (
       |  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM wc GROUP BY 1
       |),
       |tot AS (
       |  SELECT CAST(sum(r * n_r) AS BIGINT) AS t_tokens,
       |    CAST(sum(n_r) AS BIGINT) AS v_types,
       |    CAST(coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0)
       |      AS BIGINT) AS n1
       |  FROM ff)
       |SELECT f.r, f.n_r, COALESCE(x.n_next, 0) AS n_next,
       |  (1000000 * (f.r + 1) * COALESCE(x.n_next, 0)) // f.n_r
       |    AS r_star_micro,
       |  t.t_tokens, t.v_types,
       |  (1000000 * t.n1) // t.t_tokens AS p0_micro
       |FROM ff f
       |LEFT JOIN (SELECT r - 1 AS r, n_r AS n_next FROM ff) x
       |  USING (r), tot t
       |ORDER BY f.r""".stripMargin

  /** X69: Chao1 + ACE richness estimators off the N_c census — chao1
    * a positive integer floor-division, ACE one micro-floored double
    * tree mirrored verbatim (products promoted to double first).
    */
  private val richnessOracle = {
    val c = "(1 - n1 / n_rare)"
    val g2 = s"greatest(0.0, (CAST(v_rare AS DOUBLE) * sum_rr1) / " +
      s"(($c * n_rare) * (n_rare - 1)) - 1.0)"
    val ace = s"(v_types - v_rare) + v_rare / $c + (n1 / $c) * $g2"
    s"""$tokCte,
       |wc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS r FROM (
       |    SELECT unnest(toks) AS w FROM tok
       |  ) GROUP BY 1
       |),
       |ff AS (
       |  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM wc GROUP BY 1
       |),
       |a AS (
       |  SELECT CAST(sum(n_r) AS BIGINT) AS v_types,
       |    CAST(sum(r * n_r) AS BIGINT) AS t_tokens,
       |    CAST(coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0)
       |      AS BIGINT) AS n1,
       |    CAST(coalesce(sum(CASE WHEN r = 2 THEN n_r END), 0)
       |      AS BIGINT) AS n2,
       |    CAST(coalesce(sum(CASE WHEN r <= 10 THEN n_r END), 0)
       |      AS BIGINT) AS v_rare,
       |    CAST(coalesce(sum(CASE WHEN r <= 10 THEN r * n_r END), 0)
       |      AS BIGINT) AS n_rare,
       |    CAST(coalesce(sum(CASE WHEN r <= 10
       |      THEN r * (r - 1) * n_r END), 0) AS BIGINT) AS sum_rr1
       |  FROM ff)
       |SELECT v_types, t_tokens, n1, n2, v_rare,
       |  v_types - v_rare AS v_abund, n_rare,
       |  v_types + (n1 * (n1 - 1)) // (2 * (n2 + 1)) AS chao1_est,
       |  CASE WHEN n_rare >= 2 AND n1 < n_rare THEN ${Hashing.microSql(ace)}
       |       ELSE CAST(0 AS BIGINT) END AS ace_micro
       |FROM a""".stripMargin
  }

  /** X71: Yule's K + unbiased Simpson per source — both ratios one
    * micro-floored double tree with products promoted to double
    * before multiplying (the ADVICE-r11 rule), mirrored verbatim.
    */
  private val yuleKOracle = {
    val t = "CAST(t_tokens AS DOUBLE)"
    val k = s"10000.0 * (m2 - t_tokens) / ($t * t_tokens)"
    val s = s"CAST(m2 - t_tokens AS DOUBLE) / ($t * (t_tokens - 1))"
    s"""WITH wc AS (
       |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS w
       |    FROM documents
       |  ) GROUP BY 1, 2
       |),
       |a AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS v_types,
       |    CAST(sum(c) AS BIGINT) AS t_tokens,
       |    CAST(sum(c * c) AS BIGINT) AS m2
       |  FROM wc GROUP BY 1)
       |SELECT source, t_tokens, v_types, m2,
       |  CASE WHEN t_tokens > 0 THEN ${Hashing.microSql(k)}
       |       ELSE CAST(0 AS BIGINT) END AS yule_k_micro,
       |  CASE WHEN t_tokens > 1 THEN ${Hashing.microSql(s)}
       |       ELSE CAST(0 AS BIGINT) END AS simpson_micro
       |FROM a ORDER BY source""".stripMargin
  }

  /** X73: midpoint cut mirrored via the 1-based unnest index
    * (2·(i−1) < len ⟺ Spark's 2i < n on the 0-based posexplode);
    * coherence one micro-floored division; the mean a floor of the
    * integer sum over non-degenerate docs.
    */
  private val spliceOracle =
    s"""WITH tok AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS toks
       |  FROM documents
       |),
       |tk AS (
       |  SELECT doc_id, source,
       |    CASE WHEN 2 * (g.i - 1) < len(toks) THEN 0 ELSE 1 END AS half,
       |    toks[i] AS w
       |  FROM tok, unnest(range(1, len(toks) + 1)) AS g(i)
       |),
       |hd AS (SELECT DISTINCT doc_id, source, half, w FROM tk),
       |pd AS (
       |  SELECT doc_id, source,
       |    CAST(count(DISTINCT w) AS BIGINT) AS v_union,
       |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS v0,
       |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS v1
       |  FROM hd GROUP BY 1, 2
       |),
       |sc AS (
       |  SELECT source,
       |    CASE WHEN v0 > 0 AND v1 > 0
       |         THEN ${Hashing.microSql("(v0 + v1 - v_union) / v_union")}
       |         ELSE CAST(0 AS BIGINT) END AS coh,
       |    CASE WHEN v0 = 0 OR v1 = 0 THEN 1 ELSE 0 END AS degen
       |  FROM pd
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(degen) AS BIGINT) AS n_degenerate,
       |  CAST(coalesce(sum(CASE WHEN degen = 0
       |    AND coh < ${TextOps.SpliceBarMicro} THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS n_suspect,
       |  CAST(CASE WHEN count(*) - sum(degen) > 0
       |    THEN coalesce(sum(CASE WHEN degen = 0 THEN coh END), 0)
       |      // (count(*) - sum(degen))
       |    ELSE 0 END AS BIGINT) AS coh_mean_micro,
       |  CAST(coalesce(min(CASE WHEN degen = 0 THEN coh END), 0)
       |    AS BIGINT) AS coh_min_micro
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  /** D17: candidate pairs bucketed by exact Jaccard; the cumulative
    * column windows over the ≤ 21 census rows (unique bucket values,
    * so DuckDB's default RANGE frame equals the Spark ROWS frame).
    */
  private val jacHistOracle =
    s"""$tokCte $shCte,
       |$ngramCtes
       |SELECT bucket_lo_micro, count(*) AS n_pairs,
       |  CAST(sum(count(*)) OVER (ORDER BY bucket_lo_micro DESC)
       |    AS BIGINT) AS n_pairs_at_or_above
       |FROM (
       |  SELECT CAST(floor(${Hashing.microSql(
      "it.inter / (s1.n + s2.n - it.inter)")} / 50000) AS BIGINT)
       |    * 50000 AS bucket_lo_micro
       |  FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |          JOIN sz s2 ON it.d2 = s2.doc_id
       |) GROUP BY 1 ORDER BY bucket_lo_micro""".stripMargin

  /** Shared MinHash CTE chain ending in `scored` = the threshold-free
    * candidate stream with estimate + verified truth — the D3 dedup
    * oracle filters it, the D16 calibration oracle aggregates it.
    */
  private val minhashScoredCtes: String = {
    val p = Hashing.MinhashP
    val mins = Hashing.MinhashSeeds.zipWithIndex.map { case ((a, b), j) =>
      s"min(($a * h + $b) % $p) AS m$j"
    }.mkString(",\n    ")
    def bandExpr(b: Int): String = {
      val ms = (0 until 4).map(j => s"m${4 * b + j}")
      ms.reduceLeft((acc, m) => s"($acc * 31 + $m)")
    }
    val bandCase = (0 until 3).map(b =>
      s"WHEN $b THEN ${bandExpr(b)}").mkString("CASE b.band ",
      " ", s" ELSE ${bandExpr(3)} END")
    val nMatch = Hashing.MinhashSeeds.indices.map(j =>
      s"(CASE WHEN x.m$j = y.m$j THEN 1 ELSE 0 END)").mkString(" + ")
    s"""$tokCte $shCte,
       |hs0 AS (SELECT doc_id, ${h60("sh")} AS h0 FROM shs),
       |hs AS (SELECT doc_id, h0 % $p AS h FROM hs0),
       |mh AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM hs GROUP BY doc_id
       |),
       |bands AS (
       |  SELECT doc_id, b.band, $bandCase AS bh
       |  FROM mh, (VALUES (0), (1), (2), (3)) b(band)
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |),
       |est AS (
       |  SELECT c.d1, c.d2, CAST($nMatch AS BIGINT) AS n_match
       |  FROM cand c JOIN mh x ON c.d1 = x.doc_id
       |              JOIN mh y ON c.d2 = y.doc_id
       |),
       |it AS (
       |  SELECT c.d1, c.d2, count(*) AS inter
       |  FROM cand c JOIN hs0 a ON a.doc_id = c.d1
       |              JOIN hs0 b ON b.doc_id = c.d2 AND b.h0 = a.h0
       |  GROUP BY 1, 2
       |),
       |sz AS (SELECT doc_id, count(*) AS n FROM hs0 GROUP BY 1),
       |scored AS (
       |  SELECT e.d1, e.d2, e.n_match, COALESCE(it.inter, 0) AS inter,
       |    ${Hashing.microSql(
      "COALESCE(it.inter, 0) / (s1.n + s2.n - COALESCE(it.inter, 0))")}
       |      AS jac_micro
       |  FROM est e LEFT JOIN it ON e.d1 = it.d1 AND e.d2 = it.d2
       |  JOIN sz s1 ON e.d1 = s1.doc_id
       |  JOIN sz s2 ON e.d2 = s2.doc_id
       |)""".stripMargin
  }

  private val dedupMinhashOracle: String =
    s"""$minhashScoredCtes
       |SELECT * FROM scored
       |WHERE jac_micro >= $MinhashJacMin ORDER BY d1, d2""".stripMargin

  /** X67: top-V cut, per-half counts (absent = 0), tie-broken ranks,
    * integer footrule.
    */
  private val rankDriftOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id % 2 AS half,
       |    unnest(string_split(text, ' ')) AS token
       |  FROM documents
       |),
       |cen AS MATERIALIZED (
       |  SELECT token, half, CAST(count(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2
       |),
       |top AS MATERIALIZED (
       |  SELECT token FROM (
       |    SELECT token, sum(c) AS ct FROM cen GROUP BY 1
       |    ORDER BY ct DESC, token LIMIT $RankDriftTopV
       |  )
       |),
       |h0 AS (
       |  SELECT t.token, COALESCE(c.c, 0) AS c0,
       |    CAST(row_number() OVER (ORDER BY COALESCE(c.c, 0) DESC,
       |      t.token) AS BIGINT) AS r0
       |  FROM top t LEFT JOIN (SELECT token, c FROM cen WHERE half = 0)
       |    c USING (token)
       |),
       |h1 AS (
       |  SELECT t.token, COALESCE(c.c, 0) AS c1,
       |    CAST(row_number() OVER (ORDER BY COALESCE(c.c, 0) DESC,
       |      t.token) AS BIGINT) AS r1
       |  FROM top t LEFT JOIN (SELECT token, c FROM cen WHERE half = 1)
       |    c USING (token)
       |)
       |SELECT h0.token, h0.c0, h1.c1, h0.r0, h1.r1,
       |  abs(h0.r0 - h1.r1) AS dr,
       |  CAST(sum(abs(h0.r0 - h1.r1)) OVER () AS BIGINT) AS footrule
       |FROM h0 JOIN h1 USING (token)
       |ORDER BY h0.r0""".stripMargin

  /** D26: both blocking paths in one statement off the shared hs0
    * shingle-hash relation — the df-capped inverted-index truth
    * (t_-prefixed to avoid the minhash chain's hs/sz/it names) vs the
    * banded `scored` stream, verified at the same bar.
    */
  private val lshRecallOracle: String =
    s"""$minhashScoredCtes,
       |t_keep AS (SELECT h0 FROM hs0 GROUP BY h0
       |           HAVING count(*) <= $MaxShingleDf),
       |t_shf AS (SELECT s.doc_id, s.h0 FROM hs0 s
       |          JOIN t_keep USING (h0)),
       |t_sz AS (SELECT doc_id, count(*) AS n FROM hs0 GROUP BY 1),
       |t_it AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM t_shf a JOIN t_shf b
       |    ON a.h0 = b.h0 AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS MATERIALIZED (
       |  SELECT d1, d2 FROM (
       |    SELECT d1, d2,
       |      ${Hashing.microSql("inter / (s1.n + s2.n - inter)")} AS j
       |    FROM t_it JOIN t_sz s1 ON t_it.d1 = s1.doc_id
       |              JOIN t_sz s2 ON t_it.d2 = s2.doc_id
       |  ) WHERE j >= $MinhashJacMin),
       |lshp AS MATERIALIZED (
       |  SELECT d1, d2 FROM scored WHERE jac_micro >= $MinhashJacMin)
       |SELECT t.n_truth, l.n_lsh, h.n_hit,
       |  (1000000 * h.n_hit) // greatest(t.n_truth, 1) AS recall_ppm,
       |  (1000000 * (l.n_lsh - h.n_hit)) // greatest(l.n_lsh, 1)
       |    AS extra_ppm
       |FROM (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth) t,
       |     (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM lshp) l,
       |     (SELECT CAST(count(*) AS BIGINT) AS n_hit
       |      FROM truth JOIN lshp USING (d1, d2)) h""".stripMargin

  /** D25: the same `cand` blocking CTE (unreferenced CTEs downstream
    * of it cost nothing — plain CTEs only run when referenced), then
    * levenshtein verification over capped prefixes.
    */
  private val editDedupOracle: String =
    s"""$minhashScoredCtes,
       |pre AS (
       |  SELECT doc_id, substr(text, 1, $EditCapChars) AS p
       |  FROM documents),
       |v AS (
       |  SELECT c.d1, c.d2,
       |    CAST(length(a.p) AS BIGINT) AS len1,
       |    CAST(length(b.p) AS BIGINT) AS len2,
       |    CAST(levenshtein(a.p, b.p) AS BIGINT) AS edit_dist
       |  FROM cand c JOIN pre a ON c.d1 = a.doc_id
       |              JOIN pre b ON c.d2 = b.doc_id)
       |SELECT d1, d2, len1, len2, edit_dist,
       |  (1000000 * edit_dist) // greatest(len1, len2, 1) AS rel_micro
       |FROM v
       |WHERE (1000000 * edit_dist) // greatest(len1, len2, 1)
       |  <= $EditRelMax
       |ORDER BY d1, d2""".stripMargin

  /** D16: the estimator-calibration census over the same `scored`
    * stream — estimate is micro(n_match/seeds), means are
    * floor(sum/count), mirroring the Spark tree exactly.
    */
  private val minhashCalibOracle: String = {
    val nSeeds = Hashing.MinhashSeeds.length
    s"""$minhashScoredCtes
       |SELECT n_match, count(*) AS n_pairs,
       |  CAST(floor(sum(jac_micro) * 1.0 / count(*)) AS BIGINT)
       |    AS mean_jac_micro,
       |  CAST(floor(sum(abs(${Hashing.microSql(s"n_match / $nSeeds")}
       |    - jac_micro)) * 1.0 / count(*)) AS BIGINT)
       |    AS mean_abs_err_micro
       |FROM scored GROUP BY 1 ORDER BY n_match""".stripMargin
  }

  private val dedupSimhashOracle: String = {
    val bitSums = (0 until Hashing.SimhashBits).map(b =>
      s"CAST(sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$b")
      .mkString(",\n    ")
    val simExpr = (0 until Hashing.SimhashBits).map(b =>
      s"(CASE WHEN s$b >= 0 THEN 1 ELSE 0 END) * ${1L << b}")
      .mkString(" + ")
    s"""WITH tok2 AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
       |),
       |th AS (SELECT doc_id, ${h60("t")} % ${Hashing.SimhashMod} AS h FROM tok2),
       |bs AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM th GROUP BY doc_id
       |),
       |sim AS (SELECT doc_id, CAST($simExpr AS BIGINT) AS simhash FROM bs),
       |bands AS (
       |  SELECT doc_id, simhash, k.k, (simhash >> (8 * k.k)) & 255 AS band
       |  FROM sim, (VALUES (0), (1), (2), (3)) k(k)
       |),
       |pr AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |         a.simhash AS sh1, b.simhash AS sh2
       |  FROM bands a JOIN bands b
       |    ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id
       |)
       |SELECT d1, d2, sh1, sh2,
       |       CAST(bit_count(xor(sh1, sh2)) AS BIGINT) AS hamming
       |FROM pr WHERE bit_count(xor(sh1, sh2)) <= $SimhashMaxHamming
       |ORDER BY d1, d2""".stripMargin
  }

  /** D29: both detector chains in one statement — the minhash chain
    * verbatim plus the simhash chain s_-prefixed (the D26 renaming
    * precedent), the union pairs re-verified against the full hs0
    * shingle relation (empty-set pairs guarded to 0, mirrored), class
    * means as floors of integer sums (the D16 protocol).
    */
  private val detectorDiffOracle: String = {
    val bitSums = (0 until Hashing.SimhashBits).map(b =>
      s"CAST(sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END)" +
        s" AS BIGINT) AS s$b")
      .mkString(",\n    ")
    val simExpr = (0 until Hashing.SimhashBits).map(b =>
      s"(CASE WHEN s$b >= 0 THEN 1 ELSE 0 END) * ${1L << b}")
      .mkString(" + ")
    val jac = Hashing.microSql(
      "COALESCE(ui.inter, 0) / (COALESCE(s1.n, 0) + COALESCE(s2.n, 0)" +
        " - COALESCE(ui.inter, 0))")
    s"""$minhashScoredCtes,
       |s_tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |  FROM documents
       |),
       |s_th AS (SELECT doc_id, ${h60("t")} % ${Hashing.SimhashMod} AS h
       |         FROM s_tok),
       |s_bs AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM s_th GROUP BY doc_id
       |),
       |s_sim AS (SELECT doc_id, CAST($simExpr AS BIGINT) AS simhash
       |          FROM s_bs),
       |s_bands AS (
       |  SELECT doc_id, simhash, k.k, (simhash >> (8 * k.k)) & 255 AS band
       |  FROM s_sim, (VALUES (0), (1), (2), (3)) k(k)
       |),
       |shp AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM s_bands a JOIN s_bands b
       |    ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash))
       |    <= $SimhashMaxHamming
       |),
       |mhp AS MATERIALIZED (
       |  SELECT d1, d2 FROM scored WHERE jac_micro >= $MinhashJacMin
       |),
       |uni AS MATERIALIZED (
       |  SELECT d1, d2 FROM mhp UNION SELECT d1, d2 FROM shp
       |),
       |uit AS (
       |  SELECT u.d1, u.d2, count(*) AS inter
       |  FROM uni u JOIN hs0 a ON a.doc_id = u.d1
       |             JOIN hs0 b ON b.doc_id = u.d2 AND b.h0 = a.h0
       |  GROUP BY 1, 2
       |),
       |cls AS (
       |  SELECT
       |    CASE WHEN m.d1 IS NOT NULL AND s.d1 IS NOT NULL THEN 'both'
       |         WHEN m.d1 IS NOT NULL THEN 'minhash_only'
       |         ELSE 'simhash_only' END AS verdict,
       |    CASE WHEN COALESCE(s1.n, 0) + COALESCE(s2.n, 0)
       |           - COALESCE(ui.inter, 0) > 0
       |         THEN $jac ELSE CAST(0 AS BIGINT) END AS jac
       |  FROM uni u
       |  LEFT JOIN uit ui ON u.d1 = ui.d1 AND u.d2 = ui.d2
       |  LEFT JOIN sz s1 ON u.d1 = s1.doc_id
       |  LEFT JOIN sz s2 ON u.d2 = s2.doc_id
       |  LEFT JOIN mhp m ON u.d1 = m.d1 AND u.d2 = m.d2
       |  LEFT JOIN shp s ON u.d1 = s.d1 AND u.d2 = s.d2
       |)
       |SELECT verdict, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(floor(sum(jac) * 1.0 / count(*)) AS BIGINT)
       |    AS mean_jac_micro,
       |  CAST(min(jac) AS BIGINT) AS min_jac_micro,
       |  CAST(max(jac) AS BIGINT) AS max_jac_micro
       |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private val tfIdfOracle =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
       |),
       |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (
       |  SELECT t, count(*) AS df
       |  FROM (SELECT DISTINCT doc_id, t FROM toks) GROUP BY 1
       |),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.t, tf.tf, df.df,
       |    ${Hashing.microSql("tf.tf * ln(n.n_docs / df.df)")} AS tfidf_micro
       |  FROM tf JOIN df USING (t) CROSS JOIN n
       |)
       |SELECT doc_id, CAST(rn AS BIGINT) AS rn, t AS term, tf, df,
       |       tfidf_micro
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY tfidf_micro DESC, t) AS rn
       |  FROM scored
       |) WHERE rn <= $TfIdfK ORDER BY doc_id, rn""".stripMargin

  private val chunksOracle = {
    val c = s"substr(text, CAST(g.i * $ChunkStride + 1 AS BIGINT), $ChunkLen)"
    s"""SELECT doc_id, CAST(g.i AS BIGINT) AS chunk_idx,
       |  sha256($c) AS chunk_sha,
       |  CAST(length($c) AS BIGINT) AS chunk_chars,
       |  CAST(len(string_split($c, ' ')) AS BIGINT) AS chunk_tokens
       |FROM documents,
       |  unnest(range(0, (length(text) - 1) // $ChunkStride + 1)) AS g(i)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  private val curateOracle =
    s"""$tokCte $shCte,
       |$ngramCtes,
       |pairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT it.d1, it.d2,
       |      ${Hashing.microSql("it.inter / (s1.n + s2.n - it.inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |drops AS (SELECT DISTINCT d2 AS doc_id FROM pairs),
       |q AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    ${Hashing.microSql(qualityExpr)} AS quality_micro
       |  FROM tok
       |),
       |l AS (
       |  SELECT doc_id, $langPred AS lang_pred FROM (
       |    SELECT doc_id,
       |      $langScoreDefs
       |    FROM documents
       |  )
       |),
       |kept AS (
       |  SELECT q.doc_id, q.n_tokens, q.quality_micro, l.lang_pred
       |  FROM q JOIN l ON q.doc_id = l.doc_id
       |  WHERE q.quality_micro >= $CurateQualityMin
       |    AND NOT EXISTS (SELECT 1 FROM drops d WHERE d.doc_id = q.doc_id)
       |)
       |SELECT lang_pred, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(floor(sum(quality_micro) / count(*)) AS BIGINT)
       |    AS avg_quality_micro
       |FROM kept GROUP BY 1 ORDER BY lang_pred""".stripMargin

  /** X80 oracle: the shared shingle-pair + quality CTEs, per-doc
    * stage flags, one source rollup with sequential drop attribution.
    */
  private val curationWaterfallOracle =
    s"""$tokCte $shCte,
       |$ngramCtes,
       |pairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT it.d1, it.d2,
       |      ${Hashing.microSql("it.inter / (s1.n + s2.n - it.inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |drops AS (SELECT DISTINCT d2 AS doc_id FROM pairs),
       |q AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    ${Hashing.microSql(qualityExpr)} AS quality_micro
       |  FROM tok
       |),
       |f AS (
       |  SELECT d.source, q.n_tokens,
       |    CASE WHEN q.quality_micro >= $CurateQualityMin
       |         THEN 1 ELSE 0 END AS q_pass,
       |    CASE WHEN q.quality_micro >= $CurateQualityMin AND NOT
       |           EXISTS (SELECT 1 FROM drops x
       |                   WHERE x.doc_id = q.doc_id)
       |         THEN 1 ELSE 0 END AS f_pass
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |),
       |g AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_raw,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_raw,
       |    CAST(sum(q_pass) AS BIGINT) AS n_quality,
       |    CAST(sum(q_pass * n_tokens) AS BIGINT) AS tokens_quality,
       |    CAST(sum(f_pass) AS BIGINT) AS n_final,
       |    CAST(sum(f_pass * n_tokens) AS BIGINT) AS tokens_final
       |  FROM f GROUP BY 1
       |)
       |SELECT source, n_raw, tokens_raw, n_quality, tokens_quality,
       |  n_final, tokens_final,
       |  n_raw - n_quality AS drop_quality,
       |  n_quality - n_final AS drop_dedup,
       |  CAST((1000000 * n_final) // greatest(n_raw, 1) AS BIGINT)
       |    AS doc_retention_ppm,
       |  CAST((1000000 * tokens_final) // greatest(tokens_raw, 1)
       |       AS BIGINT) AS token_retention_ppm
       |FROM g ORDER BY source""".stripMargin

  private val chunkDedupOracle = {
    val c = s"substr(text, CAST(g.i * $ChunkStride + 1 AS BIGINT), $ChunkLen)"
    s"""WITH c AS (
       |  SELECT doc_id, sha256($c) AS chunk_sha
       |  FROM documents,
       |    unnest(range(0, (length(text) - 1) // $ChunkStride + 1)) AS g(i)
       |)
       |SELECT chunk_sha, count(*) AS n_copies,
       |       CAST(min(doc_id) AS BIGINT) AS keeper
       |FROM c GROUP BY 1 HAVING count(*) > 1 ORDER BY chunk_sha""".stripMargin
  }

  /** Duplicate clusters: connected components over the verified n-gram
    * near-dup pairs.
    */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    TextOps.connectedComponents(ngramPairs(spark, dir))
      .orderBy("doc_id")

  /** D27: star-form purity audit of the D7 clusters — the chaining
    * detector (how similar is the kept representative to each dropped
    * member; see [[TextOps.clusterPurity]]).
    */
  def qClusterPurity(spark: SparkSession, dir: String): DataFrame =
    TextOps.clusterPurity(docs(spark, dir), ngramPairs(spark, dir),
      ShingleN)

  /** D28: BFS eccentricity of each cluster representative over the
    * verified pair graph — the structural WHY behind D27's purity
    * read (see [[TextOps.clusterDepthCensus]]).
    */
  val ClusterMaxDepth = 8

  def qClusterDepth(spark: SparkSession, dir: String): DataFrame =
    TextOps.clusterDepthCensus(ngramPairs(spark, dir), ClusterMaxDepth)

  private val dedupClustersOracle =
    s"""${tokCte.replaceFirst("WITH ", "WITH RECURSIVE ")} $shCte,
       |$ngramCtes,
       |pairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT it.d1, it.d2,
       |      ${Hashing.microSql("it.inter / (s1.n + s2.n - it.inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |edges AS (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION SELECT d2, d1 FROM pairs
       |),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |)
       |SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS component
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** D27 oracle: the D7 recursive component chain (cc MATERIALIZED),
    * then the star audit — member-vs-representative exact Jaccard
    * over the UNFILTERED hash sets, cluster mean as an integer
    * division of the micro sum (sum CAST before `//` — the q_heavy
    * HUGEINT lesson).
    */
  private val clusterPurityOracle =
    s"""${tokCte.replaceFirst("WITH ", "WITH RECURSIVE ")} $shCte,
       |$ngramCtes,
       |pairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT it.d1, it.d2,
       |      ${Hashing.microSql("it.inter / (s1.n + s2.n - it.inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |edges AS (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION SELECT d2, d1 FROM pairs
       |),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |cc AS MATERIALIZED (
       |  SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS component
       |  FROM reach GROUP BY a
       |),
       |mem AS (SELECT doc_id, component FROM cc
       |        WHERE doc_id <> component),
       |msh AS (SELECT m.component, m.doc_id, h.h
       |        FROM mem m JOIN hs h USING (doc_id)),
       |rsh AS (SELECT c.component, h.h
       |        FROM (SELECT DISTINCT component FROM cc) c
       |        JOIN hs h ON h.doc_id = c.component),
       |it2 AS (
       |  SELECT m.component, m.doc_id, count(*) AS inter
       |  FROM msh m JOIN rsh r ON m.component = r.component
       |                       AND m.h = r.h
       |  GROUP BY 1, 2),
       |star AS (
       |  SELECT m.component,
       |    ${Hashing.microSql(
             "coalesce(it2.inter, 0) / " +
             "(s1.n + s2.n - coalesce(it2.inter, 0))")} AS jm
       |  FROM mem m
       |  LEFT JOIN it2 ON m.component = it2.component
       |              AND m.doc_id = it2.doc_id
       |  JOIN sz s1 ON m.doc_id = s1.doc_id
       |  JOIN sz s2 ON m.component = s2.doc_id)
       |SELECT component, CAST(count(*) + 1 AS BIGINT) AS n_docs,
       |  CAST(min(jm) AS BIGINT) AS min_star_micro,
       |  CAST(sum(jm) AS BIGINT) // CAST(count(*) AS BIGINT)
       |    AS mean_star_micro
       |FROM star GROUP BY 1 ORDER BY component""".stripMargin

  /** D28 oracle: the D7 component chain, then BFS from every
    * representative as a second recursive CTE — depth-capped rows
    * (doc_id, depth) per path length, min(depth) = the shortest-path
    * distance; edges MATERIALIZED (now referenced by BOTH recursions
    * plus the seed — the DuckDB plain-CTE re-expansion rule); members
    * past the cap surface as NULL → ecc cap+1 and n_beyond, exactly
    * the engine's loud-truncation contract.
    */
  private val clusterDepthOracle =
    s"""${tokCte.replaceFirst("WITH ", "WITH RECURSIVE ")} $shCte,
       |$ngramCtes,
       |pairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT it.d1, it.d2,
       |      ${Hashing.microSql("it.inter / (s1.n + s2.n - it.inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |edges AS MATERIALIZED (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION SELECT d2, d1 FROM pairs
       |),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |cc AS MATERIALIZED (
       |  SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS component
       |  FROM reach GROUP BY a
       |),
       |bfs(doc_id, depth) AS (
       |  SELECT component AS doc_id, 0 AS depth
       |  FROM (SELECT DISTINCT component FROM cc)
       |  UNION
       |  SELECT e.b, r.depth + 1 FROM bfs r JOIN edges e ON e.a = r.doc_id
       |  WHERE r.depth < ${ClusterMaxDepth}
       |),
       |md AS (SELECT doc_id, CAST(min(depth) AS BIGINT) AS depth
       |       FROM bfs GROUP BY 1)
       |SELECT c.component, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(max(coalesce(md.depth, ${ClusterMaxDepth + 1}))
       |       AS BIGINT) AS ecc,
       |  CAST(sum(CASE WHEN md.depth IS NULL THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_beyond
       |FROM cc c LEFT JOIN md ON c.doc_id = md.doc_id
       |GROUP BY 1 ORDER BY component""".stripMargin

  /** D23 oracle: the D7 recursive-reachability component chain (cc
    * MATERIALIZED — referenced twice, by ds and nd, and DuckDB 1.0
    * inlines plain CTEs per reference, re-expanding the recursion),
    * then a sorted-distinct source aggregation per component.
    */
  private val dedupSourcesOracle =
    s"""${tokCte.replaceFirst("WITH ", "WITH RECURSIVE ")} $shCte,
       |$ngramCtes,
       |pairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT it.d1, it.d2,
       |      ${Hashing.microSql("it.inter / (s1.n + s2.n - it.inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |edges AS (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION SELECT d2, d1 FROM pairs
       |),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |cc AS MATERIALIZED (
       |  SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS component
       |  FROM reach GROUP BY a
       |),
       |ds AS (
       |  SELECT DISTINCT cc.component, d.source
       |  FROM cc JOIN documents d USING (doc_id)
       |),
       |nd AS (SELECT component, CAST(count(*) AS BIGINT) AS n_docs
       |       FROM cc GROUP BY 1),
       |ns AS (
       |  SELECT component, CAST(count(*) AS BIGINT) AS n_sources,
       |    string_agg(source, ',' ORDER BY source) AS sources
       |  FROM ds GROUP BY 1
       |)
       |SELECT component, n_docs, n_sources, sources
       |FROM nd JOIN ns USING (component)
       |ORDER BY component""".stripMargin

  /** D22 oracle: the D7 pair + recursive-reachability chain (cc
    * MATERIALIZED — it is referenced twice and DuckDB 1.0 inlines
    * plain CTEs per reference, re-expanding the recursion), then the
    * per-source weighted rollup with micro(1/s), micro(toks/s) per
    * document and integer sums.
    */
  private val dedupWeightsOracle =
    s"""${tokCte.replaceFirst("WITH ", "WITH RECURSIVE ")} $shCte,
       |$ngramCtes,
       |pairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT it.d1, it.d2,
       |      ${Hashing.microSql("it.inter / (s1.n + s2.n - it.inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |edges AS (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION SELECT d2, d1 FROM pairs
       |),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |cc AS MATERIALIZED (
       |  SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS component
       |  FROM reach GROUP BY a
       |),
       |csz AS (SELECT component, CAST(count(*) AS BIGINT) AS s
       |        FROM cc GROUP BY 1),
       |dsz AS (SELECT c.doc_id, z.s
       |        FROM cc c JOIN csz z USING (component)),
       |d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
       |  FROM documents
       |),
       |w AS (
       |  SELECT d.source, d.toks, COALESCE(z.s, 1) AS s
       |  FROM d LEFT JOIN dsz z USING (doc_id)
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN s > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_docs,
       |  CAST(sum(toks) AS BIGINT) AS toks,
       |  CAST(sum(${Hashing.microSql("1 / s")}) AS BIGINT)
       |    AS eff_docs_micro,
       |  CAST(sum(${Hashing.microSql("toks / s")}) AS BIGINT)
       |    AS eff_tokens_micro
       |FROM w GROUP BY 1 ORDER BY source""".stripMargin

  /** D18: the dedup report — cluster-size histogram over the D7
    * components: how many duplicate clusters exist at each size, how
    * many documents they hold, and how many are removable keeping one
    * canonical per cluster (the headline number of every dedup
    * release note). Rides the D7 relation (bounded by true
    * duplication); the histogram is one (size, partial) Exchange over
    * a handful of groups.
    */
  def qDedupSizes(spark: SparkSession, dir: String): DataFrame =
    TextOps.connectedComponents(ngramPairs(spark, dir))
      .groupBy("component").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_clusters"))
      .select(col("size"), col("n_clusters"),
        (col("size") * col("n_clusters")).as("n_docs"),
        ((col("size") - 1L) * col("n_clusters")).as("removable"))
      .orderBy("size")

  private val dedupSizesOracle =
    s"""${tokCte.replaceFirst("WITH ", "WITH RECURSIVE ")} $shCte,
       |$ngramCtes,
       |pairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT it.d1, it.d2,
       |      ${Hashing.microSql("it.inter / (s1.n + s2.n - it.inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |edges AS (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION SELECT d2, d1 FROM pairs
       |),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |cc AS (
       |  SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS component
       |  FROM reach GROUP BY a
       |),
       |szs AS (SELECT component, count(*) AS size FROM cc GROUP BY 1)
       |SELECT size, count(*) AS n_clusters,
       |  CAST(size * count(*) AS BIGINT) AS n_docs,
       |  CAST((size - 1) * count(*) AS BIGINT) AS removable
       |FROM szs GROUP BY 1 ORDER BY size""".stripMargin

  /** D14: quality-ranked canonical selection over the D7 clusters. */
  def qDedupBest(spark: SparkSession, dir: String): DataFrame =
    TextOps.keepBest(
      TextOps.connectedComponents(ngramPairs(spark, dir)),
      TextOps.tokenStats(docs(spark, dir)))
      .orderBy("doc_id")

  /** The [[dedupClustersOracle]] component CTEs plus the tokenStats
    * quality expression, then the tie-safe two-stage argmax.
    */
  private val dedupBestOracle =
    s"""${tokCte.replaceFirst("WITH ", "WITH RECURSIVE ")} $shCte,
       |$ngramCtes,
       |pairs AS (
       |  SELECT d1, d2 FROM (
       |    SELECT it.d1, it.d2,
       |      ${Hashing.microSql("it.inter / (s1.n + s2.n - it.inter)")}
       |        AS jac_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) WHERE jac_micro >= $NgramJacMin
       |),
       |edges AS (
       |  SELECT d1 AS a, d2 AS b FROM pairs
       |  UNION SELECT d2, d1 FROM pairs
       |),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |cc AS (
       |  SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS component
       |  FROM reach GROUP BY a
       |),
       |q AS (
       |  SELECT doc_id, ${Hashing.microSql(qualityExpr)} AS quality_micro
       |  FROM tok
       |),
       |m AS (
       |  SELECT cc.doc_id, cc.component, q.quality_micro
       |  FROM cc JOIN q USING (doc_id)
       |),
       |b AS (
       |  SELECT component, max(quality_micro) AS qmax,
       |    CAST(count(*) AS BIGINT) AS n_members
       |  FROM m GROUP BY 1
       |),
       |cn AS (
       |  SELECT m.component, CAST(min(m.doc_id) AS BIGINT) AS canonical
       |  FROM m JOIN b ON m.component = b.component
       |    AND m.quality_micro = b.qmax
       |  GROUP BY 1
       |)
       |SELECT m.doc_id, m.component, m.quality_micro, b.n_members,
       |  cn.canonical, m.doc_id = cn.canonical AS keep
       |FROM m JOIN b ON m.component = b.component
       |       JOIN cn ON m.component = cn.component
       |ORDER BY m.doc_id""".stripMargin

  def qTokenBpe(spark: SparkSession, dir: String): DataFrame =
    TextOps.tokenCounts(docs(spark, dir)).orderBy("doc_id")

  def qPii(spark: SparkSession, dir: String): DataFrame =
    TextOps.piiScrub(docs(spark, dir)).orderBy("doc_id")

  val WinnowK = 8
  val WinnowW = 4

  def qWinnow(spark: SparkSession, dir: String): DataFrame =
    TextOps.winnowFingerprints(docs(spark, dir), WinnowK, WinnowW)
      .orderBy("doc_id", "fingerprint")

  val ContamMaxDf = 1000L
  val ContamRatioMin = 500000L // >= 50% of the test doc's fingerprints

  def qContamination(spark: SparkSession, dir: String): DataFrame =
    TextOps.contamination(docs(spark, dir), TrainPct, ValPct, WinnowK,
      WinnowW, ContamMaxDf, ContamRatioMin)
      .orderBy("test_doc", "train_doc")

  val StratN = 5
  val StratSalt = "eval-v1"

  def qStratified(spark: SparkSession, dir: String): DataFrame =
    TextOps.stratifiedSample(Tables.documents(spark, dir)
      .select("doc_id", "source", "text"), "source", StratN, StratSalt)
      .orderBy("source", "rank")

  private val stratifiedOracle =
    s"""WITH ranked AS (
       |  SELECT source, doc_id,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY
       |      ${Hashing.md5LongSql(
      s"'strat:$StratSalt:' || CAST(doc_id AS VARCHAR)")}, doc_id)
       |      AS BIGINT) AS rank
       |  FROM documents
       |)
       |SELECT source, doc_id, rank FROM ranked
       |WHERE rank <= $StratN ORDER BY source, rank""".stripMargin

  def qDecontam(spark: SparkSession, dir: String): DataFrame =
    TextOps.decontaminate(docs(spark, dir), TrainPct, ValPct, WinnowK,
      WinnowW, ContamMaxDf, ContamRatioMin)
      .orderBy("split")

  /** X81: the eval-gate contamination pairs — the ADMISSION form of
    * the X30 rule ([[TextOps.evalGatePairs]]): train candidates gated
    * against the test split's winnow index, df cap and ratio
    * denominator over the EVAL side alone so every verdict is
    * time-invariant (the property the T30 streaming twin's stream ≡
    * batch identity rests on). Same winnow/cap/bar constants as
    * q_contamination; when no fingerprint crosses either rule's df
    * cap the flagged pairs coincide with q_contamination's test×train
    * pairs exactly (StreamingDecontamSpec cross-checks).
    */
  def qEvalGate(spark: SparkSession, dir: String): DataFrame = {
    // eagerly materialized: the eval and train sides would otherwise
    // each re-run the winnow scan — the contamination discipline
    // ([[Materialize.shared]])
    val fs = TextOps.winnowedSplit(docs(spark, dir), WinnowK, WinnowW,
      TrainPct, ValPct).transform(Materialize.shared)
    val ev = fs.filter(col("split") === "test")
      .select(col("doc_id").as("eval_doc"), col("fingerprint"))
    val inc = fs.filter(col("split") === "train")
      .select(col("doc_id").as("new_doc"), col("fingerprint"))
    TextOps.evalGatePairs(inc, ev, ContamMaxDf, ContamRatioMin)
      .orderBy("new_doc", "eval_doc")
  }

  /** X39: word n-gram width and dirty bar of the exact-overlap audit
    * — 8-grams at a 70 % membership bar, the PaLM-style rule (GPT-3
    * used 13-grams; the synthetic corpus's docs are short enough that
    * 8 keeps the gram sets non-degenerate at every SF).
    */
  val OverlapN = 8
  val OverlapDirtyMin = 700000L

  def qNgramOverlap(spark: SparkSession, dir: String): DataFrame =
    TextOps.ngramOverlapAudit(docs(spark, dir), OverlapN, TrainPct,
      ValPct, OverlapDirtyMin).orderBy("doc_id")

  // lazy: interpolates splitBucketSql (declared below)
  private lazy val ngramOverlapOracle = {
    val n = OverlapN
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |),
       |og AS (
       |  SELECT DISTINCT doc_id,
       |         list_aggregate(toks[i:i+${n - 1}], 'string_agg', ' ') AS sh
       |  FROM tok, unnest(range(1, greatest(len(toks) - ${n - 2}, 1)))
       |    AS g(i)
       |),
       |gh AS (
       |  SELECT doc_id,
       |    CASE WHEN $splitBucketSql < $TrainPct THEN 'train'
       |         WHEN $splitBucketSql < ${TrainPct + ValPct} THEN 'val'
       |         ELSE 'test' END AS split,
       |    ${Hashing.md5LongSql("sh")} AS h
       |  FROM og
       |),
       |otg AS (SELECT DISTINCT h FROM gh WHERE split = 'train'),
       |oev AS (
       |  SELECT gh.doc_id, count(*) AS n_grams,
       |    sum(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
       |  FROM gh LEFT JOIN otg t ON gh.h = t.h
       |  WHERE gh.split <> 'train' GROUP BY 1
       |),
       |oro AS (
       |  SELECT doc_id,
       |    CASE WHEN $splitBucketSql < $TrainPct THEN 'train'
       |         WHEN $splitBucketSql < ${TrainPct + ValPct} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |),
       |obase AS (
       |  SELECT r.doc_id, r.split,
       |    CAST(COALESCE(e.n_grams, 0) AS BIGINT) AS n_grams,
       |    CAST(COALESCE(e.n_hit, 0) AS BIGINT) AS n_hit
       |  FROM oro r LEFT JOIN oev e ON r.doc_id = e.doc_id
       |  WHERE r.split <> 'train'
       |),
       |ofin AS (
       |  SELECT *,
       |    CAST(CASE WHEN n_grams > 0
       |         THEN ${Hashing.microSql("n_hit * 1.0 / n_grams")}
       |         ELSE 0 END AS BIGINT) AS overlap_micro
       |  FROM obase
       |)
       |SELECT doc_id, split, n_grams, n_hit, overlap_micro,
       |  CAST(CASE WHEN overlap_micro >= $OverlapDirtyMin
       |       THEN 1 ELSE 0 END AS BIGINT) AS dirty
       |FROM ofin ORDER BY doc_id""".stripMargin
  }

  // lazy: interpolates splitBucketSql/TrainPct/ValPct, which are
  // declared further down the object — an eager val would capture
  // null/0 (Scala top-to-bottom initialization)
  /** Shared CTE prefix of the contamination detector and remover:
    * winnow fingerprints, split assignment, df cap, per-doc counts,
    * and the (test_doc, train_doc, shared_fps) overlap relation.
    */
  private lazy val contamCtes = {
    val (k, w, m) = (WinnowK, WinnowW, TextOps.WinnowMod)
    s"""WITH kg AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) >= $k THEN
       |      list_transform(range(1, length(text) - $k + 2), i ->
       |        list_reduce(list_prepend(0, list_transform(range(0, $k),
       |          j -> ord(text[i+j]))), (a, b) -> (a * 31 + b) % $m))
       |    ELSE [] END AS hs
       |  FROM documents
       |), fp AS (
       |  SELECT doc_id,
       |    CASE WHEN len(hs) >= $w THEN
       |      list_distinct(list_transform(range(1, len(hs) - $w + 2), p ->
       |        list_min(hs[p:p+${w - 1}])))
       |    WHEN len(hs) > 0 THEN [list_min(hs)]
       |    ELSE [] END AS fps
       |  FROM kg
       |), f AS (
       |  SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fingerprint FROM fp
       |), s AS (
       |  SELECT doc_id,
       |    CASE WHEN $splitBucketSql < $TrainPct THEN 'train'
       |         WHEN $splitBucketSql < ${TrainPct + ValPct} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |), fs AS (
       |  SELECT f.doc_id, s.split, f.fingerprint FROM f JOIN s USING(doc_id)
       |), keep AS (
       |  SELECT fingerprint FROM fs GROUP BY 1
       |  HAVING count(*) <= $ContamMaxDf
       |), nf AS (
       |  SELECT doc_id, count(*) AS n_fp
       |  FROM fs JOIN keep USING(fingerprint) GROUP BY 1
       |), te AS (
       |  SELECT fs.fingerprint, doc_id AS test_doc
       |  FROM fs JOIN keep USING(fingerprint) WHERE split = 'test'
       |), tr AS (
       |  SELECT fs.fingerprint, doc_id AS train_doc
       |  FROM fs JOIN keep USING(fingerprint) WHERE split = 'train'
       |), ov AS (
       |  SELECT te.test_doc, tr.train_doc, count(*) AS shared_fps
       |  FROM te JOIN tr USING(fingerprint) GROUP BY 1, 2
       |)""".stripMargin
  }

  private lazy val contaminationOracle =
    s"""$contamCtes
       |SELECT ov.test_doc, ov.train_doc, ov.shared_fps,
       |  ${Hashing.microSql("ov.shared_fps * 1.0 / nf.n_fp")} AS ratio_micro
       |FROM ov JOIN nf ON ov.test_doc = nf.doc_id
       |WHERE ${Hashing.microSql("ov.shared_fps * 1.0 / nf.n_fp")}
       |  >= $ContamRatioMin
       |ORDER BY test_doc, train_doc""".stripMargin

  private lazy val decontamOracle =
    s"""$contamCtes,
       |cdrop AS (
       |  SELECT DISTINCT ov.train_doc AS doc_id
       |  FROM ov JOIN nf ON ov.test_doc = nf.doc_id
       |  WHERE ${Hashing.microSql("ov.shared_fps * 1.0 / nf.n_fp")}
       |    >= $ContamRatioMin
       |)
       |SELECT s.split, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(d.doc_id) AS BIGINT) AS n_dropped,
       |  CAST(count(*) - count(d.doc_id) AS BIGINT) AS n_kept,
       |  ${Hashing.microSql(
      "(count(*) - count(d.doc_id)) * 1.0 / count(*)")}
       |    AS retained_micro
       |FROM s LEFT JOIN cdrop d ON s.doc_id = d.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** X81 oracle: the winnow/split CTE prefix with the df cap and the
    * n_fp denominator computed over the EVAL (test-split) side only —
    * the one semantic divergence from `contamCtes`, mirrored exactly
    * (see [[TextOps.evalGatePairs]]).
    */
  private lazy val evalGateOracle = {
    val (k, w, m) = (WinnowK, WinnowW, TextOps.WinnowMod)
    s"""WITH kg AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) >= $k THEN
       |      list_transform(range(1, length(text) - $k + 2), i ->
       |        list_reduce(list_prepend(0, list_transform(range(0, $k),
       |          j -> ord(text[i+j]))), (a, b) -> (a * 31 + b) % $m))
       |    ELSE [] END AS hs
       |  FROM documents
       |), fp AS (
       |  SELECT doc_id,
       |    CASE WHEN len(hs) >= $w THEN
       |      list_distinct(list_transform(range(1, len(hs) - $w + 2), p ->
       |        list_min(hs[p:p+${w - 1}])))
       |    WHEN len(hs) > 0 THEN [list_min(hs)]
       |    ELSE [] END AS fps
       |  FROM kg
       |), f AS (
       |  SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fingerprint FROM fp
       |), s AS (
       |  SELECT doc_id,
       |    CASE WHEN $splitBucketSql < $TrainPct THEN 'train'
       |         WHEN $splitBucketSql < ${TrainPct + ValPct} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |), ef AS (
       |  SELECT f.doc_id AS eval_doc, f.fingerprint
       |  FROM f JOIN s USING(doc_id) WHERE s.split = 'test'
       |), keep AS (
       |  SELECT fingerprint FROM ef GROUP BY 1
       |  HAVING count(*) <= $ContamMaxDf
       |), efk AS MATERIALIZED (
       |  SELECT eval_doc, fingerprint FROM ef JOIN keep USING(fingerprint)
       |), nf AS (
       |  SELECT eval_doc, count(*) AS n_fp FROM efk GROUP BY 1
       |), tf AS (
       |  SELECT f.doc_id AS new_doc, f.fingerprint
       |  FROM f JOIN s USING(doc_id) WHERE s.split = 'train'
       |), ov AS (
       |  SELECT new_doc, eval_doc, count(*) AS shared_fps
       |  FROM tf JOIN efk USING(fingerprint) GROUP BY 1, 2
       |)
       |SELECT ov.new_doc, ov.eval_doc, ov.shared_fps,
       |  ${Hashing.microSql("ov.shared_fps * 1.0 / nf.n_fp")} AS ratio_micro
       |FROM ov JOIN nf USING(eval_doc)
       |WHERE ${Hashing.microSql("ov.shared_fps * 1.0 / nf.n_fp")}
       |  >= $ContamRatioMin
       |ORDER BY new_doc, eval_doc""".stripMargin
  }

  private val winnowOracle = {
    val (k, w, m) = (WinnowK, WinnowW, TextOps.WinnowMod)
    s"""WITH kg AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) >= $k THEN
       |      list_transform(range(1, length(text) - $k + 2), i ->
       |        list_reduce(list_prepend(0, list_transform(range(0, $k),
       |          j -> ord(text[i+j]))), (a, b) -> (a * 31 + b) % $m))
       |    ELSE [] END AS hs
       |  FROM documents
       |), fp AS (
       |  SELECT doc_id,
       |    CASE WHEN len(hs) >= $w THEN
       |      list_distinct(list_transform(range(1, len(hs) - $w + 2), p ->
       |        list_min(hs[p:p+${w - 1}])))
       |    WHEN len(hs) > 0 THEN [list_min(hs)]
       |    ELSE [] END AS fps
       |  FROM kg
       |)
       |SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fingerprint
       |FROM fp ORDER BY doc_id, fingerprint""".stripMargin
  }

  private val piiOracle = {
    // SQL single-quoted strings pass backslashes through literally, so
    // the Java/RE2 pattern injects unchanged
    val em = TextOps.EmailPattern
    val ph = TextOps.PhonePattern
    // DuckDB regexp_replace is first-match-only without the 'g' flag
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phones,
       |  sha256(regexp_replace(regexp_replace(text, '$em', '<EMAIL>', 'g'),
       |                        '$ph', '<PHONE>', 'g')) AS redacted_sha
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  private val tokenBpeOracle = {
    val pat = TextOps.BpePattern.replace("'", "''")
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT)
       |    AS n_bpe_tokens,
       |  ${Hashing.microSql(
        "len(regexp_extract_all(text, '" + pat + "')) * 1.0 / " +
          "len(string_split(text, ' '))")} AS bpe_ws_micro
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------- training-mix operators

  val TrainPct = 80
  val ValPct = 10
  val PackShards = 8
  val PackCtxLen = 2048L // power of two: exact floor division cross-engine

  def qLmScore(spark: SparkSession, dir: String): DataFrame =
    TextOps.lmScore(docs(spark, dir), TrainPct, ValPct).orderBy("doc_id")

  def qKnScore(spark: SparkSession, dir: String): DataFrame =
    TextOps.knScore(docs(spark, dir), TrainPct, ValPct).orderBy("doc_id")

  def qPplBuckets(spark: SparkSession, dir: String): DataFrame =
    TextOps.pplBuckets(
      Tables.documents(spark, dir).select("doc_id", "text", "lang"),
      TrainPct, ValPct).orderBy("doc_id")

  /** Bigram-LM scoring CTE prefix, ending in `sc` = per-doc
    * (doc_id, split, n_bigrams, avg_lp_micro): bigrams via positional
    * list indexing (same pairs as the Spark lag window), counts from
    * the train split, per-term micro-floored ln, integer per-doc sum.
    * Shared by the X19 score oracle and the X33 bucket oracle so the
    * two cannot drift. lazy — uses splitBucketSql (declared below).
    */
  private lazy val lmCtes =
    s"""$tokCte,
       |t AS (
       |  SELECT doc_id,
       |    CASE WHEN $splitBucketSql < $TrainPct THEN 'train'
       |         WHEN $splitBucketSql < ${TrainPct + ValPct} THEN 'val'
       |         ELSE 'test' END AS split,
       |    toks
       |  FROM tok
       |),
       |bi AS (
       |  SELECT doc_id, split, toks[i] AS w1, toks[i + 1] AS w
       |  FROM t, unnest(range(1, len(toks))) AS g(i)
       |),
       |cb AS (
       |  SELECT w1, w, count(*) AS cb FROM bi
       |  WHERE split = 'train' GROUP BY 1, 2
       |),
       |cu AS (
       |  SELECT w1, count(*) AS cu FROM bi
       |  WHERE split = 'train' GROUP BY 1
       |),
       |v AS (
       |  SELECT count(DISTINCT w) AS v
       |  FROM (SELECT unnest(toks) AS w FROM t WHERE split = 'train')
       |),
       |scores AS (
       |  SELECT b.doc_id, b.split,
       |    ${Hashing.microSql(
          "ln((COALESCE(cb.cb, 0) + 1) / (COALESCE(cu.cu, 0) + v.v))")}
       |      AS lp
       |  FROM bi b
       |  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w = cb.w
       |  LEFT JOIN cu ON b.w1 = cu.w1
       |  CROSS JOIN v
       |),
       |sc AS (
       |  SELECT doc_id, split, count(*) AS n_bigrams,
       |    CAST(floor(sum(lp) * 1.0 / count(*)) AS BIGINT) AS avg_lp_micro
       |  FROM scores GROUP BY 1, 2
       |)""".stripMargin

  private lazy val lmScoreOracle =
    s"""$lmCtes
       |SELECT doc_id, split, n_bigrams, avg_lp_micro
       |FROM sc ORDER BY doc_id""".stripMargin

  /** X72 oracle: the lmCtes split/bigram prefix rebuilt with the KN
    * model tables (bigram types, context totals + fan-out,
    * continuation counts, the two one-row constants); P is the same
    * literal double tree as the engine, micro-floored per bigram.
    */
  private lazy val knScoreOracle = {
    val pcSql = "((COALESCE(nb.nb, 0) + 1) / (bt.b + v.v + 1))"
    val pSql =
      s"""CASE WHEN COALESCE(ctx.cu, 0) > 0
         |  THEN greatest(COALESCE(cb.cb, 0) - 0.75, 0.0) / ctx.cu
         |    + ((0.75 * COALESCE(ctx.nf, 0)) / ctx.cu) * $pcSql
         |  ELSE $pcSql END""".stripMargin
    s"""$tokCte,
       |t AS (
       |  SELECT doc_id,
       |    CASE WHEN $splitBucketSql < $TrainPct THEN 'train'
       |         WHEN $splitBucketSql < ${TrainPct + ValPct} THEN 'val'
       |         ELSE 'test' END AS split,
       |    toks
       |  FROM tok
       |),
       |bi AS (
       |  SELECT doc_id, split, toks[i] AS w1, toks[i + 1] AS w
       |  FROM t, unnest(range(1, len(toks))) AS g(i)
       |),
       |cb AS MATERIALIZED (
       |  SELECT w1, w, CAST(count(*) AS BIGINT) AS cb FROM bi
       |  WHERE split = 'train' GROUP BY 1, 2
       |),
       |ctx AS (
       |  SELECT w1, CAST(sum(cb) AS BIGINT) AS cu,
       |    CAST(count(*) AS BIGINT) AS nf
       |  FROM cb GROUP BY 1
       |),
       |nb AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS nb FROM cb GROUP BY 1
       |),
       |v AS (
       |  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
       |  FROM (SELECT unnest(toks) AS w FROM t WHERE split = 'train')
       |),
       |bt AS (
       |  SELECT CAST(count(*) AS BIGINT) AS b FROM cb
       |),
       |scores AS (
       |  SELECT b.doc_id, b.split,
       |    ${Hashing.microSql(s"ln($pSql)")} AS lp
       |  FROM bi b
       |  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w = cb.w
       |  LEFT JOIN ctx ON b.w1 = ctx.w1
       |  LEFT JOIN nb ON b.w = nb.w
       |  CROSS JOIN v CROSS JOIN bt
       |)
       |SELECT doc_id, split, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(floor(sum(lp) * 1.0 / count(*)) AS BIGINT) AS avg_lp_micro
       |FROM scores GROUP BY 1, 2 ORDER BY doc_id""".stripMargin
  }

  /** X33: the lmCtes prefix, then the census-threshold terciles —
    * cumulative counts over DISTINCT (lang, score) rows pick each
    * score value's bucket; docs join the verdict back by value, so
    * tie groups bucket together (threshold semantics, no tie-break).
    * n_lang is a sum-of-counts → HUGEINT in DuckDB, hence the cast.
    */
  private lazy val pplBucketsOracle =
    s"""$lmCtes,
       |wl AS (
       |  SELECT sc.doc_id, sc.split, sc.avg_lp_micro, d.lang
       |  FROM sc JOIN documents d ON sc.doc_id = d.doc_id
       |),
       |cen AS (
       |  SELECT lang, avg_lp_micro, count(*) AS c FROM wl GROUP BY 1, 2
       |),
       |ct AS (
       |  SELECT lang, avg_lp_micro,
       |    sum(c) OVER (PARTITION BY lang ORDER BY avg_lp_micro DESC)
       |      AS cum,
       |    sum(c) OVER (PARTITION BY lang) AS n_lang
       |  FROM cen
       |),
       |bk AS (
       |  SELECT lang, avg_lp_micro,
       |    CASE WHEN cum * 3 <= n_lang THEN 'head'
       |         WHEN cum * 3 <= n_lang * 2 THEN 'middle'
       |         ELSE 'tail' END AS bucket,
       |    CAST(n_lang AS BIGINT) AS n_lang
       |  FROM ct
       |)
       |SELECT wl.doc_id, wl.lang, wl.split, wl.avg_lp_micro,
       |  bk.bucket, bk.n_lang
       |FROM wl JOIN bk ON wl.lang = bk.lang
       |  AND wl.avg_lp_micro = bk.avg_lp_micro
       |ORDER BY wl.doc_id""".stripMargin

  /** Target mixture over the corpus's 20 sources: four upweighted
    * "high-quality" sources at 13 % each, the rest at 3 % (sums to 100).
    * Literal constants so the oracle injects the identical table.
    */
  val MixTargets: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", if (i < 4) 13L else 3L))

  /** X35 weight table: the four "high-quality" sources upweighted
    * 2.5×, one explicitly downsampled to 0.75×, the rest passing
    * through at the 1.0 default — both fractional branches exercised.
    */
  val UpWeights: Seq[(String, Long)] =
    (0 until 4).map(i => (s"src$i", 2500000L)) :+ ("src19" -> 750000L)

  val UpsampleSalt = "epoch0"
  val UpShards = 8
  val UpEpochSalt = "e1"

  def qUpsampleShards(spark: SparkSession, dir: String): DataFrame =
    TextOps.upsampleShards(
      Tables.documents(spark, dir).select("doc_id", "source"),
      UpWeights, UpsampleSalt, UpShards, UpEpochSalt)
      .orderBy("shard", "pos")

  def qUpsample(spark: SparkSession, dir: String): DataFrame =
    TextOps.fractionalUpsample(
      Tables.documents(spark, dir).select("doc_id", "source"),
      UpWeights, UpsampleSalt).orderBy("source")

  def qMix(spark: SparkSession, dir: String): DataFrame =
    TextOps.trainingMix(Tables.documents(spark, dir), MixTargets)
      .orderBy("source")

  /** X35: the weight table as VALUES, the same salted-md5 coin as the
    * Spark side, floor'd integer base + fractional bernoulli, one
    * per-source rollup.
    */
  /** Shared X35/X36 per-doc repeat CTE: the weight VALUES table, the
    * salted-md5 coin, floor'd base + fractional bernoulli.
    */
  private val upsamplePerCte = {
    val vals = UpWeights
      .map { case (s, w) => s"('$s', $w)" }.mkString(", ")
    val coin = s"${Hashing.md5LongSql(
      s"'$UpsampleSalt:' || CAST(doc_id AS VARCHAR)")} % 1000000"
    s"""WITH w(source, w_micro) AS (VALUES $vals),
       |per AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(COALESCE(w.w_micro, 1000000) AS BIGINT) AS w_micro,
       |    CAST(floor(COALESCE(w.w_micro, 1000000) / 1000000) AS BIGINT)
       |      + CASE WHEN $coin <
       |          COALESCE(w.w_micro, 1000000) % 1000000
       |        THEN 1 ELSE 0 END AS n_rep
       |  FROM documents d LEFT JOIN w USING (source)
       |)""".stripMargin
  }

  private val upsampleOracle =
    s"""$upsamplePerCte,
       |c AS (
       |  SELECT source, max(w_micro) AS target_w_micro,
       |    count(*) AS n_docs, CAST(sum(n_rep) AS BIGINT) AS n_emitted
       |  FROM per GROUP BY 1
       |)
       |SELECT source, target_w_micro, n_docs, n_emitted,
       |  ${Hashing.microSql("n_emitted / n_docs")} AS realized_w_micro,
       |  abs(${Hashing.microSql("n_emitted / n_docs")} - target_w_micro)
       |    AS abs_dev_micro
       |FROM c ORDER BY source""".stripMargin

  /** X36: per-doc repeats exploded to copies (range is [a, b) so
    * n_rep = 0 drops out), each copy independently hashed into its
    * shard and position — the md5 mirror of the Spark window.
    */
  private val upsampleShardsOracle = {
    val h = Hashing.md5LongSql(
      s"'shuf:$UpEpochSalt:' || CAST(doc_id AS VARCHAR) || ':' || " +
        "CAST(rep AS VARCHAR)")
    s"""$upsamplePerCte,
       |copies AS (
       |  SELECT doc_id, CAST(g.r AS BIGINT) AS rep
       |  FROM per, unnest(range(1, n_rep + 1)) AS g(r)
       |),
       |hh AS (SELECT doc_id, rep, $h AS h FROM copies)
       |SELECT CAST(h % $UpShards AS BIGINT) AS shard,
       |  row_number() OVER (PARTITION BY h % $UpShards
       |    ORDER BY h, doc_id, rep) AS pos,
       |  doc_id, rep
       |FROM hh ORDER BY shard, pos""".stripMargin
  }

  private val mixOracle = {
    val vals = MixTargets
      .map { case (s, t) => s"('$s', $t)" }.mkString(", ")
    val rate = "(j.target_pct * b.b_tokens) * 1.0 / " +
      "(b.b_target * j.tokens)"
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1
       |),
       |tgt AS (
       |  SELECT * FROM (VALUES $vals) v(source, target_pct)
       |),
       |j AS (
       |  SELECT p.source, p.n_docs, p.tokens,
       |    CAST(t.target_pct AS BIGINT) AS target_pct
       |  FROM per p JOIN tgt t USING (source)
       |),
       |bn AS (
       |  SELECT tokens AS b_tokens, target_pct AS b_target FROM j
       |  ORDER BY tokens * 1.0 / target_pct, source LIMIT 1
       |),
       |r AS (
       |  SELECT j.source, j.n_docs, j.tokens, j.target_pct,
       |    ${Hashing.microSql(rate)} AS rate_micro
       |  FROM j CROSS JOIN bn b
       |)
       |SELECT source, n_docs, tokens, target_pct, rate_micro,
       |  CAST(floor(tokens * rate_micro / 1000000.0) AS BIGINT)
       |    AS kept_tokens
       |FROM r ORDER BY source""".stripMargin
  }

  def qTempMix(spark: SparkSession, dir: String): DataFrame =
    TextOps.temperatureMix(Tables.documents(spark, dir)
      .select("doc_id", "source", "text")).orderBy("source")

  private val tempMixOracle =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1
       |),
       |mn AS (SELECT min(tokens) AS tmin FROM per),
       |r AS (
       |  SELECT p.source, p.n_docs, p.tokens,
       |    ${Hashing.microSql("sqrt(m.tmin * 1.0 / p.tokens)")}
       |      AS rate_micro
       |  FROM per p CROSS JOIN mn m
       |),
       |k AS (
       |  SELECT *, CAST(floor(tokens * rate_micro / 1000000.0) AS BIGINT)
       |    AS kept_tokens
       |  FROM r
       |),
       |tk AS (SELECT CAST(sum(kept_tokens) AS BIGINT) AS total_kept
       |       FROM k)
       |SELECT k.source, k.n_docs, k.tokens, k.rate_micro, k.kept_tokens,
       |  ${Hashing.microSql("k.kept_tokens * 1.0 / t.total_kept")}
       |    AS eff_share_micro
       |FROM k CROSS JOIN tk t ORDER BY k.source""".stripMargin

  /** X77 α grid: ¼ and ¾ — dyadic points bracketing the α ≈ 0.3
    * public mixing default (UniMax/mT5-class), each (num, log2den).
    */
  val TempMixAlphas = Seq((1, 2), (3, 2))

  /** X77: temperature mixing at GENERIC dyadic α (VERDICT r14 item 6)
    * — q_temp_mix's α = ½ restriction lifted via sqrt-chain dyadic
    * powers ([[TextOps.temperatureMixAlpha]]); one row set per grid α.
    */
  def qTempMixAlpha(spark: SparkSession, dir: String): DataFrame =
    TempMixAlphas.map { case (n, l) =>
      TextOps.temperatureMixAlpha(Tables.documents(spark, dir)
        .select("doc_id", "source", "text"), n, l)
    }.reduce(_ unionByName _).orderBy("alpha_micro", "source")

  private val tempMixAlphaOracle: String =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1
       |),
       |mn AS (SELECT min(tokens) AS tmin FROM per)
       |${TempMixAlphas.map { case (n, l) =>
          TextOps.temperatureMixAlphaOracleBranch(n, l) }
          .mkString("", "\nUNION ALL\n", "")}
       |ORDER BY alpha_micro, source""".stripMargin

  val RepN = 3

  def qRepetition(spark: SparkSession, dir: String): DataFrame =
    TextOps.repetitionStats(docs(spark, dir), RepN).orderBy("doc_id")

  /** 3-grams WITH multiplicity (no DISTINCT, unlike `shCte`); DuckDB
    * inclusive list slicing: toks[i:i+2] = 3 elements, i up to len-2.
    */
  private val repetitionOracle =
    s"""$tokCte,
       |shm AS (
       |  SELECT doc_id,
       |         list_aggregate(toks[i:i+${RepN - 1}], 'string_agg', ' ') AS g
       |  FROM tok,
       |    unnest(range(1, greatest(len(toks) - ${RepN - 2}, 1))) AS r(i)
       |),
       |per AS (SELECT doc_id, g, count(*) AS c FROM shm GROUP BY 1, 2),
       |agg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
       |      AS rep_grams
       |  FROM per GROUP BY 1
       |)
       |SELECT doc_id, n_grams, rep_grams,
       |  ${Hashing.microSql("rep_grams * 1.0 / n_grams")} AS rep_micro
       |FROM agg ORDER BY doc_id""".stripMargin

  val BoilerN = 2
  val BoilerK = 20
  val BoilerBarMicro = 50000L // drop docs with >= 5 % boilerplate grams

  def qBoilerplate(spark: SparkSession, dir: String): DataFrame =
    TextOps.boilerplateStats(docs(spark, dir), BoilerN, BoilerK,
      BoilerBarMicro).orderBy("doc_id")

  /** Boilerplate oracle: bigrams with multiplicity for hit counting,
    * DISTINCT per doc for the document-frequency census, the top-k cut
    * on the same deterministic (df desc, gram) order.
    */
  private val boilerplateOracle =
    s"""$tokCte,
       |bgm AS (
       |  SELECT doc_id,
       |    list_aggregate(toks[i:i+${BoilerN - 1}], 'string_agg', ' ') AS sh
       |  FROM tok,
       |    unnest(range(1, greatest(len(toks) - ${BoilerN - 2}, 1))) AS r(i)
       |),
       |bdf AS (
       |  SELECT sh, count(DISTINCT doc_id) AS df FROM bgm GROUP BY 1
       |),
       |btop AS (SELECT sh FROM bdf ORDER BY df DESC, sh LIMIT $BoilerK),
       |bhit AS (
       |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS boiler_hits
       |  FROM bgm g JOIN btop t ON g.sh = t.sh GROUP BY 1
       |),
       |btot AS (
       |  SELECT doc_id,
       |    CAST(greatest(len(toks) - ${BoilerN - 1}, 0) AS BIGINT)
       |      AS n_grams
       |  FROM tok
       |),
       |bstat AS (
       |  SELECT t.doc_id, t.n_grams,
       |    COALESCE(h.boiler_hits, 0) AS boiler_hits,
       |    CASE WHEN t.n_grams = 0 THEN 0
       |         ELSE ${Hashing.microSql(
                  "COALESCE(h.boiler_hits, 0) * 1.0 / t.n_grams")} END
       |      AS boiler_micro
       |  FROM btot t LEFT JOIN bhit h ON t.doc_id = h.doc_id
       |)
       |SELECT doc_id, n_grams, boiler_hits, boiler_micro,
       |  CAST(CASE WHEN boiler_micro < $BoilerBarMicro THEN 1 ELSE 0 END
       |       AS BIGINT) AS kept
       |FROM bstat ORDER BY doc_id""".stripMargin

  val QrMinTok = 20L
  val QrMaxTok = 1000L
  val QrTtrMin = 300000L  // type-token ratio >= 0.30 (~p1 of the corpus)
  val QrTopMax = 200000L  // top-token share <= 0.20 (~p95)
  val QrMinStops = 1L

  def qQualityRules(spark: SparkSession, dir: String): DataFrame =
    TextOps.qualityRules(docs(spark, dir), QrMinTok, QrMaxTok,
      QrTtrMin, QrTopMax, QrMinStops).orderBy("doc_id")

  /** Quality-rule oracle: the same token census and the same five rule
    * predicates over micro-floored single divisions.
    */
  private val qualityRulesOracle =
    s"""$tokCte,
       |qfl AS (SELECT doc_id, unnest(toks) AS t FROM tok),
       |qtc AS (SELECT doc_id, t, count(*) AS c FROM qfl GROUP BY 1, 2),
       |qagg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS n_distinct,
       |    CAST(max(c) AS BIGINT) AS max_tok
       |  FROM qtc GROUP BY 1
       |),
       |qtx AS (
       |  SELECT doc_id,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars,
       |    CAST($stopFilter AS BIGINT) AS n_stops
       |  FROM tok
       |),
       |qm AS (
       |  SELECT a.doc_id, a.n_tokens,
       |    ${Hashing.microSql("x.n_chars * 1.0 / a.n_tokens")}
       |      AS mean_wlen_micro,
       |    ${Hashing.microSql("a.n_distinct * 1.0 / a.n_tokens")}
       |      AS ttr_micro,
       |    ${Hashing.microSql("a.max_tok * 1.0 / a.n_tokens")}
       |      AS top_share_micro,
       |    x.n_stops
       |  FROM qagg a JOIN qtx x ON a.doc_id = x.doc_id
       |),
       |qr AS (
       |  SELECT *,
       |    CAST(CASE WHEN n_tokens BETWEEN $QrMinTok AND $QrMaxTok
       |         THEN 1 ELSE 0 END AS BIGINT) AS r_len,
       |    CAST(CASE WHEN mean_wlen_micro BETWEEN 3000000 AND 10000000
       |         THEN 1 ELSE 0 END AS BIGINT) AS r_wlen,
       |    CAST(CASE WHEN ttr_micro >= $QrTtrMin THEN 1 ELSE 0 END
       |         AS BIGINT) AS r_ttr,
       |    CAST(CASE WHEN top_share_micro <= $QrTopMax THEN 1 ELSE 0 END
       |         AS BIGINT) AS r_top,
       |    CAST(CASE WHEN n_stops >= $QrMinStops THEN 1 ELSE 0 END
       |         AS BIGINT) AS r_stop
       |  FROM qm
       |)
       |SELECT doc_id, n_tokens, mean_wlen_micro, ttr_micro,
       |  top_share_micro, n_stops, r_len, r_wlen, r_ttr, r_top, r_stop,
       |  CAST(r_len * r_wlen * r_ttr * r_top * r_stop AS BIGINT) AS pass
       |FROM qr ORDER BY doc_id""".stripMargin

  /** X76: the cheap-score vs rule-battery calibration table at the
    * production thresholds.
    */
  def qScoreCalibration(spark: SparkSession, dir: String): DataFrame =
    TextOps.scoreCalibration(docs(spark, dir), QrMinTok, QrMaxTok,
      QrTtrMin, QrTopMax, QrMinStops)

  /** X76 oracle: the X1 score tree + the X28 rule CTEs composed, the
    * psi-oracle decile-edge machinery over the score census, the
    * 10-row rollup.
    */
  private val scoreCalibrationOracle =
    s"""$tokCte,
       |qfl AS (SELECT doc_id, unnest(toks) AS t FROM tok),
       |qtc AS (SELECT doc_id, t, count(*) AS c FROM qfl GROUP BY 1, 2),
       |qagg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS n_distinct,
       |    CAST(max(c) AS BIGINT) AS max_tok
       |  FROM qtc GROUP BY 1
       |),
       |qtx AS (
       |  SELECT doc_id,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars,
       |    CAST($stopFilter AS BIGINT) AS n_stops
       |  FROM tok
       |),
       |qm AS (
       |  SELECT a.doc_id, a.n_tokens,
       |    ${Hashing.microSql("x.n_chars * 1.0 / a.n_tokens")}
       |      AS mean_wlen_micro,
       |    ${Hashing.microSql("a.n_distinct * 1.0 / a.n_tokens")}
       |      AS ttr_micro,
       |    ${Hashing.microSql("a.max_tok * 1.0 / a.n_tokens")}
       |      AS top_share_micro,
       |    x.n_stops
       |  FROM qagg a JOIN qtx x ON a.doc_id = x.doc_id
       |),
       |qp AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN n_tokens BETWEEN $QrMinTok AND $QrMaxTok
       |         THEN 1 ELSE 0 END
       |       * CASE WHEN mean_wlen_micro BETWEEN 3000000 AND 10000000
       |         THEN 1 ELSE 0 END
       |       * CASE WHEN ttr_micro >= $QrTtrMin THEN 1 ELSE 0 END
       |       * CASE WHEN top_share_micro <= $QrTopMax THEN 1 ELSE 0 END
       |       * CASE WHEN n_stops >= $QrMinStops THEN 1 ELSE 0 END
       |       AS BIGINT) AS pass
       |  FROM qm
       |),
       |qq AS (
       |  SELECT doc_id, ${Hashing.microSql(qualityExpr)} AS v FROM tok
       |),
       |cen AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(pass) AS BIGINT) AS n_pass
       |  FROM qq JOIN qp USING (doc_id) GROUP BY 1
       |),
       |cum AS (SELECT v, cnt,
       |        CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
       |        FROM cen),
       |na AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM cen),
       |ed AS (
       |  SELECT t.i,
       |    CAST(floor((n_all - 1) * t.i / CAST(10.0 AS DOUBLE))
       |         AS BIGINT) AS r
       |  FROM na, unnest(range(1, 10)) AS t(i)
       |),
       |edges AS (
       |  SELECT e.i, c.v AS edge FROM ed e
       |  JOIN cum c ON e.r >= c.cum - c.cnt AND e.r < c.cum
       |),
       |bk AS (
       |  SELECT c.v, max(c.cnt) AS cnt, max(c.n_pass) AS n_pass,
       |    CAST(sum(CASE WHEN c.v > e2.edge THEN 1 ELSE 0 END)
       |         AS BIGINT) AS bucket
       |  FROM cen c CROSS JOIN edges e2 GROUP BY 1
       |)
       |SELECT bucket, CAST(min(v) AS BIGINT) AS score_lo,
       |  CAST(max(v) AS BIGINT) AS score_hi,
       |  CAST(sum(cnt) AS BIGINT) AS n_docs,
       |  CAST(sum(n_pass) AS BIGINT) AS n_pass,
       |  CAST((1000000 * sum(n_pass)) // sum(cnt) AS BIGINT)
       |    AS pass_ppm
       |FROM bk GROUP BY 1 ORDER BY bucket""".stripMargin

  def qSampleSplit(spark: SparkSession, dir: String): DataFrame =
    TextOps.sampleSplit(Tables.documents(spark, dir), TrainPct, ValPct)
      .orderBy("lang", "split")

  def qPack(spark: SparkSession, dir: String): DataFrame =
    TextOps.packSequences(docs(spark, dir), PackShards, PackCtxLen)
      .orderBy("shard", "doc_id")

  /** Below the corpus's distinct-token count, so truncation — and the
    * count-desc/token-asc tie-break at the boundary — is exercised.
    */
  val VocabSize = 20

  def qVocab(spark: SparkSession, dir: String): DataFrame =
    TextOps.vocabCoverage(docs(spark, dir), TrainPct, ValPct, VocabSize)
      .orderBy("split")

  /** Vocab truncation is deterministic on both engines: count-desc,
    * token-asc. lazy — uses splitBucketSql (declared below).
    */
  private lazy val vocabOracle =
    s"""$tokCte,
       |t AS (
       |  SELECT CASE WHEN $splitBucketSql < $TrainPct THEN 'train'
       |              WHEN $splitBucketSql < ${TrainPct + ValPct} THEN 'val'
       |              ELSE 'test' END AS split,
       |         unnest(toks) AS tok
       |  FROM tok
       |),
       |tv AS (
       |  SELECT tok, count(*) AS c FROM t WHERE split = 'train' GROUP BY 1
       |),
       |vocab AS (SELECT tok FROM tv ORDER BY c DESC, tok LIMIT $VocabSize)
       |SELECT t.split, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS oov_tokens,
       |  ${Hashing.microSql(
        "sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) / count(*)")}
       |    AS oov_micro
       |FROM t LEFT JOIN vocab v ON t.tok = v.tok
       |GROUP BY 1 ORDER BY split""".stripMargin

  /** 32-character grams: any shared substring of ≥ 32 chars — roughly
    * the 50-token exact-match threshold of the dedup literature scaled
    * to this corpus's short documents — produces a shared gram.
    */
  val SubK = 32
  val SubMaxDf = 50L

  def qSubstring(spark: SparkSession, dir: String): DataFrame =
    TextOps.substringMatches(docs(spark, dir), SubK, SubMaxDf)
      .orderBy("d1", "d2")

  /** Mirrors the rolling hash literally (the [[winnowOracle]] recipe
    * with positions kept): the reduce accumulator is seeded BIGINT so
    * the 2⁴⁵ modulus cannot overflow DuckDB's integer arithmetic.
    */
  private val substringOracle = {
    val (k, m) = (SubK, TextOps.SubMod)
    s"""WITH kg AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) >= $k THEN
       |      list_transform(range(1, length(text) - $k + 2), i ->
       |        struct_pack(p := i,
       |          h := list_reduce(list_prepend(CAST(0 AS BIGINT),
       |            list_transform(range(0, $k), j -> ord(text[i+j]))),
       |            (a, b) -> (a * 31 + b) % $m)))
       |    ELSE [] END AS gs
       |  FROM documents
       |), g0 AS (
       |  SELECT doc_id, unnest(gs) AS u FROM kg
       |), g1 AS (
       |  SELECT u.h AS h, doc_id, CAST(min(u.p) AS BIGINT) AS pos
       |  FROM g0 GROUP BY 1, 2
       |), keep AS (
       |  SELECT h FROM g1 GROUP BY 1
       |  HAVING count(*) >= 2 AND count(*) <= $SubMaxDf
       |), gk AS (
       |  SELECT g1.* FROM g1 JOIN keep USING (h)
       |), pr AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1, b.pos AS p2
       |  FROM gk a JOIN gk b ON a.h = b.h AND a.doc_id < b.doc_id
       |)
       |SELECT d1, d2, CAST(count(*) AS BIGINT) AS n_shared,
       |  min(p1) AS d1_pos, min(p2) AS d2_pos
       |FROM pr GROUP BY 1, 2 ORDER BY d1, d2""".stripMargin
  }

  def qCorpusCard(spark: SparkSession, dir: String): DataFrame =
    TextOps.corpusCard(
      Tables.documents(spark, dir).select("doc_id", "text", "source"))
      .orderBy("source")

  /** Per-doc stages re-expressed over the shared tok/lang-score CTEs,
    * then the source census + dominant-language argmax. lazy — uses
    * langScoreDefs/langPred (declared below).
    */
  private lazy val corpusCardOracle =
    s"""$tokCte,
       |s AS (
       |  SELECT doc_id,
       |    $langScoreDefs
       |  FROM documents
       |),
       |pd AS (
       |  SELECT d.source, d.doc_id, sha256(d.text) AS sha,
       |    CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |    ${Hashing.microSql(qualityExpr)} AS quality_micro,
       |    $langPred AS lang_pred
       |  FROM documents d
       |  JOIN tok t ON d.doc_id = t.doc_id
       |  JOIN s ON d.doc_id = s.doc_id
       |),
       |agg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(DISTINCT sha) AS BIGINT) AS n_distinct_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(floor(sum(quality_micro) / count(*)) AS BIGINT)
       |      AS avg_quality_micro
       |  FROM pd GROUP BY 1
       |),
       |lc AS (
       |  SELECT source, lang_pred, count(*) AS c FROM pd GROUP BY 1, 2
       |),
       |top AS (
       |  SELECT source, lang_pred AS top_lang FROM (
       |    SELECT source, lang_pred,
       |      row_number() OVER (PARTITION BY source
       |                         ORDER BY c DESC, lang_pred) AS rn
       |    FROM lc
       |  ) WHERE rn = 1
       |)
       |SELECT a.source, a.n_docs, a.n_distinct_docs,
       |  ${Hashing.microSql("(a.n_docs - a.n_distinct_docs) / a.n_docs")}
       |    AS dup_micro,
       |  a.total_tokens, a.avg_quality_micro, t.top_lang
       |FROM agg a JOIN top t ON a.source = t.source
       |ORDER BY a.source""".stripMargin

  def qDupCoverage(spark: SparkSession, dir: String): DataFrame =
    TextOps.dupCoverage(docs(spark, dir), SubK, SubMaxDf)
      .orderBy("doc_id")

  /** Same gram CTEs as [[substringOracle]], then the gaps-and-islands
    * interval union over matched positions.
    */
  private val dupCoverageOracle = {
    val (k, m) = (SubK, TextOps.SubMod)
    s"""WITH kg AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) >= $k THEN
       |      list_transform(range(1, length(text) - $k + 2), i ->
       |        struct_pack(p := i,
       |          h := list_reduce(list_prepend(CAST(0 AS BIGINT),
       |            list_transform(range(0, $k), j -> ord(text[i+j]))),
       |            (a, b) -> (a * 31 + b) % $m)))
       |    ELSE [] END AS gs
       |  FROM documents
       |), ap AS (
       |  SELECT doc_id, CAST(u.p AS BIGINT) AS pos, u.h AS h
       |  FROM (SELECT doc_id, unnest(gs) AS u FROM kg)
       |), g1 AS (
       |  SELECT h, doc_id FROM ap GROUP BY 1, 2
       |), keep AS (
       |  SELECT h FROM g1 GROUP BY 1
       |  HAVING count(*) >= 2 AND count(*) <= $SubMaxDf
       |), mt AS (
       |  SELECT ap.doc_id, ap.pos FROM ap JOIN keep USING (h)
       |), isl AS (
       |  SELECT doc_id, pos,
       |    max(pos + ${k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS prev_end
       |  FROM mt
       |), fl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0
       |    END AS newi
       |  FROM isl
       |), ci AS (
       |  SELECT doc_id, pos,
       |    sum(newi) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS island
       |  FROM fl
       |), pi AS (
       |  SELECT doc_id, island, min(pos) AS s,
       |    max(pos) + ${k - 1} AS e, count(*) AS ng
       |  FROM ci GROUP BY 1, 2
       |), pd AS (
       |  SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS covered_chars,
       |    CAST(sum(ng) AS BIGINT) AS n_matched_grams
       |  FROM pi GROUP BY 1
       |)
       |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       |  CAST(COALESCE(pd.n_matched_grams, 0) AS BIGINT)
       |    AS n_matched_grams,
       |  CAST(COALESCE(pd.covered_chars, 0) AS BIGINT) AS covered_chars,
       |  CASE WHEN length(d.text) = 0 THEN 0 ELSE ${Hashing.microSql(
        "COALESCE(pd.covered_chars, 0) / length(d.text)")}
       |  END AS coverage_micro
       |FROM documents d LEFT JOIN pd USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  def qExcise(spark: SparkSession, dir: String): DataFrame =
    TextOps.exciseSpans(docs(spark, dir), SubK, SubMaxDf)
      .orderBy("doc_id")

  /** The [[dupCoverageOracle]] gram/island CTEs with the owner filter
    * added, then the complement-segment splice: kept text =
    * string_agg of the between-island substrings (ordered by segment
    * start) plus the tail after the last island.
    */
  private val exciseOracle = {
    val (k, m) = (SubK, TextOps.SubMod)
    s"""WITH kg AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) >= $k THEN
       |      list_transform(range(1, length(text) - $k + 2), i ->
       |        struct_pack(p := i,
       |          h := list_reduce(list_prepend(CAST(0 AS BIGINT),
       |            list_transform(range(0, $k), j -> ord(text[i+j]))),
       |            (a, b) -> (a * 31 + b) % $m)))
       |    ELSE [] END AS gs
       |  FROM documents
       |), ap AS (
       |  SELECT doc_id, CAST(u.p AS BIGINT) AS pos, u.h AS h
       |  FROM (SELECT doc_id, unnest(gs) AS u FROM kg)
       |), g1 AS (
       |  SELECT h, doc_id FROM ap GROUP BY 1, 2
       |), own AS (
       |  SELECT h, min(doc_id) AS owner FROM g1 GROUP BY 1
       |  HAVING count(*) >= 2 AND count(*) <= $SubMaxDf
       |), mt AS (
       |  SELECT ap.doc_id, ap.pos FROM ap JOIN own USING (h)
       |  WHERE ap.doc_id <> own.owner
       |), isl AS (
       |  SELECT doc_id, pos,
       |    max(pos + ${k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS prev_end
       |  FROM mt
       |), fl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0
       |    END AS newi
       |  FROM isl
       |), ci AS (
       |  SELECT doc_id, pos,
       |    sum(newi) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS island
       |  FROM fl
       |), pi AS (
       |  SELECT doc_id, island, min(pos) AS s,
       |    max(pos) + ${k - 1} AS e
       |  FROM ci GROUP BY 1, 2
       |), sg AS (
       |  SELECT doc_id, s, e,
       |    COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
       |      AS prev_e
       |  FROM pi
       |), sp AS (
       |  SELECT doc_id,
       |    CAST(sum(e - s + 1) AS BIGINT) AS removed_chars,
       |    max(e) AS last_e,
       |    string_agg(substr(text, CAST(prev_e + 1 AS INTEGER),
       |      CAST(s - prev_e - 1 AS INTEGER)), '' ORDER BY s)
       |      AS head_text
       |  FROM sg JOIN documents USING (doc_id)
       |  GROUP BY doc_id
       |)
       |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       |  CAST(COALESCE(sp.removed_chars, 0) AS BIGINT) AS removed_chars,
       |  CAST(length(d.text) - COALESCE(sp.removed_chars, 0) AS BIGINT)
       |    AS kept_chars,
       |  CASE WHEN sp.doc_id IS NULL THEN d.text
       |    ELSE COALESCE(sp.head_text, '') ||
       |      substr(d.text, CAST(sp.last_e + 1 AS INTEGER))
       |  END AS kept_text
       |FROM documents d LEFT JOIN sp ON d.doc_id = sp.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  val DsirBuckets = 1024
  val DsirTopK = 50
  val DsirTarget = "en"

  def qDsir(spark: SparkSession, dir: String): DataFrame =
    TextOps.dsirScores(
      Tables.documents(spark, dir).select("doc_id", "text", "lang"),
      DsirTarget, DsirBuckets, DsirTopK)

  private val dsirOracle =
    s"""WITH tb AS (
       |  SELECT doc_id, lang,
       |    ${Hashing.md5LongSql("'dsir:' || tok")} % $DsirBuckets AS b
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |), db AS (
       |  SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS n
       |  FROM tb GROUP BY 1, 2, 3
       |), raw AS (SELECT b, sum(n) AS cr FROM db GROUP BY 1),
       |tgt AS (
       |  SELECT b, sum(n) AS ct FROM db WHERE lang = '$DsirTarget'
       |  GROUP BY 1
       |), tot AS (
       |  SELECT sum(n) AS nr,
       |    sum(CASE WHEN lang = '$DsirTarget' THEN n ELSE 0 END) AS nt
       |  FROM db
       |), w AS (
       |  SELECT raw.b,
       |    ${Hashing.microSql("COALESCE(ct, 0) / nt")} -
       |      ${Hashing.microSql("cr / nr")} AS w
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot
       |)
       |SELECT doc_id, lang, CAST(sum(n * w) AS BIGINT) AS score
       |FROM db JOIN w ON db.b = w.b
       |GROUP BY 1, 2
       |ORDER BY score DESC, doc_id LIMIT $DsirTopK""".stripMargin

  val ShuffleShards = 4

  def qShuffleShard(spark: SparkSession, dir: String): DataFrame =
    TextOps.shuffleShard(docs(spark, dir), ShuffleShards)
      .orderBy("shard", "pos")

  private val shuffleShardOracle =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    ${Hashing.md5LongSql("'shuf:' || CAST(doc_id AS VARCHAR)")} AS h,
       |    ${Hashing.md5LongSql("'shuf:' || CAST(doc_id AS VARCHAR)")}
       |      % $ShuffleShards AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents
       |)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
       |    AS BIGINT) AS pos,
       |  doc_id, n_tok
       |FROM base ORDER BY shard, pos""".stripMargin

  private val splitBucketSql =
    s"${Hashing.md5LongSql("'split:' || CAST(doc_id AS VARCHAR)")} % 100"

  private val sampleSplitOracle =
    s"""SELECT lang, split, count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
       |FROM (
       |  SELECT lang,
       |    CASE WHEN $splitBucketSql < $TrainPct THEN 'train'
       |         WHEN $splitBucketSql < ${TrainPct + ValPct} THEN 'val'
       |         ELSE 'test' END AS split,
       |    len(string_split(text, ' ')) AS n_tok
       |  FROM documents)
       |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  private val packOracle =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    ${Hashing.md5LongSql("'shard:' || CAST(doc_id AS VARCHAR)")}
       |      % $PackShards AS shard
       |  FROM documents
       |), c AS (
       |  SELECT shard, doc_id, n_tok,
       |    sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |                     ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM base
       |)
       |SELECT CAST(shard AS BIGINT) AS shard, doc_id, n_tok,
       |  CAST((cum - n_tok) // $PackCtxLen AS BIGINT) AS bin,
       |  CAST((cum - n_tok) % $PackCtxLen AS BIGINT) AS bin_offset
       |FROM c ORDER BY shard, doc_id""".stripMargin

  /** One BPE training round as DuckDB CTEs — shared by the
    * q_bpe_train and q_bpe_encode oracles. Every multiply-referenced
    * CTE is MATERIALIZED: DuckDB 1.0 inlines plain CTEs per reference,
    * and a 10-round chain otherwise expands the scan tree
    * exponentially (first symptom: `Too many open files`).
    */
  private def bpeRound(r: Int): String =
      s"""p$r AS MATERIALIZED (
         |  SELECT word, freq, generate_subscripts(syms, 1) AS pos,
         |         unnest(syms) AS sym
         |  FROM v$r
         |),
         |pc$r AS (
         |  SELECT a.sym AS lhs, b.sym AS rhs,
         |         CAST(sum(a.freq) AS BIGINT) AS cnt
         |  FROM p$r a JOIN p$r b ON a.word = b.word AND b.pos = a.pos + 1
         |  GROUP BY 1, 2
         |),
         |m$r AS MATERIALIZED (SELECT lhs, rhs, cnt FROM pc$r
         |        ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |g$r AS (
         |  SELECT *, pos - row_number()
         |    OVER (PARTITION BY word, mtch ORDER BY pos) AS grp
         |  FROM (
         |    SELECT p.word, p.freq, p.pos, p.sym,
         |      COALESCE(p.sym = m.lhs AND lead(p.sym)
         |        OVER (PARTITION BY p.word ORDER BY p.pos) = m.rhs,
         |        FALSE) AS mtch
         |    FROM p$r p CROSS JOIN m$r m
         |  )
         |),
         |s$r AS (
         |  SELECT word, freq, pos, sym, taken,
         |    COALESCE(lag(taken) OVER (PARTITION BY word ORDER BY pos),
         |             FALSE) AS dropped
         |  FROM (
         |    SELECT word, freq, pos, sym,
         |      CASE WHEN mtch THEN (pos - min(pos)
         |        OVER (PARTITION BY word, mtch, grp)) % 2 = 0
         |      ELSE FALSE END AS taken
         |    FROM g$r
         |  )
         |),
         |v${r + 1} AS MATERIALIZED (
         |  SELECT s.word, s.freq,
         |    list(CASE WHEN s.taken THEN m.lhs || m.rhs ELSE s.sym END
         |         ORDER BY s.pos) AS syms
         |  FROM s$r s CROSS JOIN m$r m
         |  WHERE NOT s.dropped
         |  GROUP BY 1, 2
         |)"""

  private val bpeV0Cte =
    """v0 AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
      |         string_split(word, '') AS syms
      |  FROM (
      |    SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z]+')))
      |      AS word
      |    FROM documents
      |  )
      |  GROUP BY 1
      |)"""

  /** q_bpe_train oracle — re-trains the identical merge table inside
    * DuckDB as [[TextOps.BpeMerges]] chained CTE rounds (the k-means
    * recipe): per round, pair counts from position-joined unnested
    * symbols, the argmax merge (count desc, pair asc), then the greedy
    * leftmost non-overlapping rewrite expressed positionally — a match
    * is TAKEN iff its offset within its run of consecutive matches is
    * even (runs of overlapping matches only arise when lhs = rhs), and
    * the position right of a taken match is consumed. Mirrors the
    * Spark-side `aggregate` fold exactly (BpeTrainSpec pins both
    * against a naive reference).
    */
  private val bpeTrainOracle: String = {
    val rounds =
      (0 until TextOps.BpeMerges).map(bpeRound).mkString(",\n")
    val out = (0 until TextOps.BpeMerges).map { r =>
      s"SELECT ${r + 1} AS step, lhs, rhs, lhs || rhs AS merged," +
        s" cnt AS pair_freq FROM m$r"
    }.mkString("\nUNION ALL ")
    s"""WITH $bpeV0Cte,
       |$rounds
       |$out
       |ORDER BY step""".stripMargin
  }

  /** q_bpe_encode oracle — the training chain's FINAL vocabulary
    * relation is the tokenization dictionary (symbol-array length =
    * subtokens per word); the census mirrors the Spark explode_outer +
    * left-join formulation, wordless documents kept with zero counts.
    */
  private val bpeEncodeOracle: String = {
    val m = TextOps.BpeMerges
    val rounds = (0 until m).map(bpeRound).mkString(",\n")
    s"""WITH $bpeV0Cte,
       |$rounds,
       |dict AS (SELECT word, len(syms) AS n_sub FROM v$m),
       |w AS (
       |  SELECT doc_id, lower(u.w) AS word
       |  FROM (
       |    SELECT doc_id,
       |      CASE WHEN len(regexp_extract_all(text, '[A-Za-z]+')) = 0
       |           THEN [CAST(NULL AS VARCHAR)]
       |           ELSE regexp_extract_all(text, '[A-Za-z]+') END AS ws
       |    FROM documents
       |  ), unnest(ws) AS u(w)
       |)
       |SELECT w.doc_id,
       |  CAST(count(w.word) AS BIGINT) AS n_words,
       |  CAST(COALESCE(sum(d.n_sub), 0) AS BIGINT) AS n_subtokens,
       |  CASE WHEN count(w.word) > 0
       |    THEN ${Hashing.microSql(
      "CAST(COALESCE(sum(d.n_sub), 0) AS BIGINT) / count(w.word)")}
       |    ELSE 0 END AS subtokens_per_word_micro
       |FROM w LEFT JOIN dict d USING (word)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** X34: the bpeEncode oracle's dictionary chain, the word stream
    * extended with lang, then one per-language rollup; aggregate
    * first, divide once — mirroring the Spark expression tree.
    */
  private val fertilityOracle: String = {
    val m = TextOps.BpeMerges
    val rounds = (0 until m).map(bpeRound).mkString(",\n")
    s"""WITH $bpeV0Cte,
       |$rounds,
       |dict AS (SELECT word, len(syms) AS n_sub FROM v$m),
       |w AS (
       |  SELECT doc_id, lang, lower(u.w) AS word
       |  FROM (
       |    SELECT doc_id, lang,
       |      CASE WHEN len(regexp_extract_all(text, '[A-Za-z]+')) = 0
       |           THEN [CAST(NULL AS VARCHAR)]
       |           ELSE regexp_extract_all(text, '[A-Za-z]+') END AS ws
       |    FROM documents
       |  ), unnest(ws) AS u(w)
       |),
       |r AS (
       |  SELECT lang, count(DISTINCT doc_id) AS n_docs,
       |    CAST(count(w.word) AS BIGINT) AS n_words,
       |    CAST(COALESCE(sum(d.n_sub), 0) AS BIGINT) AS n_subtokens,
       |    CAST(COALESCE(sum(len(w.word)), 0) AS BIGINT) AS word_bytes
       |  FROM w LEFT JOIN dict d USING (word)
       |  GROUP BY 1
       |)
       |SELECT lang, n_docs, n_words, n_subtokens, word_bytes,
       |  CASE WHEN n_words > 0
       |    THEN ${Hashing.microSql("n_subtokens / n_words")}
       |    ELSE 0 END AS fertility_micro,
       |  CASE WHEN n_subtokens > 0
       |    THEN ${Hashing.microSql("word_bytes / n_subtokens")}
       |    ELSE 0 END AS bytes_per_subtoken_micro
       |FROM r ORDER BY lang""".stripMargin
  }

  /** X63: RAKE keyphrase top-k. */
  def qKeyphrase(spark: SparkSession, dir: String): DataFrame =
    TextOps.rakeKeyphrases(docs(spark, dir))

  /** D24: LSH band/row tuner at the D3 dedup threshold. */
  def qLshTune(spark: SparkSession, dir: String): DataFrame =
    TextOps.lshTune(docs(spark, dir), ShingleN, MaxShingleDf,
      MinhashJacMin)

  /** D24 oracle: the D17 bucket census prefix verbatim, then the
    * config grid with the SAME generated multiplication-chain
    * S-curves ([[TextOps.lshCollideMicroSql]]) — libm pow never runs
    * on either engine.
    */
  private val lshTuneOracle = {
    val cfgRows = TextOps.LshTuneConfigs.map { case (b, r) =>
      s"""SELECT CAST($b AS BIGINT) AS bands,
         |  CAST($r AS BIGINT) AS rows_per_band,
         |  ${TextOps.lshCollideMicroSql(b, r)} AS p_micro,
         |  bucket_lo_micro, n_pairs FROM tg""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$tokCte $shCte,
       |$ngramCtes,
       |hcen AS (
       |  SELECT bucket_lo_micro, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM (
       |    SELECT CAST(floor(${Hashing.microSql(
      "it.inter / (s1.n + s2.n - it.inter)")} / 50000) AS BIGINT)
       |      * 50000 AS bucket_lo_micro
       |    FROM it JOIN sz s1 ON it.d1 = s1.doc_id
       |            JOIN sz s2 ON it.d2 = s2.doc_id
       |  ) GROUP BY 1
       |),
       |tg AS (
       |  SELECT bucket_lo_micro, n_pairs,
       |    CAST(least(bucket_lo_micro + 25000, 1000000) AS DOUBLE)
       |      / 1000000.0 AS tmid
       |  FROM hcen
       |),
       |grid AS (
       |$cfgRows
       |)
       |SELECT bands, rows_per_band,
       |  CAST(sum(n_pairs) AS BIGINT) AS n_pairs_total,
       |  CAST(sum(n_pairs * p_micro) AS BIGINT) AS exp_candidates,
       |  CAST(sum(CASE WHEN bucket_lo_micro + 25000 < $MinhashJacMin
       |       THEN n_pairs * p_micro ELSE 0 END) AS BIGINT) AS fp_mass,
       |  CAST(sum(CASE WHEN bucket_lo_micro + 25000 >= $MinhashJacMin
       |       THEN n_pairs * (1000000 - p_micro) ELSE 0 END) AS BIGINT)
       |    AS fn_mass
       |FROM grid GROUP BY 1, 2 ORDER BY bands""".stripMargin
  }

  /** X63 oracle: same islands, the same capped candidate set feeding
    * the word statistics, integer scores throughout; `ns`/`phr`/`words`
    * are multiply referenced, hence MATERIALIZED. DuckDB's 1-based
    * ordinality shifts every grp by a constant vs Spark's 0-based pos
    * — grp is only a GROUP KEY, never output, so the partitions are
    * identical.
    */
  private val keyphraseOracle = {
    val stops = TextOps.RakeStops.map(s => s"'$s'").mkString(", ")
    s"""WITH tk AS (
       |  SELECT doc_id, generate_subscripts(toks, 1) AS pos,
       |         unnest(toks) AS tok
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
       |        FROM documents)
       |),
       |ns AS MATERIALIZED (
       |  SELECT doc_id, pos, tok,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |      AS grp
       |  FROM tk WHERE tok NOT IN ($stops)
       |),
       |phr AS MATERIALIZED (
       |  SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY pos)
       |      AS phrase,
       |    CAST(count(*) AS BIGINT) AS len
       |  FROM ns GROUP BY 1, 2 HAVING count(*) <= 3
       |),
       |words AS MATERIALIZED (
       |  SELECT n.doc_id, n.grp, n.tok, p.len
       |  FROM ns n JOIN phr p USING (doc_id, grp)
       |),
       |wsc AS (
       |  SELECT tok,
       |    CAST((CAST(sum(len) AS BIGINT) * 1000000)
       |         // CAST(count(*) AS BIGINT) AS BIGINT) AS wscore
       |  FROM words GROUP BY 1
       |),
       |psc AS (
       |  SELECT w.doc_id, w.grp, p.phrase,
       |    CAST(sum(s.wscore) AS BIGINT) AS score
       |  FROM words w JOIN wsc s USING (tok)
       |  JOIN phr p USING (doc_id, grp)
       |  GROUP BY 1, 2, 3
       |)
       |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
       |  CAST(max(score) AS BIGINT) AS score_micro
       |FROM psc GROUP BY 1
       |ORDER BY score_micro DESC, phrase LIMIT 25""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_keyphrase"      -> (qKeyphrase _),
    "q_lsh_tune"       -> (qLshTune _),
    "q_bpe_train"      -> (qBpeTrain _),
    "q_bpe_encode"     -> (qBpeEncode _),
    "q_fertility"      -> (qFertility _),
    "q_lm_score"       -> (qLmScore _),
    "q_kn_score"       -> (qKnScore _),
    "q_ppl_buckets"    -> (qPplBuckets _),
    "q_mix"            -> (qMix _),
    "q_upsample"       -> (qUpsample _),
    "q_upsample_shards" -> (qUpsampleShards _),
    "q_repetition"     -> (qRepetition _),
    "q_boilerplate"    -> (qBoilerplate _),
    "q_quality_rules"  -> (qQualityRules _),
    "q_temp_mix"       -> (qTempMix _),
    "q_temp_mix_alpha" -> (qTempMixAlpha _),
    "q_curation_waterfall" -> (qCurationWaterfall _),
    "q_decontam"       -> (qDecontam _),
    "q_eval_gate"      -> (qEvalGate _),
    "q_ngram_overlap"  -> (qNgramOverlap _),
    "q_stratified"     -> (qStratified _),
    "q_pii"            -> (qPii _),
    "q_winnow"         -> (qWinnow _),
    "q_contamination"  -> (qContamination _),
    "q_token_bpe"      -> (qTokenBpe _),
    "q_sample_split"   -> (qSampleSplit _),
    "q_pack"           -> (qPack _),
    "q_shuffle_shard"  -> (qShuffleShard _),
    "q_substring"      -> (qSubstring _),
    "q_vocab"          -> (qVocab _),
    "q_dup_coverage"   -> (qDupCoverage _),
    "q_excise"         -> (qExcise _),
    "q_dsir"           -> (qDsir _),
    "q_dedup_best"     -> (qDedupBest _),
    "q_corpus_card"    -> (qCorpusCard _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_dedup_sizes"   -> (qDedupSizes _),
    "q_dedup_weights" -> (qDedupWeights _),
    "q_dedup_sources" -> (qDedupSources _),
    "q_chunk_dedup"   -> (qChunkDedup _),
    "q_curate"        -> (qCurate _),
    "q_chunks"        -> (qChunks _),
    "q_tfidf"         -> (qTfIdf _),
    "q_token_stats"   -> (qTokenStats _),
    "q_lang_id"       -> (qLangId _),
    "q_lang_confusion" -> (qLangConfusion _),
    "q_lang_mix"      -> (qLangMix _),
    "q_tok_len"       -> (qTokLen _),
    "q_score_calibration" -> (qScoreCalibration _),
    "q_simhash_hist"  -> (qSimhashHist _),
    "q_dedup_yield"   -> (qDedupYield _),
    "q_fingerprint"   -> (qFingerprint _),
    "q_dedup_exact"   -> (qDedupExact _),
    "q_dedup_ngram"   -> (qDedupNgram _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_dedup_contain" -> (qDedupContain _),
    "q_minhash_calib" -> (qMinhashCalib _),
    "q_jac_hist"      -> (qJacHist _),
    "q_heaps"         -> (qHeaps _),
    "q_prefix_dup"    -> (qPrefixDup _),
    "q_shingle_df"    -> (qShingleDf _),
    "q_pagerank"      -> (qPagerank _),
    "q_triangles"     -> (qTriangles _),
    "q_cooc"          -> (qCooc _),
    "q_ks_drift"      -> (qKsDrift _),
    "q_burstiness"    -> (qBurstiness _),
    "q_psi"           -> (qPsi _),
    "q_jsd"           -> (qJsd _),
    "q_mad"           -> (qMad _),
    "q_msttr"         -> (qMsttr _),
    "q_entropy"       -> (qEntropy _),
    "q_readability"   -> (qReadability _),
    "q_charclass"     -> (qCharclass _),
    "q_skipgram"      -> (qSkipgram _),
    "q_gini"          -> (qGini _),
    "q_coverage"      -> (qCoverage _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_bm25"          -> (qBm25 _),
    "q_winsor"        -> (qWinsor _),
    "q_concentration" -> (qConcentration _),
    "q_corr"          -> (qCorr _),
    "q_novelty"       -> (qNovelty _),
    "q_zipf"          -> (qZipf _),
    "q_good_turing"   -> (qGoodTuring _),
    "q_richness"      -> (qRichness _),
    "q_yule_k"        -> (qYuleK _),
    "q_detector_diff" -> (qDetectorDiff _),
    "q_splice"        -> (qSplice _),
    "q_cluster_purity" -> (qClusterPurity _),
    "q_cluster_depth" -> (qClusterDepth _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_edit_dedup" -> (qEditDedup _),
    "q_lsh_recall" -> (qLshRecall _),
    "q_rank_drift" -> (qRankDrift _),
    "q_dedup_simhash" -> (qDedupSimhash _))

  val oracles: Map[String, String] = Map(
    "q_keyphrase"      -> keyphraseOracle,
    "q_lsh_tune"       -> lshTuneOracle,
    "q_bpe_train"      -> bpeTrainOracle,
    "q_bpe_encode"     -> bpeEncodeOracle,
    "q_fertility"      -> fertilityOracle,
    "q_lm_score"       -> lmScoreOracle,
    "q_kn_score"       -> knScoreOracle,
    "q_ppl_buckets"    -> pplBucketsOracle,
    "q_mix"            -> mixOracle,
    "q_upsample"       -> upsampleOracle,
    "q_upsample_shards" -> upsampleShardsOracle,
    "q_repetition"     -> repetitionOracle,
    "q_boilerplate"    -> boilerplateOracle,
    "q_quality_rules"  -> qualityRulesOracle,
    "q_temp_mix"       -> tempMixOracle,
    "q_temp_mix_alpha" -> tempMixAlphaOracle,
    "q_curation_waterfall" -> curationWaterfallOracle,
    "q_decontam"       -> decontamOracle,
    "q_eval_gate"      -> evalGateOracle,
    "q_ngram_overlap"  -> ngramOverlapOracle,
    "q_stratified"     -> stratifiedOracle,
    "q_pii"            -> piiOracle,
    "q_winnow"         -> winnowOracle,
    "q_contamination"  -> contaminationOracle,
    "q_token_bpe"      -> tokenBpeOracle,
    "q_sample_split"   -> sampleSplitOracle,
    "q_pack"           -> packOracle,
    "q_shuffle_shard"  -> shuffleShardOracle,
    "q_substring"      -> substringOracle,
    "q_vocab"          -> vocabOracle,
    "q_dup_coverage"   -> dupCoverageOracle,
    "q_excise"         -> exciseOracle,
    "q_dsir"           -> dsirOracle,
    "q_dedup_best"     -> dedupBestOracle,
    "q_corpus_card"    -> corpusCardOracle,
    "q_dedup_clusters" -> dedupClustersOracle,
    "q_dedup_sizes"   -> dedupSizesOracle,
    "q_dedup_weights" -> dedupWeightsOracle,
    "q_dedup_sources" -> dedupSourcesOracle,
    "q_chunk_dedup"   -> chunkDedupOracle,
    "q_curate"        -> curateOracle,
    "q_chunks"        -> chunksOracle,
    "q_tfidf"         -> tfIdfOracle,
    "q_token_stats"   -> tokenStatsOracle,
    "q_lang_id"       -> langIdOracle,
    "q_lang_confusion" -> langConfusionOracle,
    "q_lang_mix"      -> langMixOracle,
    "q_tok_len"       -> tokLenOracle,
    "q_score_calibration" -> scoreCalibrationOracle,
    "q_simhash_hist"  -> simhashHistOracle,
    "q_dedup_yield"   -> dedupYieldOracle,
    "q_fingerprint"   -> fingerprintOracle,
    "q_dedup_exact"   -> dedupExactOracle,
    "q_dedup_ngram"   -> dedupNgramOracle,
    "q_source_overlap" -> sourceOverlapOracle,
    "q_dedup_contain" -> dedupContainOracle,
    "q_minhash_calib" -> minhashCalibOracle,
    "q_jac_hist"      -> jacHistOracle,
    "q_heaps"         -> heapsOracle,
    "q_prefix_dup"    -> prefixDupOracle,
    "q_shingle_df"    -> shingleDfOracle,
    "q_pagerank"      -> pagerankOracle,
    "q_triangles"     -> trianglesOracle,
    "q_cooc"          -> coocOracle,
    "q_ks_drift"      -> ksDriftOracle,
    "q_burstiness"    -> burstinessOracle,
    "q_psi"           -> psiOracle,
    "q_jsd"           -> jsdOracle,
    "q_mad"           -> madOracle,
    "q_msttr"         -> msttrOracle,
    "q_entropy"       -> entropyOracle,
    "q_readability"   -> readabilityOracle,
    "q_charclass"     -> charclassOracle,
    "q_skipgram"      -> skipgramOracle,
    "q_gini"          -> giniOracle,
    "q_coverage"      -> coverageOracle,
    "q_weighted_sample" -> weightedSampleOracle,
    "q_bm25"          -> bm25Oracle,
    "q_winsor"        -> winsorOracle,
    "q_concentration" -> concentrationOracle,
    "q_corr"          -> corrOracle,
    "q_novelty"       -> noveltyOracle,
    "q_zipf"          -> zipfOracle,
    "q_good_turing"   -> goodTuringOracle,
    "q_richness"      -> richnessOracle,
    "q_yule_k"        -> yuleKOracle,
    "q_detector_diff" -> detectorDiffOracle,
    "q_splice"        -> spliceOracle,
    "q_cluster_purity" -> clusterPurityOracle,
    "q_cluster_depth" -> clusterDepthOracle,
    "q_dedup_minhash" -> dedupMinhashOracle,
    "q_edit_dedup" -> editDedupOracle,
    "q_lsh_recall" -> lshRecallOracle,
    "q_rank_drift" -> rankDriftOracle,
    "q_dedup_simhash" -> dedupSimhashOracle)
}
