package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.functions.Hashing.{md5Long, micro}

/** Text analysis + deduplication operators over a `documents`-shaped frame
  * (`doc_id: long, text: string, ...`) — the training-data-pipeline surface
  * the reference lacks, built Spark-first:
  *
  *  - everything is built-in expressions / higher-order functions (split,
  *    transform, slice, filter, aggregate) — zero UDFs, so the whole
  *    pipeline stays inside whole-stage codegen;
  *  - near-dup candidate generation never goes O(n²): n-gram Jaccard uses
  *    an inverted-index self-join on shingles (with a document-frequency
  *    stop-shingle cap for 100 TB skew), MinHash uses banded LSH buckets,
  *    SimHash uses 8-bit band buckets — each join key is a shuffle key
  *    with bounded fan-out;
  *  - all scores are emitted as integer micro-units ([[Hashing.micro]]),
  *    keeping the DuckDB oracle compare exact.
  */
object TextOps {

  /** Whitespace tokenization — mirrors DuckDB `string_split(text, ' ')`
    * including empty tokens at runs/edges (Java split with limit -1).
    */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Word n-gram shingles as an array column; empty below n tokens.
    * Spark `sequence(1, k)` DESCENDS for k < 1, so the guard is load-
    * bearing, not cosmetic.
    *
    * This is the EXPRESSION formulation — an interpreted higher-order
    * tower (lambda dispatch per shingle per token), kept as the
    * readable spec mirror; every corpus-scale consumer routes through
    * [[textShingles]]'s compiled kernel instead (VERDICT r15 item 7 —
    * the shingle relation is one row per word of the corpus, the
    * X16-measured interpreted-per-element shape). TextKernelSpec pins
    * kernel ≡ expression property-style.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** [[shingles]]∘[[tokens]] as ONE codegen kernel
    * ([[graft.functions.WordShingles]]): shingle j is a single
    * substring of the original text (every separator is exactly one
    * space, so joining n consecutive tokens with spaces IS the
    * original span) — no token array, no per-shingle lambda.
    */
  def textShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.WordShingles(
      org.apache.spark.sql.GraftSqlBridge.expression(text), n))

  /** Ensure a CPU-heavy derivation isn't bottlenecked on scan
    * parallelism: a small hot table often arrives as a single parquet
    * row group (one partition), which would run the whole explode/hash
    * projection on one core. Only repartitions when the input is
    * under-parallel — at 100 TB inputs already carry thousands of
    * splits and this is a no-op (no shuffle added).
    *
    * The decision reads FILE METADATA only (`inputFiles` + file sizes —
    * both served from the already-cached file index): the earlier
    * `df.rdd.getNumPartitions` probe forced physical planning outside
    * AQE just to count partitions. Non-file-backed frames (in-memory
    * test relations) pass through untouched.
    */
  private[operators] def parallelized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) return df
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    // enough bytes -> the scan itself splits to >= target partitions
    if (bytes / math.max(1L, maxPart) >= target) df
    else df.repartition(target)
  }

  /** Distinct (doc_id, sh) shingle set — the base relation for the n-gram
    * and MinHash dedup paths.
    */
  def shingleSet(docs: DataFrame, n: Int): DataFrame =
    parallelized(docs).select(col("doc_id"),
        explode(array_distinct(textShingles(col("text"), n))).as("sh"))

  // ------------------------------------------------------------ analysis

  /** Token counting + quality scoring (length / stopword / repetition
    * ratios). One narrow projection — no shuffle at all.
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nDis = size(array_distinct(toks)).cast("long")
    val nStop = size(filter(toks, t => t === "the" || t === "a")).cast("long")
    val distinctRatio = nDis / nTok
    val stopRatio = nStop / nTok
    val quality = lit(0.5) * least(lit(1.0), nTok / lit(200.0)) +
      lit(0.3) * distinctRatio + lit(0.2) * (lit(1.0) - stopRatio)
    docs.select(col("doc_id"),
      nTok.as("n_tokens"),
      nDis.as("n_distinct"),
      micro(length(regexp_replace(col("text"), " ", "")) / nTok)
        .as("avg_token_len_micro"),
      micro(stopRatio).as("stopword_micro"),
      micro(distinctRatio).as("distinct_micro"),
      micro(quality).as("quality_micro"))
  }

  /** GPT-style BPE pre-tokenization pattern, restricted to the subset
    * with identical semantics in Java regex (Spark) and RE2 (DuckDB):
    * leftmost-first alternation over contraction suffixes, space-prefixed
    * letter runs, digit runs, punctuation runs, and residual spaces.
    * (The real GPT-2 pattern's `\p{L}` classes and negative lookahead
    * are not RE2-expressible — ASCII classes keep both engines exact.)
    */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** Token counting under both tokenization models a data pipeline
    * budgets with: whitespace words and BPE-style pre-tokens. One
    * narrow projection, no shuffle; the regex runs inside codegen.
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val nWs = size(tokens(col("text"))).cast("long")
    val nBpe = size(regexp_extract_all(col("text"), lit(BpePattern),
      lit(0))).cast("long")
    docs.select(col("doc_id"), nWs.as("n_ws_tokens"),
      nBpe.as("n_bpe_tokens"),
      micro(nBpe / nWs).as("bpe_ws_micro"))
  }

  /** Language-ID profiles: (weight, substring) evidence lists per
    * language, scored by substring occurrence counts. A toy character-
    * n-gram classifier, but the *operator* is the point: deterministic,
    * expression-only, oracle-checkable. Tie-break = first language in
    * declaration order reaching the max.
    */
  val LangProfiles: Seq[(String, Seq[(Int, String)])] = Seq(
    "en" -> Seq((2, "th"), (1, "he"), (1, " a ")),
    "de" -> Seq((2, "sc"), (1, "ch"), (1, "er")),
    "es" -> Seq((2, "ta"), (1, "os"), (1, "ue")),
    "fr" -> Seq((2, "ar"), (1, "ou"), (1, "le")),
    "zh" -> Seq((2, "ow"), (1, "in"), (1, "at")))

  def langId(docs: DataFrame): DataFrame = {
    // all profile scores in ONE compiled pass (lang_scores): the column
    // formulation ran a regexp_replace over the full text per
    // (language, needle) — 15 regex passes per row for a substring
    // count; the kernel's indexOf advances are the same non-overlapping
    // left-to-right semantics the oracle's replace trick keeps using
    val sc = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.LangScores(
        org.apache.spark.sql.GraftSqlBridge.expression(col("text")),
        LangProfiles.map(_._2.map(_._1.toLong).toArray).toArray,
        LangProfiles.map(_._2.map(_._2).toArray).toArray))
    // (element_at is 1-based)
    val scored = docs.select(col("doc_id"), sc.as("__sc"))
      .select(col("doc_id") +:
        LangProfiles.zipWithIndex.map { case ((l, _), i) =>
          element_at(col("__sc"), i + 1).as(s"score_$l")
        }: _*)
    val names = LangProfiles.map { case (l, _) => col(s"score_$l") }
    val best = greatest(names: _*)
    val total = names.reduce(_ + _) + lit(1L)
    val pred = LangProfiles.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"score_$l") >= best, lit(l)).otherwise(acc)
    }
    // foldRight keeps declaration order: first lang reaching max wins
    scored.select(col("doc_id"), pred.as("lang_pred"),
      micro(best / total).as("conf_micro"))
  }

  /** The [[graft.functions.LangScores]] kernel over an arbitrary text
    * column — one compiled pass per row returning the per-language
    * score array (shared by [[langId]]'s whole-doc read and X74's
    * half-split read).
    */
  private def langScoresOf(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.LangScores(
        org.apache.spark.sql.GraftSqlBridge.expression(text),
        LangProfiles.map(_._2.map(_._1.toLong).toArray).toArray,
        LangProfiles.map(_._2.map(_._2).toArray).toArray))

  /** Argmax language off a score-array column (declaration-order
    * tie-break — the [[langId]] rule).
    */
  private def langPredOf(sc: Column): Column = {
    val scores = LangProfiles.indices.map(i => element_at(sc, i + 1))
    val best = greatest(scores: _*)
    LangProfiles.zipWithIndex.foldRight(lit("und")) {
      case (((l, _), i), acc) =>
        when(scores(i) >= best, lit(l)).otherwise(acc)
    }
  }

  /** X74: code-switching census — X73's half-split lens pointed at
    * LANGUAGE instead of vocabulary: the token stream is cut at the
    * midpoint and each half is language-identified independently (the
    * X2 classifier, same kernel); halves that disagree mark a MIXED
    * document — concatenated bilingual pages, partially-translated
    * boilerplate, the extractor gluing a nav bar in another language —
    * which X2's whole-document argmax hides behind whichever language
    * wins the sum (the standard failure mode per-document language
    * labels inherit from their classifier; CCNet and its descendants
    * segment before labeling for exactly this reason). Per-source
    * triage census: how much of each provider is language-mixed.
    *
    * Determinism: halves are rebuilt from the token split (floor(n/2)
    * tokens / the rest) joined by single spaces — both engines build
    * the identical strings. Degenerate halves (a sub-2-token doc's
    * empty first half, or a half whose tokens carry no profile
    * evidence) score all-zero, and the classifier's argmax tie-break
    * then yields the FIRST profile language (scores ≥ best holds at 0
    * for every profile — the X2 fixed tie order), NOT 'und': a
    * 1-token doc whose single token carries non-first-language
    * evidence therefore reads lang_a = first-profile vs lang_b = that
    * language and DOES count as mixed. Deterministic and mirrored
    * verbatim by the oracle, but it means 1-token docs skew mixed_ppm
    * toward mixed — a triage census over such a corpus should filter
    * on token count first. Counts exact, the ppm an integer floor
    * division.
    *
    * Scale shape: one scan (two kernel passes per row, no explode),
    * ONE (source) partial-agg'd Exchange — the cheapest census in the
    * X family.
    */
  def langMixCensus(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val half = floor(n / lit(2)).cast("int")
    val scored = parallelized(docs).select(col("source"),
        langScoresOf(concat_ws(" ",
          slice(toks, lit(1), half))).as("sa"),
        langScoresOf(concat_ws(" ",
          slice(toks, half + lit(1), n - half))).as("sb"))
      .select(col("source"), langPredOf(col("sa")).as("lang_a"),
        langPredOf(col("sb")).as("lang_b"))
    scored.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang_a") =!= col("lang_b"), 1L).otherwise(0L))
          .as("n_mixed"))
      .select(col("source"), col("n_docs"), col("n_mixed"),
        expr("(1000000 * n_mixed) div n_docs").as("mixed_ppm"))
      .orderBy("source")
  }

  /** X75: junk bar for [[tokenLenCensus]] — whitespace tokens longer
    * than this are overwhelmingly URLs, hashes, DNA-style runs, or
    * extraction failures in web corpora.
    */
  val LongTokenLen = 15L

  /** X75: token-length census per source — the tokenizer-facing
    * diagnostic X61's CHARACTER classes cannot see: two sources with
    * identical alpha/digit splits can still differ wildly in token
    * GEOMETRY (mean length, tail length), and that geometry is what
    * drives BPE fertility (X34), budget estimates (X1's bytes/token),
    * and the classic junk signals — very long whitespace tokens are
    * URLs, base64 blobs, and no-space extraction failures (the
    * Gopher rule set carries exactly this bar). Per source: token
    * count, exact mean length, rank-picked p95 length, max, and the
    * over-bar share.
    *
    * Exactness: lengths and counts exact integers; mean an integer
    * micro floor-division; p95 the rank-picked ACTUAL length at
    * position ((n−1)·19) div 20 + 1 of the (source, len) census (the
    * X46 discipline, no interpolation); share an integer ppm floor
    * division.
    *
    * Scale shape: one token scan into the (source, len) census
    * partial-agg (lengths are ≤ max-token-length distinct values per
    * source, so the census is tiny); the rank pick and every rollup
    * ride census windows — nothing corpus-sized past the first
    * Exchange.
    */
  def tokenLenCensus(docs: DataFrame): DataFrame =
    tokenLenFromCensus(tokenLenPartial(docs))

  /** The (source, len, cnt) census of one documents-shaped frame —
    * the T24 store's per-batch partial AND the batch census's first
    * stage (shared kernel, so streamed-vs-batch parity is exact).
    */
  def tokenLenPartial(docs: DataFrame): DataFrame =
    parallelized(docs)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .select(col("source"), length(col("t")).cast("long").as("len"))
      .groupBy("source", "len").agg(count(lit(1)).as("cnt"))

  /** X75's statistics off any (source, len, cnt) census — also the
    * T24 serving read.
    */
  def tokenLenFromCensus(cen: DataFrame): DataFrame = {
    val base = cen.groupBy("source")
      .agg(sum("cnt").as("n_tokens"),
        sum(col("cnt") * col("len")).as("sum_len"),
        max("len").as("max_len"),
        sum(when(col("len") > LongTokenLen, col("cnt")).otherwise(0L))
          .as("n_long"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("len")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
    val p95 = cen
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wSrc))
      .filter(col("cum") >= expr("((n - 1) * 19) div 20 + 1"))
      .groupBy("source").agg(min("len").as("p95_len"))
    base.join(p95, "source")
      .select(col("source"), col("n_tokens"),
        expr("(sum_len * 1000000) div n_tokens").as("mean_len_micro"),
        col("p95_len"), col("max_len"),
        expr("(1000000 * n_long) div n_tokens").as("long_ppm"))
      .orderBy("source")
  }

  /** D34: dedup-yield decision table — the ONE-table summary a
    * pipeline owner reads before choosing a dedup stack: for each
    * detector lens the engine ships (D1 exact bytes, D30 opener
    * class, D3 MinHash set-resemblance at the production bar, D4
    * SimHash bit agreement at its bar), how many documents are
    * DUPLICATE-INVOLVED — members of a ≥ 2 class (group detectors) or
    * of ≥ 1 verified pair (pair detectors) — and what corpus share
    * that is. D29 answers how the detectors DISAGREE pairwise; this
    * answers what each one would touch, the number that picks the
    * stack before any pair-level comparison matters. Semantics
    * documented: "involved", not "to remove" (removal = involved −
    * clusters, the D14 keeper question).
    *
    * Exactness: every leg is exact integer counting over the shared
    * kernels (sha256 bytes, the D30 prefix key, the D3/D4 verified
    * pair relations at their production bars); the share is one
    * integer ppm floor-division.
    *
    * Scale shape: the group legs are one hash-groupBy each; the pair
    * legs are the candidate-bounded D3/D4 pipelines (re-derived by
    * bench protocol — deployments read the PairStore tables); all
    * four reduce to ONE-ROW relations joined against the broadcast
    * one-row corpus total (whitelisted BNLJ). Output is 4 rows.
    */
  def dedupYield(docs: DataFrame, n: Int, jacMicroMin: Long,
                 maxHamming: Int, prefixP: Int): DataFrame = {
    val tot = docs.agg(count(lit(1)).as("n_docs"))
    def flaggedOfGroups(groups: DataFrame, label: String): DataFrame =
      groups.filter(col("n") >= 2L)
        .agg(coalesce(sum("n"), lit(0L)).as("n_flagged"))
        .select(lit(label).as("detector"), col("n_flagged"))
    def flaggedOfPairs(pairs: DataFrame, label: String): DataFrame =
      pairs.select(col("d1").as("doc"))
        .unionByName(pairs.select(col("d2").as("doc")))
        .distinct()
        .agg(count(lit(1)).as("n_flagged"))
        .select(lit(label).as("detector"), col("n_flagged"))
    val exact = flaggedOfGroups(
      docs.groupBy(sha2(col("text"), 256)).agg(count(lit(1)).as("n")),
      "exact")
    val opener = flaggedOfGroups(
      prefixKeys(docs, prefixP).groupBy("pk")
        .agg(count(lit(1)).as("n")),
      "opener")
    val mh = flaggedOfPairs(
      minhashLshPairs(docs, n, jacMicroMin), "minhash")
    val sh = flaggedOfPairs(simhashPairs(docs, maxHamming), "simhash")
    exact.unionByName(opener).unionByName(mh).unionByName(sh)
      .crossJoin(broadcast(tot))
      .select(col("detector"), col("n_flagged"), col("n_docs"),
        expr("(1000000 * n_flagged) div n_docs").as("flagged_ppm"))
      .orderBy("detector")
  }

  /** X57: weighted sampling without replacement (Efraimidis &
    * Spirakis A-ES) — the missing third sampling mode beside X31's
    * exact-N uniform strata and X29's rate-based temperature mix: an
    * EXACT-N sample where inclusion probability is proportional to a
    * per-document weight (here its token count — "sample by mass, not
    * by headcount"). A-ES keys are u^(1/w) with u uniform; taken in
    * the log domain the key is ln(u)/w — ONE ln and ONE division, no
    * pow() (whose libm rounding differs across engines where ln's
    * does not, the X19 precedent). Top-N keys win; u is the salted
    * md5 fraction, so the draw is deterministic, reproducible, and
    * stratum-free (the X31 discipline).
    *
    * Exactness: h is a 60-bit integer; u = h/2⁶⁰ is one exact-tree
    * division; key_micro = micro(ln(u)/w) with integer w ≥ 1
    * (zero-token docs clamp to 1 — ln(u) < 0, so a zero weight would
    * be −∞); ranking ties break by doc_id.
    *
    * Scale shape: one scan projecting (hash, weight, key); the top-N
    * cut is a bounded TakeOrdered — no shuffle carries more than N
    * rows per partition.
    */
  def weightedSample(docs: DataFrame, n: Int): DataFrame =
    aesTopN(aesKeys(docs), n)

  /** The A-ES key projection — one scan, no shuffle. Factored so the
    * T21 streaming store reduces each micro-batch with the SAME kernel
    * the batch sample uses.
    */
  def aesKeys(docs: DataFrame): DataFrame = {
    val w = greatest(size(tokens(col("text"))).cast("long"), lit(1L))
    val u = greatest(md5Long(concat(lit("aes:"),
      col("doc_id").cast("string"))), lit(1L)) /
      lit(1152921504606846976.0) // 2^60, exactly representable
    parallelized(docs).select(col("doc_id"), col("source"),
      w.as("toks"), micro(log(u) / w).as("key_micro"))
  }

  /** Re-take the top-n keys over any keyed relation (the merge op —
    * top-n under (key DESC, doc_id) is an exact semilattice, the
    * X64/T13 bottom-k property mirrored).
    */
  def aesTopN(keyed: DataFrame, n: Int): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0))
      .orderBy(col("key_micro").desc, col("doc_id"))
    keyed.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= n)
      .select("rank", "doc_id", "source", "toks", "key_micro")
  }

  /** X56: language confusion census — the declared-vs-predicted
    * matrix that EVALUATES the X2 heuristic classifier against the
    * corpus's own metadata (every real pipeline runs exactly this
    * audit before trusting either side): each (declared lang,
    * predicted lang) cell with its count and row-normalized fraction.
    * Diagonal cells are recall per declared language; loud
    * off-diagonal cells say which language pair the n-gram profiles
    * cannot separate (or which source mislabels its metadata — the
    * census cannot tell you which side is wrong, only where to look).
    *
    * Exactness: counts exact integers; the row fraction is ONE IEEE
    * division, micro-floored.
    *
    * Scale shape: the classifier pass is the one corpus scan (the X2
    * compiled kernel); cells are a ≤|langs|²-row census with
    * map-side partials, totals a census-over-census aggregate.
    */
  def langConfusion(docs: DataFrame): DataFrame = {
    val pred = langId(docs).select(col("doc_id"), col("lang_pred"))
    val cells = docs.select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("lang").agg(sum("n").as("n_lang"))
    cells.join(totals, Seq("lang"))
      .select(col("lang"), col("lang_pred"), col("n"), col("n_lang"),
        micro(col("n") / col("n_lang")).as("frac_micro"))
  }

  /** Document fingerprints: content hash (sha256) + winnowing-style
    * minimum shingle hash. LEFT join keeps sub-n-token docs with a -1
    * sentinel.
    */
  def fingerprints(docs: DataFrame, n: Int): DataFrame = {
    val minSh = shingleSet(docs, n)
      .groupBy("doc_id").agg(min(md5Long(col("sh"))).as("min_shingle_hash"))
    docs.select(col("doc_id"),
        sha2(col("text").cast("binary"), 256).as("sha"))
      .join(minSh, Seq("doc_id"), "left")
      .withColumn("min_shingle_hash",
        coalesce(col("min_shingle_hash"), lit(-1L)))
  }

  // --------------------------------------------------------------- dedup

  /** Exact dedup: group by content hash, keep min doc_id. Map-side
    * partial aggregation makes this one shuffle of (hash, partial) pairs,
    * not rows.
    */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.select(sha2(col("text").cast("binary"), 256).as("fingerprint"),
        col("doc_id"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_docs"))

  /** n-gram Jaccard near-dup pairs via inverted-index join.
    *
    * Scale design: the self-join key is the shingle itself; a shingle
    * appearing in d documents contributes C(d,2) candidate pairs, so the
    * `maxDf` stop-shingle cap bounds per-key fan-out (classic suffix-
    * array/SES trick) — at 100 TB a hot shingle ("click here to") would
    * otherwise produce a quadratic key. Set sizes are computed from the
    * *unfiltered* sets so Jaccard stays unbiased.
    */
  /** The shared n-gram inverted-index pair relation: candidate doc
    * pairs with distinct-shared-shingle counts and both set sizes —
    * the common prefix of [[ngramJaccardPairs]] (symmetric metric) and
    * [[ngramContainmentPairs]] (asymmetric metric).
    */
  private def ngramPairStats(docs: DataFrame, n: Int,
                             maxDf: Long): DataFrame = {
    // hash shingles to 60-bit longs at the source: every downstream
    // shuffle/join key is 8 bytes instead of a ~30-byte string
    // (collisions at 2^-60 are negligible and the oracle mirrors the
    // same hash, so any would affect both sides identically).
    // cache(), NOT Materialize.shared: this subtree is reachable from
    // the session-memoized PairRelations DataFrame, which must stay
    // recomputable after an external unpersist — a truncated-lineage
    // checkpoint here would die on the memo's second use.
    val sh = shingleSet(docs, n)
      .select(col("doc_id"), md5Long(col("sh")).as("h")).cache()
    ngramPairStatsFrom(sh, maxDf)
  }

  /** [[ngramPairStats]] over an ALREADY-HASHED (doc_id, h) shingle
    * relation — lets callers that need BOTH blocking paths (D26) share
    * one shingle scan.
    */
  private def ngramPairStatsFrom(sh: DataFrame,
                                 maxDf: Long): DataFrame = {
    val keep = sh.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("h")
    val shf = sh.join(keep, "h")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shf.select(col("doc_id").as("d1"), col("h"))
      .join(shf.select(col("doc_id").as("d2"), col("h")), "h")
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
  }

  def ngramJaccardPairs(docs: DataFrame, n: Int, maxDf: Long,
                        jacMicroMin: Long): DataFrame =
    ngramPairStats(docs, n, maxDf)
      .withColumn("jac_micro",
        micro(col("inter") / (col("n1") + col("n2") - col("inter"))))
      .filter(col("jac_micro") >= jacMicroMin)
      .select("d1", "d2", "inter", "n1", "n2", "jac_micro")

  /** X42: per-document n-gram novelty — the fraction of a document's
    * distinct shingles appearing for the FIRST time at this doc_id
    * (ids as the arrival order — the streaming-corpus reading). The
    * curation signal between exact dedup and quality scoring: a
    * near-1 score is genuinely new content, a near-0 score is stitched
    * from already-seen fragments (boilerplate assemblies, template
    * spins) even when no single pair-level duplicate fires. The same
    * census, cut the other way, is the D13 span-excision economics —
    * how much of each NEW doc survives a seen-before filter.
    *
    * Scale shape: one shingle Exchange builds the (gram → first doc)
    * relation; the per-doc census joins gram-keyed with fan-out
    * exactly 1 (first-doc is unique per gram) and aggregates with
    * map-side partials. No pair relation, no df cap needed — nothing
    * here is quadratic.
    */
  def noveltyScores(docs: DataFrame, n: Int): DataFrame = {
    val sh = shingleSet(docs, n)
      .select(col("doc_id"), md5Long(col("sh")).as("h"))
    val first = sh.groupBy("h").agg(min("doc_id").as("first_doc"))
    sh.join(first, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        micro(col("n_novel") / col("n_grams")).as("novelty_micro"))
  }

  /** G1: damped PageRank over the verified duplication graph — graph
    * centrality as a curation signal (the web-corpus precedent:
    * Common Crawl ranks hosts by harmonic centrality/PageRank before
    * sampling). Over the near-dup pair graph high rank marks TEMPLATE
    * HUBS — documents whose content recurs across many near-copies —
    * exactly the rows a quality pass should inspect first, invisible
    * to any per-pair score.
    *
    * Determinism: rank is micro-unit INTEGER state. Each iteration
    * computes `r' = 150000 + floor(850000 · c / 10⁶)` where
    * `c = Σ_in floor(r/deg)` — every floor is a single IEEE division
    * of exact integers (magnitudes ≪ 2⁵³), and the contribution sum
    * is integer (association-free), so the whole trajectory is
    * bit-identical across engines and partitionings — the
    * [[graft.operators.SimilarityOps]] k-means discipline applied to
    * graph iteration. Isolated nodes don't exist (every node of a
    * symmetric pair graph has degree ≥ 1), so mass never dangles.
    *
    * Scale shape: the edge relation is the df-capped verified pair
    * relation (bounded by TRUE duplication, not corpus²); each of the
    * fixed `iters` rounds is one edge-keyed join + one partial-agg'd
    * Exchange over the node set — the classic distributed PageRank
    * plan, here with the degree pre-joined once so iterations reuse
    * the same edge relation. Plan depth is linear in `iters` (a
    * constant), not data-dependent — no driver loop over data.
    */
  def dupPageRank(pairs: DataFrame, iters: Int): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesD = edges.join(deg, "src").transform(Materialize.shared) // reused every round
    var ranks = deg.select(col("src").as("node"),
      lit(1000000L).as("r"))
    (1 to iters).foreach { _ =>
      val contrib = edgesD
        .join(ranks, col("src") === col("node"))
        .select(col("dst"),
          floor(col("r") / col("deg")).cast("long").as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      ranks = contrib.select(col("dst").as("node"),
        (lit(150000L) + floor(lit(850000L) * col("c") / lit(1000000.0))
          .cast("long")).as("r"))
    }
    ranks.join(deg, col("node") === col("src"))
      .select(col("node").as("doc_id"), col("deg"),
        col("r").as("rank_micro"))
  }

  /** D20: triangle census + local clustering coefficient over the
    * verified dup-pair graph — the structural readout PageRank (D19)
    * can't give: a node in many triangles sits inside a clique-like
    * duplication CLUSTER (one canonical + k near-copies of the same
    * content, all pairwise similar), while a high-degree node with few
    * triangles is a hub of unrelated partial overlaps (template/
    * boilerplate stitching) — exactly the triage a dedup operator
    * wants before choosing "keep one of the clique" vs "excise the
    * shared span" ([[exciseSpans]]).
    *
    * Counting discipline: edges arrive once each as (d1 < d2), which
    * IS an orientation by id — every triangle {a<b<c} is generated
    * exactly once, as the wedge (a,b),(a,c) closed by edge (b,c). No
    * global count-then-divide-by-3, no double counting, no
    * symmetrization explosion.
    *
    * Scale shape: wedge generation is a self-join of the df-capped
    * verified pair relation on the apex id — fan-out Σ out-deg(a)²,
    * bounded by TRUE duplication cluster sizes (the relation is df-
    * capped at candidate generation, so no corpus-sized key exists);
    * the closing test is one equi-join on the (b, c) edge key. At
    * general-graph scale the orientation would be by (degree, id)
    * instead of id — the classic compact-forward bound Σ min(deg)
    * per edge — which changes WHICH node apexes a wedge but not the
    * count; id-orientation keeps the oracle join order identical.
    * cc = 2·tri / (deg·(deg−1)) is one IEEE division of exact
    * integers, micro-floored (oracle mirrors the tree verbatim).
    *
    * Output: (doc_id, deg, n_tri, cc_micro) for every node of the
    * pair graph — the same node set as [[dupPageRank]].
    */
  def dupTriangles(pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("d1"), col("d2")).transform(Materialize.shared)
    val wedges = e.as("x").join(e.as("y"),
        col("x.d1") === col("y.d1") && col("x.d2") < col("y.d2"))
      .select(col("x.d1").as("a"), col("x.d2").as("b"),
        col("y.d2").as("c"))
    val tri = wedges
      .join(e, col("b") === col("d1") && col("c") === col("d2"))
      .select(col("a"), col("b"), col("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
    val deg = e.select(col("d1").as("doc_id"))
      .union(e.select(col("d2").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("deg"))
    deg.join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_micro",
        when(col("deg") >= 2L,
          micro(lit(2L) * col("n_tri") / (col("deg") * (col("deg") - 1L))))
          .otherwise(lit(0L)))
  }

  /** X40: cross-source duplication census — the provenance overlap
    * matrix a corpus assembler reads before merging sources: near-dup
    * pairs (the D2 inverted-index machinery and bar, verbatim) rolled
    * up per unordered source pair. The off-diagonal entries are
    * MIRRORS (the same content shipped by two providers — paying for
    * both buys nothing); the diagonal is within-source duplication
    * (the D1–D7 job). least/greatest canonicalizes the pair so
    * (src2, src7) and (src7, src2) census together on both engines.
    *
    * Scale shape: the pair relation is [[ngramJaccardPairs]] verbatim
    * (df-capped inverted index — candidates bounded by true sharing);
    * the source joins are doc_id-keyed over the pair-bounded relation
    * with columns pruned to (doc_id, source); the census is one
    * (source_a, source_b, partial) Exchange over ≤ sources² groups.
    */
  def sourceOverlap(docs: DataFrame, n: Int, maxDf: Long,
                    jacMicroMin: Long): DataFrame = {
    val pairs = ngramJaccardPairs(docs.select("doc_id", "text"), n,
      maxDf, jacMicroMin).select("d1", "d2")
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("d1"), col("source").as("s1")),
        "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("s2")),
        "d2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        when(col("source_a") === col("source_b"), 1L).otherwise(0L)
          .as("intra"))
  }

  /** Asymmetric containment near-dup pairs (Broder's containment
    * coefficient, the metric behind suffix/quote dedup): |A∩B| over
    * the SMALLER set, so a short document mostly embedded inside a
    * long one scores ~1.0 where Jaccard — diluted by the long doc's
    * unique content — stays under its dedup bar and the pair is
    * missed. `jaccard_missed` marks exactly those pairs: what this
    * operator catches that symmetric dedup cannot.
    *
    * Same inverted-index scale shape as [[ngramJaccardPairs]] (df-cap
    * before the self-join, candidates bounded by true sharing); only
    * the final metric projection differs.
    */
  def ngramContainmentPairs(docs: DataFrame, n: Int, maxDf: Long,
                            contMicroMin: Long,
                            jacMicroMin: Long): DataFrame =
    ngramPairStats(docs, n, maxDf)
      .withColumn("cont_micro",
        micro(col("inter") / least(col("n1"), col("n2"))))
      .withColumn("jac_micro",
        micro(col("inter") / (col("n1") + col("n2") - col("inter"))))
      .filter(col("cont_micro") >= contMicroMin)
      .select(col("d1"), col("d2"), col("inter"), col("n1"), col("n2"),
        col("cont_micro"), col("jac_micro"),
        (col("jac_micro") < jacMicroMin).as("jaccard_missed"))

  /** Per-doc MinHash signature as columns m0..m{seeds-1}, plus the
    * shingle-set size `n` fused into the same aggregation — over
    * pre-hashed shingles (`h0` = 60-bit md5 hash per shingle). `seeds`
    * selects the permutation count: the default 16 literal pairs are
    * the corpus tuning baked into the oracle SQL; the scale config
    * generates as many as it needs ([[Hashing.minhashSeeds]]).
    */
  def minhashSignature(hashed: DataFrame,
      seeds: Seq[(Long, Long)] = Hashing.MinhashSeeds): DataFrame = {
    val p = Hashing.MinhashP
    val hs = hashed.select(col("doc_id"), (col("h0") % p).as("h"))
    val aggs = seeds.zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * col("h") + lit(b)) % p).as(s"m$j")
    } :+ count(lit(1)).as("n")
    hs.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** The documented 100 TB MinHash configuration: 128 permutations
    * banded 16 bands × 8 rows (the corpus/test tuning is 16 perms,
    * 4×4 — same [[Banding]] join, different dial settings).
    *
    * S-curve math (a pair with Jaccard J collides per band w.p. Jʳ;
    * any-of-B recall 1 − (1 − Jʳ)ᴮ; the threshold sits at
    * J* ≈ (1/B)^(1/r)):
    *  - corpus tuning r=4, B=4: J* ≈ 0.71; catches J = 0.8 w.p. 0.88,
    *    J = 0.85 w.p. 0.95 — and lets a background J = 0.3 pair
    *    through w.p. 3.2%, harmless at 5k docs.
    *  - scale config r=8, B=16: SAME threshold (J* ≈ 0.71) but twice
    *    the slope — J = 0.8 w.p. 0.95, J = 0.85 w.p. 0.99, while the
    *    J = 0.3 background collapses to 0.1% (30× fewer junk
    *    candidates). Doubling r is the dial that crushes the
    *    quadratic B·n²·E[J_bg^r] candidate term as n grows; B rises to
    *    hold recall at the threshold. ScaleProbe measures the exact
    *    replica-candidate identity for this config.
    */
  val ScaleMinhashBands = 16
  val ScaleMinhashRows = 8

  /** MinHash LSH candidate pairs over pre-hashed shingles, signatures
    * and set sizes attached — the [[Banding]] join. The band hash is a
    * base-31 polynomial of the band's rows: kept literally for r ≤ 4
    * (it is mirrored in the q_dedup_minhash oracle SQL and stays below
    * 2⁴⁶), reduced mod p per step for wider bands (r = 8 would pass
    * 2⁶³; the reduction only re-buckets, ANSI-safely — wider bands are
    * probe configs with no oracle contract).
    */
  def minhashCandidates(hashed: DataFrame, nBands: Int, rowsPerBand: Int,
      seeds: Seq[(Long, Long)] = Hashing.MinhashSeeds): DataFrame = {
    require(seeds.length >= nBands * rowsPerBand,
      s"need ${nBands * rowsPerBand} permutations, got ${seeds.length}")
    val sig = array(seeds.indices.map(j => col(s"m$j")): _*)
    val withSig = minhashSignature(hashed, seeds)
      .select(col("doc_id"), sig.as("sig"), col("n"))
    val step: (Column, Column) => Column =
      if (rowsPerBand <= 4) (acc, m) => acc * lit(31L) + m
      else (acc, m) => (acc * lit(31L) + m) % lit(Hashing.MinhashP)
    val bandVals = (0 until nBands).map { b =>
      (0 until rowsPerBand)
        .map(j => element_at(col("sig"), rowsPerBand * b + j + 1))
        .reduceLeft(step)
    }
    // signature AND set size ride through the band join: no joins back
    // to per-doc tables afterwards — only the intersection count needs
    // another pass
    Banding.bandedCandidates(withSig, "doc_id", bandVals,
      payload = Seq("sig", "n"))
  }

  /** MinHash + banded LSH near-dup detection, verified.
    *
    * minhashes → bands × rows ([[ScaleMinhashBands]] for the parameter
    * math; defaults are the corpus tuning); docs sharing any band
    * bucket are candidates; candidates are then verified with the
    * exact Jaccard from the shingle sets. Candidate generation is a
    * join on (band, band_hash) — tiny buckets, no O(n²) anywhere;
    * verification touches only candidate pairs.
    */
  /** The threshold-free MinHash candidate stream with BOTH the
    * signature estimate (n_match of `seeds.length` components) and the
    * verified true Jaccard — the shared prefix of [[minhashLshPairs]]
    * (which applies the dedup bar) and [[minhashCalibration]] (which
    * audits the estimator against the truth).
    */
  private def minhashScoredCandidates(docs: DataFrame, n: Int,
      nBands: Int, rowsPerBand: Int,
      seeds: Seq[(Long, Long)]): DataFrame = {
    // one md5 pass; the cached working set and every join key are longs
    val sh = shingleSet(docs, n)
      .select(col("doc_id"), md5Long(col("sh")).as("h0")).transform(Materialize.shared)
    minhashScoredFrom(sh, nBands, rowsPerBand, seeds)
  }

  /** [[minhashScoredCandidates]] over an ALREADY-HASHED (doc_id, h0)
    * shingle relation — lets callers that need BOTH blocking paths
    * (D26) share one shingle scan.
    */
  private[operators] def minhashScoredFrom(sh: DataFrame,
      nBands: Int, rowsPerBand: Int,
      seeds: Seq[(Long, Long)]): DataFrame = {
    val cand = minhashCandidates(sh, nBands, rowsPerBand, seeds)
      .select(col("d1"), col("d2"), col("sig1"), col("sig2"),
        col("n1"), col("n2"))
    // zip_with over the signatures on candidate rows only (~0.01% of
    // input)
    val nMatch = aggregate(
      zip_with(col("sig1"), col("sig2"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
    val est = cand.select(col("d1"), col("d2"), col("n1"), col("n2"),
      nMatch.as("n_match"))
    val inter = cand
      .join(sh.select(col("doc_id").as("d1"), col("h0")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("h0")), Seq("d2", "h0"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    est
      .join(inter, Seq("d1", "d2"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("jac_micro",
        micro(col("inter") / (col("n1") + col("n2") - col("inter"))))
  }

  /** Candidate-similarity histogram — the threshold-sensitivity curve
    * behind the dedup bar: every df-capped candidate pair bucketed by
    * its exact Jaccard (5 %-wide buckets), with pair counts and the
    * cumulative count from the top. Reading the curve answers "how
    * many more pairs would a 0.75 bar admit than 0.8?" with data
    * before anyone re-runs a dedup sweep. Candidates only (pairs
    * sharing ≥ 1 df-capped shingle) — below-candidate pairs have
    * Jaccard ≈ 0 by construction and would swamp the histogram.
    *
    * Scale: the [[ngramPairStats]] machinery verbatim, then one
    * (bucket, partial) Exchange over ≤ 21 groups and a window across
    * those 21 rows — nothing pair-bounded ever re-shuffles.
    */
  def jaccardHistogram(docs: DataFrame, n: Int, maxDf: Long): DataFrame = {
    val bucket = (floor(micro(
      col("inter") / (col("n1") + col("n2") - col("inter"))) /
      lit(50000L)) * 50000L).as("bucket_lo_micro")
    val census = ngramPairStats(docs, n, maxDf)
      .select(bucket)
      .groupBy("bucket_lo_micro")
      .agg(count(lit(1)).as("n_pairs"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket_lo_micro").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    census.select(col("bucket_lo_micro"), col("n_pairs"),
      sum("n_pairs").over(w).as("n_pairs_at_or_above"))
  }

  def minhashLshPairs(docs: DataFrame, n: Int, jacMicroMin: Long,
      nBands: Int = 4, rowsPerBand: Int = 4,
      seeds: Seq[(Long, Long)] = Hashing.MinhashSeeds): DataFrame =
    minhashScoredCandidates(docs, n, nBands, rowsPerBand, seeds)
      .filter(col("jac_micro") >= jacMicroMin)
      .select("d1", "d2", "n_match", "inter", "jac_micro")

  /** X67: lexicon rank-drift census — the RANK-order drift lens next
    * to X44's value-distribution KS and X51's decile PSI: take the
    * corpus-wide top-V terms, rank them inside each half of the corpus
    * (doc_id parity — the deterministic interleaved split), and
    * report each term's rank displacement plus Spearman's footrule
    * Σ|r₁ − r₂| carried on every row. Frequency drift that preserves
    * RANKS (uniform growth) reads footrule 0 however much counts
    * move; a lexicon reshuffle (topic shift, new template flooding
    * specific terms) moves ranks long before marginal distributions
    * trip KS — the complementary alarm.
    *
    * Exactness: counts exact integers (absent-in-half terms count 0);
    * ranks are row_number under (count DESC, token) — fully
    * tie-broken; footrule an integer sum. No doubles anywhere.
    *
    * Scale shape: one token-census Exchange (vocab-bounded, map-side
    * combined) with the half key riding the same aggregation; the
    * top-V cut is census-sized; ranking windows run over 2·V rows.
    */
  def rankDriftCensus(docs: DataFrame, topV: Int): DataFrame = {
    val tok = docs.select((col("doc_id") % 2).as("half"),
      explode(tokens(col("text"))).as("token"))
    val cen = tok.groupBy("token", "half")
      .agg(count(lit(1)).as("c"))
    val top = cen.groupBy("token").agg(sum("c").as("ct"))
      .orderBy(col("ct").desc, col("token")).limit(topV)
      .select("token")
    def halfRank(h: Int, cName: String, rName: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0))
        .orderBy(col(cName).desc, col("token"))
      top.join(cen.filter(col("half") === h)
            .select(col("token"), col("c").as(cName)),
          Seq("token"), "left")
        .withColumn(cName, coalesce(col(cName), lit(0L)))
        .withColumn(rName, row_number().over(w).cast("long"))
    }
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    halfRank(0, "c0", "r0").join(halfRank(1, "c1", "r1"), "token")
      .withColumn("dr", abs(col("r0") - col("r1")))
      .withColumn("footrule", sum("dr").over(wAll))
      .select("token", "c0", "c1", "r0", "r1", "dr", "footrule")
  }

  /** D26: measured LSH blocking recall — D24's auto-tuner picks the
    * banding config from S-curve THEORY plus the Jaccard histogram;
    * this measures what the production config actually catches: of
    * all verified above-bar pairs reachable through the df-capped
    * inverted index (the D2 truth relation every downstream dedup
    * stage consumes), what fraction did the MinHash bands block
    * together (recall), and how many above-bar pairs did the bands
    * find that the df-cap had HIDDEN from the inverted index
    * (extra — banding does not df-cap, so a pair whose shared
    * shingles are all boilerplate-capped can still collide; a nonzero
    * extra share is the measured cost of the df-cap, not an LSH
    * error). Both sides verify at the SAME bar, so the comparison is
    * blocking-vs-blocking, not threshold-vs-threshold.
    *
    * Scale shape: both pair relations are candidate-bounded by
    * construction (df-capped buckets / LSH bands — never all-pairs);
    * the intersection joins two pair lists bounded by true
    * duplication; the output is one row.
    */
  def lshRecallAudit(docs: DataFrame, n: Int, maxDf: Long,
                     jacMicroMin: Long): DataFrame = {
    // ONE shingle scan + md5 pass feeds BOTH blocking paths
    val sh = shingleSet(docs, n)
      .select(col("doc_id"), md5Long(col("sh")).as("h0")).transform(Materialize.shared)
    val truth = ngramPairStatsFrom(
        sh.select(col("doc_id"), col("h0").as("h")), maxDf)
      .withColumn("jac_micro",
        micro(col("inter") / (col("n1") + col("n2") - col("inter"))))
      .filter(col("jac_micro") >= jacMicroMin)
      .select("d1", "d2")
    val lsh = minhashScoredFrom(sh, 4, 4, Hashing.MinhashSeeds)
      .filter(col("jac_micro") >= jacMicroMin)
      .select("d1", "d2")
    val nT = truth.agg(count(lit(1)).as("n_truth"))
    val nL = lsh.agg(count(lit(1)).as("n_lsh"))
    val nH = truth.join(lsh, Seq("d1", "d2"))
      .agg(count(lit(1)).as("n_hit"))
    nT.crossJoin(broadcast(nL)).crossJoin(broadcast(nH))
      .select(col("n_truth"), col("n_lsh"), col("n_hit"),
        expr("(1000000 * n_hit) div greatest(n_truth, 1)")
          .as("recall_ppm"),
        expr("(1000000 * (n_lsh - n_hit)) div greatest(n_lsh, 1)")
          .as("extra_ppm"))
  }

  /** D25: LSH-blocked EDIT-DISTANCE dedup — the character-level
    * verifier the set-based family can't provide. Every Jaccard-family
    * verdict (D2/D3/D15) is ORDER-BLIND: two docs with the same token
    * multiset in different order read Jaccard 1.0; Levenshtein reads
    * the reorder as edits. Conversely, record-linkage-grade edits
    * (typos, field swaps, truncations) move edit distance by exactly
    * the edit size while barely denting a 5-gram shingle set. Blocking
    * stays the production LSH (same [[minhashCandidates]] join — the
    * realistic pipeline shape: candidates from MinHash bands,
    * verification by the expensive exact measure on candidates ONLY);
    * verification is `levenshtein` over the first `capChars`
    * characters — the documented O(cap²)-per-pair cost dial that makes
    * the verifier affordable at any document length (both engines'
    * levenshtein implement the standard character-level DP, parity
    * probed cross-engine).
    *
    * Output: per surviving pair, both capped lengths, the edit
    * distance, and rel_micro = (10⁶·dist) div max(len) — 0 identical,
    * 10⁶ fully-rewritten.
    *
    * Scale shape: candidates are LSH-bounded (never all-pairs); the
    * text prefix join touches candidate docs only; the DP cost is
    * capChars²-bounded per pair regardless of document size.
    */
  def editDistancePairs(docs: DataFrame, n: Int, capChars: Int,
      relMicroMax: Long, nBands: Int = 4, rowsPerBand: Int = 4,
      seeds: Seq[(Long, Long)] = Hashing.MinhashSeeds): DataFrame = {
    val sh = shingleSet(docs, n)
      .select(col("doc_id"), md5Long(col("sh")).as("h0"))
    val cand = minhashCandidates(sh, nBands, rowsPerBand, seeds)
      .select("d1", "d2")
    val pre = docs.select(col("doc_id"),
      substring(col("text"), 1, capChars).as("p"))
    cand
      .join(pre.select(col("doc_id").as("d1"), col("p").as("p1")), "d1")
      .join(pre.select(col("doc_id").as("d2"), col("p").as("p2")), "d2")
      .select(col("d1"), col("d2"),
        length(col("p1")).cast("long").as("len1"),
        length(col("p2")).cast("long").as("len2"),
        levenshtein(col("p1"), col("p2")).cast("long").as("edit_dist"))
      .withColumn("rel_micro",
        expr("(1000000 * edit_dist) div greatest(len1, len2, 1)"))
      .filter(col("rel_micro") <= relMicroMax)
  }

  /** MinHash estimator calibration — the dedup analogue of the ANN
    * recall curve: over the PRODUCTION candidate stream (same banding,
    * no similarity bar), group pairs by the signature estimate
    * (n_match of `seeds.length` components) and report how the truth
    * distributes at each estimate level — pair count, mean verified
    * Jaccard, and mean absolute estimator error. The table answers
    * "can I trust k-of-16 as a dedup verdict, or must I verify?" with
    * measured numbers instead of the binomial-theory answer.
    *
    * Integer-exact: the estimate is micro(n_match / seeds), truth is
    * the verified micro Jaccard, both means are floor(sum / count) —
    * no doubles cross the aggregation.
    *
    * Scale shape: everything rides [[minhashScoredCandidates]] (LSH-
    * bounded candidates, verified by one intersection join); the
    * census is one (n_match, partial) Exchange over ≤ seeds+1 groups.
    */
  def minhashCalibration(docs: DataFrame, n: Int,
      nBands: Int = 4, rowsPerBand: Int = 4,
      seeds: Seq[(Long, Long)] = Hashing.MinhashSeeds): DataFrame = {
    val estMicro = micro(col("n_match") / lit(seeds.length))
    minhashScoredCandidates(docs, n, nBands, rowsPerBand, seeds)
      .select(col("n_match"), col("jac_micro"),
        abs(estMicro - col("jac_micro")).as("abs_err"))
      .groupBy("n_match")
      .agg(count(lit(1)).as("n_pairs"),
        floor(sum("jac_micro") / count(lit(1))).as("mean_jac_micro"),
        floor(sum("abs_err") / count(lit(1))).as("mean_abs_err_micro"))
  }

  /** TF-IDF top terms per document. tf and df are exact integer
    * aggregates; only the final `tf * ln(N/df)` touches doubles, and the
    * ranking key is the micro-quantized score (+ term tiebreak), so
    * top-k selection is deterministic cross-engine. df comes from one
    * extra aggregation over the same exploded tokens — two shuffles
    * total, both carrying (term, partial-count) pairs.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val toks = parallelized(docs).select(col("doc_id"),
      explode(tokens(col("text"))).as("t"))
    // tf rows are distinct (doc, term) pairs, so df folds out of tf —
    // tokens are exploded and hashed exactly once
    // cache, not an eager checkpoint: the two consumers share one
    // action, so exchange reuse already computes tf once — the eager
    // materialization job would be pure overhead here (r16 measured)
    val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf")).cache()
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "t").crossJoin(broadcast(n))
      .withColumn("tfidf_micro",
        micro(col("tf") * log(col("n_docs") / col("df"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf_micro").desc, col("t"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("rn").cast("long").as("rn"),
        col("t").as("term"), col("tf"), col("df"), col("tfidf_micro"))
  }

  /** Overlapping document chunking (LLM training prep): fixed-length
    * character windows every `stride` chars (overlap = chunkLen-stride).
    * One fused codegen pass per document
    * ([[graft.functions.ChunkStats]] — the expression tower evaluated
    * each chunk's substring THREE times through interpreted lambdas:
    * sha, length, token count; VERDICT r15 item 7) + explode; zero
    * shuffles, and the chunk count derives from exact integer floor
    * division on both engines. TextKernelSpec pins kernel ≡ the
    * expression formulation including the empty-document edge
    * (nc = (0−1) div stride + 1 = 1: one empty chunk, one empty token).
    */
  def chunkDocs(docs: DataFrame, chunkLen: Int, stride: Int): DataFrame = {
    val chunks = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.ChunkStats(
        org.apache.spark.sql.GraftSqlBridge.expression(col("text")),
        chunkLen, stride))
    docs.select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.chunk_sha").as("chunk_sha"),
        col("c.chunk_chars").as("chunk_chars"),
        col("c.chunk_tokens").as("chunk_tokens"))
  }

  /** Connected components of the near-dup pair graph: dedup semantics
    * demand one keeper per transitive CLUSTER — pairs (1,2),(2,3) are
    * one duplicate group, not two independent decisions. Iterative
    * min-label propagation over the (tiny) candidate-pair graph,
    * driver-coordinated like every Spark iterative algorithm; the
    * distributed path uses pointer jumping so rounds grow with
    * log(diameter), not diameter.
    *
    * Returns (doc_id, component) for every doc appearing in a pair,
    * component = minimum doc_id reachable (so keepers are the rows with
    * component == doc_id).
    */
  /** D27: dedup-cluster purity — the CHAINING detector for
    * transitive-closure dedup. Connected components merge by
    * REACHABILITY, so two documents can share a cluster while sharing
    * almost nothing (A≈B≥bar, B≈C≥bar, A~C ≈ 2·bar−1 — and lower down
    * longer chains); a keep-one-per-cluster excision policy then
    * silently drops non-duplicates. This audits every cluster with the
    * STAR form: exact n-gram Jaccard from the cluster representative
    * (the min-doc_id component label) to each member — linear in
    * cluster size where the full pairwise audit is quadratic, and the
    * star from the keeper is exactly the question excision asks ("how
    * similar is what I kept to what I dropped"). min_star flags the
    * chained clusters; mean_star summarizes. Jaccard uses UNFILTERED
    * shingle sets (the df cap is a candidate-generation device, not
    * part of the metric — the [[ngramJaccardPairs]] discipline).
    *
    * Exactness: inter/sizes exact integers; per-member jac micro-
    * floored (one division); the cluster mean is an INTEGER division
    * of the micro sum (never a double crossing an aggregation).
    *
    * Scale shape: components over the candidate-bounded pair graph
    * (the D7 machinery); the member- and representative-shingle
    * relations are equi-joins on (component, h) whose per-key fan-out
    * is bounded by cluster size; everything aggregates to one row per
    * cluster.
    */
  def clusterPurity(docs: DataFrame, pairs: DataFrame,
                    n: Int): DataFrame =
    clusterPurityFrom(docs, connectedComponents(pairs), n)

  /** D27 over a PRECOMPUTED component relation (doc_id, component) —
    * the store-backed path ([[graft.sources.PairStore]]): at 100 TB
    * the pair graph is computed once and audited many times, so the
    * audit reads the materialized cluster table instead of re-running
    * the candidate pipeline + union-find per query. Output ≡ the
    * in-query path under the same pair relation (spec-pinned).
    */
  def clusterPurityFrom(docs: DataFrame, cc: DataFrame,
                        n: Int): DataFrame = {
    val sh = shingleSet(docs, n)
      .select(col("doc_id"), md5Long(col("sh")).as("h"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val members = cc.filter(col("doc_id") =!= col("component"))
    val memSh = members.join(sh, Seq("doc_id"))
    val repSh = cc.select("component").distinct()
      .join(sh.select(col("doc_id").as("component"), col("h")),
        Seq("component"))
    val inter = memSh.join(repSh, Seq("component", "h"))
      .groupBy("component", "doc_id").agg(count(lit(1)).as("inter"))
    val jm = micro(col("inter") /
      (col("n_m") + col("n_r") - col("inter")))
    members
      .join(inter, Seq("component", "doc_id"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .join(sizes.select(col("doc_id"), col("sz").as("n_m")),
        Seq("doc_id"))
      .join(sizes.select(col("doc_id").as("component"),
        col("sz").as("n_r")), Seq("component"))
      .select(col("component"), jm.as("jm"))
      .groupBy("component")
      .agg((count(lit(1)) + 1).as("n_docs"),
        min("jm").as("min_star_micro"),
        expr("sum(jm) div count(1)").as("mean_star_micro"))
      .orderBy("component")
  }

  /** D28: cluster chain-depth census — the STRUCTURAL companion of
    * D27's purity audit: D27 measures how dissimilar a cluster's
    * members are from its keeper, this measures WHY — BFS eccentricity
    * of the representative over the verified pair graph. A star-shaped
    * cluster (every member directly paired with the rep) has ecc 1
    * however large it is; ecc ≥ 2 means members joined by TRANSITIVITY
    * only, and each extra hop compounds the worst-case similarity
    * decay (at bar b, a depth-d member can sit as low as d·b − (d−1)
    * from the keeper) — D27's min_star tells you it happened, ecc
    * tells you the mechanism and how far the chain ran.
    *
    * Determinism: a FIXED `maxDepth` frontier-expansion rounds (no
    * data-dependent stop — rounds past the eccentricity add empty
    * frontiers), BFS depth is a shortest-path property (min over
    * paths — order-free); members deeper than the cap surface as
    * ecc = maxDepth + 1 with n_beyond counting them (loud, never
    * silently truncated).
    *
    * Scale shape: `maxDepth` rounds of (frontier ⋈ edges) equi-joins
    * over the candidate-bounded pair graph, each round
    * `localCheckpoint`ed (the ccDistributed discipline — flat
    * lineage); frontier rows are (doc, depth) — component-bounded;
    * one (component) aggregate to a per-cluster row.
    */
  def clusterDepthCensus(pairs: DataFrame,
                         maxDepth: Int = 8): DataFrame =
    clusterDepthFrom(connectedComponents(pairs).localCheckpoint(),
      pairs, maxDepth)

  /** D28 over a PRECOMPUTED component relation — the store-backed
    * path (the [[clusterPurityFrom]] contract): components and the
    * verified pair list are read from their persisted tables; only
    * the BFS rounds run per audit.
    */
  def clusterDepthFrom(cc: DataFrame, pairs: DataFrame,
                       maxDepth: Int = 8): DataFrame = {
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .unionAll(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .distinct().localCheckpoint()
    var frontier = cc.select(col("component").as("doc_id")).distinct()
      .withColumn("depth", lit(0L)).localCheckpoint()
    var dist = frontier
    var d = 1
    var advancing = true
    while (d <= maxDepth && advancing) {
      // expand the FRONTIER only (textbook BFS — settled nodes never
      // contribute new neighbors); the empty-frontier early exit is
      // result-identical (further rounds add nothing) so replay
      // determinism is unaffected
      val nxt = frontier
        .join(edges.withColumnRenamed("a", "doc_id"), Seq("doc_id"))
        .select(col("b").as("doc_id")).distinct()
        .join(dist.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .withColumn("depth", lit(d.toLong))
        .localCheckpoint()
      advancing = nxt.count() > 0
      if (advancing) dist = dist.unionByName(nxt).localCheckpoint()
      frontier = nxt
      d += 1
    }
    cc.join(dist, Seq("doc_id"), "left")
      .groupBy("component")
      .agg(count(lit(1)).as("n_docs"),
        max(coalesce(col("depth"), lit(maxDepth + 1L))).as("ecc"),
        sum(when(col("depth").isNull, 1L).otherwise(0L))
          .as("n_beyond"))
      .orderBy("component")
  }

  def connectedComponents(pairs: DataFrame,
                          driverMaxPairs: Long = 1L << 22): DataFrame = {
    val spark = pairs.sparkSession
    // cache(), DELIBERATELY not Materialize.shared: (1) the count()
    // materializes the cache before the single downstream consumer, so
    // the racy-concurrent-fill problem Materialize.shared exists for
    // does not arise here; (2) this cache is reachable from streaming
    // foreachBatch loops (IncrementalClusters/IncrementalCuration) that
    // APPEND to the catalog tables the pair relation reads and re-read
    // them next batch from the PARENT session — enrolling the plan in
    // the shared CacheManager lets the clone-session write's
    // refreshByPath refresh the parent-cached file index in place
    // (r16 adjudication: swapping this for an eager localCheckpoint
    // made every post-append store read serve the stale EMPTY listing
    // and IncrementalClustersSpec failed store≡batch; processBatch now
    // also refreshes explicitly, but the cache stays the belt to that
    // suspender).
    val edgesDf = pairs.select(col("d1"), col("d2")).cache()
    val n = edgesDf.count()
    if (n <= driverMaxPairs) {
      // The candidate-pair graph is orders of magnitude smaller than the
      // corpus (it exists precisely because the LSH/inverted-index stage
      // pruned it); union-find on the driver is O(n α) with ZERO extra
      // jobs, vs diameter-many join rounds. Collecting PAIRS is not
      // collecting data — 4M pairs ≈ 64 MB.
      val edges = edgesDf.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != r) {
          val nx = parent(c); parent(c) = r; c = nx
        }
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          // min-id root => component is the minimum reachable doc_id
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val rows = parent.keys.toSeq.sorted.map(d => (d, find(d)))
      import spark.implicits._
      rows.toDF("doc_id", "component")
    } else {
      connectedComponentsDistributed(edgesDf)
    }
  }

  /** Distributed min-label propagation with pointer jumping — the path
    * for pair graphs too large to union-find on the driver.
    *
    * Hardening for deep components at scale:
    *  - each round ALSO adopts the current label of the node's own label
    *    ("pointer jumping" — a label is itself a node id in the same
    *    component), collapsing chains in O(log diameter) rounds instead
    *    of O(diameter);
    *  - every round is `localCheckpoint`ed: the round's result is
    *    materialized once and its lineage truncated, so plans don't grow
    *    unboundedly across iterations and no round re-runs its
    *    predecessors;
    *  - convergence is a changed-label count over the just-materialized
    *    blocks (the `old` column rides along) — no extra join pipeline
    *    re-execution for the test;
    *  - a `maxRounds` cap turns a non-converging run (impossible for
    *    monotone min-label, but cheap insurance against a planner bug)
    *    into a loud failure instead of an infinite loop.
    */
  private[operators] def connectedComponentsDistributed(
      pairs: DataFrame, maxRounds: Int = 50): DataFrame =
    ccDistributed(pairs, maxRounds)._1

  /** Returns (labels, rounds) — rounds exposed so tests can pin the
    * O(log diameter) convergence of the pointer-jumping formulation.
    */
  private[graft] def ccDistributed(
      pairs: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .unionAll(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("component", col("doc_id")).localCheckpoint()
    var rounds = 0
    var changed = 1L
    while (changed > 0) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"connected components did not converge in $maxRounds rounds")
      // min label over neighbors (one shuffle, map-side partial min)
      val prop = edges
        .join(labels.withColumnRenamed("doc_id", "a"), "a")
        .groupBy(col("b").as("doc_id"))
        .agg(min("component").as("nbr_min"))
      val stepped = labels.join(prop, Seq("doc_id"), "left")
        .select(col("doc_id"), col("component").as("old"),
          least(col("component"),
            coalesce(col("nbr_min"), col("component"))).as("component"))
        .localCheckpoint()
      // pointer jumping: component ids are node ids of the same
      // component, so the node adopts its label's JUST-stepped label —
      // known label distance doubles every round
      val jumped = stepped.join(
          stepped.select(col("doc_id").as("component"),
            col("component").as("comp_label")),
          Seq("component"), "left")
        .select(col("doc_id"), col("old"),
          least(col("component"),
            coalesce(col("comp_label"), col("component"))).as("component"))
      val updated = jumped.localCheckpoint()
      changed = updated.filter(col("component") =!= col("old")).count()
      labels = updated.select("doc_id", "component")
      rounds += 1
    }
    (labels, rounds)
  }

  /** The curation pipeline — what this operator family exists FOR,
    * composed into one declarative plan: language-ID + quality scoring
    * + near-dup removal (keep the lower doc_id of each pair), then
    * per-language corpus stats of what survives. All of it is one
    * Catalyst plan: the optimizer pushes the quality filter below the
    * joins and the anti-join against the (tiny) drop set broadcasts.
    */
  def curate(docs: DataFrame, n: Int, maxDf: Long, dupJacMin: Long,
             qualityMicroMin: Long,
             pairs: Option[DataFrame] = None): DataFrame = {
    val stats = tokenStats(docs).select("doc_id", "n_tokens",
      "quality_micro")
    val lang = langId(docs).select("doc_id", "lang_pred")
    // callers holding a shared pair relation (see [[PairRelations]])
    // pass it in; default stays self-contained
    val drops = pairs
      .getOrElse(ngramJaccardPairs(docs, n, maxDf, dupJacMin))
      .select(col("d2").as("doc_id")).distinct()
    stats.join(lang, "doc_id")
      .join(drops, Seq("doc_id"), "left_anti")
      .filter(col("quality_micro") >= qualityMicroMin)
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        floor(sum(col("quality_micro")) / count(lit(1))).cast("long")
          .as("avg_quality_micro"))
  }

  /** X80: the curation WATERFALL — the per-stage drop-attribution
    * table every data team publishes next to a release (raw →
    * quality gate → near-dup dedup, per source): [[curate]] DECIDES
    * what survives and reports only the survivors; this reports WHERE
    * everything else went, in pipeline order — the number that tells
    * you whether a shrinking corpus lost mass to a mis-tuned quality
    * bar or to genuine duplication, per source. Sequential
    * attribution is the contract: a doc that is both low-quality AND
    * a dup target counts against the QUALITY stage (the first gate it
    * failed), exactly like the pipeline that would never have paid
    * its dedup candidate generation; the drop relation itself derives
    * from the FULL corpus (dedup runs before gating in this engine's
    * [[curate]], so the pair relation is shared verbatim).
    *
    * Output per source: raw/quality/final doc and token masses, the
    * per-stage doc drops, and doc/token retention in ppm.
    *
    * Scale shape: the per-doc stage flags are one quality projection
    * plus one left join against the (distinct dup-target) relation;
    * ONE (source) aggregate with conditional partial sums carries the
    * whole table — no per-stage re-scans.
    */
  def curationWaterfall(docs: DataFrame, n: Int, maxDf: Long,
                        dupJacMin: Long, qualityMicroMin: Long,
                        pairs: Option[DataFrame] = None): DataFrame = {
    val stats = docs.select(col("doc_id"), col("source"))
      .join(tokenStats(docs).select("doc_id", "n_tokens",
        "quality_micro"), "doc_id")
    curationWaterfallFrom(stats,
      pairs.getOrElse(ngramJaccardPairs(docs, n, maxDf, dupJacMin))
        .select(col("d2").as("doc_id")),
      qualityMicroMin)
  }

  /** The waterfall's census stage over an already-materialized per-doc
    * stats relation `stats` (doc_id, source, n_tokens, quality_micro)
    * and dup-target doc relation — factored (T32) so the incremental
    * pipeline's serving path ([[graft.sources.DocStatsStore]] +
    * persisted pairs) runs the IDENTICAL statistics stage as the
    * self-contained query: at 100 TB the served refresh reads two
    * compact stores and never re-scans corpus text.
    */
  def curationWaterfallFrom(stats: DataFrame, dupDocs: DataFrame,
                            qualityMicroMin: Long): DataFrame = {
    val drops = dupDocs.select(col("doc_id")).distinct()
      .withColumn("is_dup", lit(true))
    val flags = stats
      .withColumn("q_pass", col("quality_micro") >= qualityMicroMin)
      .join(drops, Seq("doc_id"), "left")
      .withColumn("f_pass", col("q_pass") && col("is_dup").isNull)
    flags.groupBy("source")
      .agg(count(lit(1)).as("n_raw"),
        sum("n_tokens").as("tokens_raw"),
        sum(when(col("q_pass"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("q_pass"), col("n_tokens")).otherwise(0L))
          .as("tokens_quality"),
        sum(when(col("f_pass"), 1L).otherwise(0L)).as("n_final"),
        sum(when(col("f_pass"), col("n_tokens")).otherwise(0L))
          .as("tokens_final"))
      .select(col("source"), col("n_raw"), col("tokens_raw"),
        col("n_quality"), col("tokens_quality"), col("n_final"),
        col("tokens_final"),
        (col("n_raw") - col("n_quality")).as("drop_quality"),
        (col("n_quality") - col("n_final")).as("drop_dedup"),
        expr("(1000000 * n_final) div greatest(n_raw, 1)")
          .as("doc_retention_ppm"),
        expr("(1000000 * tokens_final) div greatest(tokens_raw, 1)")
          .as("token_retention_ppm"))
      .orderBy("source")
  }

  /** Corpus card — the per-source datasheet a dataset release ships
    * (docs, tokens, exact-duplicate fraction, mean quality, dominant
    * language), composed from this engine's own per-doc stages
    * ([[tokenStats]], [[langId]], the exact-dedup content hash). The
    * capstone companion of [[curate]]: curate DECIDES what survives,
    * the card DESCRIBES what a corpus contains.
    *
    * Scale shape: three per-doc projections joined on doc_id (Catalyst
    * pushes all of it below the aggregations), ONE source-keyed
    * aggregation (count-distinct of the content hash is the standard
    * two-phase expansion), and the dominant-language argmax runs on the
    * (source × language)-sized count table under a PARTITIONED window.
    */
  def corpusCard(docs: DataFrame): DataFrame =
    corpusCardFrom(docStats(docs))

  /** The per-doc stats relation BOTH release-note surfaces read
    * (doc_id, source, sha, n_tokens, quality_micro, lang_pred) — one
    * text scan feeding the card's aggregate and the waterfall's
    * quality flags; persisted per increment by
    * [[graft.sources.DocStatsStore]] (a doc's stats are a pure
    * function of its text, so the relation is append-only and
    * replay-invariant).
    */
  def docStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        sha2(col("text").cast("binary"), 256).as("sha"))
      .join(tokenStats(docs).select("doc_id", "n_tokens",
        "quality_micro"), "doc_id")
      .join(langId(docs).select("doc_id", "lang_pred"), "doc_id")

  /** The card's statistics stage over an already-materialized
    * [[docStats]] relation — factored (T32) for the store-served
    * refresh, same shared-stage discipline as
    * [[curationWaterfallFrom]].
    */
  def corpusCardFrom(perDoc: DataFrame): DataFrame = {
    val agg = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("sha")).as("n_distinct_docs"),
      sum("n_tokens").as("total_tokens"),
      floor(sum(col("quality_micro")) / count(lit(1))).cast("long")
        .as("avg_quality_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("c").desc, col("lang_pred"))
    val top = perDoc.groupBy("source", "lang_pred")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang_pred").as("top_lang"))
    agg.join(top, "source")
      .select(col("source"), col("n_docs"), col("n_distinct_docs"),
        micro((col("n_docs") - col("n_distinct_docs")) / col("n_docs"))
          .as("dup_micro"),
        col("total_tokens"), col("avg_quality_micro"), col("top_lang"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD'03) — the
    * rolling-hash fingerprint family: a polynomial rolling hash over
    * every k-char gram, then the minimum hash of each w-window of
    * consecutive gram hashes, deduplicated. Guarantees any shared
    * substring of length ≥ k+w−1 produces a shared fingerprint, with
    * ~2/(w+1) selection density — the MOSS-style local fingerprint that
    * complements the global min-shingle hash in [[fingerprints]].
    *
    * All integer math (base 31, modulus 2²⁵ so products stay in int32
    * range for the oracle), expression-only, zero shuffles.
    */
  val WinnowMod = 33554432L // 1 << 25

  def winnowFingerprints(docs: DataFrame, k: Int, w: Int): DataFrame = {
    // native expression, not HOFs: a transform/aggregate tower would be
    // interpreted per char per gram (measured 37 s at sf0.01); the
    // compiled loop in [[graft.functions.WinnowFingerprints]] is the
    // same integer math in milliseconds, inside whole-stage codegen
    val fps = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.WinnowFingerprints(
        org.apache.spark.sql.GraftSqlBridge.expression(col("text")),
        k, w, WinnowMod))
    // parallelized: the kernel is CPU-dense per row, and a small hot
    // table arrives as one parquet split — the shingleSet discipline
    // (r16 A/B: q_eval_gate 1.7 s with vs 4.7-5.4 s without)
    parallelized(docs).select(col("doc_id"),
      explode(fps).as("fingerprint"))
  }

  /** Modulus for [[substringMatches]]' gram hashes: 2⁴⁵ — large enough
    * that hash collisions are negligible at corpus scale (birthday
    * bound ~n²/2⁴⁶ for n distinct grams per df-capped bucket), small
    * enough that the DuckDB oracle's BIGINT `list_reduce` never
    * overflows (products stay < 2⁶³ for mod < 2⁵⁷).
    */
  val SubMod: Long = 1L << 45

  /** Exact shared-substring span detection (the exact-substring dedup
    * primitive of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL'22): two documents share a k-character
    * substring iff they share a k-gram rolling hash, and the gram's
    * array position says WHERE. For every document pair sharing at
    * least one k-gram (document frequency of the gram capped at
    * `maxDf` — boilerplate shared by half the corpus must not become a
    * quadratic join key), emits the number of distinct shared grams and
    * the earliest matching span start in each document (1-based, the
    * substring-extraction convention).
    *
    * Scale shape: the gram relation is the inherent cost of
    * exact-substring dedup (≈ one row per character, the same order as
    * a suffix-array build); it flows through ONE map-side-combinable
    * partial aggregation per (hash, doc) — never materialized raw into
    * a join — and candidates come only from df-capped inverted-index
    * buckets, the same discipline as [[ngramJaccardPairs]] and
    * [[contamination]]. Production note: a deployment would verify the
    * tiny candidate set with an exact substring compare to clear the
    * ~2⁻⁴⁶ per-pair hash-collision risk; the oracle computes identical
    * hashes, so the contract here is exact.
    */
  /** The (h, doc_id, pos) relation [[substringMatches]] joins: one row
    * per DISTINCT gram per document with its first 1-based position —
    * the per-doc dedup happens INSIDE the kernel
    * ([[graft.functions.GramFirstPos]]), map-side and free, so the
    * ~1-row-per-character raw gram stream never reaches a shuffle.
    */
  private[graft] def gramFirstPositions(docs: DataFrame, k: Int,
                                        mod: Long = SubMod): DataFrame = {
    val gfp = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.GramFirstPos(
        org.apache.spark.sql.GraftSqlBridge.expression(col("text")),
        k, mod))
    // parallelized: one gram per character — the heaviest explode in
    // the family; never leave it on a single-split scan
    parallelized(docs).select(col("doc_id"), explode(gfp).as("u"))
      .select(col("u.h").as("h"), col("doc_id"), col("u.pos").as("pos"))
  }

  def substringMatches(docs: DataFrame, k: Int, maxDf: Long): DataFrame =
    // Cached: three consumers (the df cap and both join sides) would
    // otherwise each re-run the scan + explode — same discipline as
    // [[contamination]]'s cached fingerprint relation.
    substringMatchesFrom(gramFirstPositions(docs, k).transform(Materialize.shared), maxDf)

  /** The audit stage of [[substringMatches]] over an already-
    * materialized gram relation (h, doc_id, pos) — split out so the
    * deployment shape can run it against a PERSISTED gram table
    * bucketed by `h` ([[graft.sources.GramStore]]), where the df cap,
    * the cap semi-join, and the self-join all arrive pre-partitioned on
    * the hash key and run Exchange-free.
    */
  def substringMatchesFrom(grams: DataFrame, maxDf: Long): DataFrame = {
    val keep = grams.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("h")
    val g = grams.join(keep, "h")
    g.select(col("h"), col("doc_id").as("d1"), col("pos").as("p1"))
      .join(g.select(col("h"), col("doc_id").as("d2"),
        col("pos").as("p2")), "h")
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("n_shared"),
        min("p1").as("d1_pos"), min("p2").as("d2_pos"))
  }

  /** The PRODUCTION variant of [[substringMatches]]: every candidate
    * gram pair is verified by an exact substring compare at the two
    * reported positions before it may count toward a pair — the
    * verification stage the hash-only contract's docs promise, closing
    * the ~n²/2⁴⁶ per-bucket collision risk entirely (a deployment
    * deciding what data to DELETE should not act on a hash match,
    * however improbable).
    *
    * Scale shape: identical to the hash path up through the df-capped
    * self-join; the verify stage then joins TEXTS onto the candidate
    * gram stream — two doc_id-keyed hash joins whose stream side is
    * bounded by true duplication plus collisions (the df cap already
    * killed boilerplate), and whose corpus side Spark prunes to
    * (doc_id, text). The substring compare itself is codegen'd
    * (`Substring` + `EqualTo`), per candidate row, no shuffle beyond
    * the joins. Verified-equals-hash on collision-free data and
    * planted-collision rejection are both spec-pinned.
    */
  def substringMatchesVerified(docs: DataFrame, k: Int, maxDf: Long,
                               mod: Long = SubMod): DataFrame =
    substringMatchesVerifiedFrom(
      gramFirstPositions(docs, k, mod).transform(Materialize.shared), docs, k, maxDf)

  /** [[substringMatchesVerified]] over an already-materialized gram
    * relation — the [[graft.sources.GramStore]] deployment shape,
    * where the store supplies (h, doc_id, pos) pre-bucketed and `docs`
    * supplies the texts to verify against.
    */
  def substringMatchesVerifiedFrom(grams: DataFrame, docs: DataFrame,
                                   k: Int, maxDf: Long): DataFrame = {
    val keep = grams.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("h")
    val g = grams.join(keep, "h")
    val cand = g
      .select(col("h"), col("doc_id").as("d1"), col("pos").as("p1"))
      .join(g.select(col("h"), col("doc_id").as("d2"),
        col("pos").as("p2")), "h")
      .filter(col("d1") < col("d2"))
    cand
      .join(docs.select(col("doc_id").as("d1"), col("text").as("t1")),
        "d1")
      .join(docs.select(col("doc_id").as("d2"), col("text").as("t2")),
        "d2")
      .filter(substring(col("t1"), col("p1"), lit(k)) ===
        substring(col("t2"), col("p2"), lit(k)))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("n_shared"),
        min("p1").as("d1_pos"), min("p2").as("d2_pos"))
  }

  /** Duplicated-span coverage — the per-document companion of
    * [[substringMatches]]: what FRACTION of each document's characters
    * lies inside at least one k-gram shared with another document
    * (df-capped, like the pair query). This is the number the cut-vs-
    * drop decision in exact-substring dedup actually reads: a doc 95 %
    * covered is a near-copy (drop it); one 10 % covered has a quoted
    * passage (cut the span, keep the doc).
    *
    * Coverage is the measure of the UNION of the fixed-length match
    * intervals [pos, pos+k−1] — overlapping matches must not double-
    * count — computed with the standard gaps-and-islands reduction:
    * a match opens a new island iff its start exceeds the running max
    * end of all earlier matches (a per-document window, ordered by
    * position); islands then aggregate to span lengths.
    *
    * Scale shape: the all-positions stream (1 row/char, inherent) is
    * immediately semi-joined against the df-capped shared-gram set, so
    * the windows run over MATCHED positions only (bounded by true
    * duplication, typically a tiny fraction); every window is
    * partitioned by doc_id — no global ordering anywhere.
    */
  def dupCoverage(docs: DataFrame, k: Int, maxDf: Long): DataFrame = {
    val keep = gramFirstPositions(docs, k)
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("h")
    val gh = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.GramHashes(
        org.apache.spark.sql.GraftSqlBridge.expression(col("text")),
        k, SubMod))
    val allPos = docs
      .select(col("doc_id"), posexplode(gh).as(Seq("p", "h")))
      .select(col("doc_id"), (col("p") + 1).cast("long").as("pos"),
        col("h"))
    val matched = allPos.join(keep, "h")
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val perDoc = matched
      .withColumn("prev_end", max(col("pos") + (k - 1)).over(wPrev))
      .withColumn("newi",
        when(col("prev_end").isNull, 1L)
          .when(col("pos") > col("prev_end"), 1L).otherwise(0L))
      .withColumn("island", sum("newi").over(wCum))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("s"), (max(col("pos")) + (k - 1)).as("e"),
        count(lit(1)).as("ng"))
      .groupBy("doc_id")
      .agg(sum(col("e") - col("s") + 1).as("covered_chars"),
        sum("ng").as("n_matched_grams"))
    docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("n_matched_grams"), lit(0L)).as("n_matched_grams"),
        coalesce(col("covered_chars"), lit(0L)).as("covered_chars"),
        // empty docs have no grams, so coverage is 0 by definition —
        // the guard keeps the division NaN-free on both engines
        when(col("n_chars") === 0L, 0L)
          .otherwise(micro(
            coalesce(col("covered_chars"), lit(0L)) / col("n_chars")))
          .as("coverage_micro"))
  }

  /** Duplicated-span EXCISION — acting on [[substringMatches]]/
    * [[dupCoverage]] the way decontamination acts on the contamination
    * detector: emit the deduplicated corpus TEXT, the deliverable of
    * exact-substring dedup (Lee et al., ACL'22, whose ExactSubstr tool
    * removes all but one occurrence of every duplicated span).
    *
    * Policy (deterministic, doc-granular): every df-capped shared
    * k-gram has a canonical OWNER — the lowest doc_id holding it. The
    * owner keeps its text untouched; every occurrence of that gram in
    * any other document is marked, marked intervals [pos, pos+k−1]
    * union per doc (the [[dupCoverage]] gaps-and-islands reduction),
    * and the islands are spliced out of the text. Exactly one copy of
    * each duplicated span survives corpus-wide, and the policy is
    * order-free: ownership is a pure min over the gram's holder set,
    * so the verdict for a doc never depends on scan order.
    *
    * Scale shape: identical to [[dupCoverage]] up through the islands
    * (the 1-row/char stream is semi-joined against the df-capped owner
    * set before any window runs — marked rows are bounded by true
    * duplication); the splice itself is per-doc-bounded: complement
    * segments come from one `lag` over islands (doc-partitioned, no
    * global order), and each doc's kept text is rebuilt by ONE ordered
    * concat over its own segment array — no driver work, no UDF, and
    * docs with no marked spans never enter the window at all (left
    * join restores them with text intact).
    */
  def exciseSpans(docs: DataFrame, k: Int, maxDf: Long): DataFrame = {
    val grams = gramFirstPositions(docs, k)
    val owner = grams.groupBy("h")
      .agg(count(lit(1)).as("df"), min("doc_id").as("owner"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("h", "owner")
    val gh = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.GramHashes(
        org.apache.spark.sql.GraftSqlBridge.expression(col("text")),
        k, SubMod))
    val allPos = docs
      .select(col("doc_id"), posexplode(gh).as(Seq("p", "h")))
      .select(col("doc_id"), (col("p") + 1).cast("long").as("pos"),
        col("h"))
    val marked = allPos.join(owner, "h")
      .filter(col("doc_id") =!= col("owner"))
      .select("doc_id", "pos")
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val islands = marked
      .withColumn("prev_end", max(col("pos") + (k - 1)).over(wPrev))
      .withColumn("newi",
        when(col("prev_end").isNull, 1L)
          .when(col("pos") > col("prev_end"), 1L).otherwise(0L))
      .withColumn("island", sum("newi").over(wCum))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("s"), (max(col("pos")) + (k - 1)).as("e"))
    // complement segments: the kept text is [prev_e+1, s−1] before each
    // island plus the tail after the last one. Islands are maximal and
    // disjoint with s > prev_e, so every segment length is ≥ 0.
    val wLag = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("s")
    val spliced = islands
      .withColumn("prev_e", coalesce(lag("e", 1).over(wLag), lit(0L)))
      .groupBy("doc_id")
      .agg(
        sum(col("e") - col("s") + 1).as("removed_chars"),
        max("e").as("last_e"),
        sort_array(collect_list(struct(col("prev_e"), col("s"))))
          .as("cuts"))
    docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"), col("text"))
      .join(spliced, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        (col("n_chars") - coalesce(col("removed_chars"), lit(0L)))
          .as("kept_chars"),
        when(col("cuts").isNull, col("text"))
          .otherwise(concat(
            concat_ws("", transform(col("cuts"), c =>
              col("text").substr(
                (c("prev_e") + 1).cast("int"),
                (c("s") - c("prev_e") - 1).cast("int")))),
            col("text").substr((col("last_e") + 1).cast("int"),
              col("n_chars").cast("int"))))
          .as("kept_text"))
  }

  /** Quality-ranked canonical selection over duplicate clusters — the
    * RefinedWeb/CCNet refinement of min-id dedup: within each near-dup
    * cluster keep the BEST copy (highest quality score), not the
    * arbitrary lowest-id one. Ties break to the lowest doc_id so the
    * verdict is fully deterministic.
    *
    * The argmax is deliberately NOT `max_by` (whose tie behavior is
    * engine-dependent): per-cluster max quality first, then min doc_id
    * among the docs achieving it — two exact integer aggregations both
    * engines order identically.
    *
    * Scale shape: `cc` is bounded by true duplication (it exists
    * because the LSH/inverted-index stage pruned the corpus), so every
    * join here is cluster-member-sized, keyed on component — never a
    * corpus-wide shuffle; the quality relation joins once on doc_id
    * with its columns pruned to (doc_id, quality_micro).
    */
  def keepBest(cc: DataFrame, quality: DataFrame): DataFrame = {
    // three consumers (best, canon, and the verdict join): cache the
    // cluster-member relation so the upstream pair/cc/quality pipeline
    // runs once — operator-scoped, cleared by Bench/Verify per query
    val members = cc
      .join(quality.select("doc_id", "quality_micro"), "doc_id")
      .transform(Materialize.shared)
    val best = members.groupBy("component")
      .agg(max("quality_micro").as("qmax"),
        count(lit(1)).as("n_members"))
    val canon = members.join(best, "component")
      .filter(col("quality_micro") === col("qmax"))
      .groupBy("component").agg(min("doc_id").as("canonical"))
    members.join(best, "component").join(canon, "component")
      .select(col("doc_id"), col("component"), col("quality_micro"),
        col("n_members"), col("canonical"),
        (col("doc_id") === col("canonical")).as("keep"))
  }

  /** DSIR-style data selection (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every raw document by how much its HASHED n-gram feature profile
    * resembles a target distribution, then keep the top-K. The target
    * here is the corpus's own English slice — DSIR's canonical use
    * (select web text resembling a formal-English target); any
    * predicate over the corpus works.
    *
    * DSIR's importance weight is Σ_features n·(log p_target − log
    * p_raw). A cross-engine-exact oracle cannot pin `ln` (neither
    * Java's `Math.log` nor DuckDB's libm `ln` is correctly rounded —
    * the same reason X29 fixes α = ½ where `pow` cancels), so the
    * per-bucket weight is the integer frequency CONTRAST instead:
    * micro(cnt_t/N_t) − micro(cnt_r/N_r) — one correctly-rounded
    * double division each, micro-floored, then pure integer products.
    * Same sign semantics (positive = over-represented in the target),
    * rank-equivalent in the small-frequency regime where log(1+x)≈x.
    *
    * Scale shape — DSIR's hashed-feature trick is precisely what makes
    * this 100 TB-able: the feature space is FIXED at `buckets` (not
    * vocabulary-sized), so the weight table is a bounded relation that
    * BROADCASTS. One explode rides the scan into one partial-agg'd
    * (doc, bucket) Exchange; the censuses (raw, target, totals) are
    * tiny rollups of that cached relation; scoring is a broadcast join
    * + doc-keyed partial agg; the top-K plans as TakeOrderedAndProject
    * (no global sort).
    */
  def dsirScores(docs: DataFrame, targetLang: String, buckets: Int,
                 topK: Int): DataFrame = {
    val db = parallelized(docs)
      .select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("tok"))
      .withColumn("b",
        md5Long(concat(lit("dsir:"), col("tok"))) % buckets)
      .groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("n"))
      .transform(Materialize.shared) // four consumers: raw census, target census, totals, scores
    val raw = db.groupBy("b").agg(sum("n").as("cr"))
    val tgt = db.filter(col("lang") === targetLang)
      .groupBy("b").agg(sum("n").as("ct"))
    val totals = db.agg(
      sum("n").as("nr"),
      sum(when(col("lang") === targetLang, col("n")).otherwise(0L))
        .as("nt"))
    val weights = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (micro(coalesce(col("ct"), lit(0L)) / col("nt")) -
          micro(col("cr") / col("nr"))).as("w"))
    db.join(broadcast(weights), "b")
      .groupBy("doc_id", "lang")
      .agg(sum(col("n") * col("w")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Train/test contamination audit — the decontamination pass every
    * LLM training pipeline runs before evaluation: for each (test doc,
    * train doc) pair, the fraction of the test doc's winnowing
    * fingerprints that also appear in the train doc. High overlap =
    * the eval set leaks into training (here: planted near-dups whose
    * copies straddle the split).
    *
    * Composition of this engine's own stages: [[sampleSplit]]'s hash
    * split + [[winnowFingerprints]] + the D2 inverted-index join
    * discipline (document-frequency cap on the fingerprint key bounds
    * per-key fan-out — boilerplate shared by thousands of docs must
    * not become a quadratic join key at 100 TB).
    */
  def contamination(docs: DataFrame, trainPct: Int, valPct: Int,
                    k: Int, w: Int, maxDf: Long,
                    ratioMicroMin: Long): DataFrame = {
    // cache(), measured BETTER than an eager checkpoint here (r16: the
    // winnow relation is corpus-wide — checkpointing it as object rows
    // cost more than the consumers save; the dedup-audit family, whose
    // shared relations are candidate-bounded, goes the other way);
    // pinKey keys the fan-out join at session parallelism
    contaminationFrom(
      winnowedSplit(docs, k, w, trainPct, valPct).cache(),
      maxDf, ratioMicroMin, pinKey = true)
  }

  /** The (doc_id, fingerprint, split) relation [[contaminationFrom]]
    * audits — computed inline here, persisted bucketed-by-fingerprint at
    * deployment scale ([[graft.sources.FingerprintStore]]).
    */
  def winnowedSplit(docs: DataFrame, k: Int, w: Int, trainPct: Int,
                    valPct: Int): DataFrame =
    winnowFingerprints(docs, k, w)
      .join(docs.select(col("doc_id"),
        splitAssign(trainPct, valPct).as("split")), "doc_id")

  /** The audit stage of [[contamination]], over an already-materialized
    * fingerprint relation `fs` (doc_id, fingerprint, split).
    *
    * This split exists because at deployment scale the fingerprint
    * relation is a persisted table, not a per-audit recomputation: write
    * it once, bucketed by `fingerprint`
    * ([[graft.sources.FingerprintStore]]), and every fingerprint-keyed
    * step here — the document-frequency cap, the cap semi-join, and the
    * test⋈train overlap join — runs Exchange-free against the bucketed
    * scans (pinned in StorageLayoutSpec). The only shuffles left are the
    * doc-keyed aggregations, which are unavoidable reductions.
    */
  def contaminationFrom(fs: DataFrame, maxDf: Long,
                        ratioMicroMin: Long,
                        pinKey: Boolean = false): DataFrame = {
    val keep = fs.groupBy("fingerprint").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fingerprint")
    // pinKey defaults FALSE because this function is the shared audit
    // stage and the store-fed deployment path runs it over the
    // fingerprint-BUCKETED FingerprintStore, where a repartition would
    // re-introduce the exchanges the layout exists to remove
    // (StorageLayoutSpec pins Exchange-free). The in-query audit
    // callers, whose fs relation is a fresh winnow scan with no layout
    // to preserve, pass true: the test×train overlap join fans out
    // Σ te(fp)·tr(fp) — byte-tiny, CPU-dense — and AQE's byte-based
    // coalescing otherwise collapses it to a few tasks
    // ([[Materialize.pinned]]).
    val fsk = (if (pinKey) Materialize.pinned(fs, "fingerprint") else fs)
      .join(keep, "fingerprint")
    val nf = fsk.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val te = fsk.filter(col("split") === "test")
      .select(col("fingerprint"), col("doc_id").as("test_doc"))
    val tr = fsk.filter(col("split") === "train")
      .select(col("fingerprint"), col("doc_id").as("train_doc"))
    val ov = te.join(tr, "fingerprint")
      .groupBy("test_doc", "train_doc")
      .agg(count(lit(1)).as("shared_fps"))
    ov.join(nf.select(col("doc_id").as("test_doc"), col("n_fp")),
        "test_doc")
      .withColumn("ratio_micro", micro(col("shared_fps") / col("n_fp")))
      .filter(col("ratio_micro") >= ratioMicroMin)
      .select("test_doc", "train_doc", "shared_fps", "ratio_micro")
  }

  /** Eval-gate contamination pairs — the X30 rule turned into an
    * ADMISSION decision (the live twin of [[contamination]]): for each
    * incoming train candidate, every PROTECTED eval document whose
    * winnow-fingerprint set it covers at `ratio_micro` ≥ the bar.
    * `incFps` is (new_doc, fingerprint); `evalFps` is (eval_doc,
    * fingerprint) — the persisted benchmark-suite index
    * ([[graft.sources.FingerprintStore.auditAgainstEval]] feeds the
    * bucketed table here; the batch query builds both sides inline).
    *
    * Two deliberate divergences from [[contaminationFrom]], both
    * FORCED by the admission setting and both in the safe direction:
    *  - `ratio_micro` = shared / n_fp(EVAL doc) — the benchmark's
    *    coverage is what the rule protects (identical to the X30
    *    pair ratio, which is test-doc-relative), NOT
    *    [[graft.sources.FingerprintStore.auditIncoming]]'s
    *    incoming-relative ratio (which serves near-dup admission);
    *  - the df cap and the n_fp denominator are computed over the
    *    EVAL INDEX ALONE, never the (growing) train side: eval sets
    *    are static and curated, so every quantity in the decision is
    *    time-invariant → gating document-by-document over any batch
    *    sequence, in any order, with any replay, is BIT-FOR-BIT the
    *    one-shot batch gate over the union (StreamingDecontamSpec
    *    pins it). [[contaminationFrom]]'s combined-side cap would
    *    make today's verdict depend on tomorrow's corpus.
    * When no fingerprint's df crosses the cap on either definition the
    * two rules coincide exactly (the spec cross-checks q_decontam's
    * drop set on such a corpus).
    *
    * Scale shape: df cap, cap semi-join, and overlap join all key on
    * `fingerprint` — against the bucketed eval store they run with
    * zero store-side Exchanges and the eval side is benchmark-sized
    * (thousands of docs) anyway; only the incoming shard's
    * fingerprints are hashed in. Output is bounded by true
    * contamination, never the corpus square.
    */
  def evalGatePairs(incFps: DataFrame, evalFps: DataFrame, maxDf: Long,
                    ratioMicroMin: Long): DataFrame = {
    val keep = evalFps.groupBy("fingerprint")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fingerprint")
    val evk = evalFps.join(keep, "fingerprint")
    val nf = evk.groupBy("eval_doc").agg(count(lit(1)).as("n_fp"))
    // broadcast both eval-side relations: the eval index is benchmark-
    // sized BY DESIGN (curated suites, thousands of docs) at every
    // corpus scale, so the incoming/train side — the side that grows
    // with the corpus — never shuffles at all (guide §3.1; r16 measured
    // 2x on q_eval_gate: the SMJ shuffled the full train fingerprint
    // relation to compare it against a broadcastable index).
    // Failure mode (documented, accepted): a deployment whose eval-
    // fingerprint relation outgrew the 8 GB / 512M-row broadcast cap
    // would fail this join outright rather than fall back to SMJ —
    // that is the design assumption surfacing, not a perf bug; drop
    // the two broadcast() hints to restore planner choice there.
    val ov = incFps.join(broadcast(evk), "fingerprint")
      .groupBy("new_doc", "eval_doc")
      .agg(count(lit(1)).as("shared_fps"))
    ov.join(broadcast(nf), "eval_doc")
      .withColumn("ratio_micro", micro(col("shared_fps") / col("n_fp")))
      .filter(col("ratio_micro") >= ratioMicroMin)
      .select("new_doc", "eval_doc", "shared_fps", "ratio_micro")
  }

  /** PII detection/redaction patterns — the RE2∩Java-safe subset
    * (ASCII classes, no lookahead), so Spark and the oracle match
    * byte-for-byte. Real deployments extend the pattern list; the
    * operator shape (count + redact + rehash) is the contract.
    */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII scrub (training-data compliance stage): per-doc match counts
    * plus the sha256 of the redacted text (emails first, then phones —
    * replacement order is part of the contract). Pure projection, zero
    * shuffles, regex inside codegen.
    */
  /** Deterministic exact-N per-stratum sample — eval-set construction:
    * rank documents within each stratum by a salted md5 of the doc id
    * (never `rand()` — the [[sampleSplit]] discipline: the same
    * (corpus, salt) reproduces the identical sample, a different salt
    * draws an independent one) and keep the first `n`. Unlike the
    * percentage split, the draw is EXACTLY n per stratum — the shape
    * benchmark suites need ("500 per language").
    *
    * Scale shape: one projection + one stratum-partitioned window
    * (rank) + a pushable rank filter; no global ordering. At 100 TB a
    * stratum is one shuffle partition group — n rows survive per
    * stratum, so the output is bounded by strata × n.
    */
  def stratifiedSample(docs: DataFrame, strataCol: String, n: Int,
                       salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(md5Long(concat(lit(s"strat:$salt:"),
        col("doc_id").cast("string"))), col("doc_id"))
    docs.select(col(strataCol), col("doc_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Decontamination — ACTING on what [[contamination]] detects: every
    * train document implicated in a test-overlap pair above the ratio
    * bar is dropped, and the report is per-split retention (the number
    * a release note quotes). Eval splits are never touched — the
    * training side pays for the overlap, keeping the benchmark intact.
    *
    * Scale shape: the pair relation is [[contaminationFrom]] verbatim
    * (cached winnow relation, df-capped inverted index); the drop set
    * is train-side distinct ids (bounded by true contamination) joined
    * back against the doc roster, then one (split, partials) rollup.
    */
  def decontaminate(docs: DataFrame, trainPct: Int, valPct: Int,
                    k: Int, w: Int, maxDf: Long,
                    ratioMicroMin: Long): DataFrame = {
    val fs = winnowedSplit(docs, k, w, trainPct, valPct).cache()
    val dropped = contaminationFrom(fs, maxDf, ratioMicroMin)
      .select(col("train_doc").as("doc_id")).distinct()
      .withColumn("dropped", lit(1L))
    docs.select(col("doc_id"),
        splitAssign(trainPct, valPct).as("split"))
      .join(dropped, Seq("doc_id"), "left")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dropped"), lit(0L))).as("n_dropped"))
      .select(col("split"), col("n_docs"), col("n_dropped"),
        (col("n_docs") - col("n_dropped")).as("n_kept"),
        micro((col("n_docs") - col("n_dropped")) / col("n_docs"))
          .as("retained_micro"))
  }

  /** X39: exact n-gram eval-overlap audit — the GPT-3 appendix-C /
    * PaLM decontamination RULE, distinct from [[contamination]]'s
    * pairwise shape: those report which (test, train) DOC PAIRS share
    * winnowed fingerprints; this reports, per eval document, the
    * fraction of its distinct word n-grams that occur ANYWHERE in the
    * train split — membership against the train gram set, no pair
    * identity, which is exactly how the release-note "X% of the eval
    * set was contaminated" numbers are computed. Docs shorter than n
    * tokens carry zero grams and report 0 overlap (kept).
    *
    * Scale shape: the train gram set is the big relation (≈ one row
    * per train token) but it flows through ONE (h, partial) distinct
    * and a gram-keyed join against the SMALL side (eval splits are a
    * few percent of a corpus by construction); no df cap is needed
    * because membership, not fan-out, is consumed — the join output
    * is bounded by eval gram count. At deployment the train gram set
    * is [[graft.sources.GramStore]]'s persisted bucketed layout, so
    * only the eval shard shuffles (the `auditIncoming` precedent).
    */
  /** The per-doc-distinct (doc_id, split, h) word n-gram hash relation
    * the overlap audit consumes — split assignment riding the shingle
    * projection (a pure function of doc_id).
    */
  private def splitGramHashes(docs: DataFrame, n: Int, trainPct: Int,
                              valPct: Int): DataFrame =
    shingleSet(docs, n)
      .select(col("doc_id"), splitAssign(trainPct, valPct).as("split"),
        md5Long(col("sh")).as("h"))

  /** The distinct train-split gram-hash SET — the persistable half of
    * the audit ([[graft.sources.WordGramStore]] saves exactly this,
    * bucketed by `h`).
    */
  def trainGramSet(docs: DataFrame, n: Int, trainPct: Int,
                   valPct: Int): DataFrame =
    splitGramHashes(docs, n, trainPct, valPct)
      .filter(col("split") === "train")
      .select("h").distinct()

  /** The distinct gram-hash set OF a given document set (no split
    * filter) — the PROTECTED set of the eval-overlap admission signal:
    * persist a benchmark suite's grams once
    * ([[graft.sources.WordGramStore.saveDocs]]) and screen every
    * incoming crawl shard against it.
    */
  def gramSet(docs: DataFrame, n: Int): DataFrame =
    shingleSet(docs, n).select(md5Long(col("sh")).as("h")).distinct()

  /** Per-doc overlap of `docs` against an explicit protected gram set
    * — the split-free core of the X39 audit, used by the streaming
    * admission gate (an incoming TRAIN candidate that substantially
    * overlaps a protected eval suite must be quarantined, or the
    * benchmark silently enters the training set). Same membership
    * join shape and bounds as [[ngramOverlapAuditFrom]].
    */
  def gramOverlapAgainst(protectedGrams: DataFrame, docs: DataFrame,
                         n: Int): DataFrame = {
    val hits = shingleSet(docs, n)
      .select(col("doc_id"), md5Long(col("sh")).as("h"))
      .join(protectedGrams.select("h").withColumn("hit", lit(1L)),
        Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    docs.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("overlap_micro",
        when(col("n_grams") > 0L, micro(col("n_hit") / col("n_grams")))
          .otherwise(0L))
  }

  def ngramOverlapAudit(docs: DataFrame, n: Int, trainPct: Int,
                        valPct: Int, dirtyMicroMin: Long): DataFrame =
    ngramOverlapAuditFrom(trainGramSet(docs, n, trainPct, valPct),
      docs, n, trainPct, valPct, dirtyMicroMin)

  /** [[ngramOverlapAudit]] against an ALREADY-MATERIALIZED train gram
    * set — the store-backed entry point: [[graft.sources
    * .WordGramStore]] feeds it the h-bucketed layout, so the
    * membership join never shuffles the (huge) train side; only the
    * eval shard's grams hash into the store's partitioning.
    */
  def ngramOverlapAuditFrom(trainGrams: DataFrame, docs: DataFrame,
                            n: Int, trainPct: Int, valPct: Int,
                            dirtyMicroMin: Long): DataFrame = {
    val hits = splitGramHashes(docs, n, trainPct, valPct)
      .filter(col("split") =!= "train")
      .join(trainGrams.select("h").withColumn("hit", lit(1L)),
        Seq("h"), "left")
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    docs.select(col("doc_id"), splitAssign(trainPct, valPct).as("split"))
      .filter(col("split") =!= "train")
      .join(hits, Seq("doc_id", "split"), "left")
      .select(col("doc_id"), col("split"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("overlap_micro",
        when(col("n_grams") > 0L, micro(col("n_hit") / col("n_grams")))
          .otherwise(0L))
      .withColumn("dirty",
        when(col("overlap_micro") >= dirtyMicroMin, 1L).otherwise(0L))
  }

  def piiScrub(docs: DataFrame): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhonePattern), lit(0)))
        .cast("long").as("n_phones"),
      sha2(redacted.cast("binary"), 256).as("redacted_sha"))
  }

  /** THE split contract: a deterministic bucket 0-99 as a pure function
    * of doc_id (salted md5) — never `rand()`, which would make the
    * split irreproducible and retries inconsistent. One definition,
    * shared by [[sampleSplit]] and [[contamination]] (and mirrored by
    * the oracles' `splitBucketSql`), so train/test membership cannot
    * silently fork between the assignment and decontamination stages.
    */
  private[operators] def splitBucket: Column =
    md5Long(concat(lit("split:"), col("doc_id").cast("string"))) % 100L

  /** Bucket → split label under (trainPct, valPct). */
  private[operators] def splitAssign(trainPct: Int, valPct: Int): Column =
    when(splitBucket < trainPct, "train")
      .when(splitBucket < trainPct + valPct, "val")
      .otherwise("test")

  /** Deterministic stratified train/val/test split — the training-mix
    * assignment step of a data pipeline. The split is [[splitBucket]]'s
    * pure function of doc_id, stable across runs, engines, and
    * re-partitioning. One narrow projection + one partial-agg shuffle
    * of (lang, split) pairs.
    */
  def sampleSplit(docs: DataFrame, trainPct: Int, valPct: Int): DataFrame = {
    docs.select(col("lang"), splitAssign(trainPct, valPct).as("split"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"))
  }

  /** Sequence packing (LLM training prep): assign each document a
    * (shard, bin, offset) position in fixed-size context windows, docs
    * packed contiguously in doc_id order within a shard (straddling a
    * bin boundary = the standard packed-sample-with-continuation
    * layout). Packing is inherently sequential, so the scale unit is
    * the SHARD — a deterministic md5 bucket of doc_id; the window sum
    * runs per shard (one shuffle, no global ordering anywhere). At
    * 100 TB you raise nShards so each shard's token stream fits an
    * executor's window state; all math is exact integer arithmetic.
    */
  def packSequences(docs: DataFrame, nShards: Int,
                    ctxLen: Long): DataFrame = {
    val shard =
      md5Long(concat(lit("shard:"), col("doc_id").cast("string"))) %
        nShards.toLong
    val base = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tok"), shard.as("shard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // (cum - n_tok) = the doc's start offset in the shard token stream;
    // ctxLen is a power of two so the long/long->double division is
    // exact and the truncating cast equals floor division cross-engine
    base.withColumn("cum", sum("n_tok").over(w))
      .select(col("shard"), col("doc_id"), col("n_tok"),
        ((col("cum") - col("n_tok")) / ctxLen).cast("long").as("bin"),
        ((col("cum") - col("n_tok")) % ctxLen).as("bin_offset"))
  }

  /** Deterministic epoch shuffle + shard assignment — the "global
    * shuffle" every training run needs before writing shards: a
    * reproducible pseudo-random order (salted md5 of doc_id — never
    * `rand()`, same discipline as [[splitBucket]]) with documents
    * bucketed into `nShards` output shards and positioned within their
    * shard. Re-running with the same corpus gives byte-identical shard
    * files; changing the salt gives an independent epoch order.
    *
    * Scale shape: one hash-partition Exchange on `shard` plus a
    * per-shard sort — exactly the cost of writing shuffled training
    * shards, with no global ordering anywhere (the per-shard window is
    * partitioned, so each shard sorts independently; at 100 TB you
    * raise nShards until a shard fits an executor's sort spill budget).
    */
  def shuffleShard(docs: DataFrame, nShards: Int,
                   salt: String = ""): DataFrame = {
    val prefix = if (salt.isEmpty) "shuf:" else s"shuf:$salt:"
    val h = md5Long(concat(lit(prefix), col("doc_id").cast("string")))
    val base = docs.select(col("doc_id"), h.as("h"),
      (h % nShards.toLong).as("shard"),
      size(tokens(col("text"))).cast("long").as("n_tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("h", "doc_id")
    base.select(col("shard"),
      row_number().over(w).cast("long").as("pos"),
      col("doc_id"), col("n_tok"))
  }

  /** The [[shuffleShard]] DELIVERABLE: write the epoch's shard files.
    * Each shard directory holds its documents in epoch order
    * (pos-sorted), so a training loader streams `shard=i/` front to
    * back and reads the deterministic permutation. Re-running with the
    * same (corpus, salt) re-creates byte-identical shard files —
    * the write is a pure function of its inputs (salted-md5 order,
    * one hash-partition Exchange, per-shard sort, deterministic
    * parquet encode) — and a new salt is an independent epoch
    * permutation of the same document set (both spec-pinned).
    *
    * Scale shape: `repartition` on shard + `partitionBy` is the only
    * data movement — exactly the one Exchange [[shuffleShard]]
    * documents; at 100 TB you raise `nShards` until one shard fits an
    * executor's sort budget, same dial as [[packSequences]].
    */
  def writeShards(docs: DataFrame, nShards: Int, salt: String,
                  outDir: String): Unit =
    shuffleShard(docs, nShards, salt)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Vocabulary coverage — the tokenizer-prep census: build the top-V
    * vocabulary from the TRAIN split's token frequencies (count-desc,
    * token-asc tie-break — deterministic truncation, never engine
    * order), then report every split's out-of-vocabulary token rate
    * against it. The val/test OOV rates are the early-warning signal
    * for train/eval distribution drift, and the train OOV rate is the
    * tail mass a V-sized tokenizer would shatter into bytes.
    *
    * Scale shape: the token stream is one explode (inherent); the
    * vocabulary is a (token, partial-count) shuffle followed by a
    * bounded top-V (TakeOrdered — V rows per partition, never a global
    * sort); membership is a BROADCAST left join of the V-sized
    * vocabulary against the stream; the final census is one
    * (split, partials) aggregation. The token stream is cached for its
    * two consumers (vocab build, coverage scan).
    */
  def vocabCoverage(docs: DataFrame, trainPct: Int, valPct: Int,
                    vocabSize: Int): DataFrame = {
    val toks = docs
      .select(splitAssign(trainPct, valPct).as("split"),
        explode(tokens(col("text"))).as("tok"))
      .transform(Materialize.shared)
    val vocab = toks.filter(col("split") === "train")
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("split")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
          .as("oov_tokens"))
      .select(col("split"), col("n_tokens"), col("oov_tokens"),
        micro(col("oov_tokens") / col("n_tokens")).as("oov_micro"))
  }

  /** Merge rounds for [[bpeTrain]] — mirrored into the generated oracle
    * CTE chain, so both engines train the same number of steps.
    */
  val BpeMerges = 10

  /** The (word, freq, syms) working vocabulary [[bpeTrain]] iterates
    * on — the corpus's only appearance in the whole training loop.
    */
  private[graft] def bpeVocab(docs: DataFrame): DataFrame =
    parallelized(docs)
      .select(explode(regexp_extract_all(col("text"),
        lit("[A-Za-z]+"), lit(0))).as("w"))
      .groupBy(lower(col("w")).as("word"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("syms", filter(split(col("word"), ""), s => s =!= ""))

  /** Frequency-weighted adjacent-pair counts over the vocabulary — one
    * (lhs, rhs, partial) Exchange per round (plan-pinned).
    */
  private[graft] def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy leftmost non-overlapping (lhs, rhs) → lhs‖rhs rewrite of
    * one symbol array — the merge-application fold ([[bpeTrain]]'s
    * rewrite step, and [[graft.sources.TokenizerStore]]'s
    * dictionary-miss path replays the whole stored chain through it).
    */
  private[graft] def bpeMergeFold(syms: Column, lhs: String,
                                  rhs: String): Column =
    bpeMergeFold(syms, lit(lhs), lit(rhs))

  /** The fold with COLUMN operands — what lets a whole stored merge
    * chain apply as ONE data-dependent `aggregate` over the chain array
    * (constant expression depth however many merges were trained)
    * instead of a merges-deep nest of folds. Semantics are identical to
    * the literal form: lhs/rhs are just evaluated per row.
    */
  private[graft] def bpeMergeFold(syms: Column, lhs: Column,
                                  rhs: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 &&
          element_at(acc, -1) === lhs && x === rhs,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(lhs, rhs))))
        .otherwise(concat(acc, array(x))))

  /** The fold as a vocabulary rewrite — a zero-shuffle projection
    * (plan-pinned).
    */
  private[graft] def bpeMergeApplied(vocab: DataFrame, lhs: String,
                                     rhs: String): DataFrame =
    vocab.withColumn("syms", bpeMergeFold(col("syms"), lhs, rhs))

  /** The training loop shared by [[bpeTrain]] and [[bpeEncode]]:
    * returns the learned merge table AND the post-training vocabulary
    * (whose symbol arrays ARE the tokenization of every corpus word).
    */
  private[graft] def bpeTrainLoop(docs: DataFrame, merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    var vocab = bpeVocab(docs).localCheckpoint()
    val learned = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to merges) {
      val best = bpePairCounts(vocab)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      require(best.nonEmpty,
        s"bpeTrain: vocabulary exhausted after ${step - 1} merges")
      val lhs = best(0).getString(0)
      val rhs = best(0).getString(1)
      learned += ((step, lhs, rhs, lhs + rhs, best(0).getLong(2)))
      vocab = bpeMergeApplied(vocab, lhs, rhs).localCheckpoint()
    }
    (learned.result(), vocab)
  }

  /** BPE merge training — the tokenizer-induction stage itself
    * ([[vocabCoverage]] sizes a vocabulary, [[tokenCounts]] budgets under
    * a FIXED pre-tokenizer; this operator LEARNS the merge table a
    * byte-pair-encoding tokenizer ships with). Classic Sennrich-style
    * BPE over lowercase ASCII word forms: the working set is the
    * distinct (word, frequency) vocabulary; each round counts adjacent
    * symbol pairs weighted by word frequency (overlapping occurrences
    * all count — the standard formulation), picks the argmax pair
    * (count desc, then (lhs, rhs) lexicographic — symbols are pure
    * ASCII, so engine collations agree), and rewrites every word by
    * greedy leftmost non-overlapping replacement of the pair.
    *
    * The greedy rewrite is ONE Catalyst `aggregate` fold per word, no
    * shuffle: "last accumulated symbol == lhs AND current == rhs →
    * replace the tail with lhs||rhs" is exactly the leftmost scan,
    * because a just-merged tail symbol (lhs||rhs) can never re-match
    * lhs — rhs is non-empty. BpeTrainSpec property-pins the fold
    * against a naive index-walking reference, repeated-letter runs
    * included. The DuckDB oracle re-trains the identical merge table as
    * chained CTEs (the k-means recipe, [[SimilarityOps]]): matches
    * marked by a lead() window, greedy non-overlap = taking every
    * second match within each run of consecutive matches (runs only
    * arise when lhs == rhs), rebuild via list(... ORDER BY pos) minus
    * positions consumed by a taken left neighbour. Every trained
    * quantity is an exact integer — nothing data-dependent crosses
    * engines.
    *
    * Scale shape: the corpus is read ONCE (one (word, partial-count)
    * Exchange — the shuffle any vocabulary build pays); every round
    * after that runs on the vocabulary-sized relation (Heaps-law
    * bounded — ~10⁸ word forms at 100 TB, never corpus-sized): one
    * (lhs, rhs, partial) Exchange for pair counts, a ONE-row argmax
    * collect (bounded driver state, the k-means discipline), and a
    * zero-shuffle fold projection for the rewrite. `localCheckpoint`
    * after each round keeps round r's plan flat instead of r folds
    * deep — the standard iterative-refinement pattern.
    */
  def bpeTrain(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainLoop(docs, merges)._1
      .toDF("step", "lhs", "rhs", "merged", "pair_freq")
      .orderBy("step")
  }

  /** Corpus tokenization census under the [[bpeTrain]]-learned
    * tokenizer — subtoken counts and the compression ratio
    * (subtokens per word) each document would cost at training time,
    * the number a token budget is actually spent in.
    *
    * Tokenizing a word is a pure function of the word, and the
    * post-training vocabulary's symbol array IS that tokenization for
    * every corpus word — so encoding is a DICTIONARY LOOKUP, not a
    * per-occurrence re-fold: broadcast the vocabulary-sized
    * (word → subtoken count) dictionary and join the exploded word
    * stream against it. One corpus pass, one broadcast hash join, one
    * doc-keyed partial agg (plan-pinned) — the shape that holds when
    * the corpus is 100 TB and the dictionary is Heaps-bounded. The
    * oracle reuses the training CTE chain's final vocabulary relation
    * the same way. Documents with no extractable word forms stay in
    * the census with zero counts (`explode_outer` keeps their row —
    * NOT a join back to the corpus, which would scan it twice and
    * shuffle two doc-sized relations on doc_id).
    */
  def bpeEncode(docs: DataFrame, merges: Int): DataFrame = {
    val dict = bpeTrainLoop(docs, merges)._2
      .select(col("word"), size(col("syms")).cast("long").as("n_sub"))
    parallelized(docs)
      .select(col("doc_id"),
        explode_outer(regexp_extract_all(col("text"),
          lit("[A-Za-z]+"), lit(0))).as("w"))
      .select(col("doc_id"), lower(col("w")).as("word"))
      .join(broadcast(dict), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(col("word")).as("n_words"),
        coalesce(sum("n_sub"), lit(0L)).as("n_subtokens"))
      .select(col("doc_id"), col("n_words"), col("n_subtokens"),
        when(col("n_words") > 0,
          micro(col("n_subtokens") / col("n_words")))
          .otherwise(lit(0L)).as("subtokens_per_word_micro"))
      .orderBy("doc_id")
  }

  /** Tokenizer fertility by language — the cross-lingual tokenizer
    * fairness report (the "fertility" metric of the mBERT/XLM
    * analyses): subtokens per word and bytes per subtoken under the
    * [[bpeTrain]]-learned tokenizer, rolled up per language. A
    * language whose fertility is 2× another's pays 2× the context
    * budget for the same text — the number that drives vocabulary
    * allocation across languages.
    *
    * Same dictionary-lookup shape as [[bpeEncode]] (tokenizing a word
    * is a pure function of the word: broadcast the Heaps-bounded
    * (word → subtoken count) dictionary into the exploded word
    * stream); the rollup is one (lang, partial) Exchange — language
    * cardinality is tiny, the corpus is read once. Word forms are
    * lowercase ASCII so char length == byte length exactly.
    */
  def tokenizerFertility(docs: DataFrame, merges: Int): DataFrame = {
    val dict = bpeTrainLoop(docs, merges)._2
      .select(col("word"), size(col("syms")).cast("long").as("n_sub"))
    parallelized(docs)
      .select(col("doc_id"), col("lang"),
        explode_outer(regexp_extract_all(col("text"),
          lit("[A-Za-z]+"), lit(0))).as("w"))
      .select(col("doc_id"), col("lang"), lower(col("w")).as("word"))
      .join(broadcast(dict), Seq("word"), "left")
      .groupBy("lang")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(col("word")).as("n_words"),
        coalesce(sum("n_sub"), lit(0L)).as("n_subtokens"),
        coalesce(sum(length(col("word")).cast("long")), lit(0L))
          .as("word_bytes"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_subtokens"), col("word_bytes"),
        when(col("n_words") > 0,
          micro(col("n_subtokens") / col("n_words")))
          .otherwise(lit(0L)).as("fertility_micro"),
        when(col("n_subtokens") > 0,
          micro(col("word_bytes") / col("n_subtokens")))
          .otherwise(lit(0L)).as("bytes_per_subtoken_micro"))
  }

  /** Bigram language-model quality scoring — the LM-perplexity filter
    * stage of a curation pipeline (heuristic stats [[tokenStats]] catch
    * garbage; an n-gram LM trained on the corpus's own train split
    * catches fluent-looking noise). Add-one smoothed bigram model:
    * P(w₂|w₁) = (c(w₁,w₂)+1) / (c(w₁)+V), with c from train-split
    * bigrams and V = distinct train tokens; each document scores the
    * average log-probability of its bigrams under that model.
    *
    * Cross-engine exactness discipline: all counts are exact integers;
    * each bigram's ln(ratio-of-exact-ints) is micro-floored PER TERM and
    * the per-doc reduction is an INTEGER sum (summing raw doubles
    * across engines is forbidden — partial-agg association differs);
    * the final average is one exact-integer division, floored.
    *
    * Scale shape: two (bigram, partial-count) aggregations over the
    * train split; scoring is a 1:1 lookup join keyed on the bigram
    * (vocabulary-sized count tables — broadcast at realistic sizes,
    * bucketed by w1 at the extreme); one per-doc partial agg. The
    * bigram sequence comes from a per-doc window (doc_id-partitioned —
    * the same shuffle the per-doc aggregate needs anyway).
    */
  def lmScore(docs: DataFrame, trainPct: Int, valPct: Int): DataFrame = {
    val toks = parallelized(docs).select(col("doc_id"),
      splitAssign(trainPct, valPct).as("split"),
      posexplode(tokens(col("text"))).as(Seq("i", "w")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    // cache the bigram relation: three consumers (model counts, and the
    // scoring pass) would otherwise each re-run the explode + per-doc
    // window — the same shared-relation discipline as contamination's
    // cached fingerprint relation
    val bi = toks.withColumn("w1", lag("w", 1).over(win))
      .filter(col("w1").isNotNull)
      .transform(Materialize.shared)
    val cb = bi.filter(col("split") === "train")
      .groupBy("w1", "w").agg(count(lit(1)).as("cb"))
    // context totals fold out of the bigram counts (sum of cb over w) —
    // aggregating the already-reduced count table, not the full stream
    val cu = cb.groupBy("w1").agg(sum("cb").as("cu"))
    // vocab needs ALL train tokens (doc-initial ones included), but no
    // window — a plain projection scan. An empty train split gives
    // V = 0 and every smoothed denominator (cu + V) = 0 — fail the job
    // loudly (inside the plan, no extra action) instead of emitting
    // log(inf)/null scores
    val vocab = toks.filter(col("split") === "train")
      .agg(countDistinct("w").as("v"))
      .select(when(col("v") > 0L, col("v"))
        .otherwise(raise_error(
          lit("lmScore: empty train split (vocabulary V = 0)")))
        .as("v"))
    val lp = micro(log(
      (coalesce(col("cb"), lit(0L)) + 1L) /
        (coalesce(col("cu"), lit(0L)) + col("v"))))
    bi.join(cb, Seq("w1", "w"), "left")
      .join(cu, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("split"), lp.as("lp_micro"))
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp_micro").as("slp"))
      .select(col("doc_id"), col("split"), col("n_bigrams"),
        floor(col("slp") / col("n_bigrams")).as("avg_lp_micro"))
  }

  /** X72: interpolated Kneser–Ney bigram scoring — THE standard n-gram
    * smoothing (Kneser & Ney 1995; Chen & Goodman 1998's interpolated
    * form with a fixed discount D = 0.75), next to X19's add-one
    * baseline: where add-one hands unseen bigrams a mass proportional
    * to nothing, KN backs off to the CONTINUATION probability — how
    * many distinct contexts a word follows, not how often it occurs —
    * the distinction that scores "San Francisco"-style collocations
    * correctly and is why every production n-gram LM shipped KN for
    * two decades. Scoring twin columns to X19 (same split, same
    * per-doc average-log-prob shape) so the two models' verdicts
    * diff row-for-row.
    *
    * Model (train split): P(w₂|w₁) = max(c₁₂ − D, 0)/c₁ +
    * (D·N₁₊(w₁·)/c₁)·Pc(w₂), with Pc(w₂) = (N₁₊(·w₂) + 1)/(B + V + 1)
    * — the continuation distribution Laplace-+1-smoothed over the
    * B observed bigram types plus a V+1-sized vocab floor (the
    * X19/X52 discipline: smoothing documented, not ε-hidden) so
    * unseen-word scores stay finite; an unseen CONTEXT (c₁ = 0) backs
    * off wholly to Pc (λ = 1, the standard limit).
    *
    * Exactness: all counts exact integers; each bigram's P is ONE
    * fixed double tree (the literal association above — integer
    * subtraction against the 0.75 literal promotes, every division
    * IEEE), micro-floored PER TERM; the per-doc reduction sums
    * INTEGERS and the average is one floored division (the X19
    * protocol exactly).
    *
    * Scale shape: the X19 shape — vocabulary-bounded count tables off
    * one cached bigram relation (broadcast at realistic sizes,
    * bucketed by w1 at the extreme), 1:1 lookup joins keyed on the
    * bigram, one per-doc partial agg; the two one-row model constants
    * broadcast (whitelisted BNLJ).
    */
  def knScore(docs: DataFrame, trainPct: Int, valPct: Int): DataFrame = {
    val toks = parallelized(docs).select(col("doc_id"),
      splitAssign(trainPct, valPct).as("split"),
      posexplode(tokens(col("text"))).as(Seq("i", "w")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    // bi is corpus-sized: never cached (the nothing-corpus-sized-
    // past-the-exchange discipline) — the scoring join re-derives it
    // with one extra token scan
    val bi = toks.withColumn("w1", lag("w", 1).over(win))
      .filter(col("w1").isNotNull)
    // the bigram TYPE table feeds four consumers (lookup, context
    // totals + fan-out, continuation counts, the B constant) — cache
    // the reduced relation, not the stream
    val cb = bi.filter(col("split") === "train")
      .groupBy("w1", "w").agg(count(lit(1)).as("cb"))
      .transform(Materialize.shared)
    val ctx = cb.groupBy("w1")
      .agg(sum("cb").as("cu"), count(lit(1)).as("nf"))
    val nb = cb.groupBy("w").agg(count(lit(1)).as("nb"))
    val vocab = toks.filter(col("split") === "train")
      .agg(countDistinct("w").as("v"))
      .select(when(col("v") > 0L, col("v"))
        .otherwise(raise_error(
          lit("knScore: empty train split (vocabulary V = 0)")))
        .as("v"))
    val bt = cb.agg(count(lit(1)).as("b"))
    val pc = (coalesce(col("nb"), lit(0L)) + lit(1L)) /
      (col("b") + col("v") + lit(1L))
    val p = when(coalesce(col("cu"), lit(0L)) > 0L,
        greatest(coalesce(col("cb"), lit(0L)) - lit(0.75), lit(0.0)) /
          col("cu") +
          ((lit(0.75) * coalesce(col("nf"), lit(0L))) / col("cu")) * pc)
      .otherwise(pc)
    bi.join(cb, Seq("w1", "w"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(nb, Seq("w"), "left")
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(bt))
      .select(col("doc_id"), col("split"), micro(log(p)).as("lp_micro"))
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp_micro").as("slp"))
      .select(col("doc_id"), col("split"), col("n_bigrams"),
        floor(col("slp") / col("n_bigrams")).as("avg_lp_micro"))
  }

  /** X73: document splice-coherence census — the glued-document
    * detector extraction pipelines need and none of the per-doc
    * lenses provides: X21's repetition and X28's rule battery read a
    * document as ONE bag, so two unrelated documents concatenated by
    * a bad extractor (boilerplate joints, truncated-page merges, the
    * classic WET-file splice) sail through both. Here each document's
    * token stream is cut at the midpoint and the two halves'
    * VOCABULARIES are compared — a topically coherent document shares
    * most of its vocabulary across halves (function words + topic
    * terms recur); a splice of unrelated sources reads near-zero
    * Jaccard. Per-source census: mean coherence, the share under the
    * suspect bar, and the minimum — the triage table for extractor
    * QA.
    *
    * Exactness: half membership is an integer compare (2i < n); the
    * half vocabularies, intersection, and union are exact integer
    * counts; per-doc coherence is ONE micro-floored division;
    * sub-2-token docs (single-half) read 0 and are counted in
    * n_degenerate, not averaged (the V45 sentinel discipline); the
    * source mean is a floor of the integer sum (the D16 protocol).
    *
    * Scale shape: one posexplode scan with a per-doc count window
    * (doc_id-partitioned — the same shuffle the per-doc aggregate
    * needs anyway), one (doc, half, word) distinct, two doc-keyed
    * aggregates, one source-cardinality census. Nothing corpus-sized
    * past the token stream.
    */
  val SpliceBarMicro = 200000L

  def spliceCoherence(docs: DataFrame): DataFrame = {
    val toks = parallelized(docs).select(col("doc_id"), col("source"),
      posexplode(tokens(col("text"))).as(Seq("i", "w")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
    val halves = toks.withColumn("n", count(lit(1)).over(win))
      .select(col("doc_id"), col("source"),
        when(lit(2L) * col("i") < col("n"), 0L).otherwise(1L).as("half"),
        col("w"))
      .distinct()
    val perDoc = halves.groupBy("doc_id", "source")
      .agg(countDistinct(col("w")).as("v_union"),
        sum(when(col("half") === 0L, 1L).otherwise(0L)).as("v0"),
        sum(when(col("half") === 1L, 1L).otherwise(0L)).as("v1"))
      .withColumn("inter", col("v0") + col("v1") - col("v_union"))
      .withColumn("coh_micro",
        when(col("v0") > 0 && col("v1") > 0,
          micro(col("inter") / col("v_union"))).otherwise(lit(0L)))
      .withColumn("degenerate",
        when(col("v0") === 0 || col("v1") === 0, 1L).otherwise(0L))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("degenerate").as("n_degenerate"),
        coalesce(sum(when(col("degenerate") === 0L, col("coh_micro"))),
          lit(0L)).as("coh_sum"),
        coalesce(sum(when(col("degenerate") === 0L &&
            col("coh_micro") < SpliceBarMicro, 1L).otherwise(0L)),
          lit(0L)).as("n_suspect"),
        coalesce(min(when(col("degenerate") === 0L, col("coh_micro"))),
          lit(0L)).as("coh_min_micro"))
      .select(col("source"), col("n_docs"), col("n_degenerate"),
        col("n_suspect"),
        when(col("n_docs") - col("n_degenerate") > 0,
          expr("coh_sum div (n_docs - n_degenerate)"))
          .otherwise(lit(0L)).as("coh_mean_micro"),
        col("coh_min_micro"))
  }

  /** Heaps-law vocabulary growth curve — the scaling diagnostic behind
    * vocabulary budgeting: distinct word count at nested corpus
    * fractions 1/8, 1/4, 1/2, 1 (docs bucketed by salted md5, so each
    * fraction is a strict superset of the previous — a genuine growth
    * curve, not four independent samples). Extrapolating the curve
    * tells you the V a 100 TB corpus needs before you pay for the
    * full-corpus census.
    *
    * The corpus is NOT scanned once per fraction. One pass computes
    * each word's MINIMUM doc-bucket (the first fraction the word
    * appears in — one vocabulary-bounded (word, partial-min) Exchange)
    * and each bucket's doc/token totals (an 8-row census); every
    * fraction's numbers are then cumulative sums over ≤ 8-row
    * censuses. Adding more fraction points costs nothing but census
    * rows.
    */
  def heapsCurve(docs: DataFrame): DataFrame = {
    val bucket =
      md5Long(concat(lit("heaps:"), col("doc_id").cast("string"))) % 8L
    val words = parallelized(docs).select(bucket.as("b"),
      explode(tokens(col("text"))).as("w"))
    // vocabulary-bounded: each word's first fraction
    val firstIn = words.groupBy("w").agg(min("b").as("mb"))
      .groupBy("mb").agg(count(lit(1)).as("new_words"))
    // the 5-gram vocabulary grows where a small word pool saturates —
    // the curve n-gram models and winnowing indexes actually live on
    val firstSh = shingleSet(docs, 5)
      .select(bucket.as("b"), col("sh"))
      .groupBy("sh").agg(min("b").as("mb"))
      .groupBy("mb").agg(count(lit(1)).as("new_shingles"))
    // 8-row doc/token census
    val perBucket = parallelized(docs)
      .select(bucket.as("b"), size(tokens(col("text"))).cast("long")
        .as("n_tok"))
      .groupBy("b")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val spark = docs.sparkSession
    import spark.implicits._
    val fractions = Seq(1L, 2L, 4L, 8L).toDF("fraction_eighths")
    fractions
      .join(perBucket, col("b") < col("fraction_eighths"), "left")
      .groupBy("fraction_eighths")
      .agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
        coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
      .join(fractions
        .join(firstIn, col("mb") < col("fraction_eighths"), "left")
        .groupBy("fraction_eighths")
        .agg(coalesce(sum("new_words"), lit(0L)).as("n_distinct_words")),
        Seq("fraction_eighths"))
      .join(fractions
        .join(firstSh, col("mb") < col("fraction_eighths"), "left")
        .groupBy("fraction_eighths")
        .agg(coalesce(sum("new_shingles"), lit(0L))
          .as("n_distinct_shingles")),
        Seq("fraction_eighths"))
  }

  /** Zipf / Good-Turing frequency-of-frequencies census — the other
    * half of the vocabulary diagnostic [[heapsCurve]] starts: for
    * every observed word frequency c, how many TYPES occur exactly c
    * times (Good-Turing's N_c, the table smoothing estimators are
    * built from) and how many tokens those types carry, with a
    * top-down cumulative so "keep only words seen ≥ c times" reads
    * straight off the curve — the truncation question every
    * vocabulary / min-count cutoff answers by guesswork otherwise.
    *
    * Scale: one (word, partial-count) Exchange builds the
    * vocabulary-bounded count relation; the frequency census is a
    * second partial-agg'd Exchange over DISTINCT COUNT VALUES — at
    * most O(√totalTokens) rows regardless of corpus size (c·N_c ≤ T
    * forces distinct c values under √(2T)), so the cumulative window
    * runs over a provably tiny census, never the corpus (the D17
    * precedent, with a closed-form bound instead of a bucket count).
    * All integers end to end; frequencies are distinct after grouping
    * so DuckDB's default RANGE frame equals Spark's ROWS frame.
    */
  def zipfCensus(docs: DataFrame): DataFrame = {
    val counts = parallelized(docs)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val census = counts.groupBy("freq")
      .agg(count(lit(1)).as("n_types"))
      .select(col("freq"), col("n_types"),
        (col("freq") * col("n_types")).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    census.select(col("freq"), col("n_types"), col("n_tokens"),
      sum("n_tokens").over(w).as("n_tokens_at_or_above"))
  }

  /** X68: Good-Turing smoothing census — [[zipfCensus]]'s N_c table
    * turned into the estimators it exists for (Good 1953; Gale &
    * Sampson 1995): per observed count r, the smoothed count
    * r* = (r+1)·N_{r+1}/N_r (0 where the next cell is empty — simple
    * GT leaves those to the fitted regime), and on every row the
    * global unseen-mass estimate p₀ = N₁/T — the number that says how
    * much probability a vocabulary-closed LM must reserve for words
    * it has never seen, i.e. how far from closed this corpus's
    * vocabulary still is (the Heaps/X37 question, answered as a
    * probability instead of a curve).
    *
    * Exactness: all inputs are exact integers off the token census;
    * r* and p₀ are single positive integer floor-divisions
    * (`(10⁶·(r+1)·N_{r+1}) div N_r`), no doubles anywhere. Long
    * headroom: 10⁶·(r+1)·N_{r+1} ≤ ~2·10⁶·T, exact up to T ≈ 4.6·10¹²
    * tokens per corpus — beyond that, shard the census (documented
    * ceiling, not a silent wrap; DuckDB errors past it identically).
    *
    * Scale shape: the [[zipfCensus]] shape exactly — one vocab-bounded
    * (word, partial) Exchange, one ≤ √(2T)-row frequency census, then
    * a census-sized self-join on r+1 and a one-row broadcast of the
    * totals. Nothing corpus-sized past the first Exchange.
    */
  def goodTuringCensus(docs: DataFrame): DataFrame = {
    val ff = parallelized(docs)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("r"))
      .groupBy("r").agg(count(lit(1)).as("n_r"))
    val ffNext = ff.select((col("r") - 1).as("r"),
      col("n_r").as("n_next"))
    val tot = ff.agg(sum(col("r") * col("n_r")).as("t_tokens"),
      sum("n_r").as("v_types"),
      coalesce(sum(when(col("r") === 1, col("n_r"))), lit(0L))
        .as("n1"))
    ff.join(ffNext, Seq("r"), "left")
      .withColumn("n_next", coalesce(col("n_next"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"), col("n_next"),
        expr("(1000000 * (r + 1) * n_next) div n_r")
          .as("r_star_micro"),
        col("t_tokens"), col("v_types"),
        expr("(1000000 * n1) div t_tokens").as("p0_micro"))
  }

  /** X69: nonparametric vocabulary-richness estimators — Chao1 and
    * ACE over the frequency-of-frequencies census (Chao 1984; Chao &
    * Lee 1992): where X68's Good-Turing p₀ says how much probability
    * mass the unseen vocabulary holds, this says how many TYPES are
    * still unseen — the "how big is the vocabulary really" question
    * behind tokenizer sizing and corpus-coverage planning. Chao1's
    * bias-corrected form V + N₁(N₁−1)/(2(N₂+1)) is defined even with
    * no doubletons; ACE splits the vocabulary at the standard
    * abundance threshold r ≤ 10 and inflates the rare block by its
    * sample coverage C = 1 − N₁/N_rare with a CV correction γ².
    *
    * Exactness: every input is an exact integer off the census;
    * chao1_extra is a single POSITIVE integer floor-division (whole
    * types — a fractional species estimate is spurious precision);
    * ACE is ONE micro-floored double tree (three divisions + one
    * max(0, ·), products promoted to double before multiplying),
    * mirrored verbatim. Guards: coverage C ≤ 0 (N₁ = N_rare — every
    * rare type a singleton) or n_rare < 2 reads ace_micro = 0, the
    * standard "fall back to Chao1" signal. Long headroom:
    * N₁·(N₁−1) exact to N₁ ≈ 3·10⁹ singleton types (documented
    * ceiling — DuckDB errors identically past it).
    *
    * Scale shape: the [[zipfCensus]] shape — one vocab-bounded
    * (word, partial) Exchange, a ≤ √(2T)-row frequency census, then
    * ONE-ROW arithmetic. Nothing corpus-sized past the first
    * Exchange.
    */
  def richnessCensus(docs: DataFrame): DataFrame = {
    val ff = parallelized(docs)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("r"))
      .groupBy("r").agg(count(lit(1)).as("n_r"))
    val agg = ff.agg(
      sum("n_r").as("v_types"),
      sum(col("r") * col("n_r")).as("t_tokens"),
      coalesce(sum(when(col("r") === 1, col("n_r"))), lit(0L)).as("n1"),
      coalesce(sum(when(col("r") === 2, col("n_r"))), lit(0L)).as("n2"),
      coalesce(sum(when(col("r") <= 10, col("n_r"))), lit(0L))
        .as("v_rare"),
      coalesce(sum(when(col("r") <= 10, col("r") * col("n_r"))), lit(0L))
        .as("n_rare"),
      coalesce(sum(when(col("r") <= 10,
        col("r") * (col("r") - 1) * col("n_r"))), lit(0L)).as("sum_rr1"))
    val cAce = lit(1.0) - col("n1") / col("n_rare")
    val g2 = greatest(lit(0.0),
      (col("v_rare").cast("double") * col("sum_rr1")) /
        ((cAce * col("n_rare")) * (col("n_rare") - 1)) - lit(1.0))
    val ace = (col("v_types") - col("v_rare")) + col("v_rare") / cAce +
      (col("n1") / cAce) * g2
    agg.select(col("v_types"), col("t_tokens"), col("n1"), col("n2"),
      col("v_rare"), (col("v_types") - col("v_rare")).as("v_abund"),
      col("n_rare"),
      (col("v_types") +
        expr("(n1 * (n1 - 1)) div (2 * (n2 + 1))")).as("chao1_est"),
      when(col("n_rare") >= 2 && col("n1") < col("n_rare"),
        micro(ace)).otherwise(lit(0L)).as("ace_micro"))
  }

  /** X71: Yule's characteristic K + unbiased Simpson repeat rate per
    * source — the LENGTH-INVARIANT lexical-repetition constant (Yule
    * 1944; Herdan 1964; Tweedie & Baayen 1998 for the invariance
    * result): K = 10⁴·(Σc² − T)/T² is asymptotically stable under
    * corpus growth where raw TTR (X54's window workaround) and
    * entropy (X55) drift with T — the one repetition number you can
    * compare ACROSS sources of wildly different sizes without a
    * length correction, which is exactly the mixing-policy question
    * (which source is template-spam before weighting it). The
    * companion column is the unbiased Simpson repeat rate
    * S = Σc(c−1)/(T(T−1)) — the probability two tokens drawn without
    * replacement are the same type (K ≈ 10⁴·S for large T; both
    * emitted so the small-source bias is visible).
    *
    * Exactness: V, T, M2 = Σc² are exact integer aggregates off the
    * per-source token census; K and S are each ONE micro-floored
    * double tree with products promoted to double BEFORE multiplying
    * (the ADVICE-r11 rule — T² never forms as a Long). Long headroom
    * on M2: worst case one type carrying all tokens, exact to
    * T ≈ 3·10⁹ tokens per source (documented ceiling; DuckDB's
    * BIGINT multiply errors identically past it, no silent wrap).
    * Degenerate guards: T = 0 → both 0; T = 1 → S = 0.
    *
    * Scale shape: ONE (source, word) partial-agg'd Exchange with
    * map-side combine (vocabulary-bounded per source), then a
    * source-cardinality aggregate — nothing corpus-sized past the
    * first Exchange, no windows, no joins.
    */
  def yuleK(docs: DataFrame): DataFrame = {
    val counts = parallelized(docs)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val agg = counts.groupBy("source")
      .agg(count(lit(1)).as("v_types"), sum("c").as("t_tokens"),
        sum(col("c") * col("c")).as("m2"))
    val t = col("t_tokens").cast("double")
    val k = lit(10000.0) * (col("m2") - col("t_tokens")) / (t * t)
    val s = (col("m2") - col("t_tokens")).cast("double") /
      (t * (col("t_tokens") - 1))
    agg.select(col("source"), col("t_tokens"), col("v_types"),
      col("m2"),
      when(col("t_tokens") > 0, micro(k)).otherwise(lit(0L))
        .as("yule_k_micro"),
      when(col("t_tokens") > 1, micro(s)).otherwise(lit(0L))
        .as("simpson_micro"))
  }

  /** [[zipfCensus]] with a TWO-LEVEL cumulative — the formulation for
    * the regime past the census bound's comfort zone. The plain census
    * is provably ≤ √(2T) rows (c·N_c ≤ T), ~6.3M rows at 100 TB — one
    * executor's sort, the stated budget. This variant removes even that
    * single-partition window: frequencies are range-bucketed
    * (freq >> bucketBits), the top-down cumulative runs as a
    * PARTITIONED window within each bucket, and the cross-bucket
    * carry is a second cumulative over the non-empty-bucket census —
    * ≤ maxFreq / 2^bucketBits rows (thousands at any corpus size with
    * the default 16 bits), the only global ordering left. Output is
    * row-identical to [[zipfCensus]] (spec-asserted): for a census row
    * in bucket b, tokens-at-or-above = the within-bucket cumulative
    * plus every strictly-higher bucket's total.
    *
    * Cost vs the flat census: one extra (bucket, partial) Exchange for
    * the bucket totals and the bucket-join — both bounded by census
    * rows, nothing corpus-sized.
    */
  def zipfCensusBucketed(docs: DataFrame, bucketBits: Int = 16)
      : DataFrame = {
    val counts = parallelized(docs)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val census = counts.groupBy("freq")
      .agg(count(lit(1)).as("n_types"))
      .select(col("freq"), col("n_types"),
        (col("freq") * col("n_types")).as("n_tokens"),
        shiftright(col("freq"), bucketBits).as("bucket"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("freq").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val inBucket = census.withColumn("cum_in", sum("n_tokens").over(wIn))
    val wHigher = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val carries = census.groupBy("bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .select(col("bucket"),
        coalesce(sum("bucket_tokens").over(wHigher), lit(0L))
          .as("higher_tokens"))
    inBucket.join(carries, Seq("bucket"))
      .select(col("freq"), col("n_types"), col("n_tokens"),
        (col("cum_in") + col("higher_tokens")).as("n_tokens_at_or_above"))
  }

  /** Fractional source upsampling — the epoch-repeat assignment of a
    * weighted data recipe (the LLaMA-style "Wikipedia ×2.5, web ×0.8"
    * table): a source weighted w repeats each of its documents
    * floor(w) times plus one more with probability frac(w), decided by
    * a salted md5 of doc_id — never `rand()` ([[splitBucket]]'s
    * discipline), so the same (corpus, salt) re-derives the identical
    * repeat plan on every run and retry. Complements [[trainingMix]] /
    * temperature mixing, which only SUBSAMPLE (weights ≤ 1): this is
    * the operator that realizes weights above 1. Weights are micro
    * ints; sources absent from the table default to 1.0 (pass-through).
    *
    * Output is the per-source census — docs, emitted repeats, target
    * vs realized weight and their gap (shrinks as 1/n by LLN; the spec
    * pins exactness on a crafted corpus instead). Scale shape: one
    * broadcast of the weight table into a two-column projection of the
    * corpus, one (source, partial) Exchange; the coin is a pure
    * per-row function — no state, no window, nothing corpus-global.
    */
  /** Per-document repeat counts under a fractional weight table — the
    * shared kernel of [[fractionalUpsample]] (census) and
    * [[upsampleShards]] (the materialized epoch stream).
    */
  private def upsampleRepeats(docs: DataFrame,
      weights: Seq[(String, Long)], salt: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toDF("source", "w_micro")
    val coin =
      md5Long(concat(lit(s"$salt:"), col("doc_id").cast("string"))) %
        1000000L
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(w), Seq("source"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("w_micro"), lit(1000000L)).as("w_micro"),
        (floor(coalesce(col("w_micro"), lit(1000000L)) / 1000000L) +
          when(coin < coalesce(col("w_micro"), lit(1000000L)) % 1000000L,
            1L).otherwise(0L)).as("n_rep"))
  }

  def fractionalUpsample(docs: DataFrame, weights: Seq[(String, Long)],
                         salt: String): DataFrame = {
    upsampleRepeats(docs, weights, salt)
      .groupBy("source")
      .agg(max("w_micro").as("target_w_micro"),
        count(lit(1)).as("n_docs"),
        sum("n_rep").as("n_emitted"))
      .select(col("source"), col("target_w_micro"), col("n_docs"),
        col("n_emitted"),
        micro(col("n_emitted") / col("n_docs")).as("realized_w_micro"),
        abs(micro(col("n_emitted") / col("n_docs")) -
          col("target_w_micro")).as("abs_dev_micro"))
  }

  /** ACTING on [[fractionalUpsample]] the way [[shuffleShard]] acts on
    * the 1× corpus: materialize the upsampled epoch STREAM. Every
    * (doc, repeat) copy is an independent unit — its shard/position
    * hash includes the repeat index, so a doc's 3 copies scatter
    * independently across the epoch instead of training back-to-back
    * (the property repeat-weighting needs to not behave like simple
    * concatenation); a weight-0.75 doc whose coin missed drops out of
    * the epoch entirely. Same (corpus, weights, salts) ⇒ identical
    * stream; the epoch salt re-deals positions without touching the
    * repeat plan.
    *
    * Scale shape: [[upsampleRepeats]]'s broadcast + a bounded explode
    * (Σ weights × docs rows), then exactly [[shuffleShard]]'s cost —
    * one hash-partition Exchange on shard and a per-shard sort, no
    * global ordering; raise nShards until a shard fits the executor
    * sort budget.
    */
  def upsampleShards(docs: DataFrame, weights: Seq[(String, Long)],
      salt: String, nShards: Int, epochSalt: String): DataFrame = {
    val copies = upsampleRepeats(docs, weights, salt)
      .filter(col("n_rep") > 0L)
      .select(col("doc_id"),
        explode(sequence(lit(1L), col("n_rep"))).as("rep"))
    val h = md5Long(concat(lit(s"shuf:$epochSalt:"),
      col("doc_id").cast("string"), lit(":"), col("rep").cast("string")))
    val base = copies.select(col("doc_id"), col("rep"), h.as("h"),
      (h % nShards.toLong).as("shard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("h", "doc_id", "rep")
    base.select(col("shard"),
      row_number().over(w).cast("long").as("pos"),
      col("doc_id"), col("rep"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    * split each language's documents into head/middle/tail terciles of
    * the [[lmScore]] fluency score — the filter CCNet uses to keep the
    * most-fluent third of Common Crawl per language.
    *
    * The tercile is NOT a per-document ntile — that would globally
    * sort every language's documents. Instead the cut thresholds come
    * from a (lang, score) CENSUS: cumulative doc counts over DISTINCT
    * score values pick the bucket each score value belongs to, and
    * documents join the verdict back by (lang, score). Equal-scoring
    * documents therefore land in the same bucket as a group (true
    * threshold semantics — CCNet applies score cutoffs, not rank
    * cuts), and a tie group straddling a boundary falls wholly into
    * the later bucket. Deterministic with no tie-break column at all.
    *
    * Scale shape: the corpus pays the [[lmScore]] cost plus ONE
    * (lang, score) partial-agg Exchange; both windows run over the
    * census (bounded by distinct score values, far smaller than the
    * corpus — scores are integer micros of an average, heavily
    * collided); the verdict joins back keyed on (lang, score) with no
    * broadcast hint, so a degenerate all-distinct census may shuffle
    * while AQE broadcasts the typical tiny one.
    */
  def pplBuckets(docs: DataFrame, trainPct: Int, valPct: Int): DataFrame =
    bucketize(lmScore(docs, trainPct, valPct)
      .join(docs.select("doc_id", "lang"), "doc_id"))

  /** The census-threshold tercile assignment over already-scored rows
    * (doc_id, split, avg_lp_micro, lang) — separated so the bucketing
    * semantics are unit-testable without training an LM.
    */
  def bucketize(scoredIn: DataFrame): DataFrame = {
    // two consumers (census + verdict join): cache the per-doc scores
    // so the LM aggregation pass runs once — same operator-scoped
    // discipline as lmScore's bigram cache
    val scored = scoredIn.transform(Materialize.shared)
    val census = scored.groupBy("lang", "avg_lp_micro")
      .agg(count(lit(1)).as("c"))
    val byScoreDesc = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("avg_lp_micro").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    val cut = census
      .withColumn("cum", sum("c").over(byScoreDesc))
      .withColumn("n_lang", sum("c").over(whole))
      .select(col("lang"), col("avg_lp_micro"),
        when(col("cum") * 3L <= col("n_lang"), "head")
          .when(col("cum") * 3L <= col("n_lang") * 2L, "middle")
          .otherwise("tail").as("bucket"),
        col("n_lang"))
    scored.join(cut, Seq("lang", "avg_lp_micro"))
      .select(col("doc_id"), col("lang"), col("split"),
        col("avg_lp_micro"), col("bucket"), col("n_lang"))
  }

  /** Intra-document repetition stats — the Gopher/MassiveText-style
    * repetition filter: the fraction of a document's word n-gram
    * OCCURRENCES that belong to an n-gram appearing more than once in
    * the same document. Complements [[tokenStats]]'s distinct-token
    * ratio (which catches token-level loops but not phrase-level
    * boilerplate) and [[chunkDocs]]-based dedup (which is cross-doc).
    * Docs shorter than n tokens have no grams and drop out.
    *
    * Shape: one explode + two hash aggregations, both keyed within the
    * document — the (doc, gram) shuffle carries map-side partials.
    */
  def repetitionStats(docs: DataFrame, n: Int): DataFrame = {
    // multiplicity matters here: no array_distinct (unlike shingleSet)
    val grams = parallelized(docs).select(col("doc_id"),
      explode(textShingles(col("text"), n)).as("g"))
    grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"),
        sum(when(col("c") > 1L, col("c")).otherwise(0L)).as("rep_grams"))
      .select(col("doc_id"), col("n_grams"), col("rep_grams"),
        micro(col("rep_grams") / col("n_grams")).as("rep_micro"))
  }

  /** Boilerplate n-gram census — the CCNet/RefinedWeb repeated-line
    * filter re-expressed for a corpus without line structure: the `k`
    * most document-frequent word n-grams ARE the corpus's boilerplate
    * set (navigation chrome, cookie banners, license headers — whatever
    * phrase repeats across documents rather than within one, the
    * complement of [[repetitionStats]]' within-doc signal), and each
    * document reports how much of its gram stream that set covers,
    * with a keep verdict under `barMicro`.
    *
    * Output: (doc_id, n_grams, boiler_hits, boiler_micro, kept 1/0).
    * Sub-n-token documents have zero grams, zero coverage, kept = 1.
    *
    * Scale shape: ONE corpus scan — the occurrence stream is cached and
    * consumed twice (distinct-set census, hit count). The document-
    * frequency census is one (gram) Exchange; the top-k cut is a
    * bounded TakeOrdered with a deterministic (df desc, gram) order, and
    * the k winners broadcast to the occurrence stream, so the hit count
    * pays only its (doc_id) partial-agg Exchange. At 100 TB the census
    * side would run over 60-bit gram hashes with strings resolved only
    * for the k winners ([[ngramJaccardPairs]]' discipline); the string
    * census here keeps the oracle exact.
    */
  def boilerplateStats(docs: DataFrame, n: Int, k: Int,
                       barMicro: Long): DataFrame = {
    val occ = parallelized(docs).select(col("doc_id"),
      explode(textShingles(col("text"), n)).as("sh")).transform(Materialize.shared)
    val topK = occ.distinct()
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("sh")).limit(k)
      .select("sh")
    val hits = occ.join(broadcast(topK), Seq("sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("boiler_hits"))
    val totals = docs.select(col("doc_id"),
      greatest(size(tokens(col("text"))) - (n - 1), lit(0))
        .cast("long").as("n_grams"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("boiler_hits"), lit(0L)).as("boiler_hits"))
      .withColumn("boiler_micro",
        when(col("n_grams") === 0L, 0L)
          .otherwise(micro(col("boiler_hits") / col("n_grams"))))
      .withColumn("kept",
        when(col("boiler_micro") < barMicro, 1L).otherwise(0L))
  }

  /** X43: co-occurrence lift census over the top-V corpus terms — the
    * collocation-mining readout (PMI's argument without the log, so
    * every value is ONE IEEE division of exact integers and the
    * cross-engine compare stays bit-exact): for terms t1 < t2,
    * lift = P(t1,t2) / (P(t1)·P(t2)) = co·N / (df1·df2), where co is
    * the number of documents containing both and df the per-term
    * document frequency. lift > 1 means the terms travel together
    * (phrases, templates — candidate compounds for a tokenizer or a
    * topic signal); lift < 1 means they repel (register/domain
    * separation). A corpus assembler reads this census to spot
    * template stitching that per-document stats can't see.
    *
    * Scale shape: the top-V cut is a bounded TakeOrdered over the term
    * census (count desc, term asc — deterministic on both engines) and
    * the V winners BROADCAST to the occurrence stream, so the distinct
    * (doc_id, term) relation carries at most V rows per document. Pair
    * generation self-joins that relation on doc_id — fan-out ≤ C(V,2)
    * per document, a constant, never corpus² — and partial-aggregates
    * before its (t1, t2) Exchange (≤ C(V,2) groups total). Replication
    * invariance: corpus ×k scales co, df, and N by k each, so lift is
    * EXACTLY invariant — "more data" does not manufacture collocation
    * signal (probed in ScaleProbe).
    */
  def coocLift(docs: DataFrame, topV: Int): DataFrame = {
    val occ = parallelized(docs).select(col("doc_id"),
      explode(tokens(col("text"))).as("t"))
    val topTerms = occ.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(topV).select("t")
    val dt = occ.join(broadcast(topTerms), Seq("t"))
      .select("doc_id", "t").distinct()
    val dfc = dt.groupBy("t").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val pairs = dt.as("a").join(dt.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.t") < col("b.t"))
      .select(col("a.t").as("t1"), col("b.t").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("co"))
    pairs
      .join(broadcast(dfc.select(col("t").as("t1"), col("df").as("df1"))),
        Seq("t1"))
      .join(broadcast(dfc.select(col("t").as("t2"), col("df").as("df2"))),
        Seq("t2"))
      .crossJoin(broadcast(nDocs))
      .select(col("t1"), col("t2"), col("co"), col("df1"), col("df2"),
        micro(col("co") * col("n_docs") / (col("df1") * col("df2")))
          .as("lift_micro"))
  }

  /** X44's KS statistic between two VALUE CENSUSES (v, cnt) — the
    * census-level core [[ksDrift]] computes pairwise per source,
    * exposed for the streaming drift monitor
    * ([[graft.streaming.DriftMonitor]]) where one side is a batch and
    * the other a persisted reference. Same exactness: integer
    * numerator max, one division. Returns ONE row
    * (n_a, n_b, ks_num, ks_micro).
    */
  def ksBetweenCensuses(a: DataFrame, b: DataFrame): DataFrame = {
    val grid = a.select("v").union(b.select("v")).distinct()
    def cum(cen: DataFrame, tag: String) =
      grid.join(cen, Seq("v"), "left")
        .select(col("v"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .withColumn(s"cum_$tag",
          sum("cnt").over(org.apache.spark.sql.expressions.Window
            .partitionBy(lit(0)).orderBy("v")))
        .select(col("v"), col(s"cum_$tag"))
    val joined = cum(a, "a").join(cum(b, "b"), Seq("v")).transform(Materialize.shared)
    val totals = joined
      .agg(max("cum_a").as("n_a"), max("cum_b").as("n_b"))
    joined.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))
          .as("num"))
      .groupBy("n_a", "n_b").agg(max("num").as("ks_num"))
      .select(col("n_a"), col("n_b"), col("ks_num"),
        micro(col("ks_num") / (col("n_a") * col("n_b")))
          .as("ks_micro"))
  }

  /** X51: Population Stability Index per source against the corpus
    * reference — the OTHER production drift metric beside X44's KS:
    * where KS is the sup-norm of the CDF gap (one worst point), PSI
    * is an f-divergence over decile buckets,
    * Σ (p_b − q_b)·ln(p_b/q_b) — every bucket's deviation contributes
    * and tail mass is weighted by the log ratio, so PSI flags a
    * fattened tail KS can underweight. Industry reading: < 0.1 quiet,
    * 0.1–0.25 investigate, > 0.25 re-fit.
    *
    * Construction: reference buckets are the CORPUS length deciles
    * (rank-picked integer edges — actual corpus values, the X46
    * discipline; tied edges merge buckets, the standard behavior);
    * each source's distribution lands on those buckets; Laplace +1
    * smoothing on every bucket count (both sides) keeps empty buckets
    * finite — documented, not hidden behind an ε.
    *
    * Exactness: counts are exact integers end to end; each bucket's
    * term is micro-floored from a FIXED double tree — p and q one
    * division each, one ln of their ratio, one multiply (the X19 ln
    * discipline) — and the per-source reduction sums INTEGERS.
    *
    * Scale shape: everything after the (source, value) census
    * partial-agg runs census-sized: decile edges come off the global
    * value census (winsor's rank machinery), bucket assignment joins
    * the census against NINE broadcast edges, and the PSI rollup is
    * sources × 10 rows.
    */
  def psiDrift(docs: DataFrame): DataFrame = {
    val scen = lengthCensus(docs).transform(Materialize.shared)
    // the bucket census (≤ sources × 10 rows) is consumed FOUR times
    // by the rollup (srcTotals, refBucket, nAll, the terms join);
    // uncached, each consumer re-runs the edge derivation INCLUDING
    // its broadcast job — the r13 factoring moved nAll from a
    // one-stage agg over the cached length census onto this chain and
    // cost q_psi ~0.9 s of pure job overhead (the r14 mover
    // adjudication); caching the tiny census restores one-execution
    // semantics for the whole chain
    psiFromBuckets(sourceBucketsFromCensus(scen,
      lengthDecileEdgesFromCensus(scen)).transform(Materialize.shared))
  }

  /** The (source, token-length) count census X51 reduces the corpus
    * to.
    *
    * No `parallelized`: tokenizing into a census is scan-cheap, and
    * the repartition it inserts would shuffle full document text for
    * a projection the scan parallelism already covers.
    */
  private def lengthCensus(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        size(tokens(col("text"))).cast("long").as("v"))
      .groupBy("source", "v").agg(count(lit(1)).as("cnt"))

  /** X51's reference bucket edges: the 9 rank-picked length deciles
    * (i, edge) of a REFERENCE corpus — exposed so a drift monitor can
    * fix them once ([[graft.streaming.StreamingPsi]] persists them
    * next to its store) and score every later batch against the same
    * grid.
    */
  def lengthDecileEdges(docs: DataFrame): DataFrame =
    lengthDecileEdgesFromCensus(lengthCensus(docs))

  private def lengthDecileEdgesFromCensus(scen: DataFrame): DataFrame = {
    val cen = scen.groupBy("v").agg(sum("cnt").as("cnt"))
    val cum = cen.withColumn("cum",
      sum("cnt").over(org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy("v")))
    val nAll = cen.agg(sum("cnt").as("n_all"))
    nAll
      .select(explode(sequence(lit(1), lit(9))).as("i"), col("n_all"))
      .withColumn("r",
        floor((col("n_all") - 1L) * col("i") / lit(10.0)).cast("long"))
      .join(cum, col("r") >= col("cum") - col("cnt") &&
        col("r") < col("cum"))
      .select(col("i"), col("v").as("edge"))
  }

  /** The per-(source, bucket) integer mass census on a FIXED edge
    * grid — X51's middle relation, and the streaming store's merge
    * unit: counts on the same edges merge by plain integer sum (an
    * exact semilattice), so accumulated batch censuses equal the
    * concatenated corpus's census bit-for-bit.
    */
  def sourceBuckets(docs: DataFrame, edges: DataFrame): DataFrame =
    sourceBucketsFromCensus(lengthCensus(docs), edges)

  private def sourceBucketsFromCensus(scen: DataFrame,
                                      edges: DataFrame): DataFrame =
    scen.crossJoin(broadcast(edges))
      .groupBy("source", "v")
      .agg(max("cnt").as("cnt"),
        sum(when(col("v") > col("edge"), 1L).otherwise(0L))
          .as("bucket"))
      .groupBy("source", "bucket")
      .agg(sum("cnt").as("n_b"))

  /** X51's PSI rollup over a (source, bucket, n_b) mass census — the
    * reference distribution is the pooled census (all sources), the
    * total is its integer sum, and every downstream double tree is
    * the X51 original verbatim, so PSI off an accumulated streaming
    * census is bit-identical to the batch query over the same rows.
    */
  def psiFromBuckets(perSrcBucket: DataFrame): DataFrame = {
    val srcTotals = perSrcBucket.groupBy("source")
      .agg(sum("n_b").as("n_s"))
    val refBucket = perSrcBucket.groupBy("bucket")
      .agg(sum("n_b").as("m_b"))
    val nAll = perSrcBucket.agg(sum("n_b").as("n_all"))
    val grid = srcTotals.select(col("source"), col("n_s"),
      explode(sequence(lit(0L), lit(9L))).as("bucket"))
    val terms = grid
      .join(perSrcBucket, Seq("source", "bucket"), "left")
      .join(broadcast(refBucket), Seq("bucket"), "left")
      .crossJoin(broadcast(nAll))
      .select(col("source"), col("n_s"),
        (coalesce(col("n_b"), lit(0L)) + 1L).as("sn"),
        (col("n_s") + 10L).as("sd"),
        (coalesce(col("m_b"), lit(0L)) + 1L).as("rn"),
        (col("n_all") + 10L).as("rd"))
      .select(col("source"), col("n_s"),
        micro((col("sn") / col("sd") - col("rn") / col("rd")) *
          log((col("sn") / col("sd")) / (col("rn") / col("rd"))))
          .as("term_micro"))
    terms.groupBy("source")
      .agg(max("n_s").as("n_docs"), sum("term_micro").as("psi_micro"))
  }

  /** X50: term burstiness census (Church & Gale's variance-to-mean
    * dispersion) over the top-V corpus terms — the within-document
    * companion of X43's cross-document lift: VMR = 1 is Poisson
    * scatter (function-word behavior), VMR ≫ 1 is bursty (a term that
    * arrives in clumps — topical/content words, or template blocks
    * repeating inside documents). A tokenizer/stopword policy and the
    * X27 boilerplate bar both read this: high-df + high-VMR terms are
    * template signatures, high-df + VMR ≈ 1 terms are glue.
    *
    * Exactness: with per-doc counts x_d over ALL N docs (zeros
    * included — they contribute nothing to the sums, so only the
    * occurrence rows are ever materialized),
    * VMR = (N·Σx² − (Σx)²) / (N·Σx) and mean = Σx/N — integer
    * numerators, ONE IEEE division each, micro-floored.
    *
    * Scale shape: the X43 census shape — top-V winners broadcast to
    * the occurrence stream, one (doc, term) partial-agg, then a
    * V-row rollup. Nothing pairwise.
    */
  def burstinessCensus(docs: DataFrame, topV: Int): DataFrame = {
    val occ = parallelized(docs).select(col("doc_id"),
      explode(tokens(col("text"))).as("t"))
    val topTerms = occ.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(topV).select("t")
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val perDoc = occ.join(broadcast(topTerms), Seq("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("x"))
    perDoc.groupBy("t")
      .agg(count(lit(1)).as("df"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .crossJoin(broadcast(nDocs))
      .select(col("t"), col("df"), col("sx"), col("n_docs"),
        micro(col("sx") / col("n_docs")).as("mean_micro"),
        micro((col("n_docs") * col("sxx") - col("sx") * col("sx")) /
          (col("n_docs") * col("sx"))).as("vmr_micro"))
  }

  /** X46: winsorized robust length stats per source — the outlier-
    * tolerant profile a pipeline reads where a plain mean is dominated
    * by a few megadocs (and a plain trim throws data away): values
    * clipped at the empirical p05/p95 BOUNDS (rank-picked, no
    * interpolation — the bounds are actual corpus values, so all math
    * stays integer), then an exact integer mean of the clipped
    * multiset. One division at the end.
    *
    * Scale shape: the R17 census machinery with a rank PICK instead of
    * interpolation — the (source, value) census partial-aggregates
    * map-side, bounds come off cumulative ranges, the winsorized sum
    * is Σ cnt·clip(v) over census rows. Nothing after the census
    * Exchange scales with rows.
    */
  def winsorStats(docs: DataFrame, pLoMilli: Long = 50L,
                  pHiMilli: Long = 950L): DataFrame = {
    val cen = parallelized(docs).select(col("source"),
        size(tokens(col("text"))).cast("long").as("v"))
      .groupBy("source", "v").agg(count(lit(1)).as("cnt"))
      .transform(Materialize.shared)
    val cum = cen.withColumn("cum",
      sum("cnt").over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("v")))
    val n = cen.groupBy("source").agg(sum("cnt").as("n"))
    // rank-picked bounds: value at 0-based rank floor((n-1)·p)
    val tgt = n.select(col("source"), col("n"),
      floor((col("n") - 1L) * pLoMilli / lit(1000.0)).cast("long")
        .as("r_lo"),
      floor((col("n") - 1L) * pHiMilli / lit(1000.0)).cast("long")
        .as("r_hi"))
    val lo = tgt.join(cum, Seq("source"))
      .filter(col("r_lo") >= col("cum") - col("cnt") &&
        col("r_lo") < col("cum"))
      .select(col("source"), col("n"), col("r_hi"), col("v").as("lo"))
    val bounds = lo.join(cum, Seq("source"))
      .filter(col("r_hi") >= col("cum") - col("cnt") &&
        col("r_hi") < col("cum"))
      .select(col("source"), col("n"), col("lo"), col("v").as("hi"))
    cen.join(bounds, Seq("source"))
      .select(col("source"), col("n"), col("lo"), col("hi"),
        col("cnt"),
        (col("cnt") * greatest(least(col("v"), col("hi")), col("lo")))
          .as("wsum"),
        when(col("v") < col("lo"), col("cnt")).otherwise(0L)
          .as("clip_lo"),
        when(col("v") > col("hi"), col("cnt")).otherwise(0L)
          .as("clip_hi"))
      .groupBy("source")
      .agg(max("n").as("n"), max("lo").as("lo"), max("hi").as("hi"),
        sum("clip_lo").as("n_clip_lo"), sum("clip_hi").as("n_clip_hi"),
        sum("wsum").as("wsum"))
      .withColumn("wmean_micro", micro(col("wsum") / col("n")))
  }

  /** X47: source concentration census — HHI (Herfindahl–Hirschman,
    * Σ share²) and top-source share of the corpus, on both a
    * doc-count and a token-count basis. The one-glance answer to "is
    * this corpus actually diverse or is it one provider wearing
    * twenty names" (read next to X40's mirror matrix, which says
    * whether the providers also ship the same bytes). HHI over k
    * equal sources = 1/k; → 1 as one source dominates.
    *
    * Exactness: HHI = (Σ c²)/T² and top = max(c)/T with integer
    * numerators — the share-squares never materialize individually,
    * so each statistic is ONE IEEE division of exact integers.
    *
    * Scale shape: both bases reduce to a ≤|sources|-row census
    * (doc counts; token sums ride the same scan) — everything after
    * the per-source partial agg is constant-size.
    */
  def concentrationCensus(docs: DataFrame): DataFrame = {
    val per = parallelized(docs).select(col("source"),
        size(tokens(col("text"))).cast("long").as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("toks").as("toks"))
      .transform(Materialize.shared)
    def basis(cName: String, label: String) =
      per.agg(count(lit(1)).as("n_sources"),
          sum(col(cName)).as("total"),
          sum(col(cName) * col(cName)).as("sq"),
          max(col(cName)).as("top"))
        .select(lit(label).as("basis"), col("n_sources"), col("total"),
          micro(col("sq") / (col("total") * col("total")))
            .as("hhi_micro"),
          micro(col("top") / col("total")).as("top_share_micro"))
    basis("docs", "docs").unionByName(basis("toks", "tokens"))
  }

  /** X48: Pearson correlation census per source between document
    * length and distinct-token count — the profiling relation behind
    * "is vocabulary growing with length here, or are long docs just
    * repetition" (a per-source Heaps'-law pulse; near-zero where long
    * documents are stuffed/templated). r computed from the five exact
    * integer power sums n, Σx, Σy, Σxy, Σx², Σy²:
    * r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)) —
    * numerator and both radicands exact integers, then two sqrts, one
    * multiply, one division in fixed association (the X29 sqrt
    * discipline). Zero-variance sides report r = 0 (flagged by the
    * radicand columns, not NaN).
    *
    * Scale shape: one partial-agg'd Exchange carrying five sums per
    * source; nothing else. (At extreme group sizes the integer power
    * sums would move to DECIMAL(38) — the bounded x, y here keep
    * longs exact.)
    */
  def corrCensus(docs: DataFrame): DataFrame = {
    val xy = parallelized(docs).select(col("source"),
      size(tokens(col("text"))).cast("long").as("x"),
      size(array_distinct(tokens(col("text")))).cast("long").as("y"))
    val sums = xy.groupBy("source").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    sums.select(col("source"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("var_x"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("var_y"))
      .withColumn("r_micro",
        when(col("var_x") > 0L && col("var_y") > 0L,
          micro(col("cov_num") /
            (sqrt(col("var_x")) * sqrt(col("var_y")))))
          .otherwise(0L))
  }

  /** X45: BM25 relevance scoring (Robertson–Spärck Jones, the
    * retrieval function behind every lexical search stack and the
    * ranking half of RAG hybrid retrieval) of the whole corpus against
    * a deterministic query — the top-`qk` corpus terms. Canonical
    * k1 = 1.2, b = 0.75:
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *   idf(t)   = ln((N − df + 0.5) / (df + 0.5))
    *
    * Common terms get NEGATIVE idf under the classic formula — kept
    * (not clamped) so the census exposes it; a serving stack would
    * drop such terms from the query.
    *
    * Cross-engine exactness: the [[lmScore]] ln discipline — idf is
    * micro-floored ONCE PER TERM over an exact-integer ratio, each
    * (doc, term) contribution is floor(idf_micro · rational), and the
    * per-doc reduction sums INTEGERS (double sums across engines are
    * forbidden). All fractional literals reach the oracle as explicit
    * DOUBLE casts (a bare 0.75 is DECIMAL in DuckDB and associates
    * exactly where IEEE rounds).
    *
    * Scale shape: the query relation (qk terms + their df + idf) is
    * census-derived and BROADCAST; tf is one (doc, term) partial-agg
    * over the occurrence stream filtered by the broadcast query; doc
    * lengths ride a zero-shuffle projection joined on doc_id; avgdl is
    * a broadcast one-row aggregate. One corpus-keyed Exchange total.
    */
  def bm25(docs: DataFrame, qk: Int): DataFrame = {
    val occ = parallelized(docs).select(col("doc_id"),
      explode(tokens(col("text"))).as("t"))
    val qTerms = occ.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(qk).select("t")
    val lens = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("dl"))
    val totals = lens.agg(sum("dl").as("tot"),
      count(lit(1)).as("n_docs"))
    val tf = occ.join(broadcast(qTerms), Seq("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      .select(col("t"),
        micro(log((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)))).as("idf_micro"))
    val avg = totals.select((col("tot") / col("n_docs")).as("avgdl"),
      col("n_docs"))
    tf.join(broadcast(dfc), Seq("t"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(avg))
      .select(col("doc_id"),
        floor(col("idf_micro") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
          .cast("long").as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("w").as("score_micro"))
  }

  /** X44: two-sample Kolmogorov–Smirnov drift census between sources
    * over a per-document metric (token count) — the distribution-drift
    * gate a pipeline runs before mixing a new provider into the
    * training pool (and, in serving, between the training corpus and
    * live traffic): KS = max_v |F₁(v) − F₂(v)| over the empirical
    * CDFs. A large KS between two sources means their length (or
    * quality) profiles genuinely differ — re-weighting or re-filtering
    * territory; near-0 means the providers draw from the same
    * distribution (and the X40 mirror census says whether it's the
    * SAME data).
    *
    * Exactness discipline: the CDF difference is kept as an INTEGER
    * numerator for the whole max — |cum₁·n₂ − cum₂·n₁| over the common
    * denominator n₁·n₂ — so the maximum is exact integer comparison
    * and only the reported statistic pays ONE IEEE division at the
    * end (micro-floored). No per-row doubles, no double max.
    *
    * Scale shape: everything runs on CENSUSES. The (source, value)
    * census partial-aggregates map-side (the only corpus-sized
    * Exchange); the evaluation grid is the distinct value set crossed
    * with the bounded source list (census-sized), cumulated by a
    * per-source window over census rows; the pair comparison
    * self-joins grid rows per value with C(|sources|, 2) fan-out.
    * Nothing downstream of the first Exchange scales with rows.
    */
  def ksDrift(docs: DataFrame): DataFrame = {
    val vals = parallelized(docs).select(col("source"),
      size(tokens(col("text"))).cast("long").as("v"))
    val cen = vals.groupBy("source", "v").agg(count(lit(1)).as("cnt"))
      .transform(Materialize.shared)
    val grid = cen.select("v").distinct()
    val srcs = cen.groupBy("source").agg(sum("cnt").as("n"))
    // every (source, grid value) point, 0 where the source lacks it
    val filled = grid.crossJoin(broadcast(srcs))
      .join(cen, Seq("source", "v"), "left")
      .select(col("source"), col("n"), col("v"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val cum = filled.withColumn("cum",
      sum("cnt").over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("v")))
    val a = cum.select(col("source").as("source_a"), col("n").as("n_a"),
      col("v"), col("cum").as("cum_a"))
    val b = cum.select(col("source").as("source_b"), col("n").as("n_b"),
      col("v"), col("cum").as("cum_b"))
    a.join(b, Seq("v")).filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))
          .as("num"))
      .groupBy("source_a", "source_b")
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("num")).as("ks_num"))
      .withColumn("ks_micro",
        micro(col("ks_num") / (col("n_a") * col("n_b"))))
  }

  /** Gopher-style quality rule battery (Rae et al., arXiv:2112.11446
    * Table A1, the subset meaningful for a whitespace corpus): per-
    * document hard filters with an explicit per-rule flag so a pipeline
    * can audit WHICH rule rejected a document, not just that one did —
    * the difference between a filter and a diagnosable filter. Rules:
    * token count within [minTok, maxTok]; mean word length within
    * [3, 10]; type-token ratio >= `ttrMinMicro`; most-frequent-token
    * share <= `topMaxMicro` (the word-soup analogue of Gopher's
    * duplicate-line share); at least `minStops` stopwords. `pass` is
    * the conjunction.
    *
    * Scale shape: one token explode into a (doc_id, token) count, then
    * a doc-keyed rollup — both aggregations partial-agg before their
    * Exchange, and every downstream ratio is ONE double division of
    * exact integer operands, micro-floored (the oracle mirrors each
    * division verbatim). The text-level metrics (char count, stopword
    * count) ride the same scan; no second corpus pass.
    */
  def qualityRules(docs: DataFrame, minTok: Long, maxTok: Long,
                   ttrMinMicro: Long, topMaxMicro: Long,
                   minStops: Long): DataFrame = {
    val counts = parallelized(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("max_tok"))
    val textside = docs.select(col("doc_id"),
      length(regexp_replace(col("text"), lit(" "), lit("")))
        .cast("long").as("n_chars"),
      size(filter(tokens(col("text")),
        t => t === "the" || t === "a")).cast("long").as("n_stops"))
    counts.join(textside, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        micro(col("n_chars") / col("n_tokens")).as("mean_wlen_micro"),
        micro(col("n_distinct") / col("n_tokens")).as("ttr_micro"),
        micro(col("max_tok") / col("n_tokens")).as("top_share_micro"),
        col("n_stops"))
      .withColumn("r_len",
        when(col("n_tokens").between(minTok, maxTok), 1L).otherwise(0L))
      .withColumn("r_wlen",
        when(col("mean_wlen_micro").between(3000000L, 10000000L), 1L)
          .otherwise(0L))
      .withColumn("r_ttr",
        when(col("ttr_micro") >= ttrMinMicro, 1L).otherwise(0L))
      .withColumn("r_top",
        when(col("top_share_micro") <= topMaxMicro, 1L).otherwise(0L))
      .withColumn("r_stop",
        when(col("n_stops") >= minStops, 1L).otherwise(0L))
      .withColumn("pass",
        col("r_len") * col("r_wlen") * col("r_ttr") * col("r_top") *
          col("r_stop"))
  }

  /** X76: quality-score calibration table — "is the cheap score a
    * usable proxy for the expensive battery": X1's one-pass weighted
    * quality score is what a pipeline GATES on at scan time (it costs
    * one projection), X28's Gopher rule battery is what it TRUSTS
    * (it costs a token explode and two aggregations) — this is the
    * reliability table between them: docs bucketed into score deciles
    * (rank-picked edges off the score census — the X51 discipline, so
    * tied scores always share a bucket), each decile reporting its
    * battery pass rate. A monotone pass_ppm column says the cheap
    * score ranks documents the way the battery would (gate on it and
    * audit a sample); a flat or inverted one says the gate threshold
    * is fiction. The standard calibration/reliability-diagram read,
    * applied to the curation stack itself.
    *
    * Exactness: scores and pass flags are the X1/X28 kernels verbatim
    * (shared code — both re-verified post-composition); the decile
    * edges are rank-picked ACTUAL score values; every output column
    * is an exact integer, the rate one ppm floor division.
    *
    * Scale shape: the X1 projection and the X28 token explode (its
    * own partial-agg'd Exchanges), joined doc-keyed, then ONE
    * (score_micro) census Exchange — everything after (edges, buckets,
    * the 10-row rollup) is census-sized; the edges broadcast.
    */
  def scoreCalibration(docs: DataFrame, minTok: Long, maxTok: Long,
                       ttrMinMicro: Long, topMaxMicro: Long,
                       minStops: Long): DataFrame =
    calibrationFromCensus(scoreCensus(docs, minTok, maxTok,
      ttrMinMicro, topMaxMicro, minStops))

  /** The (v = score, cnt, n_pass) census X76 reduces the corpus to —
    * factored so the T27 streaming store accumulates the SAME
    * relation per micro-batch (integer counts form an exact merge
    * semilattice).
    */
  def scoreCensus(docs: DataFrame, minTok: Long, maxTok: Long,
                  ttrMinMicro: Long, topMaxMicro: Long,
                  minStops: Long): DataFrame = {
    val scored = tokenStats(docs)
      .select(col("doc_id"), col("quality_micro"))
    val passed = qualityRules(docs, minTok, maxTok, ttrMinMicro,
        topMaxMicro, minStops)
      .select(col("doc_id"), col("pass"))
    scored.join(passed, Seq("doc_id"))
      .groupBy(col("quality_micro").as("v"))
      .agg(count(lit(1)).as("cnt"), sum("pass").as("n_pass"))
  }

  /** X76's statistics stage over any (v, cnt, n_pass) census — the
    * decile edges, buckets, and 10-row rollup; shared by the batch
    * query and the T27 streaming store's serving read (store ≡ batch
    * bit-for-bit — the edges are a pure function of the census, the
    * T25 discipline).
    */
  def calibrationFromCensus(census: DataFrame): DataFrame = {
    val cen = census.transform(Materialize.shared)
    val edges = lengthDecileEdgesFromCensus(cen)
    cen.crossJoin(broadcast(edges))
      .groupBy("v")
      .agg(max("cnt").as("cnt"), max("n_pass").as("n_pass"),
        sum(when(col("v") > col("edge"), 1L).otherwise(0L))
          .as("bucket"))
      .groupBy("bucket")
      .agg(min("v").as("score_lo"), max("v").as("score_hi"),
        sum("cnt").as("n_docs"), sum("n_pass").as("n_pass"))
      .select(col("bucket"), col("score_lo"), col("score_hi"),
        col("n_docs"), col("n_pass"),
        expr("(1000000 * n_pass) div n_docs").as("pass_ppm"))
      .orderBy("bucket")
  }

  /** Temperature-based source mixing at α = ½ — the multilingual
    * sampling rule (q_i ∝ p_i^α) in its most common setting, as a
    * keep-all-of-the-smallest downsampling plan: with α = ½ the rate
    * algebra collapses to rate_i = √(t_min / t_i) (the corpus total
    * cancels), so every rate is ONE double division of exact integer
    * token totals through ONE correctly-rounded sqrt, micro-floored —
    * bit-identical on both engines. Generic α would need `pow`, whose
    * rounding is not pinned down cross-engine; α = ½ is exactly the
    * case that oracles (and the one overwhelmingly used).
    * [[trainingMix]] hits explicit target percentages; temperatureMix
    * DERIVES the targets from the observed distribution.
    *
    * Output: (source, n_docs, tokens, rate_micro, kept_tokens,
    * eff_share_micro) — kept = ⌊tokens·rate⌋ in micro units, effective
    * share over the kept totals.
    *
    * Scale shape: one (source, token-partial) Exchange; everything
    * after runs on the mixture-sized census packed into a single row
    * (collect_list over source-count rows — bounded), t_min and the
    * kept total derived with folds, rows exploded back out — ONE
    * linear plan, no self-join of the census (the V9 discipline).
    * The ⌊t·rate_micro⌋ product stays under 2⁵³ for any per-source
    * total below ~9·10¹⁵ tokens, so the double conversion both
    * engines make before the final division is exact.
    */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val counts = parallelized(docs)
      .select(col("source"), size(tokens(col("text"))).cast("long").as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("tokens"))
    def rateMicro(t: Column, tmin: Column): Column =
      micro(sqrt(tmin / t))
    def keptOf(t: Column, tmin: Column): Column =
      floor(t * rateMicro(t, tmin) / lit(1000000.0)).cast("long")
    counts
      .agg(collect_list(struct(col("source"), col("n_docs"),
        col("tokens"))).as("cs"))
      .select(aggregate(col("cs"), lit(Long.MaxValue),
        (a, x) => least(a, x.getField("tokens"))).as("tmin"), col("cs"))
      .select(col("tmin"),
        aggregate(col("cs"), lit(0L),
          (a, x) => a + keptOf(x.getField("tokens"), col("tmin")))
          .as("total_kept"),
        explode(col("cs")).as("c"))
      .select(col("c.source").as("source"), col("c.n_docs").as("n_docs"),
        col("c.tokens").as("tokens"),
        rateMicro(col("c.tokens"), col("tmin")).as("rate_micro"),
        keptOf(col("c.tokens"), col("tmin")).as("kept_tokens"),
        micro(keptOf(col("c.tokens"), col("tmin")) / col("total_kept"))
          .as("eff_share_micro"))
  }

  /** x^(eNum/2^log2den) as a FIXED product of sqrt chains — the
    * cross-engine-exact dyadic power (VERDICT r14 item 6): IEEE 754
    * requires sqrt and multiply to be correctly rounded, so any
    * composition tree of them is bit-reproducible across engines,
    * while `pow`'s rounding is implementation-defined. Bit j of eNum
    * contributes the (log2den − j)-fold sqrt chain x^(1/2^(log2den−j));
    * factors multiply left-to-right in ascending-j order — the same
    * tree [[dyadicPowSql]] prints for the oracle.
    */
  private def dyadicPow(x: Column, eNum: Int, log2den: Int): Column = {
    require(eNum > 0 && eNum < (1 << log2den),
      s"dyadic exponent $eNum/2^$log2den must lie in (0, 1)")
    (0 until log2den).filter(j => ((eNum >> j) & 1) == 1)
      .map(j => (1 to (log2den - j)).foldLeft(x)((c, _) => sqrt(c)))
      .reduceLeft(_ * _)
  }

  /** The SQL mirror of [[dyadicPow]] — token for token. */
  private def dyadicPowSql(x: String, eNum: Int, log2den: Int): String =
    (0 until log2den).filter(j => ((eNum >> j) & 1) == 1)
      .map(j => (1 to (log2den - j)).foldLeft(x)((c, _) => s"sqrt($c)"))
      .reduceLeft((a, b) => s"($a * $b)")

  /** [[temperatureMix]] at GENERIC dyadic α = alphaNum/2^alphaLog2Den
    * (X77, VERDICT r14 item 6): the multilingual sampling rule
    * q_i ∝ p_i^α as a keep-all-of-the-bottleneck plan,
    * rate_i = (t_min/t_i)^(1−α) — at α = ½ this IS [[temperatureMix]].
    * Dyadic α keeps the α=½ exactness argument for every rate: the
    * exponent (1−α) is m/2ⁿ, so the rate is a fixed product of
    * correctly-rounded sqrt chains over ONE exact integer division
    * ([[dyadicPow]]) — no `pow`, whose cross-engine rounding is
    * unpinned (the reason generic α stayed unoracled through r14).
    * α = ¼ and ¾ bracket the public mixing defaults (UniMax/mT5-class
    * pipelines run α ≈ 0.3); any k/2ⁿ grid point oracles the same way.
    *
    * Output: (alpha_micro, source, n_docs, tokens, rate_micro,
    * kept_tokens, eff_share_micro). Scale shape identical to
    * [[temperatureMix]] (one census Exchange, mixture-sized folds).
    */
  def temperatureMixAlpha(docs: DataFrame, alphaNum: Int,
                          alphaLog2Den: Int): DataFrame = {
    val den = 1 << alphaLog2Den
    val eNum = den - alphaNum // exponent 1 − α in 2^-n units
    val counts = parallelized(docs)
      .select(col("source"), size(tokens(col("text"))).cast("long").as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("tokens"))
    def rateMicro(t: Column, tmin: Column): Column =
      micro(dyadicPow(tmin / t, eNum, alphaLog2Den))
    def keptOf(t: Column, tmin: Column): Column =
      floor(t * rateMicro(t, tmin) / lit(1000000.0)).cast("long")
    counts
      .agg(collect_list(struct(col("source"), col("n_docs"),
        col("tokens"))).as("cs"))
      .select(aggregate(col("cs"), lit(Long.MaxValue),
        (a, x) => least(a, x.getField("tokens"))).as("tmin"), col("cs"))
      .select(col("tmin"),
        aggregate(col("cs"), lit(0L),
          (a, x) => a + keptOf(x.getField("tokens"), col("tmin")))
          .as("total_kept"),
        explode(col("cs")).as("c"))
      .select(
        lit(1000000L * alphaNum / den).as("alpha_micro"),
        col("c.source").as("source"), col("c.n_docs").as("n_docs"),
        col("c.tokens").as("tokens"),
        rateMicro(col("c.tokens"), col("tmin")).as("rate_micro"),
        keptOf(col("c.tokens"), col("tmin")).as("kept_tokens"),
        micro(keptOf(col("c.tokens"), col("tmin")) / col("total_kept"))
          .as("eff_share_micro"))
  }

  /** One α branch of the X77 oracle — the [[temperatureMixAlpha]]
    * algebra in SQL with the SAME [[dyadicPowSql]] rate tree.
    */
  def temperatureMixAlphaOracleBranch(alphaNum: Int,
                                      alphaLog2Den: Int): String = {
    val den = 1 << alphaLog2Den
    val rate = dyadicPowSql("(m.tmin * 1.0 / p.tokens)",
      den - alphaNum, alphaLog2Den)
    s"""SELECT CAST(${1000000L * alphaNum / den} AS BIGINT)
       |    AS alpha_micro, k.source, k.n_docs, k.tokens, k.rate_micro,
       |  k.kept_tokens,
       |  ${graft.functions.Hashing.microSql(
            "k.kept_tokens * 1.0 / t.total_kept")} AS eff_share_micro
       |FROM (
       |  SELECT *, CAST(floor(tokens * rate_micro / 1000000.0)
       |    AS BIGINT) AS kept_tokens
       |  FROM (
       |    SELECT p.source, p.n_docs, p.tokens,
       |      ${graft.functions.Hashing.microSql(rate)} AS rate_micro
       |    FROM per p CROSS JOIN mn m
       |  )
       |) k CROSS JOIN (
       |  SELECT CAST(sum(kept_tokens) AS BIGINT) AS total_kept FROM (
       |    SELECT CAST(floor(tokens * rate_micro / 1000000.0)
       |      AS BIGINT) AS kept_tokens
       |    FROM (
       |      SELECT p.tokens,
       |        ${graft.functions.Hashing.microSql(rate)} AS rate_micro
       |      FROM per p CROSS JOIN mn m
       |    )
       |  )
       |) t""".stripMargin
  }

  /** Training-mix computation — the source-reweighting stage between
    * curation and packing: given target mixture percentages per source,
    * compute each source's sampling rate for the max-data-retention mix
    * (keep ALL of the bottleneck source — the one scarcest relative to
    * its target — and downsample every other source to match the
    * mixture). rate_i = (target_i·t_b)/(target_b·t_i), where b
    * minimizes t/target; the bottleneck's own rate is exactly 1.
    *
    * Exactness: token totals are integer aggregates; every rate is ONE
    * double division of exact integer cross-products, micro-floored —
    * both engines agree bit-for-bit. The per-source table is
    * mixture-sized (tens of rows), so the argmin aggregate and broadcast
    * are trivial; the only real work is the one partial-agg shuffle of
    * (source, token-partial) pairs. The bottleneck argmin is a single
    * `min_by` aggregate (struct ordering = ratio, then source), NOT a
    * global window — an unpartitioned window is never the right shape,
    * even on a mixture-sized table.
    */
  def trainingMix(docs: DataFrame,
                  targets: Seq[(String, Long)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      s"trainingMix: every target_pct must be positive, got $targets")
    val spark = docs.sparkSession
    import spark.implicits._
    val per = parallelized(docs)
      .select(col("source"), size(tokens(col("text"))).cast("long")
        .as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
    val tgt = targets.toDF("source", "target_pct")
    // a source with a target but zero tokens makes the mix infeasible
    // (its rate would be infinite) — fail loudly, inside the plan
    val j = per.join(tgt, "source")
      .select(col("source"), col("n_docs"), col("target_pct"),
        when(col("tokens") > 0L, col("tokens"))
          .otherwise(raise_error(concat(lit("trainingMix: source "),
            col("source"), lit(" has a target but zero tokens"))))
          .as("tokens"))
    val bn = j.agg(min_by(
        struct(col("tokens").as("b_tokens"),
          col("target_pct").as("b_target")),
        struct(col("tokens").cast("double") / col("target_pct"),
          col("source"))).as("b"))
      .select(col("b.b_tokens").as("b_tokens"),
        col("b.b_target").as("b_target"))
    j.crossJoin(broadcast(bn))
      .select(col("source"), col("n_docs"), col("tokens"),
        col("target_pct"),
        micro((col("target_pct") * col("b_tokens")) /
          (col("b_target") * col("tokens"))).as("rate_micro"))
      .withColumn("kept_tokens",
        floor(col("tokens") * col("rate_micro") / lit(1000000.0)))
  }

  /** Per-doc 32-bit SimHash over token occurrences (md5-based bit votes).
    * One explode + one hash-aggregate with 32 conditional sums — a single
    * shuffle of partial sums.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = parallelized(docs).select(col("doc_id"),
      explode(tokens(col("text"))).as("t"))
    val th = toks.select(col("doc_id"),
      (md5Long(col("t")) % Hashing.SimhashMod).as("h"))
    val bitSums = (0 until Hashing.SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$b")
    }
    val sums = th.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until Hashing.SimhashBits).map { b =>
      when(col(s"s$b") >= 0L, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 32 bits into 4×8-bit keys; by
    * pigeonhole any pair with Hamming distance ≤ 3 shares at least one
    * band, so bucket-join + exact `bit_count(xor)` filter finds all of
    * them without a cross join.
    */
  /** The banded candidate stream with exact Hamming distances, BEFORE
    * the bar — shared by [[simhashPairs]] (which filters) and D33's
    * histogram (which censuses the whole stream).
    */
  def simhashCandidates(docs: DataFrame): DataFrame =
    // the per-doc signature relation (doc_id + one long — the
    // narrowest relation in the dedup family) feeds BOTH sides of the
    // banded self-join; without materialization the physical plan
    // carries the full scan -> token-explode -> 32-sum aggregate
    // pipeline TWICE, once under the join's broadcast side
    // (plans/r17/q_simhash_hist_before.txt operators 1-10 vs 11-20).
    // Eager checkpoint computes the signatures once; its recompute
    // cost (the corpus token explode) dwarfs its stored size.
    Banding.bandedCandidates(Materialize.shared(simhash(docs)), "doc_id",
      (0 until 4).map(k =>
        shiftright(col("simhash"), 8 * k).bitwiseAND(lit(255L))),
      payload = Seq("simhash"))
      .select(col("d1"), col("d2"), col("simhash1").as("sh1"),
        col("simhash2").as("sh2"))
      .withColumn("hamming",
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).cast("long"))

  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame =
    simhashCandidates(docs).filter(col("hamming") <= maxHamming)

  /** D33: SimHash candidate Hamming histogram — D17's measured-basis
    * table for the OTHER detector (D17 histograms the MinHash
    * candidates' exact Jaccard to place the D2/D3 bar; this
    * histograms the banded SimHash candidates' exact Hamming to place
    * D4's): per distance, the pair count, the running cumulative, and
    * whether the distance sits within the production bar — "what does
    * loosening the bar to h admit" answered from the candidate stream
    * the index actually produces. Completeness is the banding
    * pigeonhole: distances ≤ 3 are ALL pairs (4×8-bit bands); above,
    * rows census what the index surfaces — exactly the population a
    * bar change would act on (documented; a wider-band index would
    * widen the complete region).
    *
    * Exactness: distances are bit_count over integer XOR; counts and
    * the cumulative exact integers; the bar flag an integer compare.
    *
    * Scale shape: the D4 candidate pipeline (banded, never all-pairs)
    * into a ≤ 33-row histogram census; the cumulative window runs
    * over those rows (the X33 discipline).
    */
  def simhashHammingHist(docs: DataFrame, maxHamming: Int): DataFrame = {
    val c = simhashCandidates(docs).groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy("hamming")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    c.withColumn("cum_pairs", sum("n_pairs").over(wCum))
      .withColumn("within_bar", col("hamming") <= maxHamming)
      .orderBy("hamming")
  }

  /** D29: detector disagreement census — the CROSS-DETECTOR audit
    * over the two near-dup families the engine ships: which pairs do
    * MinHash-LSH (D3, set-resemblance) and SimHash (D4, weighted
    * Hamming) agree on, and what does each one see alone? The two
    * detectors measure DIFFERENT similarities (Jaccard over 5-gram
    * sets vs cosine-like bit agreement over token frequencies —
    * Broder 1997 vs Charikar STOC 2002), so their symmetric
    * difference is not noise: simhash-only pairs are typically
    * bag-similar but order-shuffled (low shingle Jaccard), and
    * minhash-only pairs sit just past the Hamming bar. The census
    * reports each verdict class with its exact 5-gram-Jaccard profile
    * — the evidence for choosing (or stacking) detectors at a given
    * bar, measured on the corpus itself instead of asserted.
    *
    * Exactness: pair sets are the D3/D4 pipelines verbatim (shared
    * kernels); every union pair's exact Jaccard is recomputed from
    * the full shingle relation (docs below the shingle length with
    * empty sets read jac = 0 — guarded, mirrored); the class means
    * are floors of integer sums (the D16 protocol).
    *
    * Scale shape: both pair relations are candidate-bounded (banded,
    * never all-pairs); the union is pair-bounded; the exact-verify
    * join fans each pair through the shingle relation doc-keyed (the
    * D3 `inter` shape). An audit query by design (the D26 precedent)
    * — it re-derives both pipelines; a deployment reading persisted
    * pair tables pays only the union + classify.
    */
  def detectorDisagreement(docs: DataFrame, n: Int, jacMicroMin: Long,
                           maxHamming: Int): DataFrame = {
    val sh = shingleSet(docs, n)
      .select(col("doc_id"), md5Long(col("sh")).as("h0")).transform(Materialize.shared)
    // each pair relation feeds two consumers — cache the pair-bounded
    // relations, not the pipelines (the lmScore shared-relation
    // discipline; without this Spark re-derives the whole detector
    // pipeline per reference). MinHash pairs already carry their
    // verified exact Jaccard, so only the simhash-only remainder pays
    // the exact-verify join — half the audit's shingle traffic.
    val mhp = minhashScoredFrom(sh, 4, 4, Hashing.MinhashSeeds)
      .filter(col("jac_micro") >= jacMicroMin)
      .select(col("d1"), col("d2"), col("jac_micro")).transform(Materialize.shared)
    val shp = simhashPairs(docs, maxHamming)
      .select(col("d1"), col("d2")).transform(Materialize.shared)
    detectorDisagreementFrom(sh, mhp, shp)
  }

  /** D29 over PRECOMPUTED pair relations — the store-backed path the
    * D29 Scaladoc promises ("a deployment reading persisted pair
    * tables pays only the union + classify"): `mhp` is the verified
    * MinHash pair relation (d1, d2, jac_micro — bar already applied),
    * `shp` the SimHash pair relation (d1, d2), `sh` the hashed
    * shingle relation the simhash-only remainder exact-verifies
    * against. Output ≡ the in-query path under the same dials
    * (spec-pinned).
    */
  def detectorDisagreementFrom(sh: DataFrame, mhp0: DataFrame,
                               shp0: DataFrame): DataFrame = {
    val mhp = mhp0.select(col("d1"), col("d2"),
      col("jac_micro").as("jac"))
    val shp = shp0.select(col("d1"), col("d2"), lit(1L).as("in_sh"))
    val shOnly = shp.select("d1", "d2")
      .join(mhp.select("d1", "d2"), Seq("d1", "d2"), "left_anti")
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shOnly
      .join(sh.select(col("doc_id").as("d1"), col("h0")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("h0")), Seq("d2", "h0"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    val shOnlyJ = shOnly.join(inter, Seq("d1", "d2"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .join(sz.select(col("doc_id").as("d1"), col("n").as("n1")),
        Seq("d1"), "left")
      .join(sz.select(col("doc_id").as("d2"), col("n").as("n2")),
        Seq("d2"), "left")
      .withColumn("n1", coalesce(col("n1"), lit(0L)))
      .withColumn("n2", coalesce(col("n2"), lit(0L)))
      .select(col("d1"), col("d2"),
        when(col("n1") + col("n2") - col("inter") > 0,
          micro(col("inter") /
            (col("n1") + col("n2") - col("inter"))))
          .otherwise(lit(0L)).as("jac"),
        lit("simhash_only").as("verdict"))
    val mhRows = mhp.join(shp, Seq("d1", "d2"), "left")
      .select(col("d1"), col("d2"), col("jac"),
        when(col("in_sh").isNotNull, lit("both"))
          .otherwise(lit("minhash_only")).as("verdict"))
    mhRows.unionByName(shOnlyJ)
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_pairs"),
        floor(sum("jac") / count(lit(1))).as("mean_jac_micro"),
        min("jac").as("min_jac_micro"),
        max("jac").as("max_jac_micro"))
  }

  /** X53: median/MAD robust outlier census per source — the
    * breakdown-point-0.5 companion of X46's winsorized mean: median
    * and Median Absolute Deviation are immune to up to half the data
    * being garbage, so the |v − med| > k·MAD flag count is the
    * outlier census a pipeline trusts even when a crawler bug floods
    * one source with megadocs (which would drag a mean/stddev z-score
    * past any fixed cut).
    *
    * Exactness: FULLY integer — both medians are rank-PICKED census
    * values (the X46 lower-median discipline: the value at 0-based
    * rank ⌊(n−1)/2⌋, no interpolation, so `med` and `mad` are actual
    * corpus values), the deviation census re-aggregates |v − med|
    * with exact counts, and the outlier rule is an integer compare.
    * The single IEEE division is the final rate.
    *
    * MAD = 0 (majority of a source at one length) degenerates to
    * "any deviation is an outlier" — the standard MAD edge, reported
    * honestly via the `mad` column rather than patched with an ε.
    *
    * Scale shape: everything after the (source, length) census
    * partial-agg is census-sized — two rank picks over per-source
    * cumulative windows (bounded by distinct lengths), a census-sized
    * deviation re-aggregation, and a census-sized flag rollup.
    */
  def madOutliers(docs: DataFrame, k: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cen = parallelized(docs).select(col("source"),
        size(tokens(col("text"))).cast("long").as("v"))
      .groupBy("source", "v").agg(count(lit(1)).as("cnt"))
      .transform(Materialize.shared)
    val n = cen.groupBy("source").agg(sum("cnt").as("n"))
    // value at 0-based rank floor((n-1)/2) of a (source, v, cnt) census
    def lowerMedian(c: DataFrame, outName: String): DataFrame = {
      val cum = c.withColumn("cum",
        sum("cnt").over(Window.partitionBy("source").orderBy("v")))
      cum.join(n, Seq("source"))
        .filter(
          floor((col("n") - 1L) / lit(2.0)).cast("long") >=
            col("cum") - col("cnt") &&
          floor((col("n") - 1L) / lit(2.0)).cast("long") < col("cum"))
        .select(col("source"), col("v").as(outName))
    }
    val med = lowerMedian(cen, "med")
    val dev = cen.join(med, Seq("source"))
      .select(col("source"), abs(col("v") - col("med")).as("v"),
        col("cnt"))
      .groupBy("source", "v").agg(sum("cnt").as("cnt"))
    val mad = lowerMedian(dev, "mad")
    cen.join(med, Seq("source")).join(mad, Seq("source"))
      .groupBy("source")
      .agg(sum("cnt").as("n"), max("med").as("med"),
        max("mad").as("mad"),
        sum(when(abs(col("v") - col("med")) > lit(k) * col("mad"),
          col("cnt")).otherwise(0L)).as("n_out"))
      .withColumn("out_rate_micro", micro(col("n_out") / col("n")))
  }

  /** X54: Mean Segmental Type-Token Ratio per source — the lexical-
    * diversity statistic that is actually comparable across document
    * lengths: a plain TTR falls with length mechanically (Heaps, X37),
    * so corpora can't be ranked by it; MSTTR fixes the window (every
    * COMPLETE `segTokens`-token segment scores types/segTokens) and
    * averages, so a low value means genuinely repetitive text, not
    * long text. Reads next to X48 (length–vocabulary correlation) and
    * the X13 repetition flags.
    *
    * Exactness: per-segment type counts are exact integers (segment
    * identity is ⌊pos/segTokens⌋ off the token ordinal — same floor
    * tree both engines); the trailing partial segment is DROPPED
    * (n_tok = segTokens filter), the standard MSTTR convention, so
    * every averaged segment has identical weight. One IEEE division:
    * Σtypes / (segTokens · n_segs).
    *
    * Scale shape: one (source, doc, segment) aggregation over the
    * token stream — the distinct count partial-aggregates per
    * segment, segments are 16 tokens, nothing pairwise; the rollup
    * above it is census-sized.
    */
  def msttr(docs: DataFrame, segTokens: Int = 16): DataFrame = {
    val occ = parallelized(docs).select(col("source"), col("doc_id"),
        posexplode(tokens(col("text"))))
      .withColumnRenamed("col", "t")
    val perSeg = occ
      .select(col("source"), col("doc_id"),
        floor(col("pos") / lit(segTokens.toDouble)).cast("long")
          .as("seg"),
        col("t"))
      .groupBy("source", "doc_id", "seg")
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("t")).as("types"))
      .filter(col("n_tok") === segTokens.toLong)
    perSeg.groupBy("source")
      .agg(count(lit(1)).as("n_segs"), sum("types").as("sum_types"))
      .withColumn("msttr_micro",
        micro(col("sum_types") /
          (lit(segTokens.toDouble) * col("n_segs"))))
  }

  /** D22: soft deduplication weights — the keep-everything
    * alternative to hard removal (D4/D14): every document stays, but
    * a duplicate cluster of size s contributes weight 1/s per member,
    * so the CLUSTER has unit total influence regardless of how many
    * times the crawler shipped it. The census reports, per source,
    * the raw vs effective (weighted) document and token mass — the
    * numbers a sampling stage multiplies into its rates, and the
    * honest answer to "how much data do we actually have" when
    * sources differ wildly in duplication.
    *
    * Exactness: cluster sizes are exact integers off the D7
    * components; per-document weight micro(1/s) and weighted tokens
    * micro(toks/s) are each ONE IEEE division, floored, and the
    * per-source reduction sums INTEGERS. Docs in no pair have s = 1
    * exactly (left join + coalesce, not a smoothing constant).
    *
    * Scale shape: the component relation is bounded by TRUE
    * duplication (only docs appearing in a verified pair); the join
    * back to the corpus is doc-keyed against that bounded relation;
    * the rollup is source-sized with map-side partials.
    */
  def dedupWeights(docs: DataFrame, pairs: DataFrame): DataFrame =
    dedupWeightsFrom(docs, connectedComponents(pairs))

  /** D22 over a PRECOMPUTED component relation — the store-backed
    * path; with the component table bucketed on `component` (the
    * [[graft.sources.PairStore]] layout) the cluster-size aggregate
    * needs no Exchange.
    */
  def dedupWeightsFrom(docs: DataFrame, cc: DataFrame): DataFrame = {
    val sizes = cc.groupBy("component").agg(count(lit(1)).as("s"))
    val dsz = cc.join(sizes, "component").select(col("doc_id"), col("s"))
    parallelized(docs).select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("toks"))
      .join(dsz, Seq("doc_id"), "left")
      .select(col("source"), col("toks"),
        coalesce(col("s"), lit(1L)).as("s"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s") > 1L, 1L).otherwise(0L)).as("n_dup_docs"),
        sum("toks").as("toks"),
        sum(micro(lit(1) / col("s"))).as("eff_docs_micro"),
        sum(micro(col("toks") / col("s"))).as("eff_tokens_micro"))
  }

  /** D23: duplicate-cluster provenance census — WHERE duplication
    * comes from, per cluster: D19 sizes the clusters and D22 weighs
    * them, but the mirror-hunting / license-laundering / crawler-
    * overlap question is WHICH sources ship the same content. Each D7
    * component reports its size, its distinct-source count, and the
    * sorted source list — n_sources = 1 is intra-source duplication
    * (a crawler re-fetching), n_sources > 1 is the cross-source
    * mirror signature that feeds source-level dedup policy (and the
    * aggregate X40 matrix can't attribute to individual clusters).
    *
    * Exactness: counts are exact integers; the source list is a
    * sorted-distinct join (deterministic ordering, ASCII source
    * names).
    *
    * Scale shape: the component relation is bounded by TRUE
    * duplication; the corpus joins it doc-keyed (only dup docs
    * survive the inner join); the rollup is cluster-sized with
    * map-side partials; the collect_set per cluster is bounded by the
    * source universe, not the cluster size.
    */
  def dedupProvenance(docs: DataFrame, pairs: DataFrame): DataFrame =
    dedupProvenanceFrom(docs, connectedComponents(pairs))

  /** D23 over a PRECOMPUTED component relation — the store-backed
    * path (the [[dedupWeightsFrom]] contract).
    */
  def dedupProvenanceFrom(docs: DataFrame, cc: DataFrame): DataFrame = {
    parallelized(docs).select(col("doc_id"), col("source"))
      .join(cc, Seq("doc_id"))
      .groupBy("component")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        array_join(sort_array(collect_set(col("source"))), ",")
          .as("sources"))
  }

  /** X55: character-bigram conditional entropy rate per source —
    * H(next char | current char) = Σ (c_xy/T)·ln(c_x/c_xy) in nats:
    * the model-free compressibility signal (Shannon's entropy-rate
    * estimate at order 1). Near-zero means deterministic/templated
    * bytes (a generator loop, boilerplate), high means diverse prose
    * — the quality lens that catches low-entropy spam X1's
    * length/ratio heuristics and X13's token-level repetition flags
    * can both miss (it reads BYTES, not tokens, so it needs no
    * tokenizer to agree with the spammer).
    *
    * Bigrams never cross document boundaries (per-doc windows), and
    * the conditional form means padding with more IID text moves
    * nothing (probed: it is a ratio census — all counts ×k under
    * replication).
    *
    * Exactness: counts are exact integers; each bigram's term is
    * micro-floored from ONE fixed double tree (c_xy/T one division,
    * ln of one integer ratio, one multiply — every term ≥ 0 since
    * c_x ≥ c_xy) and the per-source reduction sums INTEGERS.
    *
    * Scale shape: everything after the (source, bigram) census
    * partial-agg (bounded by alphabet² per source) is census-sized —
    * the conditional totals c_x come off the census itself, never a
    * second corpus pass.
    */
  def entropyRate(docs: DataFrame): DataFrame = {
    val bi = parallelized(docs).select(col("source"),
      explode(
        when(length(col("text")) >= 2,
          transform(sequence(lit(1), length(col("text")) - 1),
            i => col("text").substr(i, lit(2))))
          .otherwise(array().cast("array<string>"))).as("b"))
    val cen = bi.groupBy("source", "b").agg(count(lit(1)).as("c_xy"))
      .transform(Materialize.shared)
    val cond = cen.select(col("source"),
        substring(col("b"), 1, 1).as("x"), col("c_xy"))
      .groupBy("source", "x").agg(sum("c_xy").as("c_x"))
    val totals = cen.groupBy("source").agg(sum("c_xy").as("t_bigrams"),
      count(lit(1)).as("n_distinct"))
    cen.withColumn("x", substring(col("b"), 1, 1))
      .join(cond, Seq("source", "x"))
      .join(totals, Seq("source"))
      .select(col("source"), col("t_bigrams"), col("n_distinct"),
        micro((col("c_xy") / col("t_bigrams")) *
          log(col("c_x") / col("c_xy"))).as("term_micro"))
      .groupBy("source")
      .agg(max("t_bigrams").as("t_bigrams"),
        max("n_distinct").as("n_distinct"),
        sum("term_micro").as("h_micro"))
  }

  /** Bucket label for the off-top-V residual mass in [[jsdDrift]] —
    * leads with the control character \u0001 (DuckDB mirror:
    * `chr(1) || 'REST'`), unreachable by whitespace tokenization of
    * real text, so a corpus containing the literal word "REST"
    * cannot alias the residual bucket.
    */
  val JsdRestBucket = "REST"

  /** X52: pairwise Jensen–Shannon divergence between source unigram
    * distributions — the third drift lens beside X44 (KS: sup-norm of
    * the length CDF gap) and X51 (PSI: bucketed f-divergence against
    * the corpus): JSD compares WHAT WORDS each source uses, not how
    * long its documents are, is symmetric, and is bounded by ln 2 —
    * the standard "are these two corpora interchangeable for mixing"
    * number (a mixture-weights tuner reads exactly this matrix).
    *
    * Distribution support: the corpus top-V terms plus ONE residual
    * bucket holding each source's remaining mass (so both
    * distributions are complete — no mass silently dropped), with
    * Laplace +1 smoothing over the V+1 buckets keeping every log
    * finite (the X51 discipline, documented not ε-hidden).
    *
    * Exactness: counts are exact integers end to end; each bucket
    * term is micro-floored from ONE fixed double tree —
    * ½·(p·ln(2p/(p+q)) + q·ln(2q/(p+q))) with p, q one division each
    * — and the per-pair reduction sums INTEGERS. Individual terms can
    * be negative (either KL half's terms may dip below zero); the
    * floor is still deterministic.
    *
    * Scale shape: after the (source, term) census partial-agg, the
    * top-V cut is a bounded TakeOrdered, winners broadcast back, and
    * ALL remaining relations are (sources × (V+1))-sized — the
    * pairwise join is census × census, never touching the corpus.
    */
  def jsdDrift(docs: DataFrame, topV: Int): DataFrame =
    jsdFromCensus(sourceTermCensus(docs), topV)

  /** The (source, t, cnt) unigram census [[jsdDrift]] reduces the
    * corpus to — factored so the T25 streaming store accumulates the
    * SAME relation per micro-batch (integer counts form an exact
    * merge semilattice: per-batch censuses summed term-wise equal the
    * census of the concatenated stream bit-for-bit).
    */
  def sourceTermCensus(docs: DataFrame): DataFrame =
    parallelized(docs).select(col("source"),
        explode(tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("cnt"))

  /** X52's statistics stage over any (source, t, cnt) census — the
    * top-V cut, residual bucket, and pairwise JSD rollup; shared by
    * the batch query and the T25 streaming store's serving read
    * (store ≡ batch bit-for-bit, StreamingJsdSpec-pinned — unlike
    * PSI's fixed reference grid, the top-V cut is a pure function of
    * the census itself, so the identity holds with no edge-pinning
    * caveat).
    */
  def jsdFromCensus(census: DataFrame, topV: Int): DataFrame = {
    val scen = census.transform(Materialize.shared)
    val top = scen.groupBy("t").agg(sum("cnt").as("c"))
      .orderBy(col("c").desc, col("t")).limit(topV).select("t")
    val nS = scen.groupBy("source").agg(sum("cnt").as("n_s"))
    val inTop = scen.join(broadcast(top), Seq("t"))
    val topMass = inTop.groupBy("source").agg(sum("cnt").as("top_mass"))
    val gridTop = nS.crossJoin(broadcast(top))
      .join(inTop, Seq("source", "t"), "left")
      .select(col("source"), col("n_s"), col("t"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val rest = nS.join(topMass, Seq("source"), "left")
      .select(col("source"), col("n_s"), lit(JsdRestBucket).as("t"),
        (col("n_s") - coalesce(col("top_mass"), lit(0L))).as("cnt"))
    val buckets = gridTop.unionByName(rest)
    val a = buckets.select(col("source").as("source_a"),
      col("n_s").as("n_a"), col("t"), col("cnt").as("cnt_a"))
    val b = buckets.select(col("source").as("source_b"),
      col("n_s").as("n_b"), col("t"), col("cnt").as("cnt_b"))
    val v1 = (topV + 1).toLong
    val pa = (col("cnt_a") + 1L) / (col("n_a") + lit(v1))
    val pb = (col("cnt_b") + 1L) / (col("n_b") + lit(v1))
    a.join(b, Seq("t")).filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        micro(lit(0.5) *
          (pa * log(lit(2.0) * pa / (pa + pb)) +
           pb * log(lit(2.0) * pb / (pa + pb))))
          .as("term_micro"))
      .groupBy("source_a", "source_b")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        sum("term_micro").as("jsd_micro"))
  }

  /** X58: Flesch reading-ease per source — the classic surface
    * readability score 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), computed corpus-style (source-level
    * totals, so ASL/ASW are the source's aggregate averages). The
    * curation lens X1/X28 don't carry: a source can pass every Gopher
    * rule and still be legalese (40-word sentences, latinate
    * vocabulary → deeply negative score) or SEO chaff (staccato
    * 3-word fragments → implausibly high). Syllables use the standard
    * programmatic estimator — count of maximal vowel-group runs
    * ([aeiouy]+) — which is what every readability library actually
    * ships; sentences are maximal [.!?]+ runs, clamped to ≥ 1 per doc
    * so fragment docs count as one sentence rather than poisoning the
    * ratio with a zero.
    *
    * Exactness: the three counts are exact integers off regexp_count
    * (both engines anchor the same ERE class semantics); the score is
    * ONE fixed double tree — two divisions, two multiplies, two
    * subtractions — micro-floored once per source.
    *
    * Scale shape: a pure per-doc projection (three codegen regex
    * counters, no explode — the corpus is never tokenized into rows)
    * followed by a source-sized integer rollup with map-side partials.
    */
  def readability(docs: DataFrame): DataFrame =
    parallelized(docs).select(col("source"),
        size(tokens(col("text"))).cast("long").as("w"),
        greatest(lit(1L),
          regexp_count(col("text"), lit("[.!?]+")).cast("long")).as("s"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
          .as("sy"))
      .groupBy("source")
      .agg(sum("w").as("n_words"), sum("s").as("n_sents"),
        sum("sy").as("n_syll"))
      .withColumn("flesch_micro",
        micro(lit(206.835) -
          lit(1.015) * (col("n_words") / col("n_sents")) -
          lit(84.6) * (col("n_syll") / col("n_words"))))

  /** X61: character-class composition census per source — the
    * alpha/digit/single-space/symbol split every quality pipeline
    * reads before its tokenizer does (Gopher's symbol-to-word ratio,
    * C4's punctuation heuristics): a source drowning in digits is logs
    * or tables, one drowning in symbols is code or markup soup, and
    * neither belongs in a prose mix at its raw weight. The space class
    * counts only the literal ' ' separator (tabs/newlines/CRs land in
    * symbol — in this corpus they are formatting anomalies worth
    * surfacing, not whitespace to forgive). Symbol count is the
    * complement (chars − alpha − digit − space), so the four classes
    * always partition the byte budget exactly.
    *
    * Exactness: counts are exact integers off regexp_count; each
    * ratio is ONE micro-floored division of source-total integers.
    * Scale shape: a pure per-doc projection (three codegen regex
    * counters) into a source-sized integer rollup.
    */
  def charClasses(docs: DataFrame): DataFrame =
    parallelized(docs).select(col("source"),
        length(col("text")).cast("long").as("chars"),
        regexp_count(col("text"), lit("[A-Za-z]")).cast("long")
          .as("alpha"),
        regexp_count(col("text"), lit("[0-9]")).cast("long").as("digit"),
        regexp_count(col("text"), lit(" ")).cast("long").as("space"))
      .groupBy("source")
      .agg(sum("chars").as("n_chars"), sum("alpha").as("alpha"),
        sum("digit").as("digit"), sum("space").as("space"))
      .select(col("source"), col("n_chars"), col("alpha"), col("digit"),
        col("space"),
        (col("n_chars") - col("alpha") - col("digit") - col("space"))
          .as("symbol"),
        micro(col("alpha") / col("n_chars")).as("alpha_micro"),
        micro(col("digit") / col("n_chars")).as("digit_micro"),
        micro((col("n_chars") - col("alpha") - col("digit") -
          col("space")) / col("n_chars")).as("symbol_micro"))

  /** X62: skip-gram co-occurrence PMI over the top-V terms — the
    * word-association matrix (the PMI formulation word2vec's SGNS
    * implicitly factorizes, Levy & Goldberg 2014) X43's DOCUMENT-level
    * lift can't see: X43 asks "do these words share documents", this
    * asks "do they share a ±2-token window" — collocations,
    * multi-word entities, template n-grams. Marginals and the total
    * come FROM the pair relation itself (cx = Σ_y c_xy row marginal,
    * N = Σ c_xy), so the distribution is self-consistent — never
    * corpus unigram counts mixed with window pair counts. Pairs are
    * position-ordered (first, second), so directional template
    * signatures survive.
    *
    * Exactness: counts exact; PMI = ln(c_xy·N/(cx·cy)) is ONE
    * micro-floored tree — two exact-integer products (< 2⁵³), one
    * division, one ln.
    *
    * Scale shape: the occurrence stream is top-V-FILTERED before the
    * pair join (broadcast winners), so the position band self-join
    * fans out ≤ window× on a stream bounded by the top-V density,
    * never the corpus; the census and both marginals are ≤ V² rows.
    */
  def skipgramPmi(docs: DataFrame, topV: Int = 50,
                  window: Int = 2): DataFrame = {
    val occ = parallelized(docs)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("p"),
        col("col").as("t"))
    val top = occ.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(topV).select("t")
    val ot = occ.join(broadcast(top), Seq("t")).transform(Materialize.shared)
    val a = ot.select(col("doc_id"), col("p"), col("t").as("x"))
    val b = ot.select(col("doc_id").as("d2"), col("p").as("q"),
      col("t").as("y"))
    val cen = a.join(b, col("doc_id") === col("d2") &&
        col("q") > col("p") && col("q") <= col("p") + window.toLong)
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .transform(Materialize.shared)
    val mx = cen.groupBy("x").agg(sum("c_xy").as("c_x"))
    val my = cen.groupBy("y").agg(sum("c_xy").as("c_y"))
    val tot = cen.agg(sum("c_xy").as("n"))
    cen.join(mx, Seq("x")).join(my, Seq("y"))
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        micro(log((col("c_xy") * col("n")) / (col("c_x") * col("c_y"))))
          .as("pmi_micro"))
  }

  /** X59: Gini coefficient of the type-frequency distribution per
    * source — the inequality lens on vocabulary usage that X47's HHI
    * (dominated by the few largest shares) and X38's Zipf slope (a
    * two-point fit) both summarize away: G = Σ(2i−n−1)·c_(i) / (n·T)
    * over counts sorted ascending, 0 = every type used equally, → 1 =
    * one type carries the corpus. Template/generator text shows up as
    * a LOW Gini at tiny vocabulary (flat reuse of few types); healthy
    * prose is high-Gini high-vocabulary (Zipf's law IS inequality).
    *
    * The ranked sum never ranks types individually: tied counts are
    * contiguous ranks, so each (count, multiplicity) census group
    * contributes the closed form c·m·(2a + m − n) where a is the
    * number of types with smaller counts — the X38 discipline (the
    * cumulative window runs over the O(√T)-bounded frequency census,
    * never the type census, so no per-source type-sized sort exists
    * anywhere in the plan).
    *
    * Exactness: all integers until ONE micro-floored division
    * num/(n·T). Headroom: |num| ≤ n·T ≤ 2⁶³ holds through ~10⁹ types
    * × ~10¹⁰ tokens per source; past that the same census form
    * carries in DECIMAL(38,0) unchanged.
    */
  def gini(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fcen = parallelized(docs).select(col("source"),
        explode(tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
      .groupBy("source", "c").agg(count(lit(1)).as("m"))
    val cum = fcen.withColumn("cum",
      sum("m").over(Window.partitionBy("source").orderBy("c")))
    val tot = fcen.groupBy("source")
      .agg(sum("m").as("n"), sum(col("c") * col("m")).as("t"))
    cum.join(tot, Seq("source"))
      .select(col("source"), col("n"), col("t"),
        (col("c") * col("m") *
          (lit(2L) * (col("cum") - col("m")) + col("m") - col("n")))
          .as("contrib"))
      .groupBy("source")
      .agg(max("n").as("n_types"), max("t").as("n_tokens"),
        sum("contrib").as("num"))
      .select(col("source"), col("n_types"), col("n_tokens"),
        micro(col("num") / (col("n_types") * col("n_tokens")))
          .as("gini_micro"))
  }

  /** X60: top-k type coverage curve per source — what fraction of a
    * source's token mass its k most frequent types carry, at k ∈
    * {1, 10, 100, 1000}. The operational readout of X38/X59: a
    * tokenizer-budget or stopword-list decision reads "top-1000 types
    * cover 72 %" directly, where a Zipf slope or Gini has to be
    * inverted. k is clamped to the vocabulary (k_used = min(k, n)) so
    * small sources report their true saturation point instead of a
    * missing row.
    *
    * Scale shape: the rank cut `row_number ≤ max(k)` plans as
    * WindowGroupLimit (the V12 precedent) — per-partition top-1000
    * before the Exchange — so the cumulative window that follows runs
    * over ≤ 1000 rows per source, never the type census; totals come
    * off the census aggregation, not a second corpus pass. Exactness:
    * integer cumulative, ONE micro division per output row; ties at
    * the cut break on (count desc, type) in both engines — ASCII
    * tokens keep the collations aligned.
    */
  def coverageCurve(docs: DataFrame,
                    ks: Seq[Int] = Seq(1, 10, 100, 1000)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxK = ks.max
    val cen = parallelized(docs).select(col("source"),
        explode(tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
      .transform(Materialize.shared)
    val tot = cen.groupBy("source")
      .agg(count(lit(1)).as("n_types"), sum("c").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy(col("c").desc, col("t"))
    val top = cen.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= maxK.toLong)
      .withColumn("cum", sum("c").over(
        Window.partitionBy("source").orderBy(col("c").desc, col("t"))))
    import docs.sparkSession.implicits._
    val kdf = ks.map(_.toLong).toDF("k")
    val picked = top.select(col("source").as("psrc"), col("rn"),
      col("cum"))
    tot.crossJoin(broadcast(kdf))
      .withColumn("k_used", least(col("k"), col("n_types")))
      .join(picked, col("source") === col("psrc") &&
        col("k_used") === col("rn"))
      .select(col("source"), col("k"), col("k_used"),
        col("n_types"), col("n_tokens"),
        micro(col("cum") / col("n_tokens")).as("cov_micro"))
  }

  // ----------------------------------------------- LSH tuner (D24)

  /** D24's config grid: every (bands, rows) factorization of the 16
    * MinHash components.
    */
  val LshTuneConfigs: Seq[(Int, Int)] =
    Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))

  /** Left-associated explicit power chain `(e) * (e) * … * (e)` —
    * integer exponents expanded to multiplication so BOTH engines
    * evaluate the identical double tree (libm `pow` is not
    * cross-engine reproducible; a product of identical factors is).
    */
  def powChainSql(e: String, k: Int): String =
    Seq.fill(k)(s"($e)").mkString(" * ")

  /** The S-curve collision probability 1 − (1 − t^r)^b at `tmid`, in
    * micro units, as engine-portable SQL (shared verbatim between the
    * Spark plan and the DuckDB oracle).
    */
  def lshCollideMicroSql(b: Int, r: Int): String =
    "CAST(floor(1000000.0 * (1.0 - (" +
      powChainSql(s"1.0 - (${powChainSql("tmid", r)})", b) +
      "))) AS BIGINT)"

  /** D24: MinHash-LSH band/row auto-tuner — the parameter sweep every
    * LSH deployment runs before fixing (bands, rows): for each
    * factorization of the 16 signature components, integrate the
    * S-curve collision probability 1 − (1 − t^r)^b against the
    * CORPUS'S OWN verified Jaccard histogram (the D17 census — not
    * the uniform prior of the textbook analysis) and report, at the
    * dedup threshold τ: expected candidates, expected wasted
    * verifications (collisions below τ — the cost knob), and expected
    * missed duplicates (non-collisions at/above τ — the recall knob).
    * D16 calibrates the ESTIMATOR at the production config; this
    * chooses the config.
    *
    * Exactness: the histogram masses are exact pair counts; each
    * bucket's collision probability is ONE micro-floored double tree
    * whose powers are explicit multiplication chains (shared verbatim
    * with the oracle — libm pow never runs); all weighting is integer
    * products and sums. Mass is conditioned on the D15/D17 candidate
    * stream (pairs the current banding surfaces) — documented: the
    * tuner reads relative config quality, not absolute corpus counts.
    *
    * Scale shape: everything after [[ngramPairStats]] (LSH-bounded,
    * df-capped) is census-sized: ≤ 21 buckets × 5 configs rows, one
    * partial-agg'd rollup to 5 rows.
    */
  def lshTune(docs: DataFrame, n: Int, maxDf: Long,
              tauMicro: Long): DataFrame = {
    val bucket = (floor(micro(
      col("inter") / (col("n1") + col("n2") - col("inter"))) /
      lit(50000L)) * 50000L).as("bucket_lo_micro")
    val census = ngramPairStats(docs, n, maxDf)
      .select(bucket)
      .groupBy("bucket_lo_micro")
      .agg(count(lit(1)).as("n_pairs"))
    val cfgs = array(LshTuneConfigs.map { case (b, r) =>
      struct(lit(b.toLong).as("bands"),
        lit(r.toLong).as("rows_per_band"),
        expr(lshCollideMicroSql(b, r)).as("p_micro"))
    }: _*)
    census
      // midpoint clamped at 1.0: the exact-duplicate bucket's lo IS
      // 1.0, and an unclamped mid would leave the S-curve's domain
      // (t^r > 1 flips the sign of every factor)
      .withColumn("tmid",
        expr("CAST(least(bucket_lo_micro + 25000, 1000000) AS DOUBLE)" +
          " / 1000000.0"))
      .select(col("bucket_lo_micro"), col("n_pairs"),
        explode(cfgs).as("c"))
      .select(col("bucket_lo_micro"), col("n_pairs"),
        col("c.bands").as("bands"),
        col("c.rows_per_band").as("rows_per_band"),
        col("c.p_micro").as("p_micro"))
      .groupBy("bands", "rows_per_band")
      .agg(sum("n_pairs").as("n_pairs_total"),
        sum(col("n_pairs") * col("p_micro")).as("exp_candidates"),
        sum(when(col("bucket_lo_micro") + 25000L < tauMicro,
          col("n_pairs") * col("p_micro")).otherwise(0L))
          .as("fp_mass"),
        sum(when(col("bucket_lo_micro") + 25000L >= tauMicro,
          col("n_pairs") * (lit(1000000L) - col("p_micro")))
          .otherwise(0L)).as("fn_mass"))
      .orderBy("bands")
  }

  // --------------------------------------------- RAKE keyphrases (X63)

  /** X63's stopword delimiters — the corpus's function words (the X1
    * stop-ratio convention).
    */
  val RakeStops: Seq[String] = Seq("the", "a")

  /** X63: RAKE keyphrase extraction (Rose et al. 2010) — the
    * PHRASE-level companion of X4's term-level TF-IDF: candidate
    * phrases are maximal stopword-free token runs (gaps-and-islands on
    * stopword positions), each word scores degree/frequency over the
    * candidate set (degree = Σ length of phrases containing the word —
    * co-occurring words inflate it, so multi-word domain phrases
    * outrank bare frequent terms), and a phrase scores the sum of its
    * member word scores. The top-k census is what keyword-tagging and
    * topic-labeling stages consume.
    *
    * Contract: candidates longer than `maxLen` tokens are DISCARDED
    * (the standard RAKE cap — an uncapped run lets one-off long
    * phrases inflate member degrees) and word statistics run over the
    * capped candidate set, self-consistently. Identical phrase TEXTS
    * aggregate: same members ⇒ same score, so the census carries
    * (phrase, n_occ, score).
    *
    * Exactness: freq/degree are exact integer counts; a word's score
    * is ONE integer micro division (deg·1e6) div freq; a phrase's
    * score is an INTEGER sum of those — association-free. Phrase
    * assembly is order-pinned both sides (array_sort on (pos, tok) /
    * string_agg ORDER BY pos); ties at the cut break (score DESC,
    * phrase) — ASCII keeps collations aligned.
    *
    * Scale shape: one corpus scan explodes tokens; the islands window
    * partitions BY DOCUMENT (document-sized frames, never corpus
    * ones); word stats are two (term)-keyed partial-agg'd Exchanges
    * (vocabulary-sized census); the phrase relation is bounded by
    * token count / 1 and its rollup keys on phrase text; the final
    * top-k is a bounded TakeOrderedAndProject — no global sort.
    */
  def rakeKeyphrases(docs: DataFrame, maxLen: Int = 3,
                     k: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = parallelized(docs).select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val ns = tok.filter(!col("tok").isin(RakeStops: _*))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val isl = ns.withColumn("grp", col("pos") - row_number().over(w))
    val phr = isl.groupBy("doc_id", "grp")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"),
        count(lit(1)).as("len"))
      .filter(col("len") <= maxLen.toLong)
    val words = isl.select(col("doc_id"), col("grp"), col("tok"))
      .join(phr.select(col("doc_id"), col("grp"), col("len")),
        Seq("doc_id", "grp"))
    val wsc = words.groupBy("tok")
      .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
      .select(col("tok"), expr("(deg * 1000000) div freq").as("wscore"))
    val psc = words.join(wsc, Seq("tok"))
      .groupBy("doc_id", "grp")
      .agg(sum("wscore").as("score"))
      .join(phr.select(col("doc_id"), col("grp"), col("phrase")),
        Seq("doc_id", "grp"))
    psc.groupBy("phrase")
      .agg(count(lit(1)).as("n_occ"), max("score").as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase"))
      .limit(k)
  }

  /** D30: duplicate-opener census — documents sharing their first
    * [[PrefixDupTokens]] tokens, the TEMPLATE-OPENER detector the
    * whole-document lenses miss: a boilerplate disclaimer, a scraped
    * nav header, or a form letter's fixed opening glues thousands of
    * otherwise-distinct documents into one opener class, which D1
    * (exact hash) never groups (the bodies differ) and D2/D3 only
    * catch pairwise at Jaccard cost — here the grouping is a single
    * hash-groupBy on the prefix key, the cheapest lens in the family,
    * and the standard first pass extraction pipelines run (CCNet-
    * style line/prefix dedup operates on exactly this signal). Read
    * next to X27's line-frequency boilerplate: X27 finds repeated
    * LINES anywhere, this finds repeated OPENINGS — the signature of
    * template instantiation rather than quoted content.
    *
    * Semantics: key = md5 of the first min(P, len) tokens re-joined;
    * documents shorter than P key on their full text (they group only
    * with equals of the same short prefix — documented); groups of
    * one drop (the census reports duplication, not the corpus).
    * Exactness: counts are exact integers, the key the shared md5
    * primitive; the exemplar is min(doc_id) — deterministic.
    *
    * Scale shape: ONE scan into ONE (prefix-hash) partial-agg'd
    * Exchange with map-side combine; output is bounded by the number
    * of DUPLICATED openers. No pairing, no window, no join — the
    * opener class materializes directly, where a pairwise detector
    * would pay |class|²/2.
    */
  val PrefixDupTokens = 8

  /** The (source, doc_id, pk) keying shared by the batch census and
    * the T23 streaming store — factored so streamed-vs-batch parity
    * is the same kernel, not a twin implementation.
    */
  def prefixKeys(docs: DataFrame, p: Int): DataFrame =
    parallelized(docs).select(col("source"), col("doc_id"),
      md5Long(concat_ws(" ", slice(tokens(col("text")), 1, p)))
        .as("pk"))

  def prefixDupCensus(docs: DataFrame, p: Int): DataFrame =
    prefixKeys(docs, p)
      .groupBy("pk")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        min("doc_id").as("exemplar"))
      .filter(col("n_docs") >= 2L)
      .orderBy(col("n_docs").desc, col("pk"))

  /** D31: shingle document-frequency spectrum — the tuning table
    * behind every df cap in the family (D2's inverted index, D9's
    * gram blocking, X17's winnow buckets all carry a maxDf dial whose
    * value has so far been an argument; this is the measurement): the
    * 5-gram df distribution bucketed by power of two, each bucket
    * carrying the gram count, the occurrence mass, and — the number
    * the cap actually trades — the candidate-PAIR mass Σ df·(df−1)/2
    * an inverted index would emit if grams of that df were kept, plus
    * the running cumulative. Reading: the cap belongs where
    * cum_pair_mass turns vertical — above it sit boilerplate grams
    * that generate quadratic pair traffic and no dedup signal
    * (Broder's classic super-shingle observation).
    *
    * Exactness: everything is exact integer arithmetic — the bucket
    * is floor(log₂ df)+1 computed from the BINARY STRING LENGTH
    * (`bin`/`printf('%b')` — no floating log, so exact at powers of
    * two where log2 rounds wrong); pair mass df·(df−1) is even, so
    * the halving floor-division is exact; bucket bounds are
    * power-of-two doubles cast back (exact to 2⁵³).
    *
    * Scale shape: one shingle scan into the (gram) df census (the D2
    * relation), then a ≤ 64-row bucket census; the cumulative window
    * runs over those ≤ 64 rows (the X33 census-window discipline).
    */
  def shingleDfCensus(docs: DataFrame, n: Int, capDf: Long): DataFrame = {
    val dfs = shingleSet(docs, n).groupBy("sh")
      .agg(count(lit(1)).as("df"))
    val buckets = dfs
      .withColumn("bucket", length(bin(col("df"))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_grams"), sum("df").as("occ_mass"),
        sum(expr("(df * (df - 1)) div 2")).as("pair_mass"),
        sum(when(col("df") <= capDf, 1L).otherwise(0L))
          .as("n_under_cap"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy("bucket")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    buckets
      .select(col("bucket"),
        expr("CAST(power(2, bucket - 1) AS BIGINT)").as("lo"),
        (expr("CAST(power(2, bucket) AS BIGINT)") - 1L).as("hi"),
        col("n_grams"), col("occ_mass"), col("pair_mass"),
        col("n_under_cap"))
      .withColumn("cum_pair_mass", sum("pair_mass").over(wCum))
      .orderBy("bucket")
  }
}
