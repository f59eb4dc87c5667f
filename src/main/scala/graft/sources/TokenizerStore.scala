package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing.micro
import graft.operators.TextOps

/** Persisted BPE tokenizer — the deployment shape of
  * [[TextOps.bpeTrain]] (train ONCE at write time, encode forever
  * after), completing the pattern [[FingerprintStore]], [[GramStore]],
  * and [[VectorStore]] set for their operator families: the oracled
  * query trains in-query; the store is the production path where the
  * 100 TB corpus is read once and every later shard reuses the
  * artifact.
  *
  * Layout under `path`:
  *  - `merges/` — the ordered learned merge table
  *    (step, lhs, rhs, merged, pair_freq)
  *  - `dict/`   — (word, n_sub): the subtoken count of every word form
  *    seen at training time (= the final training vocabulary's
  *    symbol-array length; vocabulary-sized, Heaps-bounded)
  *
  * [[encodeWith]] censuses a NEW shard without retraining. Seen words
  * hit the broadcast dictionary — the hot path; Heaps' law makes
  * almost every occurrence of a large corpus a dictionary hit. Unseen
  * words replay the stored merge chain as a fold cascade per word —
  * exact BPE application, identical to how training would have
  * tokenized the word, evaluated ONLY on dictionary misses (the
  * conditional branch keeps the interpreted higher-order folds off the
  * hot path). Both paths are shuffle-free; the only Exchange is the
  * doc-keyed partial aggregation any per-document census pays.
  *
  * TokenizerStoreSpec pins store-encode == in-query encode on the
  * training corpus, and the miss path against the naive reference on
  * novel words.
  */
object TokenizerStore {

  private def mergesDir(path: String) = s"$path/merges"
  private def dictDir(path: String) = s"$path/dict"

  /** Train on `docs` and persist the merge table + dictionary. */
  def save(docs: DataFrame, path: String,
           merges: Int = TextOps.BpeMerges): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (learned, vocab) = TextOps.bpeTrainLoop(docs, merges)
    learned.toDF("step", "lhs", "rhs", "merged", "pair_freq")
      .coalesce(1).write.mode("overwrite").parquet(mergesDir(path))
    vocab.select(col("word"), size(col("syms")).cast("long").as("n_sub"))
      .write.mode("overwrite").parquet(dictDir(path))
  }

  /** The stored merge chain, in training order. */
  def readMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(mergesDir(path)).orderBy("step")
      .select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Subtoken count of one word under the stored chain: characters
    * folded through every merge in training order — exact BPE
    * application, used for dictionary misses only.
    */
  private def chainTokens(word: Column,
                          merges: Seq[(String, String)]): Column =
    size(merges.foldLeft(filter(split(word, ""), s => s =!= "")) {
      case (syms, (lhs, rhs)) => TextOps.bpeMergeFold(syms, lhs, rhs)
    }).cast("long")

  /** Out-of-vocabulary drift of one shard against the stored
    * dictionary — the retrain signal, mirroring [[VectorStore]]'s
    * assignment-score drift: a rising miss fraction means the corpus
    * has moved past the tokenizer's training vocabulary (new domains,
    * new languages) and the merge table is mis-budgeting tokens.
    */
  final case class TokDrift(nWords: Long, oovWords: Long) {
    def oovMicro: Long =
      if (nWords == 0) 0L
      else math.floor(1e6 * oovWords.toDouble / nWords).toLong
    def needsRetrain(oovMicroMax: Long): Boolean = oovMicro > oovMicroMax
  }

  /** Measure a shard's [[TokDrift]] — one broadcast dictionary join,
    * one global count pair; the shard never shuffles.
    */
  def auditShard(spark: SparkSession, path: String,
                 docs: DataFrame): TokDrift = {
    val dict = spark.read.parquet(dictDir(path))
    val r = docs
      .select(explode(regexp_extract_all(col("text"),
        lit("[A-Za-z]+"), lit(0))).as("w"))
      .select(lower(col("w")).as("word"))
      .join(broadcast(dict), Seq("word"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("n_sub").isNull, 1L).otherwise(0L)).as("oov"))
      .head()
    TokDrift(r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Per-document census of `docs` under the STORED tokenizer — the
    * schema of [[TextOps.bpeEncode]] with zero training jobs.
    */
  def encodeWith(spark: SparkSession, path: String,
                 docs: DataFrame): DataFrame = {
    val merges = readMerges(spark, path)
    val dict = spark.read.parquet(dictDir(path))
    docs
      .select(col("doc_id"),
        explode_outer(regexp_extract_all(col("text"),
          lit("[A-Za-z]+"), lit(0))).as("w"))
      .select(col("doc_id"), lower(col("w")).as("word"))
      .join(broadcast(dict), Seq("word"), "left")
      .select(col("doc_id"), col("word"),
        when(col("word").isNull, lit(null).cast("long"))
          .otherwise(coalesce(col("n_sub"),
            chainTokens(col("word"), merges))).as("n_sub"))
      .groupBy("doc_id")
      .agg(count(col("word")).as("n_words"),
        coalesce(sum("n_sub"), lit(0L)).as("n_subtokens"))
      .select(col("doc_id"), col("n_words"), col("n_subtokens"),
        when(col("n_words") > 0,
          micro(col("n_subtokens") / col("n_words")))
          .otherwise(lit(0L)).as("subtokens_per_word_micro"))
      .orderBy("doc_id")
  }
}
