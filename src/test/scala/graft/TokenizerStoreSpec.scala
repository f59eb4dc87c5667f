package graft

import graft.operators.TextOps
import graft.sources.TokenizerStore

/** [[TokenizerStore]] — the persisted-tokenizer deployment shape:
  * store-encode must equal in-query encode on the training corpus, and
  * the dictionary-miss fold cascade must tokenize novel words exactly
  * as training would have.
  */
class TokenizerStoreSpec extends SparkSpec {
  import sqlImplicits._

  private val corpus = Seq(
    "the cat sat on the mat",
    "The THE the batter better",
    "aaa abab xaay ab ab ab",
    "letter better setter, wetter!",
    "12345 !!!")
  private val merges = 6

  private def df(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("store encode equals in-query encode on the training corpus") {
    val path = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    TokenizerStore.save(df(corpus), path, merges)
    assert(rows(TokenizerStore.encodeWith(spark, path, df(corpus))) ===
      rows(TextOps.bpeEncode(df(corpus), merges)))
  }

  test("dictionary misses replay the chain exactly like training") {
    val path = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    TokenizerStore.save(df(corpus), path, merges)
    // novel shard: 'thecat'/'batters'/'aaaa' unseen at train time
    val shard = Seq("thecat batters aaaa", "the zzz")
    // naive: apply the stored merges to each novel word's chars
    val stored = TokenizerStore.readMerges(spark, path)
    def naiveTok(w: String): Long = {
      var syms = w.split("").filter(_.nonEmpty).toVector
      stored.foreach { case (lhs, rhs) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
            out += (lhs + rhs); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }
    val expect = shard.zipWithIndex.map { case (t, i) =>
      val ws = "[A-Za-z]+".r.findAllIn(t).map(_.toLowerCase).toSeq
      val nSub = ws.map(naiveTok).sum
      val micro =
        math.floor(1e6 * nSub.toDouble / ws.length).toLong
      (i.toLong, ws.length.toLong, nSub, micro)
    }
    val got = rows(TokenizerStore.encodeWith(spark, path, df(shard)))
    assert(got === expect)
  }

  test("chain and dictionary agree on every trained word") {
    val path = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    TokenizerStore.save(df(corpus), path, merges)
    val dict = spark.read.parquet(s"$path/dict")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stored = TokenizerStore.readMerges(spark, path)
    // re-encode each dict word through the miss path by hiding the
    // dictionary: a one-word doc per word, empty store dict is not
    // constructible, so assert via the naive chain instead
    def naiveTok(w: String): Long = {
      var syms = w.split("").filter(_.nonEmpty).toVector
      stored.foreach { case (lhs, rhs) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
            out += (lhs + rhs); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }
    dict.foreach { case (w, n) =>
      assert(naiveTok(w) === n, s"chain/dict disagreement on '$w'")
    }
  }

  // naive in-order chain application — the reference for every
  // miss-path and sampled-dict assertion below
  private def naiveChain(w: String,
                         chain: Seq[(String, String)]): Long = {
    var syms = w.split("").filter(_.nonEmpty).toVector
    chain.foreach { case (lhs, rhs) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
          out += (lhs + rhs); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms.length.toLong
  }

  // frequency-separated sampling fixture: every merge-determining pair
  // comes from the 200 identical type-A docs (alphabet {m,a,d} — any
  // subset keeps A's pair ratios EXACTLY), while the rare B/C docs use
  // a disjoint alphabet and can never out-count A's floor (≤32 vs
  // ≥200 full, ≥~80 sampled) or perturb an A pair's count — so the 50%
  // hash-sample provably learns the identical merge sequence
  private def sampledCorpus = {
    val texts =
      Seq.fill(200)("mamma adam dam mad madam") ++
        Seq.fill(8)("zonzo zorro pronto") ++
        Seq.fill(8)("porto torno")
    df(texts)
  }

  test("sample-trained merges equal full-trained merges on the fixture") {
    val full = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    val sampled = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    TokenizerStore.save(sampledCorpus, full, 8)
    TokenizerStore.save(sampledCorpus, sampled, 8, samplePct = 50)
    // the sample really is a strict subset
    val nSample = sampledCorpus
      .filter(TokenizerStore.sampleFilter(50)).count()
    assert(nSample > 0 && nSample < 216,
      s"sample of $nSample/216 docs is not a strict subset")
    assert(TokenizerStore.readMerges(spark, sampled) ===
      TokenizerStore.readMerges(spark, full))
  }

  test("sampled store's dictionary covers the FULL corpus exactly") {
    val path = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    TokenizerStore.save(sampledCorpus, path, 8, samplePct = 50)
    // no word form of the full corpus is a dictionary miss
    assert(TokenizerStore.auditShard(spark, path, sampledCorpus)
      .oovWords === 0L)
    // and out-of-sample dict entries are exact chain applications
    val chain = TokenizerStore.readMerges(spark, path)
    spark.read.parquet(s"$path/dict").collect()
      .foreach { r =>
        assert(naiveChain(r.getString(0), chain) === r.getLong(1),
          s"sampled dict wrong for '${r.getString(0)}'")
      }
  }

  test("120-merge training is bounded and the deep chain replays flat") {
    // vocabulary-rich deterministic corpus: 360 synthetic words
    val words = (0 until 360).map { i =>
      val x = i * 7919 + 13
      (0 until (5 + i % 5)).map(j => ('a' + (x >> (j * 2)) % 26).toChar)
        .mkString
    }
    val corpus = words.grouped(12).map(_.mkString(" ")).toSeq
    val path = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    TokenizerStore.save(df(corpus), path, merges = 120)
    val chain = TokenizerStore.readMerges(spark, path)
    assert(chain.length === 120)
    // novel shard: every word unseen → every word takes the 120-deep
    // miss path, which must compile (constant expression depth) and
    // match the naive in-order reference exactly
    val novel = Seq("qqabcdefgh zzyyxxwwvv", "the cat grazes")
    val expect = novel.zipWithIndex.map { case (t, i) =>
      val ws = "[A-Za-z]+".r.findAllIn(t).map(_.toLowerCase).toSeq
      val dict = spark.read.parquet(s"$path/dict")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val nSub = ws.map(w => dict.getOrElse(w, naiveChain(w, chain))).sum
      (i.toLong, ws.length.toLong, nSub,
        math.floor(1e6 * nSub.toDouble / ws.length).toLong)
    }
    assert(rows(TokenizerStore.encodeWith(spark, path, df(novel))) ===
      expect)
  }

  test("drift-gated retrain: swap fires on OOV drift, encode follows") {
    val path = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    TokenizerStore.save(df(corpus), path, merges)
    // in-vocabulary shard: no retrain, artifact untouched
    val calm = df(Seq("the cat sat"))
    val (d0, r0) = TokenizerStore.auditOrRetrain(spark, path, calm,
      df(corpus), oovMicroMax = 500000L, merges)
    assert(!r0 && d0.oovWords === 0L)
    // drifted shard: 4/4 words unseen → retrain on corpus ∪ shard
    val drifted = df(Seq("zzz qqq jjj kkk"))
    val grown = df(corpus ++ Seq("zzz qqq jjj kkk"))
    val (d1, r1) = TokenizerStore.auditOrRetrain(spark, path, drifted,
      grown, oovMicroMax = 500000L, merges)
    assert(r1 && d1.oovMicro === 1000000L)
    // the swapped-in artifact now covers the drifted shard...
    assert(TokenizerStore.auditShard(spark, path, drifted)
      .oovWords === 0L)
    // ...and encode output switches to the new table atomically:
    // identical to a fresh save on the grown corpus
    val fresh = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    TokenizerStore.save(grown, fresh, merges)
    assert(rows(TokenizerStore.encodeWith(spark, path, drifted)) ===
      rows(TokenizerStore.encodeWith(spark, fresh, drifted)))
    // no leftover swap scratch directories
    assert(!new java.io.File(s"${path}__retrain_tmp").exists)
    assert(!new java.io.File(s"${path}__retrain_old").exists)
  }

  test("shard OOV drift: zero on the training corpus, exact on novel") {
    val path = java.nio.file.Files
      .createTempDirectory("tokstore").toString
    TokenizerStore.save(df(corpus), path, merges)
    val onTrain = TokenizerStore.auditShard(spark, path, df(corpus))
    assert(onTrain.oovWords === 0L)
    assert(!onTrain.needsRetrain(0L))
    // shard: 5 words, 3 unseen (thecat, batters, zzz; 'the' seen twice)
    val drift = TokenizerStore.auditShard(spark, path,
      df(Seq("thecat batters the", "the zzz")))
    assert(drift.nWords === 5L)
    assert(drift.oovWords === 3L)
    assert(drift.oovMicro === 600000L)
    assert(drift.needsRetrain(500000L) && !drift.needsRetrain(600000L))
  }
}
