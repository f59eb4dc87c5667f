package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MultimodalOps, SimilarityOps, TextOps}

/** Dev tool: scale-extrapolation probe. Replicates the sf0.1 tables
  * in-memory (id-offset copies — same distribution, k× the rows; near-
  * dup pairs only exist within each replica, so candidate counts scale
  * linearly like real deduped corpora) and times the heavy operators at
  * 1×..k×. If time grows ~linearly the candidate-generation design
  * (inverted index / LSH buckets) is doing its job; quadratic growth
  * would expose an O(n²) hiding behind the small provided SFs.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def replicate(df: DataFrame, idCol: String, copies: Int): DataFrame = {
      val n = 10000000L
      df.crossJoin(
          spark.range(copies).toDF("__r"))
        .withColumn(idCol, col(idCol) + col("__r") * n)
        .drop("__r")
    }

    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text")
    val emb = graft.sources.Tables.embeddings(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"SCALE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
      spark.catalog.clearCache()
    }

    Seq(1, k).foreach { c =>
      val d = replicate(docs, "doc_id", c)
      val e = replicate(emb, "vec_id", c)
      println(s"--- ${c}x sf0.1 (${5000 * c} docs, ${2000 * c} vecs) ---")
      time(s"minhash_lsh_${c}x")(
        TextOps.minhashLshPairs(d, 5, 700000L).count())
      time(s"ngram_jaccard_${c}x")(
        TextOps.ngramJaccardPairs(d, 5, 1000L, 800000L).count())
      time(s"simhash_pairs_${c}x")(
        TextOps.simhashPairs(d, 3).count())
      time(s"sign_lsh_${c}x")(
        SimilarityOps.signLshPairs(e, 16, 4, 400000L).count())
      time(s"ann_topk_${c}x")(
        SimilarityOps.annTopK(e, 0L, 10).count())
    }

    // Production sign-LSH setting (ScaleLshPlanes × ScaleLshBandBits,
    // see SimilarityOps). Candidate COUNT on replicated identical data
    // is exactly quadratic for any similarity-preserving LSH (every
    // cross-replica copy-pair of a 1× candidate is itself a candidate —
    // measured 65x at 8x, k²=64 plus the identical-copy pairs), so
    // "sub-quadratic growth" is not the invariant to pin. The invariant
    // that holds at 100 TB is the candidate FRACTION: of all n²/2
    // pairs, ~nBands·2^-bandBits collide on unclustered data — the
    // band-width dial (4→8 bits cuts the constant 16×) plus balanced
    // buckets (a skewed plane would blow the constant past theory).
    val cand = Seq(1, k).map { c =>
      val e = replicate(emb, "vec_id", c)
      var n = 0L
      time(s"lsh_scale_cand_${c}x") {
        n = SimilarityOps.signLshCandidates(e,
          SimilarityOps.ScaleLshPlanes, SimilarityOps.ScaleLshBandBits)
          .count()
        n
      }
      c -> n
    }.toMap
    println(f"SCALE lsh_scale_cand_growth ${
      cand(k).toDouble / math.max(1L, cand(1))}%.1fx at ${k}x " +
      f"(identical-replica floor=${k * k}x)")
    val nVec = emb.count() * k
    val frac = cand(k).toDouble / (nVec.toDouble * (nVec - 1) / 2.0)
    val nBands = SimilarityOps.ScaleLshPlanes / SimilarityOps.ScaleLshBandBits
    val theory = nBands * math.pow(2.0, -SimilarityOps.ScaleLshBandBits)
    println(f"SCALE lsh_scale_cand_fraction ${100 * frac}%.2f%% of all " +
      f"pairs (unclustered theory ${100 * theory}%.2f%%, bound ${
        300 * theory}%.2f%%)")
    require(frac <= 3 * theory,
      f"scale-config candidate fraction $frac%.4f exceeds 3x the " +
        f"B*2^-b theory bound — check hyperplane/bucket balance")

    // Production MinHash setting (ScaleMinhashBands × ScaleMinhashRows,
    // see TextOps for the S-curve math). Replica copies share their
    // signatures EXACTLY, so the candidate count at k× is an identity,
    // not a bound: cand(k×) = k²·cand(1×) + n·k(k−1)/2 — every 1×
    // candidate pair appears in all k² copy combinations, plus the
    // identical-copy pairs themselves always collide. Holding exactly
    // means the wide-band config generates candidates from true
    // similarity only; drift would expose band-hash truncation or a
    // broken bucket key.
    {
      val mhSeeds = graft.functions.Hashing.minhashSeeds(
        TextOps.ScaleMinhashBands * TextOps.ScaleMinhashRows)
      def mhCand(c: Int): Long = {
        val d = replicate(docs, "doc_id", c)
        val sh = TextOps.shingleSet(d, 5).select(col("doc_id"),
          graft.functions.Hashing.md5Long(col("sh")).as("h0"))
        var n = 0L
        time(s"minhash_scale_cand_${c}x") {
          n = TextOps.minhashCandidates(sh, TextOps.ScaleMinhashBands,
            TextOps.ScaleMinhashRows, mhSeeds).count()
          n
        }
        n
      }
      val base = mhCand(1)
      val atK = mhCand(k)
      val nDocs = docs.count()
      val expected = base * k * k + nDocs * k * (k - 1) / 2
      val nPairs1 = nDocs.toDouble * (nDocs - 1) / 2.0
      println(f"SCALE minhash_scale_cand_fraction ${100 * base / nPairs1}%.3f%% " +
        f"of 1x pairs; ${k}x identity $atK vs expected $expected")
      require(atK == expected,
        s"replica candidate identity broken: $atK != $expected")
      require(base / nPairs1 <= 0.001,
        f"wide-band MinHash candidate fraction ${base / nPairs1}%.5f " +
          "exceeds 0.1%% of all pairs — the S-curve should crush " +
          "background collisions")
    }

    // X40 source-overlap census at k× (the D2 replica identity
    // PROJECTED per source pair): replicas keep their source, so every
    // 1× pair multiplies k² inside its own (source_a, source_b) cell,
    // and each doc's identical replicas add k(k−1)/2 pairs to its
    // source's DIAGONAL cell — off-diagonal cells scale by exactly k²,
    // diagonals by k²·base + nDocs(source)·k(k−1)/2. The df cap scales
    // with k (df at k× is exactly k·df₁ — the substring-probe
    // discipline). Holding exactly means the census is driven by true
    // sharing per provenance cell, not hash drift.
    {
      val sdocs = graft.sources.Tables.documents(spark, dir)
        .select("doc_id", "text", "source")
      def srcov(c: Int): Map[(String, String), Long] = {
        val d = replicate(sdocs, "doc_id", c)
        var out: Map[(String, String), Long] = Map.empty
        time(s"source_overlap_${c}x") {
          out = TextOps.sourceOverlap(d, 5, 1000L * c, 800000L)
            .collect()
            .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
            .toMap
          out.size.toLong
        }
        out
      }
      val s1 = srcov(1)
      val sk = srcov(k)
      val perSource = sdocs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      sk.foreach { case ((sa, sb), n) =>
        val base = s1.getOrElse((sa, sb), 0L)
        val expected = base * k * k +
          (if (sa == sb) perSource(sa) * k * (k - 1) / 2 else 0L)
        require(n == expected,
          s"source-overlap identity broken at ($sa,$sb): $n != $expected")
      }
      // and no 1x cell disappears
      require(s1.keySet.subsetOf(sk.keySet),
        "every 1x census cell must survive replication")
      println(s"SCALE source_overlap_identity ok (${s1.size} cells at " +
        s"1x -> ${sk.size} at ${k}x; k² off-diagonal, " +
        "k²+n·k(k−1)/2 diagonal, exact)")
    }

    // Exact-substring span detection at k×. Replica copies share every
    // gram, so with the df cap scaled by k (df at k× is exactly k·df_1)
    // the pair count is an IDENTITY: every 1× pair appears in all k²
    // copy combinations, plus each doc that has ≥1 cap-surviving gram
    // pairs with its own k−1 copies. Holding exactly means candidates
    // come only from true shared substrings — hash-collision drift or a
    // broken df cap would break the equality.
    {
      val subK = 32
      val maxDf = 50L
      def subPairs(c: Int): Long = {
        val d = replicate(docs, "doc_id", c)
        var n = 0L
        time(s"substring_pairs_${c}x") {
          n = TextOps.substringMatches(d, subK, maxDf * c).count()
          n
        }
        n
      }
      val p1 = subPairs(1)
      val pk = subPairs(k)
      // docs owning >= 1 gram that survives the cap (df_1 <= maxDf; the
      // >= 2 lower bound is met at kx since every gram's df becomes k)
      val g1 = TextOps.gramFirstPositions(docs, subK)
      val dfOk = g1.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("h")
      val dCount = g1.join(dfOk, "h").select("doc_id").distinct().count()
      val expected = p1 * k * k + dCount * k * (k - 1) / 2
      println(s"SCALE substring_identity $pk vs expected $expected " +
        s"(p1=$p1, docsWithGrams=$dCount)")
      require(pk == expected,
        s"substring replica identity broken: $pk != $expected")
    }

    // BPE training at k×: replicating the corpus multiplies every word
    // frequency — hence every pair count — by exactly k, and ties at 1×
    // stay ties at k× under the same (count desc, pair asc) break, so
    // the learned merge SEQUENCE is invariant and each pair_freq scales
    // by exactly k. Holding exactly means training depends only on
    // frequency ratios (the property that makes a sampled/sharded
    // training corpus representative); drift would expose
    // non-determinism in the argmax or the rewrite.
    {
      def mergeTable(c: Int): Seq[(Int, String, String, Long)] = {
        val d = replicate(docs, "doc_id", c)
        var out: Seq[(Int, String, String, Long)] = Nil
        time(s"bpe_train_${c}x") {
          out = TextOps.bpeTrain(d, TextOps.BpeMerges).collect()
            .map(r => (r.getInt(0), r.getString(1), r.getString(2),
              r.getLong(4))).toSeq
          out.length.toLong
        }
        out
      }
      val m1 = mergeTable(1)
      val mk = mergeTable(k)
      require(mk == m1.map { case (s, a, b, f) => (s, a, b, f * k) },
        s"BPE merge-sequence invariance under ${k}x replication broken")
      println(s"SCALE bpe_merge_invariance ok (${m1.length} merges, " +
        s"pair counts exactly x$k)")
    }

    // Duplicated-span coverage at k×. With the df cap scaled by k,
    // the matched-position set SATURATES at 2×: every gram has
    // df_k = k·df_1, so the df >= 2 lower bound is met by every gram
    // once k >= 2 and the cap keeps exactly the df_1 <= maxDf grams —
    // the matched set (hence the interval union) is then independent
    // of k. Three invariants, all exact: (a) every replica reports the
    // identical row as its base doc (coverage is a pure function of
    // content); (b) 8× rows == 2× rows (saturation); (c) per base doc
    // 2× >= 1× in matched grams and covered chars (more duplicates
    // can only extend the matched set).
    {
      val subK = 32
      val maxDf = 50L
      val base = 10000000L
      def cov(c: Int): Map[Long, (Long, Long, Long, Long)] = {
        val d = replicate(docs, "doc_id", c)
        var out: Map[Long, (Long, Long, Long, Long)] = Map.empty
        time(s"dup_coverage_${c}x") {
          out = TextOps.dupCoverage(d, subK, maxDf * c).collect()
            .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4))).toMap
          out.size.toLong
        }
        out
      }
      val c1 = cov(1)
      val c2 = cov(2)
      val ck = cov(k)
      ck.foreach { case (id, v) =>
        require(v == c2(id % base),
          s"replica/saturation identity broken for doc $id: " +
            s"$v != ${c2(id % base)}")
      }
      val grew = c1.count { case (id, v) =>
        c2(id)._2 > v._2 || c2(id)._3 > v._3 }
      c1.foreach { case (id, v) =>
        require(c2(id)._2 >= v._2 && c2(id)._3 >= v._3,
          s"coverage must be monotone under duplication for doc $id")
        require(c2(id)._1 == v._1, s"n_chars must not move for doc $id")
      }
      println(s"SCALE dup_coverage_invariance ok (saturates at 2x; " +
        s"$grew/${c1.size} docs gain coverage from replication)")
    }

    // BPE encode census at k×: the merge sequence is replication-
    // invariant (pinned above), so the learned vocabulary's symbol
    // arrays — and therefore every document's (n_words, n_subtokens,
    // ratio) row — are identical for every replica of a base doc.
    {
      val base = 10000000L
      def census(c: Int): Map[Long, (Long, Long, Long)] = {
        val d = replicate(docs, "doc_id", c)
        var out: Map[Long, (Long, Long, Long)] = Map.empty
        time(s"bpe_encode_${c}x") {
          out = TextOps.bpeEncode(d, TextOps.BpeMerges).collect()
            .map(r => r.getLong(0) ->
              (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
          out.size.toLong
        }
        out
      }
      val e1 = census(1)
      val ek = census(k)
      require(ek.size == e1.size * k, "census must keep every replica")
      ek.foreach { case (id, v) =>
        require(v == e1(id % base),
          s"encode census replica identity broken for doc $id: " +
            s"$v != ${e1(id % base)}")
      }
      println(s"SCALE bpe_encode_invariance ok (${e1.size} base docs, " +
        s"every replica row identical at ${k}x)")
    }

    // Boilerplate census at k×: replication scales every gram's
    // document frequency by exactly k, so the (df desc, gram) top-k
    // order — ties included — is invariant, and every replica doc
    // reports its base doc's exact row.
    {
      val base = 10000000L
      def boiler(c: Int): Map[Long, (Long, Long, Long, Long)] = {
        val d = replicate(docs, "doc_id", c)
        var out: Map[Long, (Long, Long, Long, Long)] = Map.empty
        time(s"boilerplate_${c}x") {
          out = TextOps.boilerplateStats(d, 2, 20, 50000L).collect()
            .map(r => r.getLong(0) ->
              (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
            .toMap
          out.size.toLong
        }
        out
      }
      val b1 = boiler(1)
      val bk = boiler(k)
      require(bk.size == b1.size * k, "census must keep every replica")
      bk.foreach { case (id, v) =>
        require(v == b1(id % base),
          s"boilerplate replica identity broken for doc $id: " +
            s"$v != ${b1(id % base)}")
      }
      println(s"SCALE boilerplate_invariance ok (${b1.size} base docs, " +
        s"top-20 df cut stable under ${k}x replication)")
    }

    // SemDeDup at k×, under ONE codebook trained on the base corpus
    // (the production shape — the codebook is a persisted artifact
    // reused as the corpus grows, not retrained per query; retraining
    // on the replicated corpus would reseed the md5 init and change
    // the clustering itself). Identical vectors then assign to
    // identical clusters, and replica ids sit ABOVE every base id, so
    // (a) each base vector keeps its 1× verdict exactly (its lower-id
    // neighbor set is unchanged), and (b) every replica beyond the
    // base copy has a cos-1.0 lower-id twin in its own cluster and is
    // dropped — the kept set at k× IS the kept set at 1×.
    {
      val base = 10000000L
      val cents = SimilarityOps.kmeansCodebook(emb, 10,
        SimilarityOps.KmRounds)
      def sem(c: Int): Map[Long, Long] = {
        val e = replicate(emb, "vec_id", c)
        var out: Map[Long, Long] = Map.empty
        time(s"semdedup_${c}x") {
          out = SimilarityOps.semDedup(e, cents, 400000L).collect()
            .map(r => r.getLong(0) -> r.getAs[Long]("kept")).toMap
          out.size.toLong
        }
        out
      }
      val s1 = sem(1)
      val sk = sem(k)
      require(sk.size == s1.size * k, "one verdict per replica")
      val kept1 = s1.filter(_._2 == 1L).keySet
      val keptK = sk.filter(_._2 == 1L).keySet
      require(keptK == kept1,
        s"kept set must be replication-invariant: ${keptK.size} at " +
          s"${k}x vs ${kept1.size} at 1x")
      require(sk.keys.filter(_ >= base).forall(id => sk(id) == 0L),
        "every non-base replica is a cos-1.0 dup and must drop")
      println(s"SCALE semdedup_invariance ok (${kept1.size} of " +
        s"${s1.size} base vectors kept; kept set identical at ${k}x)")
    }

    // SSP prototype pruning at k× under ONE base-trained codebook:
    // replicas score identically to their base, so the verdict is
    // fraction-shaped, not threshold-shaped — each cluster keeps
    // EXACTLY floor(k·n·num/den) rows no matter how duplicated the
    // data is (a threshold rule would flood or starve the kept set as
    // density shifts; the rank rule cannot). Pinned: per-cluster size
    // scales by exactly k and per-cluster kept count equals the
    // closed-form floor at both scales.
    {
      val cents = SimilarityOps.kmeansCodebook(emb, 10,
        SimilarityOps.KmRounds)
      val (num, den) = (7, 10)
      def prune(c: Int): Map[Long, (Long, Long)] = {
        val e = replicate(emb, "vec_id", c)
        var out: Map[Long, (Long, Long)] = Map.empty
        time(s"proto_prune_${c}x") {
          val rows = SimilarityOps.protoPrune(e, cents, num, den)
            .groupBy("cluster")
            .agg(max("n_cluster").as("n"), sum("kept").as("kept"))
            .collect()
          out = rows.map(r => r.getAs[Long]("cluster") ->
            ((r.getAs[Long]("n"), r.getAs[Long]("kept")))).toMap
          out.size.toLong
        }
        out
      }
      val p1 = prune(1)
      val pk = prune(k)
      require(p1.keySet == pk.keySet, "cluster set replication-invariant")
      p1.foreach { case (cid, (n1, kept1)) =>
        val (nk, keptK) = pk(cid)
        require(nk == n1 * k, s"cluster $cid size must scale by $k")
        require(kept1 == n1 * num / den,
          s"1x kept of cluster $cid must equal floor(n*frac)")
        require(keptK == nk * num / den,
          s"${k}x kept of cluster $cid must equal floor(kn*frac)")
      }
      println(s"SCALE proto_prune_invariance ok (${p1.size} clusters; " +
        s"kept = floor(n*$num/$den) exact at 1x and ${k}x)")
    }

    // Diversity census at k×: the sum-vector identity gives CLOSED
    // FORMS under replication — n'=kn, t'=kt, ssum'=k²·ssum — so the
    // k× census is fully predicted by the 1× census with zero slack:
    // coherence' = micro((k²·ssum − k·t)/((kn−1)·k·t)). Measured
    // equality pins both the identity algebra and the exactness claim
    // (any double drift in the pipeline would break bit-equality).
    {
      def divers(c: Int): Map[Int, (Long, Long, Long, Long)] = {
        val e = replicate(emb, "vec_id", c)
        var out: Map[Int, (Long, Long, Long, Long)] = Map.empty
        time(s"embed_diversity_${c}x") {
          out = SimilarityOps.embedDiversity(e).collect()
            .map(r => r.getInt(0) -> ((r.getAs[Long]("n_vecs"),
              r.getAs[Long]("self_dot_sum"), r.getAs[Long]("sum_vec_dot"),
              r.getAs[Long]("coherence_micro")))).toMap
          out.size.toLong
        }
        out
      }
      val d1 = divers(1)
      val dk = divers(k)
      require(d1.keySet == dk.keySet, "label set replication-invariant")
      d1.foreach { case (label, (n, t, ssum, _)) =>
        val (nk, tk, ssumK, cohK) = dk(label)
        require(nk == n * k && tk == t * k && ssumK == ssum * k * k,
          s"label $label moments must follow the closed form at ${k}x")
        val predicted = math.floor(1000000.0 *
          ((ssumK - tk).toDouble / ((nk - 1).toDouble * tk))).toLong
        require(cohK == predicted,
          s"label $label coherence ${cohK} != closed form $predicted")
      }
      println(s"SCALE diversity_closed_form ok (${d1.size} labels; " +
        s"k²/k moment scaling and coherence bit-exact at ${k}x)")
    }

    // PQ at k× under ONE codebook set trained on the base corpus (the
    // artifact-reuse shape, as with SemDeDup above): codes are a pure
    // function of the embedding, so every replica encodes identically
    // to its base; and because ADC ties break to the lower vec_id, the
    // k×-corpus ADC top-k is exactly the 1× ranking with each winner
    // expanded into its replica run — top-10 at 8× must be 8 copies of
    // the 1× winner then 2 of the runner-up.
    {
      val base = 10000000L
      val books = SimilarityOps.pqCodebooks(emb, 4, 16, 8)
      def codes(c: Int): Map[Long, Seq[Long]] = {
        val e = replicate(emb, "vec_id", c)
        var out: Map[Long, Seq[Long]] = Map.empty
        time(s"pq_encode_${c}x") {
          out = SimilarityOps.pqEncode(e, books, 16).collect()
            .map(r => r.getLong(0) -> (1 to 4).map(r.getLong(_))).toMap
          out.size.toLong
        }
        out
      }
      val c1 = codes(1)
      val ck = codes(k)
      require(ck.size == c1.size * k, "one code row per replica")
      ck.foreach { case (id, v) =>
        require(v == c1(id % base),
          s"pq code replica identity broken for vec $id")
      }
      val top1 = SimilarityOps.pqAdcTopK(emb, books, 16, 0L, 10)
        .collect().map(_.getLong(0))
      // replicas of the QUERY would trivially top the list (exact
      // copies); drop them so the probe measures db-side ranking
      val ek = replicate(emb, "vec_id", k)
        .filter(col("vec_id") % base =!= 0L || col("vec_id") === 0L)
      var topk: Array[Long] = Array.empty
      time(s"pq_adc_${k}x") {
        topk = SimilarityOps.pqAdcTopK(ek, books, 16, 0L, 10)
          .collect().map(_.getLong(0))
        topk.length.toLong
      }
      val expected = top1.flatMap(id =>
        (0 until k).map(r => id + r * base)).take(10)
      require(topk.toSeq == expected.toSeq,
        s"ADC ranking must expand 1x winners into replica runs: " +
          s"${topk.toSeq} vs ${expected.toSeq}")
      println(s"SCALE pq_invariance ok (codes replica-identical, " +
        s"ADC top-10 at ${k}x = 1x winners expanded)")
    }

    // IVF accuracy/cost dial at k×: mean recall@10 per probe width,
    // measured on the replicated corpus — the evidence that nProbe
    // trades recall for scan fraction beyond the tiny test SF. Recall
    // is monotone in nProbe by construction (anything displacing a
    // truth hit from a wider candidate set's top-k is itself a truth
    // hit) and exact at nProbe = nCentroids (full probe IS brute
    // force) — both asserted, not assumed.
    {
      val e = replicate(emb, "vec_id", k)
      val nCent = 16
      val cents = SimilarityOps.kmeansCodebook(e, nCent,
        SimilarityOps.KmRounds)
      val probes = Seq(1, 2, 4, 8, nCent)
      var curve: Array[(Long, Double)] = Array.empty
      time(s"ann_recall_${k}x") {
        curve = SimilarityOps.annRecall(e, 5L, cents, probes, 10)
          .groupBy("nprobe").agg(avg("recall_micro").as("r"))
          .orderBy("nprobe")
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        curve.length.toLong
      }
      curve.foreach { case (np, r) =>
        println(f"SCALE ann_recall_np$np%-3d ${r / 10000}%6.1f%% @ ${k}x")
      }
      require(curve.last._2 == 1000000.0,
        "full probe must reach exact recall")
      require(curve.map(_._2).sliding(2).forall(p => p(0) <= p(1)),
        "recall must be monotone in nProbe")
    }
    // Tokenizer fertility at k×: replication scales every word and
    // pair frequency by exactly k, so the learned merge table — ties
    // included — is invariant (pinned by the bpe_train probe above);
    // per-language totals scale by exactly k and both micro ratios
    // are therefore EXACTLY unchanged.
    {
      val dl = graft.sources.Tables.documents(spark, dir)
        .select("doc_id", "text", "lang")
      def fert(c: Int): Map[String, (Long, Long, Long, Long, Long)] = {
        val d = replicate(dl, "doc_id", c)
        var out: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
        time(s"fertility_${c}x") {
          out = TextOps.tokenizerFertility(d, TextOps.BpeMerges)
            .collect().map(r => r.getString(0) ->
              (r.getLong(2), r.getLong(3), r.getLong(4),
                r.getLong(5), r.getLong(6))).toMap
          out.size.toLong
        }
        out
      }
      val f1 = fert(1)
      val fk = fert(k)
      require(fk.keySet == f1.keySet, "language set must be stable")
      f1.foreach { case (l, (w, s, b, fm, bpm)) =>
        val (wk, sk2, bk2, fmk, bpmk) = fk(l)
        require(wk == w * k && sk2 == s * k && bk2 == b * k,
          s"fertility totals for $l must scale exactly ${k}x")
        require(fmk == fm && bpmk == bpm,
          s"fertility ratios for $l must be replication-invariant")
      }
      println(s"SCALE fertility_invariance ok (${f1.size} languages, " +
        s"totals x$k exact, ratios unchanged)")
    }

    // Media dedup census at k×: every payload's copy count scales by
    // exactly k, so n_blobs and total/reclaim bytes follow closed
    // forms of the 1× census — n_distinct invariant, n_blobs ×k,
    // reclaim(k) = total(k) − (total(1) − reclaim(1)).
    {
      val dm = graft.sources.Tables.documents(spark, dir)
      def med(c: Int): Map[String, (Long, Long, Long, Long)] = {
        val d = replicate(dm, "doc_id", c)
        var out: Map[String, (Long, Long, Long, Long)] = Map.empty
        time(s"media_dedup_${c}x") {
          out = MultimodalOps.mediaDedupCensus(d).collect()
            .map(r => r.getString(0) ->
              (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
            .toMap
          out.size.toLong
        }
        out
      }
      val m1 = med(1)
      val mk = med(k)
      require(mk.keySet == m1.keySet, "format set must be stable")
      m1.foreach { case (f, (nb, nd, tb, rb)) =>
        val (nbk, ndk, tbk, rbk) = mk(f)
        require(nbk == nb * k, s"$f: n_blobs must scale exactly ${k}x")
        require(ndk == nd, s"$f: n_distinct must be invariant")
        require(tbk == tb * k, s"$f: total_bytes must scale exactly ${k}x")
        require(rbk == tbk - (tb - rb),
          s"$f: reclaim must equal total minus one kept copy per blob")
      }
      println(s"SCALE media_dedup_invariance ok (${m1.size} census rows, " +
        s"distinct blobs invariant under ${k}x)")
    }

    // Containment pairs at k×: a base pair's stats are functions of
    // the two shingle SETS, which replication leaves untouched — every
    // 1× pair must reappear with IDENTICAL (inter, n1, n2, cont, jac)
    // among the base ids at k× (the df cap scales with k so the same
    // grams survive).
    {
      val base = 10000000L
      def cont(c: Int): Map[(Long, Long), Seq[Long]] = {
        val d = replicate(docs, "doc_id", c)
        var out: Map[(Long, Long), Seq[Long]] = Map.empty
        time(s"containment_${c}x") {
          out = TextOps.ngramContainmentPairs(d, 5, 1000L * c,
            900000L, 800000L).collect()
            .map(r => (r.getLong(0), r.getLong(1)) ->
              Seq(r.getLong(2), r.getLong(3), r.getLong(4),
                r.getLong(5), r.getLong(6))).toMap
          out.size.toLong
        }
        out
      }
      val c1 = cont(1)
      val ck = cont(k)
      c1.foreach { case (pair, stats) =>
        require(ck.get(pair).contains(stats),
          s"containment base pair $pair must persist with identical " +
            s"stats at ${k}x")
      }
      println(s"SCALE containment_invariance ok (${c1.size} base pairs " +
        s"persist stat-identical at ${k}x; ${ck.size} total)")
    }
    // Heaps curve at k×: replication adds documents but NO new words
    // or shingles, so the full-fraction distinct counts are EXACTLY
    // invariant while docs/tokens scale ×k — the difference between a
    // vocabulary census and a row count, pinned.
    {
      def heaps(c: Int): Map[Long, (Long, Long, Long, Long)] = {
        val d = replicate(docs, "doc_id", c)
        var out: Map[Long, (Long, Long, Long, Long)] = Map.empty
        time(s"heaps_${c}x") {
          out = TextOps.heapsCurve(d).collect()
            .map(r => r.getLong(0) ->
              (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
            .toMap
          out.size.toLong
        }
        out
      }
      val h1 = heaps(1)
      val hk = heaps(k)
      val (d1, t1, w1, s1) = h1(8L)
      val (dk, tk, wk, sk2) = hk(8L)
      require(dk == d1 * k && tk == t1 * k,
        s"full-fraction docs/tokens must scale exactly ${k}x")
      require(wk == w1 && sk2 == s1,
        "replication must add ZERO new words or shingles")
      println(s"SCALE heaps_invariance ok (full fraction: docs/tokens " +
        s"x$k, vocabulary bit-identical at ${k}x)")
    }

    // Jaccard histogram at k×: every cross-replica image of a 1× pair
    // shares its sets (same bucket), and the identical-copy pairs land
    // at bucket 1000000 — so with the df cap scaled by k the histogram
    // obeys the exact closed form hist_k(b) = k²·hist_1(b), plus
    // nShingled·k(k−1)/2 at b = 1000000 (the D9 replica-identity form,
    // now per similarity level).
    {
      def hist(c: Int): Map[Long, Long] = {
        val d = replicate(docs, "doc_id", c)
        var out: Map[Long, Long] = Map.empty
        time(s"jac_hist_${c}x") {
          out = TextOps.jaccardHistogram(d, 5, 1000L * c).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          out.size.toLong
        }
        out
      }
      val nShingled = TextOps.shingleSet(docs, 5)
        .select("doc_id").distinct().count()
      val h1 = hist(1)
      val hk = hist(k)
      val expected = (h1.keySet + 1000000L).map { b =>
        val base = h1.getOrElse(b, 0L) * k * k
        b -> (if (b == 1000000L)
          base + nShingled * k * (k - 1) / 2 else base)
      }.toMap.filter(_._2 > 0L)
      require(hk == expected,
        s"histogram must follow the k² closed form: $hk vs $expected")
      println(s"SCALE jac_hist_invariance ok (k² closed form exact at " +
        s"${k}x, identical-copy mass at bucket 1.0)")
    }

    // Cosine census at k× under ONE codebook trained on the base
    // vectors (the semdedup probe's production shape): identical
    // replicas co-cluster, every cross-replica image of a 1× pair
    // scores identically, and the copy pairs add per-vector self-pair
    // mass — the same k² closed form, in embedding space. Unlike the
    // Jaccard case the self-cosine is NOT exactly 1.0 for every
    // vector: cos(v,v) = d/(sqrt(d)·sqrt(d)) in doubles, and sqrt(d)²
    // rounds above or below d per vector, so micro-floor puts some
    // copy pairs at bucket 950000 (cos 0.999999…) and the rest at
    // 1000000. The probe measures each base vector's own self-cosine
    // bucket (the same expression the census uses) and distributes
    // the k(k−1)/2 copy-pair mass per bucket — exact, not assumed.
    {
      val cents = SimilarityOps.kmeansCodebook(emb, 10,
        SimilarityOps.KmRounds)
      val selfBuckets: Map[Long, Long] = {
        import graft.functions.vector.cosineSim
        import graft.functions.Hashing.micro
        emb.select((floor(micro(cosineSim(col("embedding"),
            col("embedding"))) / lit(50000L)) * 50000L).as("b"))
          .groupBy("b").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      def census(c: Int): Map[Long, Long] = {
        val e = replicate(emb, "vec_id", c)
        var out: Map[Long, Long] = Map.empty
        time(s"cos_census_${c}x") {
          out = SimilarityOps.cosineCensus(e, cents).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          out.size.toLong
        }
        out
      }
      val c1 = census(1)
      val ck = census(k)
      val expected = (c1.keySet ++ selfBuckets.keySet).map { b =>
        b -> (c1.getOrElse(b, 0L) * k * k +
          selfBuckets.getOrElse(b, 0L) * k * (k - 1) / 2)
      }.toMap.filter(_._2 > 0L)
      require(ck == expected,
        s"cosine census must follow the k² closed form: $ck vs $expected")
      println(s"SCALE cos_census_invariance ok (k² closed form exact " +
        s"at ${k}x; self-cos mass split ${selfBuckets.toSeq.sortBy(_._1)
          .map { case (b, n) => s"$b:$n" }.mkString(", ")})")
    }

    // Zipf census at k×: replication multiplies every word's count by
    // exactly k, so the census maps bijectively — freq c moves to c·k,
    // n_types is INVARIANT, token masses scale ×k. The frequency AXIS
    // stretches while the type distribution stays put: the signature
    // distinguishing "more data" from "more diverse data", and the
    // replication analogue of the Heaps full-fraction invariant.
    {
      def zipf(c: Int): Map[Long, (Long, Long, Long)] = {
        val d = replicate(docs, "doc_id", c)
        var out: Map[Long, (Long, Long, Long)] = Map.empty
        time(s"zipf_${c}x") {
          out = TextOps.zipfCensus(d).collect()
            .map(r => r.getLong(0) ->
              (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
          out.size.toLong
        }
        out
      }
      val z1 = zipf(1)
      val zk = zipf(k)
      val expected = z1.map { case (c, (t, n, cum)) =>
        (c * k) -> (t, n * k, cum * k)
      }
      require(zk == expected,
        s"zipf census must stretch the frequency axis by exactly $k")
      println(s"SCALE zipf_invariance ok (freq axis x$k, type counts " +
        s"invariant, ${z1.size} census rows)")
    }

    // kNN label audit at k× (k > kNN): every vector's nearest
    // neighbors become its own replicas — self-cosine dominates every
    // true cross-vector cosine (max within-cluster base cosine ~0.47
    // vs ~1.0) — so the vote is unanimous-own-label and the confusion
    // collapses to a PURE DIAGONAL at exactly k × the per-label
    // vector counts. A replicated corpus passes its own label audit
    // perfectly: the measured form of the caveat that a kNN audit is
    // only meaningful AFTER dedup, never before.
    {
      require(k > 5, "diagonal collapse needs more replicas than kNN")
      val cents = SimilarityOps.kmeansCodebook(emb, 10,
        SimilarityOps.KmRounds)
      var conf: Map[(Int, Int), Long] = Map.empty
      time(s"knn_label_${k}x") {
        conf = SimilarityOps
          .knnLabelConfusion(replicate(emb, "vec_id", k), cents, 5)
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
        conf.size.toLong
      }
      val perLabel = emb.groupBy("label").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val expected = perLabel.map { case (l, n) => (l, l) -> n * k }
      require(conf == expected,
        s"replicated corpus must self-audit to a pure diagonal: " +
          s"$conf vs $expected")
      println(s"SCALE knn_label_invariance ok (pure diagonal at ${k}x " +
        s"— the dedup-before-audit caveat, measured)")
    }
    // SemDeDup's scale dial, executed (the paper's ~100k-cluster
    // regime in miniature): the Σ|cluster|² pair cost is honest at
    // 100 TB only if nCentroids scales WITH the corpus. Identical
    // replicas can't test this (same point → same cluster by
    // definition), so replica r translates component 0 by +16r —
    // k disjoint regions of identical internal structure. Invariants:
    // with nCentroids held at C the per-vector pair mass grows ~k×
    // (the failure mode); with nCentroids scaled to k·C the codebook
    // spends ~C per region and per-vector pair mass returns to ~1×.
    {
      def shifted(c: Int): DataFrame = {
        val n = 10000000L
        emb.crossJoin(spark.range(c).toDF("__r"))
          .withColumn("vec_id", col("vec_id") + col("__r") * n)
          .withColumn("embedding",
            transform(col("embedding"), (x, i) =>
              when(i === 0, x + (col("__r") * 16).cast("float"))
                .otherwise(x)))
          .drop("__r")
      }
      def pairsPerVec(e: DataFrame, nCents: Int, tag: String): Double = {
        var out = 0.0
        time(s"semdedup_dial_$tag") {
          val cents = SimilarityOps.kmeansCodebook(e, nCents,
            SimilarityOps.KmRounds)
          val counts = SimilarityOps.clusterMix(e, cents, nCents)
            .select("n_vecs").collect().map(_.getLong(0))
          val pairs = counts.map(n => n * (n - 1) / 2).sum
          out = pairs.toDouble / counts.sum
          counts.sum
        }
        out
      }
      val c0 = 10
      val base = pairsPerVec(shifted(1), c0, s"1x_${c0}c")
      val fixedC = pairsPerVec(shifted(k), c0, s"${k}x_${c0}c")
      val scaledC = pairsPerVec(shifted(k), c0 * k, s"${k}x_${c0 * k}c")
      println(f"SCALE semdedup_dial pairs/vec: 1x@${c0}c=$base%.1f, " +
        f"${k}x@${c0}c=$fixedC%.1f (${fixedC / base}%.1fx), " +
        f"${k}x@${c0 * k}c=$scaledC%.1f (${scaledC / base}%.2fx)")
      // measured at 8x: 100 → 2823 (28.2x, fixed C) → 307 (3.07x,
      // scaled C). The residual ~3x over the balanced ideal is TRAINER
      // imbalance, constant in k: the md5-seed draw is multinomial
      // across the 8 disjoint regions (a region dealt 7 seeds keeps 7 —
      // 2 Lloyd rounds cannot migrate a centroid across a 16-unit gap),
      // inflating E[region/c_r] above region/E[c_r]. The invariants pin
      // the REGIME, not the trainer's luck: fixed C must blow up with
      // the corpus, scaling C by k must claw back at least k/2 of it,
      // and the residual must stay a small constant multiple.
      require(fixedC > (k / 2.0) * base,
        f"holding nCentroids fixed must inflate per-vector pair mass " +
          f"~k x (got ${fixedC / base}%.1fx) — otherwise the dial tests " +
          "nothing")
      require(fixedC / scaledC > k / 2.0,
        f"scaling nCentroids ${k}x must cut per-vector pair mass by " +
          f">= ${k}/2, got ${fixedC / scaledC}%.1fx")
      require(scaledC < 6.0 * base,
        f"per-vector pair mass under the scaled codebook must stay a " +
          f"small constant multiple of 1x, got ${scaledC / base}%.2fx")
    }
    // G2 triangle census under a k-blow-up with KNOWN ground truth:
    // every node of the 1x verified pair graph becomes a k-clique and
    // every edge a complete k x k bipartite graph — the exact structure
    // replication induces on a dup graph — and the triangle count has
    // a closed form: n·C(k,3) (within-clique) + m·2k·C(k,2) (one side
    // doubled across an edge) + t·k³ (original triangles blown up).
    // Constructing the blow-up at the PAIR level keeps the prediction
    // exact regardless of the df-cap's behavior under replication.
    {
      val off = 10000000L
      val pairs1 = TextOps.ngramJaccardPairs(docs, 5, 1000L, 800000L)
        .select("d1", "d2").cache()
      val m1 = pairs1.count()
      val nodes1 = pairs1.select(col("d1").as("x"))
        .union(pairs1.select(col("d2").as("x"))).distinct().cache()
      val n1 = nodes1.count()
      def triTotal(p: DataFrame): Long = {
        val t = TextOps.dupTriangles(p)
          .agg(sum("n_tri").as("s")).head.getLong(0)
        require(t % 3 == 0, "corner sum must be divisible by 3")
        t / 3
      }
      var t1 = 0L
      time("triangles_1x") { t1 = triTotal(pairs1); t1 }
      val ri = spark.range(k).toDF("i")
      val rj = spark.range(k).toDF("j")
      val cross = pairs1.crossJoin(ri).crossJoin(rj)
        .select((col("d1") + col("i") * off).as("u"),
          (col("d2") + col("j") * off).as("v"))
      val cliq = nodes1.crossJoin(ri).crossJoin(rj)
        .filter(col("i") < col("j"))
        .select((col("x") + col("i") * off).as("u"),
          (col("x") + col("j") * off).as("v"))
      val blowup = cross.union(cliq)
        .select(least(col("u"), col("v")).as("d1"),
          greatest(col("u"), col("v")).as("d2"))
      var tk = 0L
      time(s"triangles_blowup_${k}x") { tk = triTotal(blowup); tk }
      def c2(x: Long) = x * (x - 1) / 2
      def c3(x: Long) = x * (x - 1) * (x - 2) / 6
      val kL = k.toLong
      val predicted = n1 * c3(kL) + m1 * 2 * kL * c2(kL) + t1 * kL * kL * kL
      println(s"SCALE triangles_closed_form measured=$tk predicted=" +
        s"$predicted (n=$n1 m=$m1 t1=$t1)")
      require(tk == predicted,
        s"blow-up triangle count must match the closed form: " +
          s"$tk != $predicted")
      pairs1.unpersist(); nodes1.unpersist()
    }
    // X43 lift invariance: replication multiplies co, df, and N by k
    // each, so lift = co·N/(df1·df2) is EXACTLY invariant — "more of
    // the same data" cannot manufacture collocation signal. The top-V
    // cut is also invariant (counts scale uniformly, ties break on the
    // same term order).
    {
      def liftMap(c: Int): Map[(String, String), (Long, Long)] = {
        val d = replicate(docs, "doc_id", c)
        var out: Map[(String, String), (Long, Long)] = null
        time(s"cooc_lift_${c}x") {
          out = TextOps.coocLift(d, 24).collect()
            .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2")) ->
              (r.getAs[Long]("lift_micro"), r.getAs[Long]("co"))).toMap
          out.size.toLong
        }
        out
      }
      val l1 = liftMap(1)
      val lk = liftMap(k)
      require(l1.keySet == lk.keySet,
        "top-V pair set must be invariant under replication")
      l1.foreach { case (key, (lift1, co1)) =>
        val (liftK, coK) = lk(key)
        require(liftK == lift1,
          s"lift must be exactly invariant at $key: $liftK != $lift1")
        require(coK == co1 * k,
          s"co-occurrence count must scale by k at $key")
      }
      println(s"SCALE cooc_invariance ${l1.size} pairs bit-identical " +
        s"at ${k}x, co scaled exactly ${k}x")
    }
    // R17 census quantiles at kx: the scale claim is that the census —
    // the only relation the rank arithmetic ever sorts or joins — does
    // NOT grow with replication (distinct values are the same), while
    // n scales by k; the quantile itself stays within one value unit
    // (h = p·(kn−1) lands in the same census neighborhood).
    {
      val ev = graft.sources.Tables.events(spark, dir)
        .select("event_id", "event_type", "value")
      def qmap(c: Int): (Long, Map[String, (Long, Long, Long, Long)]) = {
        val e = replicate(ev, "event_id", c)
        val censusRows = e.withColumn("v_int", floor(col("value")))
          .select("event_type", "v_int").distinct().count()
        var out: Map[String, (Long, Long, Long, Long)] = null
        time(s"quantile_census_${c}x") {
          out = graft.operators.RelationalQueries
            .censusQuantiles(e, Seq(0.25, 0.5, 0.9)).collect()
            .map(r => r.getAs[String]("event_type") ->
              (r.getAs[Long]("p25_micro"), r.getAs[Long]("p50_micro"),
                r.getAs[Long]("p90_micro"), r.getAs[Long]("n"))).toMap
          out.size.toLong
        }
        (censusRows, out)
      }
      val (cen1, q1) = qmap(1)
      val (cenK, qk) = qmap(k)
      require(cen1 == cenK,
        s"census must not grow under replication: $cen1 -> $cenK")
      q1.foreach { case (t, (a1, b1, c1, n1e)) =>
        val (aK, bK, cK, nK) = qk(t)
        require(nK == n1e * k, s"n must scale by k for $t")
        require(math.abs(aK - a1) <= 1000000L &&
          math.abs(bK - b1) <= 1000000L && math.abs(cK - c1) <= 1000000L,
          s"quantiles must stay within one value unit for $t")
      }
      println(s"SCALE quantile_census_rows $cen1 rows at 1x AND ${k}x " +
        s"(n scales, census does not)")
    }
    // M7 class ceiling: the dHash relation is what the pair join runs
    // over, and the fixture's hash space is bounded (image determined
    // by id mod 3840) — at kx the image count grows k-fold while
    // distinct classes stay under the ceiling, so hash-level pairing
    // cost is ~flat where doc-level pairing would grow k².
    {
      def classes(c: Int): (Long, Long) = {
        val d = replicate(docs, "doc_id", c)
        var cls = 0L; var imgs = 0L
        time(s"phash_classes_${c}x") {
          val h = MultimodalOps.imageDHash(MultimodalOps.mediaBinary(d))
            .toDF().cache()
          imgs = h.count()
          cls = h.select("dhash").distinct().count()
          h.unpersist()
          cls
        }
        (cls, imgs)
      }
      val (cls1, img1) = classes(1)
      val (clsK, imgK) = classes(k)
      require(imgK == img1 * k, "image count must scale by k")
      require(clsK <= 3840L,
        s"distinct dHash classes must stay under the fixture ceiling, " +
          s"got $clsK")
      println(s"SCALE phash_classes $cls1 classes over $img1 images at " +
        s"1x -> $clsK over $imgK at ${k}x (ceiling 3840)")
    }
    // X44/X47/X48/R18 exact-invariance battery: each of these censuses
    // is a RATIO of quantities that all scale by k (or k²) under
    // replication, so the reported statistic must be BIT-identical at
    // 8x — KS (num x k² over n1·n2 x k²), HHI/top-share (Σc², max c
    // over T² , T), Pearson r (cov and variances x k², and √(64·v) =
    // 8·√v exactly in IEEE since 64 is a power of 4), and transition
    // probabilities (arcs and totals x k when USERS are replicated).
    // "More of the same data" must not move any drift/concentration/
    // correlation needle.
    {
      def km[K](df: DataFrame, keys: Seq[String], value: String)
      : Map[Seq[Any], Long] =
        df.collect().map(r => keys.map(k => r.getAs[Any](k)) ->
          r.getAs[Long](value)).toMap
      def invariant(name: String, f: DataFrame => DataFrame,
                    base: DataFrame, idCol: String,
                    keys: Seq[String], value: String): Unit = {
        var m1: Map[Seq[Any], Long] = null
        var mk: Map[Seq[Any], Long] = null
        time(s"${name}_1x") { m1 = km(f(base), keys, value); m1.size.toLong }
        time(s"${name}_${k}x") {
          mk = km(f(replicate(base, idCol, k)), keys, value)
          mk.size.toLong
        }
        require(m1 == mk,
          s"$name must be bit-invariant under ${k}x replication")
        println(s"SCALE ${name}_invariance ok (${m1.size} groups " +
          s"bit-identical at ${k}x)")
      }
      val fullDocs = graft.sources.Tables.documents(spark, dir)
      val ev = graft.sources.Tables.events(spark, dir)
        .select("event_id", "user_id", "event_type", "ts", "value")
      invariant("ks_drift", d => TextOps.ksDrift(d),
        fullDocs, "doc_id", Seq("source_a", "source_b"), "ks_micro")
      invariant("concentration", d => TextOps.concentrationCensus(d),
        fullDocs, "doc_id", Seq("basis"), "hhi_micro")
      invariant("corr", d => TextOps.corrCensus(d),
        fullDocs, "doc_id", Seq("source"), "r_micro")
      invariant("transitions",
        e => graft.operators.RelationalQueries.transitionCensus(e),
        ev, "user_id", Seq("from_type", "to_type"), "p_micro")
      // X50 VMR: every power sum scales by k, numerator and
      // denominator both by k² — bit-invariant
      invariant("burstiness", d => TextOps.burstinessCensus(d, 24),
        docs, "doc_id", Seq("t"), "vmr_micro")
      // V25: the 10M id offset is even, so replica parity is
      // preserved; (k·s) div (k·n) == s div n (same rational, same
      // truncation) — centroids and the drift cosine bit-identical
      invariant("centroid_drift",
        e => graft.operators.SimilarityOps.centroidDrift(e),
        emb, "vec_id", Seq("label"), "cos_micro")
      // X49 KMV: replication adds ZERO new distinct shingles, so the
      // sketch — k-th minimum, estimate, and exact count alike — is
      // completely blind to duplication (the distinct-count sketch's
      // defining property, measured)
      invariant("kmv",
        d => graft.operators.SketchQueries.kmvCensus(d),
        fullDocs, "doc_id", Seq("source"), "est")
      // X53: both rank picks land on the same census value under ×k
      // (k = 8 is a power of two, so the boundary positions scale
      // losslessly and (k·a)/(k·b) is the SAME IEEE division as a/b)
      // — med, MAD, and the outlier rate all bit-identical
      invariant("mad_pick", d => TextOps.madOutliers(d),
        fullDocs, "doc_id", Seq("source"), "mad")
      invariant("mad_rate", d => TextOps.madOutliers(d),
        fullDocs, "doc_id", Seq("source"), "out_rate_micro")
      // X54: per-segment type counts are per-replica identical,
      // n_segs and Σtypes both ×k ⇒ the ratio is the same IEEE
      // division (power-of-two k) — bit-invariant
      invariant("msttr", d => TextOps.msttr(d),
        fullDocs, "doc_id", Seq("source"), "msttr_micro")
      // X55: every bigram count ×k ⇒ each term's two ratios are the
      // same IEEE divisions (power-of-two k) — bit-invariant, i.e.
      // "more of the same bytes" moves no entropy needle
      invariant("entropy", d => TextOps.entropyRate(d),
        fullDocs, "doc_id", Seq("source"), "h_micro")
      // X56: every confusion cell ×k ⇒ row fractions are the same
      // IEEE divisions — the classifier-eval matrix is duplication-
      // blind, as an accuracy metric must be
      invariant("lang_confusion", d => TextOps.langConfusion(d),
        fullDocs, "doc_id", Seq("lang", "lang_pred"), "frac_micro")
      // X58: words/sentences/syllables all ×k ⇒ both Flesch ratios
      // are the same IEEE divisions — readability is duplication-blind
      invariant("readability", d => TextOps.readability(d),
        fullDocs, "doc_id", Seq("source"), "flesch_micro")
      // X59: every type count ×k scales the tie-group numerator and
      // n·T by exactly k (order of counts preserved) ⇒ the one
      // division has both operands ×k — Gini inequality is
      // duplication-blind, as an inequality measure must be
      invariant("gini", d => TextOps.gini(d),
        fullDocs, "doc_id", Seq("source"), "gini_micro")
      // X60: the rank order is invariant under ×k (all counts scale),
      // so cum and T scale together at every k_used — coverage curve
      // bit-identical
      invariant("coverage", d => TextOps.coverageCurve(d),
        fullDocs, "doc_id", Seq("source", "k"), "cov_micro")
      // R24: cnt, num both ×k with den fixed ⇒ the integer verdict
      // cnt·den > 3·num compares both sides ×k — the spike census is
      // volume-homogeneous (a uniformly duplicated feed alarms on the
      // same days, never on the duplication itself)
      invariant("ewma_spikes",
        e => graft.operators.RelationalQueries.ewmaAnomaly(e)
          .select(col("event_type"), col("day"),
            col("is_spike").cast("long").as("spike")),
        ev, "event_id", Seq("event_type", "day"), "spike")
    }
    // R21 k-anonymity closed form under USER replication: every class
    // gains exactly k distinct users per original one, so the census
    // maps (size, n_classes) -> (k·size, n_classes) bijectively and
    // the risk curve is IDENTICAL at the stretched sizes (cum and
    // total both ×k; power-of-two k ⇒ same IEEE division). Measured,
    // not assumed: "more clones of the same population" must not move
    // a re-identification risk needle, only the k axis.
    {
      val ev = graft.sources.Tables.events(spark, dir)
        .select("event_id", "user_id", "event_type", "ts")
      def curve(c: Int): Seq[(Long, Long, Long, Long)] = {
        val d = if (c == 1) ev else replicate(ev, "user_id", c)
        var out: Seq[(Long, Long, Long, Long)] = null
        time(s"kanon_${c}x") {
          out = graft.operators.RelationalQueries.kanonCurve(d)
            .collect()
            .map(r => (r.getAs[Long]("size"), r.getAs[Long]("n_classes"),
              r.getAs[Long]("n_recs"), r.getAs[Long]("risk_micro")))
            .toSeq
          out.size.toLong
        }
        out
      }
      val c1 = curve(1)
      val ck = curve(k)
      val expected = c1.map { case (s, nc, nr, risk) =>
        (s * k, nc, nr * k, risk) }
      require(ck == expected,
        s"k-anonymity closed form broken at ${k}x")
      println(s"SCALE kanon_closed_form ok (${c1.size} census rows, " +
        s"size axis x$k, risk curve bit-identical)")
    }
    // X52 JSD identity at scale: Laplace smoothing deliberately keeps
    // JSD from being replication-invariant (the +1 floor does not
    // scale), so the pinned invariant is the identity axiom instead —
    // a source and its EXACT CLONE (same bytes, new ids, new source
    // label) must read jsd_micro == 0 at sf0.1: p = q in every bucket
    // makes every ln(1) exactly zero BEFORE the floor, no tolerance.
    {
      val fullDocs = graft.sources.Tables.documents(spark, dir)
      val base = fullDocs.filter(col("source") === "src0")
      val clone = base
        .withColumn("doc_id", col("doc_id") + lit(100000000L))
        .withColumn("source", lit("zzz_clone"))
      val corpus = fullDocs.unionByName(clone)
      var zero = -1L
      time("jsd_clone_identity") {
        val m = TextOps.jsdDrift(corpus, 24).collect()
          .map(r => (r.getAs[String]("source_a"),
            r.getAs[String]("source_b")) -> r.getAs[Long]("jsd_micro"))
          .toMap
        zero = m(("src0", "zzz_clone"))
        m.size.toLong
      }
      require(zero == 0L,
        s"clone source must read EXACTLY zero JSD, got $zero")
      println("SCALE jsd_clone_identity ok (exact integer zero)")
    }
    // D21 fuzzy join under name-preserving k-replication (keys offset,
    // names copied — the "same entity shipped k times under different
    // keys" regime) with the df cap scaled by k (the corpus-relative
    // dial): every replica probe must resolve to the BASE entity
    // (lowest key of its name class) at distance 1, and the resolved
    // probe count must scale by exactly k.
    {
      val off = 10000000L
      val cust = graft.sources.Tables.customer(spark, dir)
        .select("c_custkey", "c_name")
      def resolved(c: Int): Seq[(Long, Long, Long)] = {
        val m = replicate(cust, "c_custkey", c)
        var out: Seq[(Long, Long, Long)] = null
        time(s"fuzzy_join_${c}x") {
          out = graft.operators.RelationalQueries
            .fuzzyResolve(m, maxDf = 500L * c).collect()
            .map(r => (r.getAs[Long]("probe_id"),
              r.getAs[Long]("matched_key"), r.getAs[Long]("distance")))
            .toSeq
          out.size.toLong
        }
        out
      }
      val r1 = resolved(1)
      val rk = resolved(k)
      require(rk.size == r1.size * k,
        s"resolved probe count must scale by k: ${r1.size} -> ${rk.size}")
      rk.foreach { case (p, m, d) =>
        require(m == p % off,
          s"replica probe $p must resolve to its base entity, got $m")
        require(d == 1L, s"probe $p must resolve at distance 1")
      }
      println(s"SCALE fuzzy_blowup ok (${r1.size} probes at 1x -> " +
        s"${rk.size} at ${k}x, every replica resolved to its base " +
        "entity at distance 1)")
    }
    // ≥1k-merge sampled BPE train: real tokenizers live at 32k merges,
    // and the scale claim is that every training round is VOCABULARY-
    // sized (pair counts over distinct word forms), never corpus-sized
    // — which predicts per-merge cost ~flat in the merge index. The
    // provided corpus's 31-word vocabulary exhausts long before 1k, so
    // train on a 4000-word deterministic synthetic vocabulary (the
    // TokenizerStoreSpec fixture, scaled) at samplePct=50 (the sampled
    // path: train reads the hash-sample, the dictionary still covers
    // the full corpus via the chain replay), and pin that amortized
    // per-merge cost at 1024 merges stays within 2.5x of 128 merges.
    {
      import spark.implicits._
      val words = (0 until 4000).map { i =>
        val x = i * 7919 + 13
        (0 until (6 + i % 7)).map(j => ('a' + (x >> (j * 2)) % 26).toChar)
          .mkString
      }
      val corpus = words.grouped(10).map(_.mkString(" ")).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
        .cache()
      corpus.count()
      def train(m: Int): Double = {
        val path = java.nio.file.Files
          .createTempDirectory(s"graft-tok$m").toString
        var dt = 0.0
        time(s"bpe_train_${m}m") {
          val t0 = System.nanoTime()
          graft.sources.TokenizerStore.save(corpus, path, merges = m,
            samplePct = 50)
          dt = (System.nanoTime() - t0) / 1e9
          m.toLong
        }
        require(graft.sources.TokenizerStore
          .readMerges(spark, path).length == m, s"chain must hold $m merges")
        dt
      }
      val t128 = train(128)
      val t1024 = train(1024)
      val per128 = t128 / 128.0
      val per1024 = t1024 / 1024.0
      println(f"SCALE bpe_1k_round_cost ${per128 * 1000}%.0f ms/merge at " +
        f"128m vs ${per1024 * 1000}%.0f ms/merge at 1024m " +
        f"(${per1024 / per128}%.2fx)")
      require(per1024 < 2.5 * per128,
        f"per-merge cost must stay ~flat in the merge index, got " +
          f"${per1024 / per128}%.2fx at 1024 merges")
      corpus.unpersist()
    }

    // ---- round-9 operators: closed-form invariants at 1x and kx ----
    {
      import graft.operators.RelationalQueries
      val orders = graft.sources.Tables.orders(spark, dir)
      val events = graft.sources.Tables.events(spark, dir)
        .select("event_id", "user_id", "event_type", "ts", "value")

      // hubness: Σ k_occ·n_vecs must equal Σ_clusters |c|·min(k,|c|−1)
      // exactly — every vector emits min(k, |c|−1) directed edges.
      // Codebook trained once at 1x so the kx run measures the pair
      // join, not a retrain.
      val cents = SimilarityOps.kmeansCodebook(emb, 10,
        SimilarityOps.KmRounds)
      Seq(1, k).foreach { c =>
        val e = replicate(emb, "vec_id", c)
        val kNN = 5
        var census: Array[(Long, Long)] = Array.empty
        time(s"hubness_${c}x") {
          census = SimilarityOps.hubnessCensus(e, cents, kNN).collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          census.length.toLong
        }
        val edges = census.map { case (o, n) => o * n }.sum
        val sizes = e.select(graft.functions.KmeansAssign
            .kmeansAssign(col("embedding"), cents).as("cl"))
          .groupBy("cl").count().collect().map(_.getLong(1))
        val expect = sizes.map(s => s * math.min(kNN.toLong, s - 1)).sum
        require(edges == expect,
          s"hubness edge closed form broke at ${c}x: $edges != $expect")
        require(census.map(_._2).sum == emb.count() * c,
          s"hubness must place every vector exactly once at ${c}x")
      }

      // Mann-Whitney: U1 + U2 = n_a·n_b (doubled: 2·n_a·n_b) — run the
      // census on the raw and arm-flipped frames and add.
      Seq(1, k).foreach { c =>
        val ev = replicate(events, "event_id", c)
        var u1: Map[String, (Long, Long, Long)] = Map.empty
        time(s"mannwhitney_${c}x") {
          u1 = RelationalQueries.mannWhitneyCensus(ev).collect()
            .map(r => r.getAs[String]("event_type") ->
              ((r.getAs[Long]("u1_x2"), r.getAs[Long]("n_a"),
                r.getAs[Long]("n_b")))).toMap
          u1.size.toLong
        }
        val flipped = RelationalQueries.mannWhitneyCensus(
            ev.withColumn("user_id", col("user_id") + 1L)).collect()
          .map(r => r.getAs[String]("event_type") ->
            r.getAs[Long]("u1_x2")).toMap
        u1.foreach { case (t, (u1x2, na, nb)) =>
          require(u1x2 + flipped(t) == 2L * na * nb,
            s"U1 + U2 = n_a*n_b identity broke for $t at ${c}x")
        }
      }

      // RFM: cell masses must conserve exactly — Σ n_cust = customers
      // with orders, Σ segment_cents = total order cents.
      Seq(1, k).foreach { c =>
        val o = replicate(orders, "o_custkey", c)
        var cells: Array[(Long, Long)] = Array.empty
        time(s"rfm_${c}x") {
          cells = RelationalQueries.rfmSegments(o).collect()
            .map(r => (r.getAs[Long]("n_cust"),
              r.getAs[Long]("segment_cents")))
          cells.length.toLong
        }
        val nCust = o.select("o_custkey").distinct().count()
        val cents2 = o.select(expr(
            "CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) " +
              "AS BIGINT)").as("t")).collect().head.getLong(0)
        require(cells.map(_._1).sum == nCust,
          s"rfm must place every customer exactly once at ${c}x")
        require(cells.map(_._2).sum == cents2,
          s"rfm segment cents must conserve at ${c}x")
      }

      // RAKE: identical-replica corpus leaves every word score exactly
      // invariant ((k·deg·1e6) div (k·freq) ≡ (deg·1e6) div freq as
      // rationals), so the top-k phrases and scores are bit-identical
      // with n_occ scaled by k.
      val base = TextOps.rakeKeyphrases(docs).collect()
        .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("score_micro")))
      var rep: Array[(String, Long, Long)] = Array.empty
      time(s"keyphrase_${k}x") {
        rep = TextOps.rakeKeyphrases(replicate(docs, "doc_id", k))
          .collect().map(r => (r.getAs[String]("phrase"),
            r.getAs[Long]("n_occ"), r.getAs[Long]("score_micro")))
        rep.length.toLong
      }
      require(rep.toSeq == base.map { case (p, n, s) =>
        (p, n * k, s) }.toSeq,
        s"RAKE top-k must be replica-invariant with n_occ scaled ${k}x")

      // bootstrap: per-replicate effective n concentrates at the corpus
      // size (Poisson(1) weights: mean N, sd sqrt(N)) — 6 sigma at kx.
      {
        val o = replicate(orders, "o_orderkey", k)
        val n = o.count()
        var effs: Array[Long] = Array.empty
        time(s"bootstrap_${k}x") {
          effs = RelationalQueries.bootstrapMean(o,
            RelationalQueries.BootstrapB).collect()
            .map(_.getAs[Long]("n_eff"))
          effs.length.toLong
        }
        val bound = 6.0 * math.sqrt(n.toDouble)
        effs.foreach { e =>
          require(math.abs(e - n) < bound,
            s"bootstrap n_eff $e drifted past 6 sigma of $n at ${k}x")
        }
      }
    }

    // ---- round-10 operators: closed-form invariants at 1x and kx ----
    {
      import graft.operators.{RelationalQueries, SketchQueries}
      val events = graft.sources.Tables.events(spark, dir)
        .select("event_id", "user_id", "event_type", "ts", "value")
      val lineitem = graft.sources.Tables.lineitem(spark, dir)

      // survival: replicating every USER k-fold scales deaths/censored/
      // at-risk by exactly k per duration day, and the hazard curve is
      // BIT-IDENTICAL ((1e6·kd) div (kn) ≡ (1e6·d) div n — same
      // rational) — Nelson-Aalen is duplication-blind in rates.
      {
        val base = RelationalQueries.survivalCensus(events, 14)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        var rep: Array[(Long, Long, Long, Long, Long, Long)] =
          Array.empty
        time(s"survival_${k}x") {
          rep = RelationalQueries
            .survivalCensus(replicate(events, "user_id", k), 14)
            .collect().map(r => (r.getLong(0), r.getLong(1),
              r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
          rep.length.toLong
        }
        require(rep.toSeq == base.map { case (d, de, ce, ar, h, ch) =>
          (d, de * k, ce * k, ar * k, h, ch) }.toSeq,
          s"survival hazard curve must be duplication-blind at ${k}x")
      }

      // cusum: k-fold replication scales counts and the days-scaled
      // statistic by k, leaves score_micro and the changepoint day
      // bit-identical (same rational |S'|/(D·T)).
      {
        val base = RelationalQueries.cusumCensus(events).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5)))
        var rep: Array[(String, Long, Long, Long, Long, Long)] =
          Array.empty
        time(s"cusum_${k}x") {
          rep = RelationalQueries
            .cusumCensus(replicate(events, "event_id", k)).collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4), r.getLong(5)))
          rep.length.toLong
        }
        require(rep.toSeq == base.map { case (d, n, c, s, sc, f) =>
          (d, n * k, c * k, s * k, sc, f) }.toSeq,
          s"cusum score/changepoint must be volume-homogeneous at ${k}x")
      }

      // zorder: replicating rows (fresh orderkeys, same part/supp keys)
      // leaves the part_sorted and zorder zone maps IDENTICAL — same
      // buckets hit, same scan shares, rows scaled k. (Arrival buckets
      // depend on the new orderkeys by design and are excluded.)
      {
        def nonArrival(df: DataFrame) = df
          .filter(col("layout") =!= "arrival").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
            r.getLong(7)))
        val base = nonArrival(RelationalQueries
          .zorderAudit(lineitem, RelationalQueries.ZorderProbes))
        var rep: Array[(String, String, Long, Long, Long, Long, Long,
          Long)] = Array.empty
        time(s"zorder_${k}x") {
          rep = nonArrival(RelationalQueries.zorderAudit(
            replicate(lineitem, "l_orderkey", k),
            RelationalQueries.ZorderProbes))
          rep.length.toLong
        }
        require(rep.toSeq == base.map {
          case (l, d, p, bh, bt, rs, rt, ppm) =>
            (l, d, p, bh, bt, rs * k, rt * k, ppm) }.toSeq,
          s"zorder zone maps must be replica-invariant at ${k}x")
      }

      // join_card: the KMV estimates read DISTINCT key hashes, so
      // duplicating every row k-fold changes NOTHING — the whole
      // census is bit-identical (duplication-blindness, the X49/KMV
      // property carried into the join estimator).
      {
        def keys(df: DataFrame, c: String) = df.select(col(c).as("k"))
        val pairs = Seq(("cust",
          keys(graft.sources.Tables.orders(spark, dir), "o_custkey"),
          keys(graft.sources.Tables.customer(spark, dir), "c_custkey")))
        val base = SketchQueries.joinCardCensus(pairs).collect()
          .map(_.toSeq)
        var rep: Array[Seq[Any]] = Array.empty
        time(s"join_card_${k}x") {
          val dup = pairs.map { case (n, a, b) =>
            (n, (1 to k).map(_ => a).reduce(_ unionAll _),
              (1 to k).map(_ => b).reduce(_ unionAll _)) }
          rep = SketchQueries.joinCardCensus(dup).collect()
            .map(_.toSeq)
          rep.length.toLong
        }
        require(rep.toSeq == base.toSeq,
          s"join_card estimates must be duplication-blind at ${k}x")
      }
    }

    // ---- round-11 operators: closed-form invariants at 1x and kx ----
    {
      import graft.operators.{RelationalQueries, SketchQueries}
      val events = graft.sources.Tables.events(spark, dir)
        .select("event_id", "user_id", "event_type", "ts", "value")
      val orders = graft.sources.Tables.orders(spark, dir)

      // q_heavy: k-fold doc replication multiplies every token count
      // by k; the MG threshold is the rank-(k+1) VALUE, so counters
      // scale exactly xk with the SAME surviving token set (bound
      // recomputed as (kN) div 17 — integer floor does not commute
      // with the xk).
      {
        val base = SketchQueries.heavyHittersCensus(docs).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3)))
        val n = docs.select(explode(TextOps.tokens(col("text")))).count()
        var rep: Array[(String, Long, Long, Long, Long)] = Array.empty
        time(s"heavy_${k}x") {
          rep = SketchQueries
            .heavyHittersCensus(replicate(docs, "doc_id", k)).collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getAs[Long]("bound")))
          rep.length.toLong
        }
        require(rep.map(t => (t._1, t._2, t._3, t._4)).toSeq ==
          base.map { case (t, mg, tc, e) => (t, mg * k, tc * k, e * k) }
            .toSeq,
          s"MG counters must scale exactly x$k under replication")
        require(rep.forall(_._5 == (n * k) / (SketchQueries.MgK + 1)),
          "MG bound must be (kN) div (k+1 counters)")
      }

      // q_benford: duplication-blindness of every ppm column —
      // floor((1e6*k*obs)/(k*n)) is the same rational as
      // floor((1e6*obs)/n).
      {
        val amounts = orders.select(col("o_totalprice").as("amount"))
        val base = RelationalQueries.benfordCensus(amounts).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
            r.getString(7)))
        var rep: Array[(Long, Long, Long, Long, Long, Long, Long,
          String)] = Array.empty
        time(s"benford_${k}x") {
          val dup = (1 to k).map(_ => amounts).reduce(_ unionAll _)
          rep = RelationalQueries.benfordCensus(dup).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
              r.getString(7)))
          rep.length.toLong
        }
        require(rep.toSeq == base.map {
          case (d, o, n, op, ep, dv, m, c) =>
            (d, o * k, n * k, op, ep, dv, m, c) }.toSeq,
          s"benford ppm columns must be duplication-blind at ${k}x")
      }

      // q_anova_dow: volume homogeneity — xk events per day scale
      // every s_g by k and ssq by k²; with k a power of two the k²
      // scaling of each double term is IEEE-exact, so eta² is
      // bit-identical.
      {
        require((k & (k - 1)) == 0, "anova probe needs a power-of-2 k")
        val base = RelationalQueries.anovaDowCensus(events).collect()
          .head
        var rep: org.apache.spark.sql.Row = null
        time(s"anova_dow_${k}x") {
          rep = RelationalQueries
            .anovaDowCensus(replicate(events, "event_id", k))
            .collect().head
          1L
        }
        require(rep.getAs[Long]("eta2_micro") ==
          base.getAs[Long]("eta2_micro"),
          s"eta2 must be volume-homogeneous at ${k}x")
        (1 to 7).foreach { g =>
          require(rep.getAs[Long](s"m$g") == base.getAs[Long](s"m$g") &&
            rep.getAs[Long](s"s$g") == base.getAs[Long](s"s$g") * k)
        }
      }

      // q_runs_test: xk volumes scale the median by k and leave every
      // sign — hence runs, n1, n2, E[R], z — bit-identical.
      {
        val base = RelationalQueries.runsTestCensus(events).collect()
          .head
        var rep: org.apache.spark.sql.Row = null
        time(s"runs_test_${k}x") {
          rep = RelationalQueries
            .runsTestCensus(replicate(events, "event_id", k))
            .collect().head
          1L
        }
        require(rep.getAs[Long]("med") == base.getAs[Long]("med") * k &&
          Seq("n1", "n2", "runs", "e_micro", "z_micro").forall(c =>
            rep.getAs[Long](c) == base.getAs[Long](c)),
          s"runs test must be volume-homogeneous at ${k}x")
      }

      // q_gap_census: duplication-blind outright (distinct days).
      {
        val base = RelationalQueries.gapCensus(events).collect()
          .map(_.toSeq)
        var rep: Array[Seq[Any]] = Array.empty
        time(s"gap_census_${k}x") {
          rep = RelationalQueries
            .gapCensus(replicate(events, "event_id", k)).collect()
            .map(_.toSeq)
          rep.length.toLong
        }
        require(rep.toSeq == base.toSeq,
          s"gap census must be duplication-blind at ${k}x")
      }

      // q_kcenter: exact-copy replicas (higher vec_ids) never win the
      // argmin tie, so the greedy trajectory — picks, radii — is
      // bit-identical over the replicated corpus.
      {
        val base = SimilarityOps.kcenterSelect(emb, 8).collect()
          .map(_.toSeq)
        var rep: Array[Seq[Any]] = Array.empty
        time(s"kcenter_${k}x") {
          rep = SimilarityOps
            .kcenterSelect(replicate(emb, "vec_id", k), 8).collect()
            .map(_.toSeq)
          rep.length.toLong
        }
        require(rep.toSeq == base.toSeq,
          s"k-center trajectory must be replica-invariant at ${k}x")
      }
    }

    // ---- round-12 operators: closed-form invariants at 1x and kx ----
    {
      import graft.operators.RelationalQueries
      val events = graft.sources.Tables.events(spark, dir)
        .select("event_id", "user_id", "event_type", "ts", "value")

      // q_spearman: xk event replication scales every daily volume by
      // k (a monotone map — rank structure and tie groups unchanged)
      // and leaves distinct users alone, so both rank sequences and
      // therefore ALL six moments and rho are bit-identical.
      {
        val base = RelationalQueries.spearmanCensus(events).collect()
          .head.toSeq
        var rep: Seq[Any] = Seq.empty
        time(s"spearman_${k}x") {
          rep = RelationalQueries
            .spearmanCensus(replicate(events, "event_id", k))
            .collect().head.toSeq
          1L
        }
        require(rep == base,
          s"spearman must be volume-homogeneous at ${k}x")
      }

      // q_hill: xk replication scales every per-user count by k, so
      // every exceedance RATIO x_i/x_(k+1) — hence each micro-floored
      // ln term, the sum, and alpha — is bit-identical, while the
      // threshold count scales exactly xk.
      {
        val base = RelationalQueries
          .hillCensus(events, RelationalQueries.HillK).collect().head
        var rep: org.apache.spark.sql.Row = null
        time(s"hill_${k}x") {
          rep = RelationalQueries
            .hillCensus(replicate(events, "event_id", k),
              RelationalQueries.HillK).collect().head
          1L
        }
        require(rep.getAs[Long]("xk1") == base.getAs[Long]("xk1") * k &&
          Seq("n_users", "k_used", "sum_ln", "alpha_micro").forall(c =>
            rep.getAs[Long](c) == base.getAs[Long](c)),
          s"hill tail index must be scale-free at ${k}x")
      }

      // q_fano: xk scales each user's F by exactly k (bucket floors do
      // not commute with xk, so pin the conserved columns: the user
      // census and the event mass).
      {
        val base = RelationalQueries.fanoCensus(events).collect()
        var rep: Array[org.apache.spark.sql.Row] = Array.empty
        time(s"fano_${k}x") {
          rep = RelationalQueries
            .fanoCensus(replicate(events, "event_id", k)).collect()
          rep.length.toLong
        }
        def users(rs: Array[org.apache.spark.sql.Row]) =
          rs.map(_.getAs[Long]("n_users")).sum
        def mass(rs: Array[org.apache.spark.sql.Row]) =
          rs.map(_.getAs[Long]("n_events")).sum
        require(users(rep) == users(base) &&
          rep.head.getAs[Long]("n_users_total") ==
            base.head.getAs[Long]("n_users_total") &&
          mass(rep) == mass(base) * k,
          s"fano census must conserve users and scale mass x$k")
      }
    }

    // ------------------- round-13 operator invariants (8x) -------------

    {
      import graft.operators.{RelationalQueries, SketchQueries}
      val events = graft.sources.Tables.events(spark, dir)
        .select("event_id", "user_id", "event_type", "ts", "value")

      // q_welch_t / q_mde: event replication multiplies every per-user
      // sum by exactly k, so means scale k, variances k², and the t /
      // df / relative-MDE statistics are SCALE-FREE. k = 8 is a power
      // of two, so the double trees scale by exact exponent shifts and
      // the micro-floored outputs are BIT-identical, not just close.
      {
        val base = RelationalQueries.welchCensus(events).collect()
        var rep: Array[org.apache.spark.sql.Row] = Array.empty
        time(s"welch_${k}x") {
          rep = RelationalQueries
            .welchCensus(replicate(events, "event_id", k)).collect()
          rep.length.toLong
        }
        require(rep.length == base.length, "welch census row drift")
        base.zip(rep).foreach { case (b, r) =>
          require(r.getAs[Long]("n_a") == b.getAs[Long]("n_a") &&
            r.getAs[Long]("sum_a") == b.getAs[Long]("sum_a") * k &&
            r.getAs[Long]("ss_a") == b.getAs[Long]("ss_a") * k * k &&
            r.getAs[java.lang.Long]("t_micro") ==
              b.getAs[java.lang.Long]("t_micro") &&
            r.getAs[java.lang.Long]("df_micro") ==
              b.getAs[java.lang.Long]("df_micro"),
            s"welch t/df must be scale-free at ${k}x " +
              s"(${b.getString(0)})")
        }
      }

      // q_srm: event replication adds no users — the whole census is
      // INVARIANT (the validity alarm must not fire on volume).
      {
        val base = RelationalQueries.srmCensus(events).collect()
          .map(_.toSeq)
        var rep: Seq[Seq[Any]] = Nil
        time(s"srm_${k}x") {
          rep = RelationalQueries
            .srmCensus(replicate(events, "event_id", k)).collect()
            .map(_.toSeq).toSeq
          rep.length.toLong
        }
        require(rep == base.toSeq,
          s"SRM census must be invariant under event replication x$k")
      }

      // q_kmv_overlap: doc replication adds no DISTINCT shingles per
      // source, so the per-source hash sets — hence the states, the
      // union sketches, every estimate, and the exact intersections —
      // are all IDENTICAL. The strongest invariance in the family.
      {
        val sdocs = graft.sources.Tables.documents(spark, dir)
          .select("doc_id", "text", "source")
        val base = SketchQueries.kmvOverlap(sdocs).collect()
          .map(_.toSeq)
        var rep: Seq[Seq[Any]] = Nil
        time(s"kmv_overlap_${k}x") {
          rep = SketchQueries
            .kmvOverlap(replicate(sdocs, "doc_id", k)).collect()
            .map(_.toSeq).toSeq
          rep.length.toLong
        }
        require(rep == base.toSeq,
          s"KMV overlap must be invariant under doc replication x$k")
      }

      // q_tok_len: counts scale x k, every distribution statistic
      // (mean, p95, max, long ppm) is invariant. Mean/max/ppm are
      // invariant by the floor-division identity; the p95 rank pick
      // is invariant unless the 95th-percentile boundary's ±1 rank
      // rounding straddles a census tie-block edge — verified not to
      // on this corpus (the probe's job: it would flag a distribution
      // whose quantile sits exactly on a block boundary).
      {
        val sdocs = graft.sources.Tables.documents(spark, dir)
          .select("doc_id", "text", "source")
        val base = TextOps.tokenLenCensus(sdocs).collect()
        var rep: Array[org.apache.spark.sql.Row] = Array.empty
        time(s"tok_len_${k}x") {
          rep = TextOps
            .tokenLenCensus(replicate(sdocs, "doc_id", k)).collect()
          rep.length.toLong
        }
        require(rep.length == base.length, "tok_len census row drift")
        base.zip(rep).foreach { case (b, r) =>
          require(r.getAs[Long]("n_tokens") ==
              b.getAs[Long]("n_tokens") * k &&
            Seq("mean_len_micro", "p95_len", "max_len", "long_ppm")
              .forall(c => r.getAs[Long](c) == b.getAs[Long](c)),
            s"tok_len stats must be scale-free at ${k}x")
        }
      }

      // q_prefix_dup: at k >= 2 EVERY opener class crosses the >= 2
      // bar, so groups(kx) keys = ALL distinct openers, each with
      // n_docs = k * (base count incl singletons), source count
      // invariant, exemplar = the base min doc_id (replica ids are
      // offset upward).
      {
        val sdocs = graft.sources.Tables.documents(spark, dir)
          .select("doc_id", "text", "source")
        val baseAll = TextOps
          .prefixKeys(sdocs, TextOps.PrefixDupTokens)
          .groupBy("pk")
          .agg(count(lit(1)).as("n"),
            countDistinct("source").as("ns"),
            min("doc_id").as("ex"))
          .collect()
          .map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        var rep: Array[org.apache.spark.sql.Row] = Array.empty
        time(s"prefix_dup_${k}x") {
          rep = TextOps.prefixDupCensus(
            replicate(sdocs, "doc_id", k),
            TextOps.PrefixDupTokens).collect()
          rep.length.toLong
        }
        require(rep.length == baseAll.size,
          s"every opener class must cross the bar at ${k}x: " +
            s"${rep.length} != ${baseAll.size}")
        rep.foreach { r =>
          val (n, ns, ex) = baseAll(r.getAs[Long]("pk"))
          require(r.getAs[Long]("n_docs") == n * k &&
            r.getAs[Long]("n_sources") == ns &&
            r.getAs[Long]("exemplar") == ex,
            s"prefix_dup identity broken at pk=${r.getAs[Long]("pk")}")
        }
      }

      // q_anisotropy: per-dim component sums scale exactly x k, so
      // snorm2 scales k² (integer squares — floor is the identity),
      // self mass and n scale k.
      {
        val e = graft.sources.Tables.embeddings(spark, dir)
        val base = SimilarityOps.anisotropyCensus(e).collect()
        var rep: Array[org.apache.spark.sql.Row] = Array.empty
        time(s"anisotropy_${k}x") {
          rep = SimilarityOps
            .anisotropyCensus(replicate(e, "vec_id", k)).collect()
          rep.length.toLong
        }
        require(rep.length == base.length, "anisotropy row drift")
        base.zip(rep).foreach { case (b, r) =>
          require(r.getAs[Long]("n") == b.getAs[Long]("n") * k &&
            r.getAs[Long]("selfsum") == b.getAs[Long]("selfsum") * k &&
            r.getAs[Long]("snorm2") ==
              b.getAs[Long]("snorm2") * k * k,
            s"anisotropy sums must scale (k, k²) at ${k}x " +
              s"(label ${b.getAs[Long]("label")})")
        }
      }

      // R69: the daily arm census — the only corpus-sized relation in
      // the sequential test — scales EXACTLY under event replication
      // (every cumulative column ×k; user/ts/value ride unchanged, so
      // arms and days are preserved), and the always-valid statistic
      // stays monotone per type at k× (the no-peeking guarantee is
      // scale-free).
      {
        val ev = graft.sources.Tables.events(spark, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
        def cen(c: Int) = {
          val e = if (c == 1) ev else replicate(ev, "event_id", c)
          graft.operators.RelationalQueries.msprtCensus(e).collect()
        }
        val b = cen(1)
        var r: Array[org.apache.spark.sql.Row] = Array.empty
        time(s"msprt_${k}x") { r = cen(k); r.length.toLong }
        require(r.length == b.length, "msprt type-day row drift")
        b.zip(r).foreach { case (x, y) =>
          require(y.getAs[Long]("cn_a") == x.getAs[Long]("cn_a") * k &&
            y.getAs[Long]("cn_b") == x.getAs[Long]("cn_b") * k &&
            y.getAs[Long]("csum_a") == x.getAs[Long]("csum_a") * k &&
            y.getAs[Long]("csum_b") == x.getAs[Long]("csum_b") * k,
            "msprt cumulative census must scale exactly by k")
        }
        r.groupBy(_.getAs[String]("event_type")).foreach {
          case (_, rows) =>
            val lps = rows.sortBy(_.getAs[String]("day"))
              .flatMap(x =>
                Option(x.getAs[java.lang.Long]("lp_micro")))
              .map(_.toLong)
            require(lps.sameElements(lps.sorted),
              s"lp must stay monotone at ${k}x")
        }
        println(s"SCALE msprt_census_scaling ok (cn/csum exactly xk " +
          s"over ${b.length} type-days; lp monotone at ${k}x)")
      }

      // M19 ⟷ M18 cross-operator identity: the Goertzel DC bin is
      // the square of the decoder's integer sample sum —
      // |X(0)|² = (Σx)² EXACTLY, for every doc, at 1× AND k×
      // (replica ids generate FRESH synthetic WAVs, so the k× pass
      // exercises k× new content, not copies).
      {
        def check(c: Int): Long = {
          val d = replicate(docs, "doc_id", c)
          val g = MultimodalOps
            .wavGoertzelStats(MultimodalOps.mediaBinary(d))
            .toDF().select("doc_id", "p0")
          val s = MultimodalOps
            .wavDcStats(MultimodalOps.mediaBinary(d))
            .toDF().select(col("doc_id"),
              (col("sum_all") * col("sum_all")).as("sq"))
          val bad = g.join(s, "doc_id")
            .filter(col("p0") =!= col("sq")).count()
          require(bad == 0L,
            s"Goertzel DC bin must equal (sum)^2, $bad rows differ")
          g.count()
        }
        check(1)
        var n = 0L
        time(s"goertzel_dc_${k}x") { n = check(k); n }
        println(s"SCALE goertzel_dc_identity ok ($n wav docs at " +
          s"${k}x, p0 == sum_all² exactly)")
      }

      // V53: SQ8 fidelity census under vec-replication — fidelity is
      // a pure function of the vector bytes, so the bucket census
      // scales EXACTLY: counts/sums ×k, min/max/mean and the worst
      // exemplar (base min vec_id rides below the replica offset)
      // byte-identical.
      {
        def census(c: Int) = SimilarityOps.sq8FidelityCensus(
            replicate(emb, "vec_id", c))
          .collect().map(r => r.getLong(0) -> (r.getLong(1),
            r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6))).toMap
        val b1 = census(1)
        var bk: Map[Long, (Long, Long, Long, Long, Long, Long)] = null
        time(s"sq8_fidelity_${k}x") { bk = census(k); bk.size.toLong }
        require(bk.keySet == b1.keySet, "bucket set must not move")
        b1.foreach { case (bu, (n1, mn, mx, sm, wv, mean)) =>
          val (nk, mnk, mxk, smk, wvk, meank) = bk(bu)
          require(nk == k * n1 && mnk == mn && mxk == mx &&
            smk == k * sm && wvk == wv && meank == mean,
            s"bucket $bu must scale exactly: base=${b1(bu)} k×=${bk(bu)}")
        }
        println(s"SCALE sq8_fidelity_census ok (${b1.size} buckets: " +
          s"counts/sums x$k, min/max/mean/exemplar invariant)")
      }

      // R74: cluster-robust SE under user-replication (new user ids,
      // parity preserved): arm means are unchanged, so every cluster
      // residual replicates verbatim → n/users/sums/cr_mass scale
      // EXACTLY ×k and each arm's design effect is BYTE-IDENTICAL
      // (crn/n and the naive variance are both replication-invariant).
      {
        val ev = graft.sources.Tables.events(spark, dir)
          .select(col("event_type"), col("user_id"), col("value"))
        def rep(c: Int) = ev.crossJoin(spark.range(c).toDF("__r"))
          .withColumn("user_id",
            col("user_id") + col("__r") * 10000000L) // even offset
          .drop("__r")
        def census(c: Int) = RelationalQueries.clusterSeCensus(rep(c))
          .collect().map(r => r.getString(0) -> (r.getLong(1),
            r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7),
            r.getLong(8),
            Option(r.getAs[java.lang.Long]("deff_a_micro")),
            Option(r.getAs[java.lang.Long]("deff_b_micro")))).toMap
        val b1 = census(1)
        var bk: Map[String, (Long, Long, Long, Long, Long, Long,
          Option[java.lang.Long], Option[java.lang.Long])] = null
        time(s"cluster_se_${k}x") { bk = census(k); bk.size.toLong }
        b1.foreach { case (t, (na, nb, sa, sb, ca, cb, da, db)) =>
          val (nak, nbk, sak, sbk, cak, cbk, dak, dbk) = bk(t)
          require(nak == k * na && nbk == k * nb && sak == k * sa &&
            sbk == k * sb && cak == k * ca && cbk == k * cb,
            s"$t: integer census must scale exactly x$k")
          require(dak == da && dbk == db,
            s"$t: design effects must be replication-invariant")
        }
        println(s"SCALE cluster_se_census ok (${b1.size} types: " +
          s"counts/sums/cr_mass x$k, design effects invariant)")
      }

      // X77: dyadic-α temperature mixing under doc-replication —
      // rates depend only on token-total RATIOS, so every rate_micro
      // (and the α grid itself) is replication-invariant.
      {
        def rates(c: Int) = Seq((1, 2), (3, 2)).map { case (nu, l) =>
          TextOps.temperatureMixAlpha(
              replicate(graft.sources.Tables.documents(spark, dir)
                .select("doc_id", "source", "text"), "doc_id", c),
              nu, l)
            .collect().map(r => (r.getLong(0), r.getString(1)) ->
              r.getAs[Long]("rate_micro")).toMap
        }.reduce(_ ++ _)
        val r1 = rates(1)
        var rk: Map[(Long, String), Long] = null
        time(s"temp_mix_alpha_${k}x") { rk = rates(k); rk.size.toLong }
        require(rk == r1,
          "dyadic-α rates must be replication-invariant")
        println(s"SCALE temp_mix_alpha ok (${r1.size} (α, source) " +
          s"rates byte-identical at ${k}x)")
      }
    }
    spark.stop()
  }
}
