package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MediaBlob, MultimodalOps}

/** Dev tool (VERDICT r14 item 5): the M-family scale curve — the
  * DedupScale/VectorScale protocol applied to media decode: one
  * recorded 32× run of the decode-heavy censuses over REPLICATED
  * BLOBS (identical payload bytes, offset doc_ids), turning the
  * "decode is row-local, embarrassingly parallel" claim from argument
  * into a measured wall curve with exact closed-form output checks.
  *
  * Closed forms under payload-identical replication:
  *  - every per-doc integer census (Goertzel bins, DC sums, resize
  *    grids) emits for each copy EXACTLY its base doc's row (stats are
  *    pure functions of the bytes) — checked by anti-joining the c×
  *    stats against the base stats on (base doc, stat columns): zero
  *    mismatches, row count exactly c·base;
  *  - the M19 ⟷ M18 cross-operator identity p_dc ≡ (Σx)² holds per
  *    row at every c (the Goertzel c=2 bin IS the square of the DC
  *    sum — two independent decoder passes must agree exactly);
  *  - the M7 near-dup census runs at the DISTINCT-HASH level, so
  *    replication leaves the hash-pair relation IDENTICAL and only
  *    multiplies class sizes: cross-class pair mass n_pairs scales
  *    exactly ×c², within-class mass is C(c·n, 2) — including the
  *    base singletons that become duplicate classes at c ≥ 2. The
  *    probe derives the expected c× census from the 1× class relation
  *    in plain arithmetic and demands set equality.
  *
  * The quantity under test is WALL TIME against that known output
  * growth: decode is one scalar pass per blob with no shuffle, so
  * time should grow ~linearly in c (bounded below by fixed job
  * overhead); the census join stages are hash-class-sized and should
  * barely move.
  *
  * Usage: sbt "runMain graft.MediaScale [c1 c2 ...]" (default 1 8 32).
  */
object MediaScale {
  def main(args: Array[String]): Unit = {
    val points = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1, 8, 32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val off = 10000000L

    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id")
    val base = MultimodalOps.mediaBinary(docs).cache()
    val nBlobs = base.count()
    // M21: the compressed-format decode curve — real baseline JPEGs
    // through the full Huffman/IDCT path (r16; same replica protocol)
    val baseJp = MultimodalOps.jpegBinary(docs).cache()
    val baseJpStats = MultimodalOps.jpegDecodeStats(baseJp).toDF().cache()
    val nJp = baseJpStats.count()
    val basePn = MultimodalOps.pngBinary(docs).cache()
    val basePnStats = MultimodalOps.pngDecodeStats(basePn).toDF().cache()
    val nPn = basePnStats.count()
    val baseGz = MultimodalOps.wavGoertzelStats(base).cache()
    val baseRz = MultimodalOps.bmpResizeStats(base).cache()
    val baseCls = MultimodalOps.imageDHash(base).toDF()
      .groupBy("dhash")
      .agg(count(lit(1)).as("n"), min("doc_id").as("exemplar"))
      .cache()
    val (nGz, nRz, nCls) = (baseGz.count(), baseRz.count(),
      baseCls.count())
    println(s"--- base sf0.1: $nBlobs blobs, $nGz wav, $nRz bmp, " +
      s"$nCls distinct dhash classes ---")

    def replicate(c: Int) = base.toDF()
      .crossJoin(spark.range(c).toDF("__r"))
      .withColumn("doc_id", col("doc_id") + col("__r") * off)
      .drop("__r").as[MediaBlob]

    def timed(name: String, c: Int)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"MEDIASCALE $name%-16s c=$c%-3d " +
        f"${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }

    /** zero rows of `rep` disagree with the base stat row of their
      * base doc, and the count is exactly c×base.
      */
    def copyIdentity(name: String, c: Int, rep: DataFrame,
                     baseDf: DataFrame, nBase: Long): Unit = {
      val repKeyed = rep.withColumn("doc_id", col("doc_id") % off)
      val bad = repKeyed.join(baseDf,
        repKeyed.columns.toSeq, "left_anti").count()
      val n = rep.count()
      require(bad == 0L && n == c * nBase,
        s"$name copy identity violated at $c×: " +
          s"mismatches=$bad rows=$n expected=${c * nBase}")
      println(s"MEDIASCALE check $name c=$c copy-identity OK " +
        s"($n rows = $c x $nBase, 0 mismatches)")
    }

    points.foreach { c =>
      val d = replicate(c).cache()
      d.count() // materialize the replica outside the timed region
      println(s"--- ${c}x sf0.1 (${nBlobs * c} blobs) ---")

      var gz: DataFrame = null
      timed("wav_goertzel", c) {
        gz = MultimodalOps.wavGoertzelStats(d).toDF().cache()
        gz.count()
      }
      copyIdentity("wav_goertzel", c, gz, baseGz.toDF(), nGz)

      var dc: DataFrame = null
      timed("wav_dc", c) {
        dc = MultimodalOps.wavDcStats(d).toDF().cache()
        dc.count()
      }
      copyIdentity("wav_dc", c, dc, MultimodalOps.wavDcStats(base)
        .toDF(), nGz)
      // M19 ⟷ M18 cross-decoder identity at c×: p_dc ≡ (Σx)²
      val badDc = gz.select(col("doc_id"), col("p0"))
        .join(dc.select(col("doc_id"), col("sum_all")), "doc_id")
        .filter(col("p0") =!= col("sum_all") * col("sum_all"))
        .count()
      require(badDc == 0L, s"goertzel DC identity broken: $badDc rows")
      println(s"MEDIASCALE check goertzel_dc c=$c identity OK " +
        s"(p0 = sum² on all ${nGz * c} wav rows)")
      gz.unpersist(); dc.unpersist()

      var rz: DataFrame = null
      timed("bmp_resize", c) {
        rz = MultimodalOps.bmpResizeStats(d).toDF().cache()
        rz.count()
      }
      copyIdentity("bmp_resize", c, rz, baseRz.toDF(), nRz)
      rz.unpersist()

      // M21: JPEG decode — per-blob Huffman + 6 IDCTs per MCU, the
      // heaviest per-byte decode in the family; copies carry identical
      // payloads so the per-doc stats identity applies verbatim
      val dj = baseJp.toDF()
        .crossJoin(spark.range(c).toDF("__r"))
        .withColumn("doc_id", col("doc_id") + col("__r") * off)
        .drop("__r").as[MediaBlob].cache()
      dj.count()
      var jp: DataFrame = null
      timed("jpeg_decode", c) {
        jp = MultimodalOps.jpegDecodeStats(dj).toDF().cache()
        jp.count()
      }
      copyIdentity("jpeg_decode", c, jp, baseJpStats, nJp)
      jp.unpersist(); dj.unpersist()

      // M23: PNG decode — inflate + unfilter per blob (lossless path)
      val dp = basePn.toDF()
        .crossJoin(spark.range(c).toDF("__r"))
        .withColumn("doc_id", col("doc_id") + col("__r") * off)
        .drop("__r").as[MediaBlob].cache()
      dp.count()
      var pn: DataFrame = null
      timed("png_decode", c) {
        pn = MultimodalOps.pngDecodeStats(dp).toDF().cache()
        pn.count()
      }
      copyIdentity("png_decode", c, pn, basePnStats, nPn)
      pn.unpersist(); dp.unpersist()

      // M7 near-dup census: hash-level, so the EXPECTED c× census is
      // plain arithmetic over the 1× class relation
      val maxHamming = 3
      var census: Seq[Seq[Any]] = null
      timed("phash_census", c) {
        val out = MultimodalOps.phashCensusOf(
          MultimodalOps.imageDHash(d).toDF(), maxHamming)
        census = out.collect().map(_.toSeq).toSeq
        census.size.toLong
      }
      val cl = c.toLong
      val expectedSelf = baseCls.collect().map { r =>
        val (h, n, ex) = (r.getLong(0), r.getLong(1), r.getLong(2))
        Seq[Any](h, h, 0L, cl * n, cl * n, cl * n * (cl * n - 1) / 2,
          ex, ex)
      }.filter(_(3).asInstanceOf[Long] >= 2L).toSeq
      val expectedNear = MultimodalOps.phashCensusOf(
          MultimodalOps.imageDHash(base).toDF(), maxHamming)
        .filter(col("hamming") > 0L)
        .collect().map { r =>
          Seq[Any](r.getLong(0), r.getLong(1), r.getLong(2),
            cl * r.getLong(3), cl * r.getLong(4),
            cl * cl * r.getLong(3) * r.getLong(4),
            r.getLong(6), r.getLong(7))
        }.toSeq
      require(census.toSet == (expectedSelf ++ expectedNear).toSet,
        s"phash census closed form violated at $c×")
      println(s"MEDIASCALE check phash_census c=$c closed-form OK " +
        s"(${census.size} rows: ${expectedSelf.size} classes + " +
        s"${expectedNear.size} near pairs)")
      d.unpersist()
    }
    spark.stop()
  }
}
