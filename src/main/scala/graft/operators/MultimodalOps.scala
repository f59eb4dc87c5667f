package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** One media record as seen by the partition-local feature extractor. */
case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String)

/** Extracted (fake-decoded) per-record features — see
  * [[MultimodalOps.extractFeatures]] for the decode-stub contract.
  */
case class MediaFeatures(doc_id: Long, n_bytes: Long, mean_byte_micro: Long,
                         max_byte: Long, byte_entropy_micro: Long)

/** Multimodal-column operators: image/audio/video-style payloads modeled
  * as opaque `binary` columns with typed metadata, plus the Spark-side
  * plumbing a real decode pipeline needs (schema, frame sampling,
  * partition-batched feature extraction).
  *
  * The *decode step itself is a stub* — this container has no image or
  * audio codecs, so "decoding" is a deterministic byte-level fake. The
  * schemas, the binary slicing, the metadata propagation, and the
  * batched `mapPartitions` shape are real and tested; swapping the stub
  * for an actual codec touches only [[decodeStub]].
  *
  * Scale notes: payload columns ride along untouched until the operator
  * that needs them — narrow projections everywhere else keep Parquet
  * column pruning effective (a metadata-only query never reads payload
  * pages). Frame sampling is an expression (`transform` + `substr`), so
  * it runs inside codegen with zero shuffles.
  */
object MultimodalOps {

  val FrameStride = 32
  val FrameLen = 16

  /** documents → media frame: payload = UTF-8 bytes of `text` (the
    * deterministic stand-in for real image/audio bytes), metadata typed
    * and derived reproducibly from doc_id/source.
    */
  def media(docs: DataFrame): DataFrame = {
    // byte_len is the OCTET length of the payload (length() on a binary
    // column counts bytes), not the character count of `text` — for
    // non-ASCII text these differ, and all frame math slices bytes
    val len = length(col("text").cast("binary")).cast("long")
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      when(col("source") === "src0", "png")
        .when(col("source") === "src1", "jpeg")
        .when(col("source") === "src2", "wav")
        .when(col("source") === "src3", "mp4")
        .otherwise("bin").as("format"),
      (lit(16L) + (col("doc_id").bitwiseAND(lit(63L))) * 4L).as("width"),
      (lit(16L) + (shiftright(col("doc_id"), 3).bitwiseAND(lit(63L))) * 4L)
        .as("height"),
      len.as("byte_len"))
  }

  /** Number of full frames a payload yields at (stride, frameLen). */
  def nFrames(byteLen: Column): Column =
    when(byteLen >= FrameLen,
      ((byteLen - FrameLen) / FrameStride).cast("long") + 1L)
      .otherwise(0L)

  /** Typed metadata projection incl. a "resize" transform — metadata
    * math only, payload column never read (check ReadSchema in explain).
    */
  def mediaMeta(docs: DataFrame): DataFrame =
    media(docs).select(
      col("doc_id"), col("format"), col("width"), col("height"),
      greatest(lit(1L), shiftright(col("width"), 1)).as("resized_width"),
      greatest(lit(1L), shiftright(col("height"), 1)).as("resized_height"),
      col("byte_len"),
      sha2(col("payload"), 256).as("sha"),
      nFrames(col("byte_len")).as("n_frames"))

  /** Frame sampling: slice `frameLen` bytes every `stride` bytes. The
    * per-frame sha256 stands in for the decoded frame tensor.
    */
  def mediaFrames(docs: DataFrame): DataFrame = {
    val m = media(docs)
    val nf = nFrames(col("byte_len"))
    val frames = when(nf >= 1L,
      transform(sequence(lit(0L), nf - 1L),
        i => struct(i.as("frame_idx"),
          sha2(substr(col("payload"), i * FrameStride + 1L, lit(FrameLen)),
            256).as("frame_sha"))))
      .otherwise(array().cast("array<struct<frame_idx:bigint,frame_sha:string>>"))
    m.select(col("doc_id"), explode(frames).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.frame_sha").as("frame_sha"))
  }

  /** STUB — deterministic stand-in for a real image/audio decode.
    * A production build would replace this body with the codec call
    * (e.g. javax.imageio / ffmpeg bindings) returning pixel/sample
    * buffers; everything around it (batching, schema, partitioning)
    * stays as-is.
    */
  def decodeStub(payload: Array[Byte]): Array[Int] =
    payload.map(b => b & 0xff)

  /** Partition-batched feature extraction over the opaque payloads —
    * the `mapPartitions` shape a vectorized decoder wants: records are
    * processed in fixed-size batches (amortizing per-batch codec setup),
    * one iterator pass, no driver collection. This is the one operator
    * family where imperative per-partition code beats expressions
    * (codecs aren't expressible in Catalyst), so `mapPartitions` is the
    * honest tool (SURVEY.md §7.3 last-resort rule).
    */
  val FeatureBatchSize = 64

  def extractFeatures(media: org.apache.spark.sql.Dataset[MediaRecord])
  : org.apache.spark.sql.Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(FeatureBatchSize).flatMap { batch =>
        // per-batch "codec init" would happen here, once per batch
        batch.iterator.map { rec =>
          val bytes = decodeStub(rec.payload)
          val n = bytes.length.toLong
          val sum = bytes.foldLeft(0L)(_ + _)
          val max = if (bytes.isEmpty) 0L else bytes.max.toLong
          // byte-value spread in [0,1]: distinct values / 256
          val distinct = bytes.distinct.length.toLong
          MediaFeatures(
            rec.doc_id,
            n,
            if (n == 0) 0L else math.floor(1000000.0 * sum / n / 255.0).toLong,
            max,
            math.floor(1000000.0 * distinct / 256.0).toLong)
        }
      }
    }
  }

  def mediaFeatures(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val ds = media(docs).select("doc_id", "payload", "format")
      .as[MediaRecord]
    extractFeatures(ds).toDF()
  }

  /** Exact media dedup census — the storage-side dedup report every
    * multimodal pipeline runs first: blobs grouped by content hash
    * (sha-256 of the payload bytes), per-format counts of stored vs
    * distinct blobs and the bytes reclaimable by keeping one copy per
    * hash, plus an ALL rollup row where a blob stored under several
    * formats still counts ONCE distinct (cross-format duplicates are
    * invisible to any per-format number — the reason the rollup
    * re-groups by hash instead of summing the format rows).
    *
    * Scale shape: ONE corpus pass builds the (format, sha) blob
    * relation — the only shuffle that sees payload-derived rows, keyed
    * on the 64-char hash with map-side partials (identical blobs
    * collapse before the wire); both censuses and the ALL re-group
    * aggregate blob-level rows (bounded by distinct blobs, not bytes).
    */
  def mediaDedupCensus(docs: DataFrame): DataFrame = {
    val blobs = media(docs)
      .select(col("format"), sha2(col("payload"), 256).as("sha"),
        col("byte_len"))
      .groupBy("format", "sha")
      .agg(count(lit(1)).as("c"), max("byte_len").as("len"))
      .cache()
    def census(g: RelationalGroupedDataset) = g.agg(
      sum("c").as("n_blobs"),
      count(lit(1)).as("n_distinct_blobs"),
      (sum("c") - count(lit(1))).as("dup_blobs"),
      sum(col("c") * col("len")).as("total_bytes"),
      sum((col("c") - 1L) * col("len")).as("reclaim_bytes"))
    val perFormat = census(blobs.groupBy("format"))
    val all = census(
      blobs.groupBy("sha").agg(sum("c").as("c"), max("len").as("len"))
        .groupBy())
      .withColumn("format", lit("ALL"))
    perFormat.unionByName(all.select(perFormat.columns.map(col): _*))
  }
}
