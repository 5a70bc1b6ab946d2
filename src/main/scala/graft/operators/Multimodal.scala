package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the pipeline as
  * opaque `binary` columns plus typed metadata; decode / feature-extract
  * runs batch-wise inside `mapPartitions` (the Scala analog of a pandas
  * `mapInPandas` batch UDF — same schema/batching/partitioning shape).
  *
  * Decode status: UNCOMPRESSED formats decode for real — [[RawMedia]]
  * implements WAV/PCM16 and BMP24 containers from scratch (pure JVM, no
  * codec library) with genuine frame-RMS/zero-crossing and pixel
  * mean/resize features, verified end-to-end by q:multimodal_wav /
  * q:multimodal_bmp round-trip oracles. COMPRESSED formats (JPEG/MP3/
  * H.264) remain the environmental stub below: this container ships no
  * codec libraries, so [[fakeDecode]] is a clearly-marked deterministic
  * fake — a pure function of the raw bytes — while everything
  * Spark-side (schema, batch iteration, partition-preserving map,
  * metadata struct) is real and tested. Swap `fakeDecode` for a codec
  * call to productionize.
  */
object Multimodal {

  /** One media row: payload + modality tag. */
  final case class MediaRow(id: Long, modality: String, blob: Array[Byte])

  /** Extracted features (the decode output schema). */
  final case class MediaMeta(id: Long, modality: String, byte_len: Long,
                             width: Int, height: Int, channels: Int,
                             n_frames: Int, n_patches: Long)

  /** Wrap a text table as a media table: bytes = UTF-8 payload (the opaque
    * stand-in), modality assigned deterministically by id. */
  def asMedia(docs: DataFrame, id: String = "doc_id",
              text: String = "text"): DataFrame =
    docs.select(col(id).cast("long").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(id), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(text), "UTF-8").as("blob"))

  /** ======== STUB DECODER ======== deterministic fake: derives "media
    * dimensions" from the raw bytes only. Real implementation would call
    * an image/audio codec here, one batch at a time. */
  private[operators] def fakeDecode(id: Long, modality: String,
                                    blob: Array[Byte]): MediaMeta = {
    val len = blob.length.toLong
    val first = if (blob.nonEmpty) blob(0) & 0xff else 0
    val width = 64 + (len % 577L).toInt
    val height = 64 + first
    val channels = if (modality == "audio") 1 else 3
    val nFrames = if (modality == "video") (len / 100L).toInt + 1 else 1
    val nPatches = ((width.toLong * height + 255L) / 256L) * nFrames
    MediaMeta(id, modality, len, width, height, channels, nFrames, nPatches)
  }

  /** Frame sampling over decoded video metadata: every `step`-th frame
    * index (the mapInPandas frame-sample stage's planning half — the
    * actual pixel decode is the stub). Non-video rows sample their single
    * frame 0. Output: (id, n_frames, n_sampled, frame_idx_csv). */
  def sampleFrames(meta: Dataset[MediaMeta], step: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    meta.toDF().select(col("id"), col("n_frames").cast("long").as("n_frames"),
      sequence(lit(0), col("n_frames") - 1, lit(step)).as("idx"))
      .select(col("id"), col("n_frames"),
        size(col("idx")).cast("long").as("n_sampled"),
        array_join(col("idx"), ",").as("frame_idx_csv"))
  }

  /** Byte-class REMOVE patterns for [[featureHistogram]] (count of a
    * class = length after removing everything else) — shared with the
    * SQL oracle so both sides count the same classes. Last class =
    * "other" (everything outside a-z, 0-9, space). */
  val HistRemovePatterns: Seq[String] =
    Seq("[^a-i]", "[^j-r]", "[^s-z]", "[^0-9]", "[^ ]", "[a-z0-9 ]")

  /** REAL (not stubbed) feature extraction over the opaque payload: a
    * byte-class histogram of the blob as a fixed-size feature vector —
    * the simplest genuine content embedding computable without codecs
    * (for this text-backed corpus the bytes are UTF-8, so byte classes ==
    * character classes). Pure codegen'd column ops over the binary
    * column: decode + 6 regexp counts, no UDF, no shuffle. Output:
    * (id, v: array<double>[6]). */
  def featureHistogram(media: DataFrame): DataFrame = {
    val s = decode(col("blob"), "UTF-8")
    media.select(col("id"),
      array(HistRemovePatterns.map(p =>
        length(regexp_replace(s, p, "")).cast("double")): _*).as("v"))
  }

  /** Multimodal similarity search: feature-extract every payload, then
    * brute-force cosine top-k against the payload with id `queryId` —
    * the feature-extract -> ANN composite of a multimodal curation
    * pipeline (dedup by perceptual similarity). Broadcast query vector,
    * one scan, TakeOrdered. */
  def featureTopK(media: DataFrame, queryId: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = featureHistogram(media)
    val q = h.where(col("id") === queryId).select(col("v").as("qv"))
    h.crossJoin(broadcast(q))
      .where(col("id") =!= queryId)
      .select(col("id"), graft.functions.TextFns.cosine(col("v"), col("qv"))
        .as("sim"))
      .orderBy(col("sim").desc, col("id").asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("sim").desc, col("id").asc)))
      .select(col("rank"), col("id"), col("sim"))
  }

  /** Batch-wise "decode": partition-preserving mapPartitions consuming
    * fixed-size batches (the pandas-UDF batch shape). */
  def decodeStub(media: DataFrame, batchSize: Int = 256): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("modality"), col("blob"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // real codecs want contiguous batches (GPU/SIMD); the stub keeps
          // the shape: decode the whole batch, emit the whole batch.
          batch.iterator.map(r => fakeDecode(r.id, r.modality, r.blob))
        }
      }
  }
}
