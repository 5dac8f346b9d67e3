package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize stages.
  *
  * The actual codecs are STUBBED (this container ships no image/audio
  * libraries): `fakeDecode` derives deterministic pseudo-metadata and
  * pseudo-features from the bytes. Everything Spark-side — schema shape,
  * batch iteration, partition-level decoding, column pruning of the heavy
  * binary column — is real and tested. Swapping in a real codec touches
  * only the marked function.
  *
  * Scale notes: the binary column is the wide payload; every stage keeps
  * it prunable (metadata extraction projects it away as early as
  * possible), and the per-partition decode path uses `mapPartitions` so a
  * real codec can amortize per-batch init (model load, JNI handles) —
  * the Scala analog of `mapInPandas` batching.
  */
object Multimodal {

  /** The engine's multimodal record shape: opaque payload + typed
    * metadata, the pattern a 100 TB image/audio corpus would use
    * (payload in parquet binary or referenced object-store keys).
    */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("mime", StringType, nullable = true)
    )), nullable = true)
  ))

  /** Build a media table from the documents fixture: the text bytes stand
    * in for an encoded payload. Deterministic.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text")).as("n_bytes"),
        lit("application/x-fake").as("mime")
      ).as("meta"))

  /** ===== STUB: deterministic fake decode =====
    * Real implementation would decode payload → (width, height, channels,
    * pixel features). Here: pseudo-values derived from xxhash64 of the
    * bytes, so results are stable across runs/partitionings.
    */
  def fakeDecode(payload: Column): Column = {
    val h = xxhash64(payload)
    struct(
      (pmod(h, lit(1280L)) + lit(32L)).cast("int").as("width"),
      (pmod(shiftright(h, 16), lit(720L)) + lit(32L)).cast("int").as("height"),
      lit(3).as("channels"),
      transform(
        sequence(lit(0), lit(7)),
        i => pmod(xxhash64(payload, i), lit(1000L)).cast("double") / lit(1000.0)
      ).as("features"))
  }

  /** Column-expression decode stage (codegen path): metadata + features
    * without leaving Tungsten.
    */
  def decode(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("modality"),
      col("meta.n_bytes").as("n_bytes"),
      fakeDecode(col("payload")).as("decoded"))

  /** "Resize" stage stub: recompute features at a target resolution —
    * demonstrates a chained transform whose real version re-encodes the
    * payload. Keeps only narrow columns downstream (payload pruned).
    */
  def resizeFeatures(decoded: DataFrame, w: Int, h: Int): DataFrame =
    decoded.select(
      col("media_id"),
      lit(w).as("width"),
      lit(h).as("height"),
      transform(col("decoded.features"), f => round(f * lit(w.toDouble / 1280), 6))
        .as("features"))

  /** Frame sampling for video-modality payloads: emit one row per
    * sampled frame (every `everyNth` of `nFrames` total), each with
    * deterministic pseudo frame features derived from (payload, frame
    * index) — the STUB stands in for a real container demux + frame
    * decode, while the Spark-side shape is the real one: a controlled
    * explode fan-out where output rows ≈ |media| × nFrames/everyNth, the
    * payload column dropped BEFORE the explode so the wide bytes never
    * replicate per frame.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 32, everyNth: Int = 8): DataFrame = {
    require(everyNth > 0 && nFrames > 0, "sampleFrames: positive nFrames/everyNth")
    media.select(
      col("media_id"),
      // hash the payload ONCE; frames derive from (hash, idx) so the
      // binary column is pruned before the fan-out
      xxhash64(col("payload")).as("_h"),
      col("meta.n_bytes").as("n_bytes"))
      .select(
        col("media_id"), col("_h"), col("n_bytes"),
        explode(sequence(lit(0), lit(nFrames - 1), lit(everyNth))).as("frame_idx"))
      .select(
        col("media_id"), col("n_bytes"), col("frame_idx"),
        (pmod(xxhash64(col("_h"), col("frame_idx")), lit(1000L))
          .cast("double") / lit(1000.0)).as("frame_feature"))
  }

  /** Partition-batched decode via mapPartitions on the raw payload — the
    * seam where a real codec (JNI/FFI, ONNX session, …) would initialize
    * once per partition and stream batches. The fake here mirrors
    * fakeDecode's n_bytes-derived shape but exercises the typed
    * Dataset path and per-partition init.
    */
  def decodePartitioned(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition init point for a real codec lives here
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // payload is nullable by schema (e.g. unfetched object-store
          // reference): decode to the empty shape rather than NPE
          if (bytes == null) Row(id, 0, 0L)
          else Row(id, bytes.length, java.util.Arrays.hashCode(bytes).toLong)
        }
      }(enc)
  }
}
