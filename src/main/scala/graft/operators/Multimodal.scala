package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.8, row 46): treat media as
  * opaque `binary` columns + typed metadata, with decode / feature
  * extraction running batched per partition. The image/audio codec
  * libraries are not available in this environment, so `decodeStub` is a
  * clearly-marked deterministic fake — but everything Spark-side (schema,
  * binary column, partition-batched execution, output shape) is real and
  * is what a production decode would plug into.
  */
object Multimodal {

  /** Fixed feature dimension the "decoder" emits. */
  val featureDim = 8

  /** STUB — stands in for a real image/audio decode + feature extraction
    * (e.g. JPEG decode → resize → channel means). Deterministic in the
    * bytes so tests and the rows-only check are reproducible. A real
    * implementation would decode `bytes` with a codec here; the surrounding
    * plan would not change.
    */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val h = bytes.foldLeft(1125899906842597L)((a, b) => a * 31 + (b & 0xFF))
    Array.tabulate(featureDim)(i => (math.abs(h >> (i * 7)) % 1000).toDouble / 1000.0)
  }

  /** #46 mm_binary_columns — build the binary column + typed metadata from
    * `documents` (text bytes stand in for media payloads), run the batched
    * decode per partition, return features + metadata. The mapPartitions
    * boundary is exactly where `mapInPandas`/Arrow batching would sit in a
    * Python pipeline; in Scala the partition iterator IS the batch, so the
    * decoder can amortize model/codec setup per partition.
    */
  def binaryColumns(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val flat = t.documents.select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        element_at(array(lit("jpeg"), lit("png"), lit("webp")),
          (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
        (lit(64) + col("doc_id") % 576).cast("int").as("width"),
        (lit(64) + col("doc_id") % 448).cast("int").as("height"))
      .as[(Long, Array[Byte], String, Int, Int)]
    flat.mapPartitions { it =>
      // per-partition batch: a real decoder would init its codec once here
      it.map { case (id, bytes, fmt, w, h) =>
        (id, fmt, w, h, bytes.length, decodeStub(bytes))
      }
    }.toDF("doc_id", "fmt", "width", "height", "n_bytes", "feat")
      .select(col("doc_id"), col("fmt"), col("width"), col("height"), col("n_bytes"),
        (floor(element_at(col("feat"), 1) * 10000) / 10000).as("feat0"))
      .orderBy(col("doc_id"))
  }

  /** Frames sampled per video, whatever its length — the fan-out bound
    * that keeps frame rows proportional to the corpus, not to runtime.
    */
  val maxFramesPerVideo = 8

  /** mm_frame_sample — video frame sampling as a PLAN: per clip, typed
    * metadata (duration, fps) synthesized from the binary stand-in, then a
    * bounded uniform frame-index `sequence` exploded into one row per
    * sampled frame with its timestamp. The decode of each frame is the
    * documented stub; everything the sampler decides — which frames, how
    * many, the per-frame output schema — is the real production shape
    * (explode keeps the fan-out ≤ maxFramesPerVideo so a 3-hour clip can't
    * blow up a partition).
    */
  def frameSample(t: Tables): DataFrame = {
    val durationMs = (lit(1000) + col("doc_id") % 29 * 1000).cast("long")
    val fps = when(col("doc_id") % 2 === 0, 24).otherwise(30)
    val nFrames = (durationMs / lit(1000) * fps).cast("long")
    // uniform stride so ≤ maxFramesPerVideo indices cover the whole clip
    val stride = greatest(lit(1L), ceil(nFrames / lit(maxFramesPerVideo)).cast("long"))
    t.documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        durationMs.as("duration_ms"), fps.as("fps"), nFrames.as("n_frames"),
        stride.as("stride"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, col("stride"))))
      .select(
        col("doc_id"), col("duration_ms"), col("fps"), col("n_frames"),
        col("frame_idx"),
        (col("frame_idx") * 1000 / col("fps")).cast("long").as("frame_ts_ms"),
        // per-frame stub decode keyed on (payload, frame) — deterministic
        (floor(
          (abs(xxhash64(col("payload"), col("frame_idx"))) % 1000) / 1000 * 10000)
          / 10000).as("feat0"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Audio chunk length (ms) for mm_audio_chunks. */
  val audioChunkMs = 5000L

  /** mm_audio_chunks — audio chunking as a PLAN: per track, fixed-length
    * windows (the Whisper-style 5 s chunk shape) generated with `sequence`
    * + explode, each carrying its (start, end) bounds and a stub feature.
    * The last chunk is clipped to the track end, exactly like a real
    * chunker.
    */
  def audioChunks(t: Tables): DataFrame = {
    val durationMs = (lit(2500) + col("doc_id") % 17 * 1700).cast("long")
    t.documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        durationMs.as("duration_ms"))
      .withColumn("start_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(audioChunkMs))))
      .select(
        col("doc_id"), col("duration_ms"), col("start_ms"),
        least(col("start_ms") + audioChunkMs, col("duration_ms")).as("end_ms"),
        (floor(
          (abs(xxhash64(col("payload"), col("start_ms"))) % 1000) / 1000 * 10000)
          / 10000).as("feat0"))
      .orderBy(col("doc_id"), col("start_ms"))
  }
}
