package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.8, row 46): treat media as
  * opaque `binary` columns + typed metadata, with decode / feature
  * extraction running batched per partition.
  *
  * The image decode is REAL: payloads are Netpbm P5 (binary grayscale PGM
  * — magic + ASCII dims + raster), and `decodePgm` is a genuine parser
  * with header validation, bounds checks and truncation handling. The
  * format needs no codec library, which is the point — the heavyweight
  * JPEG/PNG/audio codecs absent from this environment would slot into the
  * SAME mapPartitions boundary with the same schema; only the parser body
  * changes.
  */
object Multimodal {

  /** A decoded grayscale image: dimensions + the pixel statistics the
    * feature-extraction stage emits.
    */
  final case class PgmImage(width: Int, height: Int, meanGray: Double,
                            minGray: Int, maxGray: Int)

  /** Netpbm P5 encoder (the ingest-side stand-in): `P5\n<w> <h>\n255\n`
    * header + w*h raster bytes.
    */
  def encodePgm(width: Int, height: Int, raster: Array[Byte]): Array[Byte] = {
    require(raster.length == width * height, "raster size mismatch")
    val header = s"P5\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ raster
  }

  /** P5 container parse: magic check, ASCII header parse, maxval check,
    * raster-length validation. Returns (width, height, raster offset into
    * `bytes`) — the raster itself is not copied, so every consumer
    * (statistics fold, perceptual hash) reads the payload in place.
    */
  def decodePgmRaster(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '5') return None
    // header = three whitespace-delimited tokens after the magic
    var i = 2
    def token(): Option[Int] = {
      while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
      val start = i
      while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
      if (i <= start || i >= bytes.length) None
      else scala.util.Try(new String(bytes, start, i - start, "US-ASCII").toInt).toOption
    }
    val parsed = for {
      w <- token(); h <- token(); maxval <- token()
      if w > 0 && h > 0 && maxval == 255
    } yield (w, h)
    parsed.flatMap { case (w, h) =>
      val rasterStart = i + 1 // single whitespace after maxval
      // long arithmetic: a hostile header like 46341x46341 overflows Int
      // (w*h < 0) and would skip the truncation check entirely
      if (w.toLong * h > Int.MaxValue ||
          (bytes.length - rasterStart).toLong < w.toLong * h) None
      else Some((w, h, rasterStart))
    }
  }

  /** REAL P5 decoder: container parse + single-pass pixel statistics.
    * Returns None on any malformed payload (wrong magic, bad dims,
    * truncation) — the per-row error handling a production decode needs.
    */
  def decodePgm(bytes: Array[Byte]): Option[PgmImage] =
    decodePgmRaster(bytes).map { case (w, h, rasterStart) =>
      var (sum, mn, mx, j) = (0L, 255, 0, rasterStart)
      val end = rasterStart + w * h
      while (j < end) {
        val p = bytes(j) & 0xFF
        sum += p; if (p < mn) mn = p; if (p > mx) mx = p
        j += 1
      }
      PgmImage(w, h, sum.toDouble / (w * h), mn, mx)
    }

  /** #46 mm_binary_columns — build the binary column + typed metadata from
    * `documents` (text bytes become the raster, wrapped in a real PGM
    * container; every 13th payload is truncated to exercise the error
    * path), run the batched decode per partition, return per-image stats +
    * metadata. The mapPartitions boundary is exactly where
    * `mapInPandas`/Arrow batching would sit in a Python pipeline; in Scala
    * the partition iterator IS the batch, so a decoder can amortize
    * codec/model setup per partition.
    */
  def binaryColumns(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val flat = t.documents.select(
        col("doc_id"),
        // constant pad, not the text itself: rpad with an empty pad string
        // returns the input unchanged, so an empty document would yield an
        // empty raster and crash encodePgm's size check
        encode(rpad(col("text"), 192, " "), "UTF-8").as("raster"),
        (lit(8) + col("doc_id") % 9).cast("int").as("width"),
        (lit(8) + col("doc_id") % 5).cast("int").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
    flat.mapPartitions { it =>
      // per-partition batch: a real decoder would init its codec once here
      it.map { case (id, raster, w, h) =>
        val payload = encodePgm(w, h, raster.take(w * h))
        val wire = if (id % 13 == 0) payload.take(payload.length / 2) else payload
        (id, wire.length, decodePgm(wire))
      }
    }.map { case (id, nBytes, img) =>
      (id, "pgm", nBytes, img.isDefined,
        img.map(_.width).getOrElse(-1), img.map(_.height).getOrElse(-1),
        img.map(i => math.floor(i.meanGray * 10000) / 10000).getOrElse(-1.0),
        img.map(_.minGray).getOrElse(-1), img.map(_.maxGray).getOrElse(-1))
    }.toDF("doc_id", "fmt", "n_bytes", "decode_ok",
        "width", "height", "mean_gray", "min_gray", "max_gray")
      .orderBy(col("doc_id"))
  }

  /** Frames sampled per video, whatever its length — the fan-out bound
    * that keeps frame rows proportional to the corpus, not to runtime.
    */
  val maxFramesPerVideo = 8

  /** Frame raster dims for the sampled-frame decode (16x9 grayscale). */
  val frameW = 16
  val frameH = 9

  /** The sampled frame's raster: the payload window at the frame's byte
    * offset, cyclically extended — the deterministic stand-in for what a
    * codec's SEEK + single-frame decode returns. A real sampler never
    * decodes the whole clip to sample 8 frames; it seeks per sampled
    * index, which is exactly the per-row work modeled here.
    */
  def frameRaster(payload: Array[Byte], frameIdx: Long): Array[Byte] = {
    val n = frameW * frameH
    val out = new Array[Byte](n)
    if (payload.isEmpty) return out
    var j = 0
    var src = ((frameIdx * 31) % payload.length).toInt
    while (j < n) {
      out(j) = payload(src)
      j += 1; src += 1
      if (src == payload.length) src = 0
    }
    out
  }

  /** mm_frame_sample — video frame sampling as a PLAN plus a REAL per-frame
    * decode: per clip, typed metadata (duration, fps) synthesized from the
    * binary stand-in, a bounded uniform frame-index `sequence` exploded
    * into one row per sampled frame, then each sampled frame's raster runs
    * through the SAME P5 container + `decodePgm` parser as
    * mm_binary_columns, emitting genuine raster statistics (mean/min/max
    * gray). Only the raster CONTENT is synthesized (`frameRaster` — the
    * codec seek boundary); the sampler's decisions and the decode are the
    * production shape, and explode keeps fan-out ≤ maxFramesPerVideo so a
    * 3-hour clip can't blow up a partition.
    */
  def frameSample(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
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
      .select(col("doc_id"), col("payload"), col("duration_ms"), col("fps"),
        col("n_frames"), col("frame_idx"))
      // spread the exploded frame axis before the per-frame decode: the
      // documents scan is a handful of input splits, and without this the
      // decode fold runs on those few partitions (measured single-threaded).
      // The EXPLICIT count matters: the shuffled rows are a few hundred KB,
      // so AQE would coalesce a column-only repartition back to one task —
      // the cost here is decode CPU per row, not bytes
      .repartition(spark.sparkContext.defaultParallelism,
        col("doc_id"), col("frame_idx"))
      .as[(Long, Array[Byte], Long, Int, Long, Long)]
      .mapPartitions { it =>
        // per-partition batch: a real decoder inits its codec once here
        it.map { case (id, payload, durMs, fps, nf, idx) =>
          val img = decodePgm(encodePgm(frameW, frameH, frameRaster(payload, idx)))
            .getOrElse(sys.error(s"frame decode failed for doc $id frame $idx"))
          (id, durMs, fps, nf, idx, idx * 1000 / fps,
            math.floor(img.meanGray * 10000) / 10000, img.minGray, img.maxGray)
        }
      }
      .toDF("doc_id", "duration_ms", "fps", "n_frames", "frame_idx",
        "frame_ts_ms", "mean_gray", "min_gray", "max_gray")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Audio chunk length (ms) for mm_audio_chunks. */
  val audioChunkMs = 5000L

  /** PCM sample rate (Hz) of the synthesized mono 8-bit track. */
  val audioSampleRate = 8000

  /** Per-chunk signal features over one pass of the chunk's PCM samples:
    * RMS level, peak amplitude, zero-crossing rate (signed 8-bit samples,
    * the three stats every audio-quality gate starts from).
    */
  final case class PcmFeatures(rms: Double, peak: Int, zcr: Double)

  /** One-pass PCM feature fold over signed 8-bit samples. */
  def pcmFeatures(samples: Array[Byte]): PcmFeatures = {
    if (samples.isEmpty) return PcmFeatures(0.0, 0, 0.0)
    var (sumSq, peak, crossings) = (0.0, 0, 0)
    var prev = 0
    var j = 0
    while (j < samples.length) {
      val s = samples(j).toInt
      sumSq += s.toDouble * s
      val a = math.abs(s); if (a > peak) peak = a
      if (j > 0 && ((s >= 0) != (prev >= 0))) crossings += 1
      prev = s
      j += 1
    }
    PcmFeatures(math.sqrt(sumSq / samples.length), peak,
      crossings.toDouble / samples.length)
  }

  /** LCG multiplier/increment: the published Numerical Recipes `ranqd1`
    * 32-bit generator (Press et al., 2nd ed. §7.1). 32-bit on purpose —
    * the closed-form state A^j·seed + C·S_j mod 2^32 stays inside signed
    * 64-bit intermediates, which is what lets the DuckDB oracle replay
    * every sample exactly (a 64-bit LCG forces 128-bit modmuls, measured
    * >600 s at sf0.01; this one replays in ~26 s).
    */
  val pcmLcgA = 1664525L
  val pcmLcgC = 1013904223L
  val pcmSeedDocMix = 2654435761L // Knuth multiplicative hash
  val pcmSeedMsMix = 40503L

  /** The chunk's PCM raster — a fast deterministic LCG seeded by
    * (doc_id, start_ms): the stand-in for what the audio codec's seek +
    * decode returns for that time window (same boundary argument as
    * `frameRaster`). Each sample is the state's top byte, the LCG's
    * strongest bits.
    */
  def chunkPcm(docId: Long, startMs: Long, nSamples: Int): Array[Byte] = {
    val out = new Array[Byte](nSamples)
    var state = (docId * pcmSeedDocMix + startMs * pcmSeedMsMix + 1L) & 0xFFFFFFFFL
    var j = 0
    while (j < nSamples) {
      state = (state * pcmLcgA + pcmLcgC) & 0xFFFFFFFFL
      out(j) = (state >>> 24).toByte
      j += 1
    }
    out
  }

  /** mm_audio_chunks — audio chunking as a PLAN plus REAL per-chunk signal
    * features: per track, fixed-length windows (the Whisper-style 5 s
    * chunk shape) generated with `sequence` + explode, then each chunk's
    * PCM raster (8 kHz mono 8-bit, synthesized at the codec-seek boundary)
    * folds to RMS / peak / zero-crossing rate in one pass. The last chunk
    * is clipped to the track end, exactly like a real chunker — its sample
    * count shrinks with it.
    */
  def audioChunks(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val durationMs = (lit(2500) + col("doc_id") % 17 * 1700).cast("long")
    t.documents
      .select(col("doc_id"), durationMs.as("duration_ms"))
      .withColumn("start_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(audioChunkMs))))
      .select(
        col("doc_id"), col("duration_ms"), col("start_ms"),
        least(col("start_ms") + audioChunkMs, col("duration_ms")).as("end_ms"))
      // spread the chunk axis: each chunk folds 40k PCM samples, and the
      // few documents input splits would otherwise serialize the decode
      // (measured 6.9 s single-threaded vs sub-second spread). Explicit
      // count — the rows are tiny, so AQE would coalesce a column-only
      // repartition back into one task; the cost is CPU, not bytes
      .repartition(spark.sparkContext.defaultParallelism,
        col("doc_id"), col("start_ms"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, durMs, startMs, endMs) =>
          val n = ((endMs - startMs) * audioSampleRate / 1000).toInt
          val f = pcmFeatures(chunkPcm(id, startMs, n))
          (id, durMs, startMs, endMs, n,
            math.floor(f.rms * 10000) / 10000, f.peak,
            math.floor(f.zcr * 10000) / 10000)
        }
      }
      .toDF("doc_id", "duration_ms", "start_ms", "end_ms", "n_samples",
        "rms", "peak", "zcr")
      .orderBy(col("doc_id"), col("start_ms"))
  }

  /** dHash grid: `dhashRows` sample rows × `dhashCols` sample columns,
    * each row contributing `dhashCols - 1` horizontal-gradient bits —
    * 7×8 = 56 bits, which keeps every band-shift and the SQL oracle's
    * power-of-two sum inside a signed 64-bit integer (the same reason
    * simhash is 60-bit).
    */
  val dhashRows = 7
  val dhashCols = 9
  val dhashBits: Int = dhashRows * (dhashCols - 1)

  /** Hamming threshold for "near-duplicate image" pairs. */
  val dhashMaxHamming = 8

  /** Difference hash over a decoded raster (the classic perceptual image
    * fingerprint): nearest-neighbor downsample to the `dhashRows` ×
    * `dhashCols` grid — sample point (r, c) reads pixel
    * (r·(h−1) div (rows−1), c·(w−1) div (cols−1)), valid for any w, h ≥ 1
    * — then bit r·8+c is set iff grid(r, c) > grid(r, c+1). Gradient
    * signs survive brightness/contrast shifts, which is what makes dHash
    * a near-dup detector rather than an exact checksum.
    */
  def dhash56(w: Int, h: Int, raster: Array[Byte], off: Int): Long = {
    var hash = 0L
    var r = 0
    while (r < dhashRows) {
      val py = r * (h - 1) / (dhashRows - 1)
      var prev = raster(off + py * w) & 0xFF
      var c = 0
      while (c < dhashCols - 1) {
        val px = (c + 1) * (w - 1) / (dhashCols - 1)
        val cur = raster(off + py * w + px) & 0xFF
        if (prev > cur) hash |= 1L << (r * (dhashCols - 1) + c)
        prev = cur
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Per-image perceptual hashes over the SAME payload synthesis and the
    * SAME real container-parse path as `binaryColumns` (no truncated
    * wires here — the hash table is built from admitted, decodable
    * images). Takes ANY documents frame — batch (`dhashDocs`) and the
    * streaming admission gate share this ONE definition, so the
    * fingerprint can never drift between them.
    */
  def dhashFrame(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        encode(rpad(col("text"), 192, " "), "UTF-8").as("raster"),
        (lit(8) + col("doc_id") % 9).cast("int").as("width"),
        (lit(8) + col("doc_id") % 5).cast("int").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, raster, w, h) =>
          val payload = encodePgm(w, h, raster.take(w * h))
          val (pw, ph, off) = decodePgmRaster(payload)
            .getOrElse(sys.error(s"pgm decode failed for doc $id"))
          (id, dhash56(pw, ph, payload, off))
        }
      }
      .toDF("doc_id", "dhash")
  }

  def dhashDocs(t: Tables): DataFrame = dhashFrame(t.documents)

  /** mm_phash_dedup — perceptual-hash image dedup, the image face of the
    * dedup family: decode every image (real P5 parse), fingerprint with
    * dHash, band the 56-bit hash into 4×14-bit chunks, bucket-join, exact
    * hamming (bit_count of xor) within buckets — the same candidate
    * discipline as `dedup_simhash` (shared `Dedup.bandedNearCandidates`,
    * including the `bandBucketCap` occupancy ceiling + sub-band
    * refinement over the complementary 42 bits), so pair work is bounded
    * by bucket occupancy even when a degenerate image floods a band
    * bucket, never N². Per-doc output (hash + near-pair count).
    *
    * HASH-CHECKED, not rows-only: the raster bytes are the padded ASCII
    * text, so the DuckDB oracle replays the decode+downsample+gradient
    * pipeline through character codes — the first mm operator whose full
    * output the oracle verifies bit-for-bit.
    */
  def phashDedup(t: Tables, cap: Int = Dedup.bandBucketCap): DataFrame = {
    val docs = dhashDocs(t)
    // shared banding discipline with dedup_simhash: 4×14-bit bands,
    // buckets above the occupancy ceiling refined by sub-bands over the
    // complementary 42 bits (Dedup.bandedNearCandidates' contract — the
    // hamming-≤3 pigeonhole guarantee survives the cap)
    val near = Dedup.bandedNearCandidates(docs, "dhash", dhashBits, cap)
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= dhashMaxHamming)
    val nNear = near.select(col("da").as("doc_id"))
      .union(near.select(col("db").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
    docs.join(nNear, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dhash"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy(col("doc_id"))
  }
}
