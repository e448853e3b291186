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
}
