package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * North-star extension surface (SURVEY.md §2.4). The actual codec work
  * (JPEG decode, resampling, frame sampling) needs native libraries that are
  * NOT in this environment — those steps are STUBBED with a deterministic
  * fake (clearly marked below). Everything Spark-side is real and tested:
  * schema, binary packing, partition-batched processing shape, and the
  * feature-extraction dataflow.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(kind: String, width: Int, height: Int, sampleRateHz: Int)

  case class MediaRecord(media_id: Long, meta: MediaMeta, content: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      // STUB output: a real decoder would emit e.g. CLIP features here.
      feature: Array[Float])

  /** Pack any DataFrame with an id and a binary-castable payload column into
    * the canonical media schema. */
  def pack(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      struct(
        lit(kind).as("kind"),
        lit(0).as("width"),
        lit(0).as("height"),
        lit(0).as("sampleRateHz")).as("meta"),
      col(payloadCol).cast("binary").as("content"))

  /** ======================= STUB =======================
    * Deterministic fake decode: real implementation would decode the payload
    * with a native codec (libjpeg/ffmpeg) here, inside mapPartitions so the
    * codec context is reused across a batch. The fake derives features from
    * the byte content only — stable across runs/partitionings, so the
    * pipeline around it is fully testable.
    * ==================================================== */
  private def stubDecode(content: Array[Byte], dims: Int): Array[Float] = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < content.length) { h = (h ^ content(i)) * 0x100000001B3L; i += 1 }
    val out = new Array[Float](dims)
    var d = 0
    var z = h
    while (d < dims) {
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      out(d) = ((z >>> 40).toInt & 0xFFFF) / 65535.0f
      d += 1
    }
    out
  }

  private def checksum(content: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < content.length) { h = (h ^ content(i)) * 0x100000001B3L; i += 1 }
    h
  }

  /** Per-partition batched feature extraction. The mapPartitions boundary is
    * where a real decoder would amortize codec/model setup per batch (same
    * shape a Pandas-UDF `mapInPandas` pipeline has in PySpark). */
  def extractFeatures(records: Dataset[MediaRecord], dims: Int = 8): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real impl: open codec once here, close at iterator end
      it.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          kind = r.meta.kind,
          n_bytes = r.content.length.toLong,
          checksum = checksum(r.content),
          feature = stubDecode(r.content, dims))
      }
    }
  }

  /** End-to-end demo pipeline over the documents table: text bytes stand in
    * for an opaque payload; outputs are deterministic and partially
    * SQL-checkable (n_bytes). */
  def documentMediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val packed = pack(docs, "doc_id", "text", "text/plain")
    val records = packed.as[MediaRecord]
    extractFeatures(records).toDF()
  }
}
