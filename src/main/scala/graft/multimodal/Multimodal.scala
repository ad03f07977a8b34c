package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY columns
 * with typed metadata, plus a batched decode/feature-extract stage.
 *
 * The Spark-side shape is real and tested — schema, partitioning, batch
 * iteration via `mapPartitions` (the Scala analogue of `mapInPandas`:
 * one iterator per partition, decode amortized across the batch). The
 * actual codec is STUBBED (`StubDecoder`) because no image/audio
 * libraries ship in this environment; swapping in a real decoder is a
 * one-function change and nothing in the plan changes.
 *
 * Scale notes: binary payloads ride the normal columnar path (parquet
 * BINARY), decode is embarrassingly parallel per partition, and feature
 * vectors come out as ARRAY<FLOAT> ready for [[graft.ml.Similarity]].
 */
object Multimodal {

  case class MediaItem(
      media_id: Long,
      media_type: String,   // "image" | "audio" | "video"
      payload: Array[Byte], // opaque encoded bytes
      width: Int,
      height: Int)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      feature: Array[Float])

  /** Deterministic fake decode: byte histogram moments. A real decoder
    * (JPEG → pixels → model features) replaces ONLY this function. */
  def stubDecode(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched decode stage: one decoder instance per partition, streamed
    * over the iterator — the mapInPandas-equivalent shape. */
  def extractFeatures(items: Dataset[MediaItem], dims: Int = 8): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition decoder init would go here (model load, codec ctx)
      it.map { m =>
        MediaFeatures(m.media_id, m.media_type, m.payload.length.toLong,
          stubDecode(m.payload, dims))
      }
    }
  }

  case class Frame(
      media_id: Long,
      frame_idx: Long,
      payload: Array[Byte])

  /**
   * Frame sampling (video → every `everyN`-th frame): the one-to-many
   * decode shape. Frames here are fixed-size payload chunks (the stub
   * codec); a real demuxer replaces only the chunking. `flatMap` keeps
   * it fully parallel and lets downstream per-frame decode fan out.
   */
  def frameSample(items: Dataset[MediaItem], frameBytes: Int, everyN: Int): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.collect {
        case (bytes, i) if i % everyN == 0 => Frame(m.media_id, i.toLong, bytes)
      }
    }
  }

  /** Resize stub: metadata transform + deterministic payload rewrite
    * (truncate/pad to the target byte budget — a real scaler replaces
    * only this kernel; the plan shape is an embarrassingly parallel
    * `map`). */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.map { m =>
      val budget = math.max(1, w * h / 64)
      val p = if (m.payload.length >= budget) m.payload.take(budget)
              else m.payload ++ Array.fill[Byte](budget - m.payload.length)(0)
      MediaItem(m.media_id, m.media_type, p, w, h)
    }
  }

  /** Demo corpus: documents' text bytes standing in for encoded media. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("media_type"),
        col("text").cast("binary").as("payload"),
        lit(64).as("width"),
        lit(64).as("height"))
      .as[MediaItem]
  }
}
