package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batched inside `mapPartitions` with an executor-pinned "codec" session —
  * the same execution shape as the ONNX NER stage. The actual decoder is a
  * STUB (no media libs in this container): [[StubCodec]] produces
  * deterministic fake frames from the bytes, while the Spark-side schema,
  * partitioning, batch shape and session lifecycle are real and tested.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaMeta(doc_id: Long, n_bytes: Long, n_frames: Long,
      feature_hash: Long)

  /** Executor-pinned decoder session (one per JVM — the analogue of an
    * ONNX/ffmpeg context). Real implementation would lazily load native
    * codecs here. */
  final class StubCodec {
    val FrameSize = 128
    /** "Decode" payload into frames: deterministic slices of the bytes. */
    def decodeFrames(payload: Array[Byte]): Iterator[Array[Byte]] =
      payload.grouped(FrameSize)
    /** "Feature-extract" a frame: deterministic 64-bit digest standing in
      * for an embedding (the real path would run a vision/audio model). */
    def features(frame: Array[Byte]): Long = {
      var h = 1469598103934665603L
      var i = 0
      while (i < frame.length) { h ^= frame(i); h *= 1099511628211L; i += 1 }
      h
    }
  }

  private object CodecHolder {
    lazy val codec = new StubCodec // lazy ⇒ one per executor JVM
  }

  /** Synthesize the binary column deterministically from text (the corpus
    * has no real media; production reads the bytes from the lake). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, t) =>
        MediaRow(id, t.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          "application/octet-stream")
      }
      .toDF()
  }

  /** The decode/feature stage: batched per partition, session pinned per
    * executor, emits typed metadata rows. */
  def extractMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = CodecHolder.codec
        it.map { case (id, payload) =>
          var frames = 0L
          var featHash = 0L
          codec.decodeFrames(payload).foreach { f =>
            frames += 1
            featHash ^= codec.features(f)
          }
          MediaMeta(id, payload.length.toLong, frames, featHash)
        }
      }
      .toDF()
      .orderBy($"doc_id")
  }
}
