package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Ids

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata (builder-prompt requirement).
  *
  * The DECODE step is a clearly-marked STUB (no codec libraries ship in
  * this container): [[decodeStub]] produces a deterministic fake feature
  * vector from the bytes. Everything Spark-side is real and tested —
  * schema, batched mapPartitions shape (the Scala analogue of
  * mapInPandas: fixed-size batches through the per-partition iterator),
  * partition balancing, and the downstream feature-vector contract
  * (Array[Float], ready for the similarity operators).
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Float])

  val featureDim = 16
  val batchSize = 64

  /** STUB: deterministic fake decoder. A production build replaces this
    * with a real codec call; the signature (bytes -> float features) and
    * everything around it stay unchanged.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < payload.length) { h = Ids.mix64(h ^ payload(i)); i += 1 }
    var d = 0
    while (d < featureDim) {
      out(d) = ((Ids.mix64(h, d) >>> 40).toFloat / (1 << 24)) - 0.5f
      d += 1
    }
    out
  }

  /** Batched featurization: fixed-size batches through each partition
    * iterator (the mapInPandas batch shape), repartitioned by media_id
    * so decode work balances even when payload sizes skew.
    */
  def featurize(media: Dataset[MediaRow], partitions: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(partitions, col("media_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized decoder would be invoked
          batch.iterator.map { m =>
            MediaFeatures(m.media_id, m.kind, m.payload.length, decodeStub(m.payload))
          }
        }
      }
  }

  /** Video frame sampling STUB: real impl seeks keyframes; here the
    * payload is sliced deterministically every `stride` bytes into
    * `nFrames` pseudo-frames. The operator shape (one row in, n typed
    * frame rows out = flatMap/explode) is the real contract.
    */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val stride = math.max(1, m.payload.length / math.max(nFrames, 1))
      (0 until math.min(nFrames, m.payload.length)).map { f =>
        val start = f * stride
        val end = math.min(start + stride, m.payload.length)
        (m.media_id, f, m.payload.slice(start, end))
      }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }

  /** Demo media table derived from the fixture pages' html bytes. */
  def mediaFromPages(spark: SparkSession, pages: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    pages.select(
      xxhash64(col("url")).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col("url")), lit(3L)) + 1).cast("int")).as("kind"),
      col("html").as("payload"),
      lit(640).as("width"),
      lit(480).as("height"))
      .as[MediaRow]
  }

  /** Media table over the driver `documents` fixture: doc text bytes as
    * the opaque payload (string -> binary cast = UTF-8), doc_id as the
    * media id — the driver-table entry point for the multimodal ->
    * featurize -> ANN composition (q78).
    */
  def mediaFromDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      lit(640).as("width"),
      lit(480).as("height"))
      .as[MediaRow]
  }
}
