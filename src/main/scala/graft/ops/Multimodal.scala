package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus partition-wise decode/featurize.
  *
  * The Spark-side plumbing (schema, batch shape, partitioning, typed
  * mapPartitions — the Scala analogue of a Pandas-UDF/mapInPandas stage) is
  * real and tested; ONLY the codec call inside `decodeStub` is a
  * deterministic fake, because no image/audio libraries ship in this
  * container. Swapping in a real decoder changes one function.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int)
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      meta: MediaMeta,
      ts: Timestamp
  )
  final case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      histogram: Array[Float] // 16-bin byte histogram (stub featurizer)
  )
  final case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      frame_hash: Long
  )

  /** Deterministic synthetic media (no external data): payload bytes are a
    * seeded function of media_id, sized by kind.
    */
  def generate(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 256 + (id % 7L).toInt * 128
      val bytes = Array.tabulate[Byte](len) { i =>
        (((id * 31 + i) * 2654435761L) >>> 24).toByte
      }
      val meta = kind match {
        case "image" => MediaMeta(64 + (id % 4).toInt * 32, 64, 0)
        case "audio" => MediaMeta(0, 0, 16000)
        case _       => MediaMeta(128, 72, 0)
      }
      MediaRow(id, kind, bytes, meta, new Timestamp(1700000000000L + id * 1000))
    }
  }

  /** STUB decode: a real implementation calls the codec here (e.g. JPEG →
    * pixels). The fake is a byte histogram — deterministic, shape-correct.
    */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xFF) >> 4) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { hist(j) /= math.max(bytes.length, 1).toFloat; j += 1 }
    hist
  }

  /** Partition-wise featurize (the mapInPandas-shaped stage): each task
    * processes its partition's rows as a batch; no shuffle.
    */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeature(r.media_id, r.kind, r.bytes.length.toLong,
          decodeStub(r.bytes))
      }
    }
  }

  /** Frame sampling for video-ish payloads: slice the payload into
    * `nFrames` chunks, fingerprint each (posexplode keeps it columnar).
    */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val chunk = (octet_length(col("bytes")) / nFrames).cast("int")
    media
      .filter(col("kind") === "video")
      .select(
        col("media_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(nFrames - 1)),
            i => xxhash64(substring(col("bytes"), (i * chunk) + 1, chunk))
          )
        ).as(Seq("frame_idx", "frame_hash"))
      )
  }
}
