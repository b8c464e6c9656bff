package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus partition-wise decode/featurize.
  *
  * The container-level decode is REAL: [[decodeMeta]] parses PNG (signature
  * + IHDR chunk, CRC-checked) and WAV (RIFF/WAVE fmt chunk walk) headers
  * from raw bytes with zero dependencies — pure-JVM byte parsing. What
  * remains out of scope is pixel/sample decompression of the payload
  * (zlib IDAT inflate, codec frames): no media libraries ship in this
  * container, so [[byteHistogram]] is the content featurizer — an honest
  * byte-level statistic, not a fake decode.
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
      histogram: Array[Float] // 16-bin byte histogram (content statistic)
  )
  final case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      frame_hash: Long
  )

  /** Parsed container metadata; fields that do not apply to the detected
    * format are None (e.g. width for WAV). `format` is `png` / `wav` /
    * `unknown` — unknown means the bytes failed signature or structural
    * validation (including a bad IHDR CRC), never a silent guess.
    */
  final case class MediaDecoded(
      media_id: Long,
      format: String,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      sample_rate: Option[Int],
      bit_depth: Option[Int]
  )

  // ------------------------------------------------------------- encoders

  private val pngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def crc32(bytes: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue.toInt
  }

  /** Deterministic pseudo-random payload bytes (NOT a valid container). */
  def opaqueBytes(seed: Long, len: Int): Array[Byte] =
    Array.tabulate[Byte](len)(i => (((seed * 31 + i) * 2654435761L) >>> 24).toByte)

  /** A minimal, spec-correct PNG: signature, IHDR (with real CRC32), one
    * IDAT chunk of deterministic (not zlib-valid) payload bytes, IEND.
    * Spec: PNG 1.2 §3 (8-byte signature), §4.1.1 (IHDR layout:
    * width/height as big-endian u32, then bit depth, color type,
    * compression, filter, interlace).
    */
  def encodePng(width: Int, height: Int, bitDepth: Int, colorType: Int,
      seed: Long): Array[Byte] = {
    val ihdrBody = be32(width) ++ be32(height) ++
      Array(bitDepth.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
    val ihdr = "IHDR".getBytes("US-ASCII") ++ ihdrBody
    val idatPayload = opaqueBytes(seed, 64)
    val idat = "IDAT".getBytes("US-ASCII") ++ idatPayload
    val iend = "IEND".getBytes("US-ASCII")
    pngSig ++
      be32(13) ++ ihdr ++ be32(crc32(ihdr)) ++
      be32(idatPayload.length) ++ idat ++ be32(crc32(idat)) ++
      be32(0) ++ iend ++ be32(crc32(iend))
  }

  /** A minimal, spec-correct PCM WAV: RIFF header, canonical 16-byte
    * `fmt ` chunk (audio format 1 = PCM, channels/sample-rate/byte-rate/
    * block-align/bits-per-sample little-endian), one `data` chunk of
    * deterministic payload bytes.
    */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nDataBytes: Int, seed: Long): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(bitsPerSample)
    val data = "data".getBytes("US-ASCII") ++ le32(nDataBytes) ++
      opaqueBytes(seed, nDataBytes)
    val riffLen = 4 + fmt.length + data.length
    "RIFF".getBytes("US-ASCII") ++ le32(riffLen) ++
      "WAVE".getBytes("US-ASCII") ++ fmt ++ data
  }

  // -------------------------------------------------------------- decoder

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def asciiAt(b: Array[Byte], off: Int, s: String): Boolean =
    off >= 0 && off + s.length <= b.length &&
      s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  /** REAL container-header parse: PNG signature + IHDR (CRC-verified) or
    * RIFF/WAVE chunk walk to `fmt `. Returns format `unknown` on any
    * structural failure — wrong magic, truncated header, bad CRC, missing
    * fmt chunk, non-positive dimensions.
    */
  def decodeMeta(id: Long, bytes: Array[Byte]): MediaDecoded = {
    def unknown = MediaDecoded(id, "unknown", None, None, None, None, None)
    if (bytes.length >= 33 && bytes.take(8).sameElements(pngSig)) {
      // first chunk must be IHDR with length 13 (PNG 1.2 §4.1.1)
      if (readBe32(bytes, 8) != 13 || !asciiAt(bytes, 12, "IHDR")) unknown
      else {
        val expected = crc32(bytes.slice(12, 29))
        if (readBe32(bytes, 29) != expected) unknown
        else {
          val w = readBe32(bytes, 16)
          val h = readBe32(bytes, 20)
          if (w <= 0 || h <= 0) unknown
          else MediaDecoded(id, "png", Some(w), Some(h), None, None,
            Some(bytes(24) & 0xff))
        }
      }
    } else if (bytes.length >= 12 && asciiAt(bytes, 0, "RIFF") &&
      asciiAt(bytes, 8, "WAVE")) {
      // walk chunks until `fmt ` (chunks are [id:4][size:LE32][body], even-padded)
      var off = 12
      var out: Option[MediaDecoded] = None
      while (out.isEmpty && off + 8 <= bytes.length) {
        val size = readLe32(bytes, off + 4)
        // a crafted negative size would walk the offset BACKWARD forever
        if (size < 0) return unknown
        if (asciiAt(bytes, off, "fmt ") && size >= 16 &&
          off + 8 + 16 <= bytes.length) {
          val channels = readLe16(bytes, off + 10)
          val rate = readLe32(bytes, off + 12)
          val bits = readLe16(bytes, off + 22)
          out =
            if (channels <= 0 || rate <= 0 || bits <= 0) Some(unknown)
            else Some(MediaDecoded(id, "wav", None, None, Some(channels),
              Some(rate), Some(bits)))
        } else {
          // advance in Long: a size near Int.MaxValue wraps `off + 8 +
          // size` negative in Int math and the next probe would index out
          // of bounds — structural garbage must decode as `unknown`
          val next = off.toLong + 8L + size.toLong + (size & 1)
          if (next > bytes.length || next <= off) return unknown
          off = next.toInt
        }
      }
      out.getOrElse(unknown)
    } else unknown
  }

  /** Partition-wise container decode over a (media_id, bytes) frame — the
    * mapInPandas-shaped stage: each task decodes its partition as a batch,
    * no shuffle.
    */
  def decodeTable(media: DataFrame): Dataset[MediaDecoded] = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decodeMeta(id, b) })
  }

  /** Deterministic synthetic media (no external data): image/audio rows
    * carry REAL containers (PNG/WAV with parseable headers); video stays
    * an opaque payload (the frame-sampling target).
    */
  def generate(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 256 + (id % 7L).toInt * 128
      val meta = kind match {
        case "image" => MediaMeta(64 + (id % 4).toInt * 32, 64, 0)
        case "audio" => MediaMeta(0, 0, 16000)
        case _       => MediaMeta(128, 72, 0)
      }
      val bytes = kind match {
        case "image" => encodePng(meta.width, meta.height, 8, 2, id)
        case "audio" => encodeWav(meta.sampleRate, 1, 16, len, id)
        case _       => opaqueBytes(id, len)
      }
      MediaRow(id, kind, bytes, meta, new Timestamp(1700000000000L + id * 1000))
    }
  }

  /** Byte-level content featurizer: normalized 16-bin histogram of the raw
    * payload. (Pixel/sample-level features need a decompressor — not
    * available here; the histogram is a real statistic of real bytes.)
    */
  private def byteHistogram(bytes: Array[Byte]): Array[Float] = {
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
          byteHistogram(r.bytes))
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
