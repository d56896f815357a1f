package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio payloads travel as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded batches
  * (mapPartitions — the Scala analog of mapInPandas: one iterator pass,
  * constant memory, no driver involvement).
  *
  * The container ships no image/audio codecs, so the formats are the
  * CODEC-FREE ones a pure JVM can encode AND decode exactly: binary PPM
  * (P6), uncompressed 24-bit BMP (BITMAPINFOHEADER, padded bottom-up rows),
  * and 16-bit PCM WAV (RIFF). The decoder below is a real byte-level parser
  * of those containers — header magic dispatch, little-endian field reads,
  * PPM ASCII-header tokenizing — not a stub; swapping in a JPEG/FLAC
  * library later changes [[decode]]'s dispatch table only.
  */
object Multimodal {

  /** media row: payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: Map[String, String])

  /** extracted features: image fields null for audio and vice versa. */
  final case class MediaFeatures(
      media_id: Long, kind: String, byte_len: Long,
      width: Option[Int], height: Option[Int], channels: Option[Int],
      sample_rate: Option[Int], n_samples: Option[Long])

  // ------------------------------------------------------------- encoders

  /** binary PPM (P6): ASCII header `P6\n<w> <h>\n255\n` + w*h*3 RGB bytes. */
  def encodePpm(w: Int, h: Int, seed: Long): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h * 3) { out(header.length + i) = graft.util.Rand.mix(seed, 21, i).toByte; i += 1 }
    out
  }

  private def putLeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def putLeShort(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** uncompressed 24-bit BMP: 14-byte file header + 40-byte info header +
    * bottom-up rows padded to 4 bytes. */
  def encodeBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLeInt(out, 2, 54 + dataSize) // file size
    putLeInt(out, 10, 54)           // pixel-data offset
    putLeInt(out, 14, 40)           // BITMAPINFOHEADER size
    putLeInt(out, 18, w)
    putLeInt(out, 22, h)
    putLeShort(out, 26, 1)          // planes
    putLeShort(out, 28, 24)         // bits per pixel
    putLeInt(out, 34, dataSize)
    var i = 0
    while (i < dataSize) { out(54 + i) = graft.util.Rand.mix(seed, 22, i).toByte; i += 1 }
    out
  }

  /** 16-bit PCM WAV: canonical 44-byte RIFF/fmt/data layout. */
  def encodeWav(channels: Int, sampleRate: Int, nSamples: Long, seed: Long): Array[Byte] = {
    val dataSize = (nSamples * channels * 2).toInt
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLeInt(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLeInt(out, 16, 16)            // fmt chunk size
    putLeShort(out, 20, 1)           // PCM
    putLeShort(out, 22, channels)
    putLeInt(out, 24, sampleRate)
    putLeInt(out, 28, sampleRate * channels * 2) // byte rate
    putLeShort(out, 32, channels * 2)            // block align
    putLeShort(out, 34, 16)                      // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLeInt(out, 40, dataSize)
    var i = 0
    while (i < dataSize) { out(44 + i) = graft.util.Rand.mix(seed, 23, i).toByte; i += 1 }
    out
  }

  // -------------------------------------------------------------- decoder

  /** Byte-level container parse by magic: PPM (P6), BMP, WAV. Malformed or
    * unknown payloads yield kind="unknown" with only byte_len set — the
    * dead-letter-friendly shape (never throws on data). */
  def decode(mediaId: Long, bytes: Array[Byte]): MediaFeatures = {
    def unknown = MediaFeatures(mediaId, "unknown", bytes.length.toLong,
      None, None, None, None, None)
    try {
      if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') {
        // tokenize the ASCII header: P6, width, height, maxval
        var i = 2; val tokens = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (tokens.length < 3 && i < bytes.length) {
          while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
          var v = -1L
          while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
            v = math.max(v, 0L) * 10 + (bytes(i) - '0'); i += 1
          }
          if (v >= 0) tokens += v else i += 1
        }
        if (tokens.length < 3) return unknown
        val (w, h) = (tokens(0).toInt, tokens(1).toInt)
        MediaFeatures(mediaId, "image_ppm", bytes.length.toLong,
          Some(w), Some(h), Some(3), None, None)
      } else if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') {
        val w = leInt(bytes, 18); val h = leInt(bytes, 22)
        val bpp = leShort(bytes, 28)
        MediaFeatures(mediaId, "image_bmp", bytes.length.toLong,
          Some(w), Some(h), Some(bpp / 8), None, None)
      } else if (bytes.length >= 44 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E') {
        val channels = leShort(bytes, 22)
        val rate = leInt(bytes, 24)
        val bytesPerSample = leShort(bytes, 34) / 8
        val dataSize = leInt(bytes, 40).toLong
        val n = if (channels > 0 && bytesPerSample > 0)
          dataSize / (channels * bytesPerSample) else 0L
        MediaFeatures(mediaId, "audio_wav", bytes.length.toLong,
          None, None, Some(channels), Some(rate), Some(n))
      } else unknown
    } catch { case _: Exception => unknown }
  }

  /** Deterministic synthetic media across all three real containers. */
  def genMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n.toLong).map { i =>
      val w = 16 + graft.util.Rand.nextInt(seed, 10, i, 48)
      val h = 16 + graft.util.Rand.nextInt(seed, 11, i, 48)
      i % 3 match {
        case 0 => MediaRow(i, "image_ppm", encodePpm(w, h, seed + i), Map("container" -> "ppm"))
        case 1 => MediaRow(i, "image_bmp", encodeBmp(w, h, seed + i), Map("container" -> "bmp"))
        case _ =>
          val ch = 1 + graft.util.Rand.nextInt(seed, 12, i, 2)
          val rate = 8000 + 100 * graft.util.Rand.nextInt(seed, 13, i, 5)
          MediaRow(i, "audio_wav", encodeWav(ch, rate, 64 + (i % 128), seed + i),
            Map("container" -> "wav"))
      }
    }
  }

  /** Partition-wise decode/feature-extract: one pass, bounded memory, no
    * driver involvement — the shape a real 100 TB media pipeline needs. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r => decode(r.media_id, r.bytes)))
  }

  /** Declarative slice: metadata stats straight off the binary column —
    * stays in codegen, no decode needed. */
  def sizeStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      sum(length(col("bytes"))).as("total_bytes"),
      max(length(col("bytes"))).as("max_bytes"))
}
