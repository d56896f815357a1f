package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads travel as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`decodeStub`) — it parses a tiny fake
  * header instead of pixels. Everything AROUND the decode is the real Spark
  * plumbing this operator is about: the binary-column schema, partition-wise
  * batched processing via mapPartitions (the Scala analog of mapInPandas —
  * one iterator pass, constant memory), and a typed feature-struct output
  * that downstream relational operators consume.
  */
object Multimodal {

  /** media row: payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: Map[String, String])

  /** extracted features (what a real decoder would emit). */
  final case class MediaFeatures(media_id: Long, kind: String, byteLen: Int,
      width: Int, height: Int, channels: Int, contentHash: Long)

  /** Deterministic synthetic media: an 8-byte fake header (width, height,
    * channels, kind tag) followed by pseudo-random payload bytes. */
  def genMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n.toLong).map { i =>
      val w = 16 + graft.util.Rand.nextInt(seed, 10, i, 64)
      val h = 16 + graft.util.Rand.nextInt(seed, 11, i, 64)
      val c = 1 + graft.util.Rand.nextInt(seed, 12, i, 3)
      val kinds = Array("image", "audio", "video")
      val kind = kinds(graft.util.Rand.nextInt(seed, 13, i, 3))
      val payloadLen = 64 + graft.util.Rand.nextInt(seed, 14, i, 192)
      val bytes = new Array[Byte](8 + payloadLen)
      bytes(0) = (w >> 8).toByte; bytes(1) = w.toByte
      bytes(2) = (h >> 8).toByte; bytes(3) = h.toByte
      bytes(4) = c.toByte; bytes(5) = kind.length.toByte
      var j = 0
      while (j < payloadLen) { bytes(8 + j) = graft.util.Rand.mix(seed, 15, i * 1000 + j).toByte; j += 1 }
      MediaRow(i, kind, bytes, Map("codec" -> "fake", "src" -> s"gen-$i"))
    }
  }

  /** ??? REAL DECODER GOES HERE ??? — the container ships no codecs, so this
    * stub "decodes" the deterministic fake header. Swap the body for an
    * actual image/audio library call; the partitioning, batching, and output
    * schema stay identical. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val w = ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)
    val h = ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val c = bytes(4) & 0xff
    (w, h, c)
  }

  /** Partition-wise decode/feature-extract: one pass, bounded memory, no
    * driver involvement — the shape a real 100 TB media pipeline needs. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = decodeStub(r.bytes)
        var hash = 0xcbf29ce484222325L
        var i = 0
        while (i < r.bytes.length) { hash ^= r.bytes(i); hash *= 0x100000001b3L; i += 1 }
        MediaFeatures(r.media_id, r.kind, r.bytes.length, w, h, c, hash)
      }
    }
  }

  /** Declarative slice: metadata stats straight off the binary column —
    * stays in codegen, no decode needed. */
  def sizeStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      sum(length(col("bytes"))).as("total_bytes"),
      max(length(col("bytes"))).as("max_bytes"))
}
