package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder-prompt "Multimodal columns"): media
  * as opaque `binary` columns + typed metadata, processed in batched
  * per-partition passes.
  *
  * The decode step is a clearly marked deterministic STUB — the container
  * has no image/audio codecs — but the Spark-side shape is real: binary
  * column in, `mapPartitions` batch processing (the Scala analog of a
  * batched `mapInPandas` decode), typed struct schema out, partition count
  * preserved. Swap `decodeStub` for a real codec and nothing else changes.
  */
object MultimodalOps {

  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, checksum: Long,
      head_hex: String, width: Int, height: Int, n_frames: Int)

  /** STUB decoder: a real build would parse image/audio headers here
    * (??? in spirit). Deterministic fake dimensions derived from content. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) =
    ((bytes.length % 64) + 1, ((bytes.length / 64) % 64) + 1)

  /** Binary "media" pipeline: bytes → per-partition batched decode →
    * typed metadata + fixed-rate frame sampling count. */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frameBytes = 256 // STUB frame = 256-byte chunk
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h) = decodeStub(bytes)
          var sum = 0L
          bytes.foreach(b => sum = sum * 31 + (b & 0xff))
          MediaMeta(id, bytes.length.toLong, sum,
            bytes.take(8).map(b => f"$b%02x").mkString,
            w, h, (bytes.length + frameBytes - 1) / frameBytes)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> (multimodalDecode _)
  )

  val oracle: Map[String, String] = Map.empty
}
