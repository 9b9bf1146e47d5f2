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

  /** Fixed-rate FRAME SAMPLING over the binary "video" column: each doc's
    * bytes are a stream of 64-byte frames; every 2nd frame is sampled and
    * fingerprinted. The shape is the real one — binary column in, a narrow
    * per-row explode of sampled offsets (no shuffle until the final sort),
    * `substring`/`md5` running ON the binary — and because the synthetic
    * media is deterministic UTF-8, the frame hashes are DuckDB-expressible,
    * so this multimodal key is hash-checked end-to-end (the decode stub
    * above stays the only unverifiable step in the family). */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    val frameBytes = 64
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .withColumn("n", length(col("media")).cast("long"))
      .withColumn("n_frames", expr(s"(n + ${frameBytes - 1}) div $frameBytes"))
      // sample ordinals 0..(n_frames-1)/2 → frames 0, 2, 4, …
      .select(col("doc_id"), col("media"), col("n"),
        explode(expr("sequence(CAST(0 AS BIGINT), (n_frames - 1) div 2)")).as("i"))
      .select(col("doc_id"),
        (col("i") * 2).as("frame_idx"),
        (col("i") * 2 * frameBytes).as("off"),
        least(lit(frameBytes.toLong), col("n") - col("i") * 2 * frameBytes).as("flen"),
        md5(expr(s"substring(media, i * 2 * $frameBytes + 1, $frameBytes)")).as("fhash"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Per-modality dataset manifest + shard plan — the bookkeeping pass a
    * media corpus needs before any distributed decode: item/byte counts,
    * the largest blob (decode-memory sizing), distinct-content count
    * (storage dedup potential), and the output shard count at a fixed
    * byte budget. One narrow projection (bytes never leave their
    * partition; only per-group counters shuffle) feeding a
    * map-side-combining aggregation over |modalities| groups. The 16 KiB
    * budget is fixture-scaled — production uses ~1 GiB; only the constant
    * changes. */
  def multimodalManifest(s: SparkSession, dir: String): DataFrame = {
    val budget = 16384L
    Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        sha2(col("text"), 256).as("chash"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("modality"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_items"),
        sum(length(col("media"))).cast("long").as("total_bytes"),
        max(length(col("media"))).cast("long").as("max_bytes"),
        count_distinct(col("chash")).as("n_distinct_content"))
      .withColumn("n_shards", expr(s"(total_bytes + ${budget - 1}) div $budget"))
      .orderBy(col("modality"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_framesample" -> (frameSample _),
    "multimodal_manifest" -> (multimodalManifest _)
  )

  val oracle: Map[String, String] = Map(
    "multimodal_manifest" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS media, sha256(text) AS chash,
        |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1]
        |      AS modality
        |  FROM documents)
        |SELECT modality, COUNT(*) AS n_items,
        |  CAST(SUM(octet_length(media)) AS BIGINT) AS total_bytes,
        |  CAST(MAX(octet_length(media)) AS BIGINT) AS max_bytes,
        |  COUNT(DISTINCT chash) AS n_distinct_content,
        |  CAST((SUM(octet_length(media)) + 16383) // 16384 AS BIGINT)
        |    AS n_shards
        |FROM m GROUP BY modality ORDER BY modality""".stripMargin,
    "multimodal_framesample" ->
      """WITH m AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents),
        |f AS (SELECT doc_id, text, n, (n + 63) // 64 AS n_frames FROM m),
        |s AS (SELECT doc_id, text, n, unnest(range(0, (n_frames - 1) // 2 + 1)) AS i FROM f)
        |SELECT doc_id, CAST(i * 2 AS BIGINT) AS frame_idx,
        |  CAST(i * 2 * 64 AS BIGINT) AS off,
        |  CAST(LEAST(64, n - i * 2 * 64) AS BIGINT) AS flen,
        |  md5(substring(text, CAST(i * 2 * 64 + 1 AS INTEGER), 64)) AS fhash
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin
  )
}
