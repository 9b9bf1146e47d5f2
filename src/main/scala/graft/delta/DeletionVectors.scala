package graft.delta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID
import scala.collection.concurrent.TrieMap

/** Read-side Delta deletion vectors (protocol v3 `deletionVectors` reader
  * feature), implemented from the published protocol spec:
  *
  *  - descriptor (`add.deletionVector`): `storageType` ∈ {`i` inline,
  *    `u` UUID-relative file, `p` absolute-path file}, `pathOrInlineDv`,
  *    `offset` into the file, `sizeInBytes` of the bitmap data,
  *    `cardinality` = deleted-row count;
  *  - on-disk blob at `offset`: [size int32 BE][data][crc32 int32 BE];
  *  - `data`: magic 1681511377 (int32 LE) + a 64-bit RoaringBitmapArray in
  *    "portable" form — int64 LE bitmap count, then one standard portable
  *    32-bit RoaringBitmap per high-32-bit key 0..n-1;
  *  - strings use Base85 with the RFC 1924 alphabet (same as git binary
  *    patches): 20 chars for a UUID, padded 4-byte groups for inline data.
  *
  * Scale shape: the scan stays a vectorized parquet read; deleted rows are
  * dropped by a narrow post-scan filter on `_metadata.(file_path,
  * row_index)`. Only the tiny DESCRIPTORS are broadcast; bitmap bytes are
  * read lazily on executors (one storage read per DV file, cached per JVM)
  * — the same read topology delta-spark uses.
  */
object DeletionVectors {

  // ------------------------------------------------------------------
  // Base85 (RFC 1924 alphabet, 4-byte big-endian groups → 5 chars)
  // ------------------------------------------------------------------
  private val Alphabet: Array[Char] =
    (('0' to '9') ++ ('A' to 'Z') ++ ('a' to 'z') ++ "!#$%&()*+-;<=>?@^_`{|}~").toArray
  private val Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Decode base85 text to bytes (output length = chars/5*4; callers slice
    * to the descriptor's sizeInBytes — inline data is zero-padded to a
    * 4-byte multiple before encoding). */
  def base85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"base85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val v = if (c < 128) Decode(c.toInt) else -1
        require(v >= 0, s"invalid base85 char '$c'")
        acc = acc * 85 + v
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (acc >>> 24).toByte
      out(o + 1) = (acc >>> 16).toByte
      out(o + 2) = (acc >>> 8).toByte
      out(o + 3) = acc.toByte
      i += 5
    }
    out
  }

  def base85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "base85 input must be 4-byte aligned")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var acc = ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
        ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
      val g = new Array[Char](5)
      var j = 4
      while (j >= 0) { g(j) = Alphabet((acc % 85).toInt); acc /= 85; j -= 1 }
      sb.appendAll(g)
      i += 4
    }
    sb.toString
  }

  def uuidFromBase85(s: String): UUID = {
    val b = base85Decode(s)
    require(b.length == 16, s"UUID base85 must decode to 16 bytes, got ${b.length}")
    val bb = ByteBuffer.wrap(b)
    new UUID(bb.getLong, bb.getLong)
  }

  // ------------------------------------------------------------------
  // Portable 64-bit RoaringBitmapArray (membership only)
  // ------------------------------------------------------------------
  val Magic = 1681511377

  sealed trait Container {
    def contains(v: Int): Boolean
    def foreach(f: Int => Unit): Unit
  }
  private final class ArrayContainer(vals: Array[Char]) extends Container {
    def contains(v: Int): Boolean =
      java.util.Arrays.binarySearch(vals, v.toChar) >= 0
    def foreach(f: Int => Unit): Unit = vals.foreach(c => f(c.toInt))
  }
  private final class BitmapContainer(words: Array[Long]) extends Container {
    def contains(v: Int): Boolean = (words(v >>> 6) & (1L << (v & 63))) != 0
    def foreach(f: Int => Unit): Unit = {
      var w = 0
      while (w < words.length) {
        var bits = words(w)
        while (bits != 0) {
          val t = bits & -bits
          f(w * 64 + java.lang.Long.numberOfTrailingZeros(bits))
          bits ^= t
        }
        w += 1
      }
    }
  }
  private final class RunContainer(starts: Array[Int], ends: Array[Int]) extends Container {
    def contains(v: Int): Boolean = {
      // binary search over run starts
      var lo = 0; var hi = starts.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (v < starts(mid)) hi = mid - 1
        else if (v > ends(mid)) lo = mid + 1
        else return true
      }
      false
    }
    def foreach(f: Int => Unit): Unit = {
      var r = 0
      while (r < starts.length) {
        var v = starts(r)
        while (v <= ends(r)) { f(v); v += 1 }
        r += 1
      }
    }
  }

  /** One 32-bit roaring bitmap: sorted (key16 → container). */
  final class Roaring32(keys: Array[Int], containers: Array[Container]) {
    def contains(v: Int): Boolean = {
      val key = v >>> 16
      val i = java.util.Arrays.binarySearch(keys, key)
      i >= 0 && containers(i).contains(v & 0xFFFF)
    }
    def foreach(f: Int => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        val base = keys(i) << 16
        containers(i).foreach(low => f(base | low))
        i += 1
      }
    }
  }

  final class RoaringArray(bitmaps: Array[Roaring32]) {
    def contains(v: Long): Boolean = {
      val high = (v >>> 32).toInt
      high < bitmaps.length && high >= 0 && bitmaps(high).contains(v.toInt)
    }
    /** ascending iteration over all set values */
    def foreach(f: Long => Unit): Unit = {
      var h = 0
      while (h < bitmaps.length) {
        val base = h.toLong << 32
        bitmaps(h).foreach(low => f(base | (low & 0xFFFFFFFFL)))
        h += 1
      }
    }
    def toArray: Array[Long] = {
      val b = Array.newBuilder[Long]
      foreach(b += _)
      b.result()
    }
  }

  /** Serialize SORTED DISTINCT values into the magic-prefixed portable
    * form (array containers ≤4096 values, bitmap containers above — the
    * layouts every roaring implementation must read; no run containers).
    * Offset headers are emitted per the RoaringFormatSpec so foreign
    * readers that seek by offset work. */
  def serialize(sorted: Array[Long]): Array[Byte] = {
    require(sorted.forall(_ >= 0), "row indexes must be non-negative")
    val out = new java.io.ByteArrayOutputStream()
    def i16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def i32(v: Int): Unit = { i16(v & 0xFFFF); i16(v >>> 16) }
    def i64(v: Long): Unit = { i32((v & 0xFFFFFFFFL).toInt); i32((v >>> 32).toInt) }
    i32(Magic)
    val byHigh = sorted.toSeq.groupBy(v => (v >>> 32).toInt)
    val nBitmaps = if (byHigh.isEmpty) 0 else byHigh.keys.max + 1
    i64(nBitmaps.toLong)
    (0 until nBitmaps).foreach { high =>
      val vals = byHigh.getOrElse(high, Seq.empty).map(_.toInt)
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      i32(SerialCookieNoRun)
      i32(byKey.size)
      byKey.foreach { case (key, vs) => i16(key); i16(vs.size - 1) }
      // offset header: absolute byte position of each container within
      // THIS bitmap's serialization (cookie offset = 0)
      var pos = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) =>
        i32(pos)
        pos += (if (vs.size <= 4096) 2 * vs.size else 8192)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.size <= 4096) vs.foreach(v => i16(v & 0xFFFF))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v => val low = v & 0xFFFF; words(low >>> 6) |= 1L << (low & 63) }
          words.foreach(i64)
        }
      }
    }
    out.toByteArray
  }

  private val SerialCookie = 12347
  private val SerialCookieNoRun = 12346
  private val NoOffsetThreshold = 4

  /** Deserialize one standard portable 32-bit RoaringBitmap, advancing
    * `bb` (little-endian). Layout per the public RoaringFormatSpec. */
  def readRoaring32(bb: ByteBuffer): Roaring32 = {
    val cookie = bb.getInt
    val hasRun = (cookie & 0xFFFF) == SerialCookie
    val size =
      if (hasRun) (cookie >>> 16) + 1
      else {
        require(cookie == SerialCookieNoRun, s"bad roaring cookie $cookie")
        bb.getInt
      }
    val runFlags = new Array[Byte](if (hasRun) (size + 7) / 8 else 0)
    if (hasRun) bb.get(runFlags)
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = bb.getShort & 0xFFFF
      cards(i) = (bb.getShort & 0xFFFF) + 1
      i += 1
    }
    // offset header present unless (run-capable and small)
    if (!hasRun || size >= NoOffsetThreshold) bb.position(bb.position() + 4 * size)
    val containers = new Array[Container](size)
    i = 0
    while (i < size) {
      val isRun = hasRun && (runFlags(i / 8) & (1 << (i % 8))) != 0
      containers(i) =
        if (isRun) {
          val n = bb.getShort & 0xFFFF
          val starts = new Array[Int](n); val ends = new Array[Int](n)
          var r = 0
          while (r < n) {
            val st = bb.getShort & 0xFFFF
            val len = bb.getShort & 0xFFFF
            starts(r) = st; ends(r) = st + len
            r += 1
          }
          new RunContainer(starts, ends)
        } else if (cards(i) <= 4096) {
          val vals = new Array[Char](cards(i))
          var v = 0
          while (v < cards(i)) { vals(v) = (bb.getShort & 0xFFFF).toChar; v += 1 }
          new ArrayContainer(vals)
        } else {
          val words = new Array[Long](1024)
          var w = 0
          while (w < 1024) { words(w) = bb.getLong; w += 1 }
          new BitmapContainer(words)
        }
      i += 1
    }
    new Roaring32(keys, containers)
  }

  /** Deserialize the magic-prefixed portable RoaringBitmapArray. */
  def deserialize(data: Array[Byte]): RoaringArray = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad deletion-vector magic $magic (want $Magic)")
    val n = bb.getLong
    require(n >= 0 && n < Int.MaxValue, s"bad bitmap count $n")
    new RoaringArray(Array.fill(n.toInt)(readRoaring32(bb)))
  }

  // ------------------------------------------------------------------
  // Descriptor resolution
  // ------------------------------------------------------------------
  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Int,
      sizeInBytes: Int,
      cardinality: Long) extends Serializable {

    /** Absolute path of the DV file (None for inline). */
    def filePath(tablePath: String): Option[Path] = storageType match {
      case "i" => None
      case "p" => Some(new Path(pathOrInlineDv))
      case "u" =>
        val prefix = pathOrInlineDv.dropRight(20)
        val uuid = uuidFromBase85(pathOrInlineDv.takeRight(20))
        val dir = if (prefix.isEmpty) new Path(tablePath) else new Path(tablePath, prefix)
        Some(new Path(dir, s"deletion_vector_$uuid.bin"))
      case other =>
        throw DeltaUnsupportedFeatureException("deletionVectors",
          s"unknown deletion-vector storageType '$other'")
    }
  }

  /** Load + decode one DV's bitmap (executor-side; no caching here). */
  def readBitmap(desc: Descriptor, tablePath: String, conf: Configuration): RoaringArray =
    desc.storageType match {
      case "i" =>
        deserialize(base85Decode(desc.pathOrInlineDv).take(desc.sizeInBytes))
      case _ =>
        val p = desc.filePath(tablePath).get
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        try {
          in.seek(desc.offset.toLong)
          val size = in.readInt() // big-endian framing
          require(size == desc.sizeInBytes,
            s"DV size mismatch at $p offset ${desc.offset}: framed $size vs descriptor ${desc.sizeInBytes}")
          val data = new Array[Byte](size)
          in.readFully(data)
          val crc = in.readInt()
          val c = new java.util.zip.CRC32
          c.update(data)
          require(crc == c.getValue.toInt, s"DV checksum mismatch at $p offset ${desc.offset}")
          deserialize(data)
        } finally in.close()
    }

  /** Write one DV file holding each entry's framed bitmap
    * ([size BE][data][crc32 BE] per entry after the 1-byte format version);
    * returns the file's UUID and each entry's (offset, size) for the
    * descriptors. */
  def writeDvFile(fs: org.apache.hadoop.fs.FileSystem, tablePath: String,
                  datas: Seq[Array[Byte]]): (UUID, Seq[(Int, Int)]) = {
    val uuid = UUID.randomUUID()
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out) // big-endian framing
    dos.writeByte(1)
    val entries = datas.map { data =>
      val offset = dos.size()
      dos.writeInt(data.length)
      dos.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      dos.writeInt(crc.getValue.toInt)
      (offset, data.length)
    }
    dos.flush()
    val p = new Path(tablePath, s"deletion_vector_$uuid.bin")
    val os = fs.create(p, false)
    try os.write(out.toByteArray) finally os.close()
    (uuid, entries)
  }

  def encodeUuid(uuid: UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    base85Encode(bb.array())
  }

  /** Per-JVM decoded-bitmap cache (one storage read per distinct DV). */
  private val cache = TrieMap.empty[(String, String, Int), RoaringArray]

  /** Test hook: drop memoized bitmaps (per-JVM cache keyed by table path +
    * descriptor — an independence drill that vacuums one table's bins must
    * not be served the other's cached copy). */
  private[graft] def clearCache(): Unit = cache.clear()
  def cachedBitmap(desc: Descriptor, tablePath: String, conf: Configuration): RoaringArray =
    cache.getOrElseUpdate((tablePath, desc.pathOrInlineDv, desc.offset),
      readBitmap(desc, tablePath, conf))

  // ------------------------------------------------------------------
  // Scan application
  // ------------------------------------------------------------------

  /** Drop DV-deleted rows from a scan DataFrame. `df` must be rooted at the
    * file scan (so `_metadata` resolves); the result carries only
    * `outputCols`. Files without a DV pass through the filter untouched. */
  def applyToScan(spark: SparkSession, df: DataFrame, snap: DeltaSnapshot,
                  outputCols: Seq[Column]): DataFrame = {
    // LIMIT-1 probe, then a distributed filter collecting ONLY the
    // DV-carrying files — never the whole file list
    if (!snap.fileSet.hasDeletionVectors) return df.select(outputCols: _*)
    val withDv = snap.fileSet.dvFiles
    val descByPath: Map[String, Descriptor] =
      withDv.map(f => snap.normAbsolutePath(f) -> f.deletionVector.get).toMap
    val bcDesc = spark.sparkContext.broadcast(descByPath)
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(spark.sessionState.newHadoopConf()))
    val tablePath = snap.tablePath
    val live = udf { (filePath: String, rowIndex: Long) =>
      bcDesc.value.get(DeltaActions.normUriPath(filePath)) match {
        case None => true
        case Some(desc) =>
          !cachedBitmap(desc, tablePath, bcConf.value.value).contains(rowIndex)
      }
    }
    df.withColumn("__dv_fp", col("_metadata.file_path"))
      .withColumn("__dv_ri", col("_metadata.row_index"))
      .filter(live(col("__dv_fp"), col("__dv_ri")))
      .select(outputCols: _*)
  }
}
