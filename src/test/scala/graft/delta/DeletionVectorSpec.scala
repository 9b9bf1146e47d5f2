package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Deletion-vector decode + apply. The base85 and roaring-format tests
  * check against INDEPENDENT byte layouts written out by hand from the
  * public specs (RFC 1924's own example; the RoaringFormatSpec field list),
  * not round-trips through the production code. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  // ---- hand-rolled little-endian byte builder ----
  private class LE {
    val out = new ByteArrayOutputStream()
    def i16(v: Int): LE = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF); this }
    def i32(v: Int): LE = { i16(v & 0xFFFF); i16(v >>> 16); this }
    def i64(v: Long): LE = { i32((v & 0xFFFFFFFFL).toInt); i32((v >>> 32).toInt); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  test("base85 matches an independent group-wise computation (RFC 1924 alphabet)") {
    // The format (git / delta-spark Base85Codec): 4-byte big-endian groups,
    // each encoded as 5 base-85 digits over the RFC 1924 alphabet. (NOT the
    // RFC's own whole-128-bit worked example — grouping changes the carries.)
    val alphabet =
      "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~"
    def refEncode(bytes: Array[Byte]): String =
      bytes.grouped(4).map { g =>
        var v = g.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xFF))
        val out = new Array[Char](5)
        (4 to 0 by -1).foreach { i => out(i) = alphabet((v % 85).toInt); v /= 85 }
        new String(out)
      }.mkString
    val vectors = Seq(
      Array(0x10, 0x80, 0x00, 0x00).map(_.toByte),
      Array(0x00, 0x00, 0x00, 0x00).map(_.toByte),
      Array(0xFF, 0xFF, 0xFF, 0xFF).map(_.toByte),
      Array.tabulate(16)(i => (i * 37 + 5).toByte))
    vectors.foreach { bs =>
      val enc = refEncode(bs)
      assert(DeletionVectors.base85Encode(bs) == enc, s"encode ${bs.toSeq}")
      assert(DeletionVectors.base85Decode(enc).toSeq == bs.toSeq, s"decode $enc")
    }
    // spot value: 0x10800000 = 5*85^4 + 25*85^3 + 64*85^2 + 63*85 + 59
    assert(DeletionVectors.base85Encode(vectors.head) ==
      Seq(5, 25, 64, 63, 59).map(alphabet(_)).mkString)
    // UUID round-trip through the 20-char form
    val u = new java.util.UUID(0x0123456789ABCDEFL, 0xFEDCBA9876543210L)
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    assert(DeletionVectors.uuidFromBase85(DeletionVectors.base85Encode(bb.array())) == u)
  }

  test("portable roaring deserializer reads hand-written array/run/bitmap containers") {
    // --- array containers, no-run cookie (12346): {1, 3, 70000} ---
    val arr = new LE()
    arr.i32(DeletionVectors.Magic).i64(1L)
    arr.i32(12346).i32(2)                  // cookie, container count
    arr.i16(0).i16(1)                      // key 0, card-1 = 1   -> {1,3}
    arr.i16(1).i16(0)                      // key 1, card-1 = 0   -> {4464}
    arr.i32(0).i32(0)                      // offset header (ignored by reader)
    arr.i16(1).i16(3)                      // container 0 values
    arr.i16(70000 - 65536)                 // container 1 values
    val a = DeletionVectors.deserialize(arr.bytes)
    assert(a.contains(1L) && a.contains(3L) && a.contains(70000L))
    assert(!a.contains(0L) && !a.contains(2L) && !a.contains(4L) && !a.contains(70001L))
    assert(!a.contains(1L << 32 | 1L), "high-key beyond bitmap count must be absent")

    // --- run container, run cookie (12347), 1 container -> NO offset header ---
    val run = new LE()
    run.i32(DeletionVectors.Magic).i64(1L)
    run.i32(12347 | (0 << 16))             // cookie: size-1=0 in upper 16 bits
    run.out.write(0x01)                    // run flag bitset: container 0 is a run
    run.i16(0).i16(10)                     // key 0, card-1 (11 values: 5..15)
    run.i16(1)                             // numRuns = 1
    run.i16(5).i16(10)                     // run: start 5, length 10 -> [5,15]
    val r = DeletionVectors.deserialize(run.bytes)
    (5 to 15).foreach(v => assert(r.contains(v.toLong), s"run must contain $v"))
    assert(!r.contains(4L) && !r.contains(16L))

    // --- bitmap container (cardinality > 4096): all even values in key 0 ---
    val bm = new LE()
    bm.i32(DeletionVectors.Magic).i64(1L)
    bm.i32(12346).i32(1)
    bm.i16(0).i16(32768 - 1)               // 32768 even values
    bm.i32(0)                              // offset header
    (0 until 1024).foreach(_ => bm.i64(0x5555555555555555L)) // bits at even positions
    val b = DeletionVectors.deserialize(bm.bytes)
    assert(b.contains(0L) && b.contains(2L) && b.contains(65534L))
    assert(!b.contains(1L) && !b.contains(65535L))
  }

  // serialized bitmap {1, 3} (rows to delete), used by the e2e fixtures
  private def dvData(deleted: Seq[Int]): Array[Byte] = {
    val le = new LE()
    le.i32(DeletionVectors.Magic).i64(1L)
    le.i32(12346).i32(1)
    le.i16(0).i16(deleted.size - 1)
    le.i32(0)
    deleted.sorted.foreach(le.i16)
    le.bytes
  }

  private def newTable(): String =
    Files.createTempDirectory("graft_dv").toString + "/tbl"

  private def writeLog(table: String, version: Long, lines: Seq[String]): Unit = {
    val dir = Paths.get(table, "_delta_log")
    Files.createDirectories(dir)
    Files.write(dir.resolve(f"$version%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  private val schemaJson =
    """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""

  /** one 10-row single parquet file, row_index i ↔ id i */
  private def dataFile(table: String, rel: String): Long = {
    val tmp = Files.createTempDirectory("graft_dvp").toString + "/out"
    (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .find(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).get
    val target = Paths.get(table, rel)
    Files.createDirectories(target.getParent)
    Files.copy(Paths.get(part), target)
    Files.size(target)
  }

  test("inline deletion vector drops exactly its rows (load + loadViaJoin)") {
    val t = newTable()
    val sz = dataFile(t, "part-a.parquet")
    val data = dvData(Seq(1, 3))
    val padded = data ++ new Array[Byte]((4 - data.length % 4) % 4)
    val inline = DeletionVectors.base85Encode(padded)
    writeLog(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"m-dvi","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.enableDeletionVectors":"true"},"createdTime":1}}""",
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${data.length},"cardinality":2}}}"""))
    val got = DeltaSnapshotReader.load(spark, t).select("id").as[Long].collect().toSet
    assert(got == Set(0L, 2L, 4L, 5L, 6L, 7L, 8L, 9L), s"got $got")
    val viaJoin = DeltaSnapshotReader.loadViaJoin(spark, t).select("id").as[Long].collect().toSet
    assert(viaJoin == got)
  }

  test("file-based (u) deletion vector with framing + crc; filters and pushdown still work") {
    val t = newTable()
    val sz = dataFile(t, "part-a.parquet")
    val data = dvData(Seq(0, 9))
    // DV file: version byte, then [size BE][data][crc32 BE] at offset 1
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val encodedUuid = DeletionVectors.base85Encode(bb.array())
    val crc = new java.util.zip.CRC32
    crc.update(data)
    val be = java.nio.ByteBuffer.allocate(1 + 4 + data.length + 4)
    be.put(1.toByte).putInt(data.length).put(data).putInt(crc.getValue.toInt)
    Files.createDirectories(Paths.get(t))
    Files.write(Paths.get(t, s"deletion_vector_$uuid.bin"), be.array())
    writeLog(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"m-dvu","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"$encodedUuid","offset":1,"sizeInBytes":${data.length},"cardinality":2}}}"""))
    val df = DeltaSnapshotReader.load(spark, t)
    assert(df.select("id").as[Long].collect().toSet == (1L to 8L).toSet)
    // data filters compose with the DV filter
    assert(df.filter(col("id") >= 5).select("id").as[Long].collect().toSet == (5L to 8L).toSet)
    assert(df.count() == 8L)
  }

  test("fully-DV-deleted file is skipped at listing time, never opened") {
    val t = newTable()
    val szA = dataFile(t, "part-a.parquet")
    val szB = dataFile(t, "part-b.parquet")
    // file A: DV covers ALL 10 rows (cardinality == stats numRecords) —
    // foreign writers leave such adds in place instead of removing them;
    // file B: partial DV (row 0 deleted)
    def inline(rows: Seq[Int]): (String, Int) = {
      val data = dvData(rows)
      val padded = data ++ new Array[Byte]((4 - data.length % 4) % 4)
      (DeletionVectors.base85Encode(padded), data.length)
    }
    val (dvA, szDvA) = inline(0 until 10)
    val (dvB, szDvB) = inline(Seq(0))
    writeLog(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"m-dvs","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$szA,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":10}","deletionVector":{"storageType":"i","pathOrInlineDv":"$dvA","sizeInBytes":$szDvA,"cardinality":10}}}""",
      s"""{"add":{"path":"part-b.parquet","partitionValues":{},"size":$szB,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":10}","deletionVector":{"storageType":"i","pathOrInlineDv":"$dvB","sizeInBytes":$szDvB,"cardinality":1}}}"""))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    // driver-path listing drops file A without opening it
    val idx = new DeltaFileIndex(spark, snap)
    val listed = idx.listFiles(Nil, Nil).flatMap(_.files.map(_.getPath.getName))
    assert(listed == Seq("part-b.parquet"), listed)
    // distributed-path listing agrees
    spark.conf.set("spark.graft.delta.driverFileListThreshold", "0")
    try {
      DeltaSnapshotReader.invalidate(t) // fresh, uncollected file set
      val snap2 = DeltaSnapshotReader.snapshot(spark, t)
      val idx2 = new DeltaFileIndex(spark, snap2)
      val listed2 = idx2.listFiles(Nil, Nil).flatMap(_.files.map(_.getPath.getName))
      assert(listed2 == Seq("part-b.parquet"), listed2)
    } finally spark.conf.unset("spark.graft.delta.driverFileListThreshold")
    // end-to-end: only B's live rows come back
    assert(DeltaSnapshotReader.load(spark, t).select("id").as[Long].collect().toSet ==
      (1L to 9L).toSet)
  }

  test("change feed refuses ranges containing DV rewrites") {
    val t = newTable()
    val sz = dataFile(t, "part-a.parquet")
    writeLog(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"m-dvc","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true}}"""))
    val data = dvData(Seq(2))
    val padded = data ++ new Array[Byte]((4 - data.length % 4) % 4)
    writeLog(t, 1, Seq(
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$sz,"modificationTime":2,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${DeletionVectors.base85Encode(padded)}","sizeInBytes":${data.length},"cardinality":1}}}"""))
    val e = intercept[IllegalArgumentException](
      DeltaSnapshotReader.changes(spark, t, fromVersion = 0L).collect())
    assert(e.getMessage.contains("non-append"), e.getMessage)
  }
}
