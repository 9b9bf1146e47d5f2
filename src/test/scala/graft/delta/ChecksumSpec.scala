package graft.delta

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Per-commit snapshot checksum (`<version>.crc`, VERDICT r12 #4): every
  * commit emits one; load validates it. Corruption drill: a tampered crc
  * (wrong numFiles / tableSizeBytes) → loud refusal; a MISSING crc →
  * tolerated (foreign logs never have one); a TORN crc (crashed writer) →
  * warn-and-ignore, never bricks the table. */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_crc").toString + "/tbl"

  private def crcFile(t: String, v: Long) =
    Paths.get(t, "_delta_log", f"$v%020d.crc")

  private def df(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1)

  /** Tamper THROUGH the Hadoop fs (fresh write, fresh checksum sidecar) —
    * the realistic shape on an object store is a clean full-object PUT of
    * wrong content, not a torn local write. An NIO edit here would leave
    * the local fs's own .crc sidecar stale and read back as a TORN file
    * (warn-and-ignore path), which is a different drill (below). */
  private def hadoopWrite(t: String, v: Long, content: String): Unit = {
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(t + "/_delta_log", f"$v%020d.crc"), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  test("every commit writes a parseable crc with the post-commit state") {
    val t = newTable()
    DeltaWriter.write(df(0, 10), t)
    DeltaWriter.write(df(10, 20), t)
    DeltaWriter.delete(spark, t, org.apache.spark.sql.functions.col("id") < 5)
    for (v <- 0L to 2L)
      assert(Files.exists(crcFile(t, v)), s"missing crc for v$v")
    // each crc records THAT version's state, not the latest
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def state(v: Long) = {
      val n = om.readTree(new String(Files.readAllBytes(crcFile(t, v)), "UTF-8"))
      (n.get("numFiles").asLong, n.get("tableSizeBytes").asLong,
        n.get("protocol").get("minReaderVersion").asInt,
        n.get("metadata").get("schemaString").asText)
    }
    val s0 = state(0); val s1 = state(1); val s2 = state(2)
    assert(s0._1 == 1 && s1._1 == 2, s"append counts: $s0 $s1")
    assert(s1._2 > s0._2, "append grows tableSizeBytes")
    assert(s2._4.contains("\"id\""), "metadata echo carries the schema")
    // and the crc matches an independent replay at each version
    for (v <- 0L to 2L) {
      val snap = DeltaSnapshotReader.snapshotAt(spark, t, Some(v))
      assert(state(v)._1 == snap.fileSet.count, s"v$v numFiles")
      assert(state(v)._2 == snap.fileSet.totalBytes, s"v$v tableSizeBytes")
    }
  }

  test("tampered crc → loud refusal on load; repeated loads keep refusing") {
    val t = newTable()
    DeltaWriter.write(df(0, 10), t)
    DeltaWriter.write(df(10, 20), t)
    val p = crcFile(t, 1)
    val txt = new String(Files.readAllBytes(p), "UTF-8")
    val bad = txt.replaceFirst(""""numFiles":\d+""", "\"numFiles\":99")
    assert(bad != txt)
    hadoopWrite(t, 1, bad)
    DeltaSnapshotReader.invalidate(t)
    val e = intercept[Checksum.ChecksumMismatchException] {
      DeltaSnapshotReader.snapshot(spark, t)
    }
    assert(e.getMessage.contains("numFiles=99"))
    // refusal is not cached away: a second load refuses again
    intercept[Checksum.ChecksumMismatchException] {
      DeltaSnapshotReader.snapshot(spark, t)
    }
    // restoring the true crc heals the table
    hadoopWrite(t, 1, txt)
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 20)
  }

  test("tampered tableSizeBytes also refuses; time travel validates ITS version") {
    val t = newTable()
    DeltaWriter.write(df(0, 10), t)
    DeltaWriter.write(df(10, 20), t)
    // corrupt only v0's crc: latest load (v1) stays fine, travel to v0 refuses
    val p = crcFile(t, 0)
    val txt = new String(Files.readAllBytes(p), "UTF-8")
    hadoopWrite(t, 0, txt.replaceFirst(""""tableSizeBytes":\d+""",
      "\"tableSizeBytes\":7"))
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 20)
    val e = intercept[Checksum.ChecksumMismatchException] {
      DeltaSnapshotReader.snapshotAt(spark, t, Some(0L))
    }
    assert(e.getMessage.contains("tableSizeBytes=7"))
  }

  test("missing crc tolerated (foreign log); torn crc warns and is ignored") {
    val t = newTable()
    DeltaWriter.write(df(0, 10), t)
    DeltaWriter.write(df(10, 20), t)
    Files.delete(crcFile(t, 1))
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 20)
    // torn file: a crashed writer's partial JSON must not brick the table.
    // Drill BOTH tolerance paths — unparseable-but-readable content (the
    // object-store torn shape) and a bytes-vs-sidecar mismatch the local
    // fs surfaces as an unreadable file (NIO write bypassing Hadoop)
    hadoopWrite(t, 0, """{"tableSizeBytes":123,"numFi""")
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.snapshotAt(spark, t, Some(0L)).fileSet.count == 1)
    Files.write(crcFile(t, 0), """{"tableSizeBytes":123,"numFiles":9}"""
      .getBytes(StandardCharsets.UTF_8)) // stale .crc sidecar → read fails
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.snapshotAt(spark, t, Some(0L)).fileSet.count == 1)
  }

  test("incremental(): edge shapes fall back (None); foreign fields never carry forward") {
    val t = newTable()
    DeltaWriter.write(df(0, 10), t) // v0 — a real prev crc exists
    val logDir = new org.apache.hadoop.fs.Path(t, "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    val add = """{"add":{"path":"x.parquet","partitionValues":{},"size":100,"modificationTime":1,"dataChange":true}}"""
    // happy path: arithmetic against the real v0 crc
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val inc = Checksum.incremental(fs, logDir, 1L, Seq(add))
    assert(inc.isDefined)
    val node = om.readTree(inc.get)
    assert(node.get("numFiles").asLong == 2)
    // remove WITHOUT size (RESTORE's distributed builder shape) → fallback
    assert(Checksum.incremental(fs, logDir, 1L,
      Seq("""{"remove":{"path":"x","dataChange":true}}""")).isEmpty)
    // unknown action → fallback (never guess)
    assert(Checksum.incremental(fs, logDir, 1L,
      Seq("""{"futureAction":{"x":1}}""")).isEmpty)
    // negative intermediate (remove more bytes than the table has) → fallback
    assert(Checksum.incremental(fs, logDir, 1L,
      Seq("""{"remove":{"path":"x","dataChange":true,"size":999999999999}}""")).isEmpty)
    // torn previous crc → fallback
    hadoopWrite(t, 0, """{"numFi""")
    assert(Checksum.incremental(fs, logDir, 1L, Seq(add)).isEmpty)
    // missing previous crc → fallback
    Files.delete(crcFile(t, 0))
    assert(Checksum.incremental(fs, logDir, 1L, Seq(add)).isEmpty)
    // v0 without a metaData action → fallback (echo would be junk)
    assert(Checksum.incremental(fs, logDir, 0L, Seq(add)).isEmpty)
    // FOREIGN prev crc (delta-spark VersionChecksum with allFiles /
    // setTransactions / txnId): arithmetic proceeds, but none of the
    // foreign state may survive into the new crc under the new version
    hadoopWrite(t, 0,
      """{"tableSizeBytes":500,"numFiles":1,"numMetadata":1,"numProtocol":1,""" +
        """"allFiles":[{"path":"a.parquet","size":500}],"setTransactions":[{"appId":"s","version":7}],""" +
        """"txnId":"abc","protocol":{"minReaderVersion":1,"minWriterVersion":2},""" +
        """"metadata":{"partitionColumns":[],"configuration":{},"schemaString":"{\"type\":\"struct\",\"fields\":[]}",""" +
        """"format":{"provider":"parquet","options":{}}}}""")
    val chained = Checksum.incremental(fs, logDir, 1L, Seq(add))
    assert(chained.isDefined)
    val out = om.readTree(chained.get)
    assert(out.get("numFiles").asLong == 2 && out.get("tableSizeBytes").asLong == 600)
    for (stale <- Seq("allFiles", "setTransactions", "txnId"))
      assert(!out.has(stale), s"foreign field '$stale' carried forward")
    // foreign prev WITHOUT the state aggregates → fallback
    hadoopWrite(t, 0, """{"txnId":"abc"}""")
    assert(Checksum.incremental(fs, logDir, 1L, Seq(add)).isEmpty)
  }

  test("crc tracks DML and maintenance state transitions") {
    val t = newTable()
    DeltaWriter.write(df(0, 1000), t)
    DeltaWriter.write(df(1000, 2000), t)
    DeltaWriter.write(df(2000, 3000), t)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def nf(v: Long) = om.readTree(
      new String(Files.readAllBytes(crcFile(t, v)), "UTF-8")).get("numFiles").asLong
    assert(nf(2) == 3)
    // DV delete replaces adds in place: numFiles unchanged
    DeltaWriter.deleteWithDV(spark, t, org.apache.spark.sql.functions.col("id") % 7 === 0)
    assert(nf(3) == nf(2), s"DV delete: ${nf(2)} -> ${nf(3)}")
    // CoW delete: whatever rewrite shape the DML chose, the crc agrees
    // with an independent replay of the post-delete version
    val t2 = newTable()
    DeltaWriter.write(df(0, 10), t2)
    DeltaWriter.write(df(10, 20), t2)
    DeltaWriter.delete(spark, t2, org.apache.spark.sql.functions.col("id") < 10)
    def nf2(v: Long) = om.readTree(
      new String(Files.readAllBytes(crcFile(t2, v)), "UTF-8")).get("numFiles").asLong
    assert(nf2(2) == DeltaSnapshotReader.snapshotAt(spark, t2, Some(2L)).fileSet.count,
      s"CoW delete: crc ${nf2(2)} vs replay")
    // OPTIMIZE (DV-free table) compacts: 2 small files -> 1, crc tracks it
    val t3 = newTable()
    DeltaWriter.write(df(0, 10), t3)
    DeltaWriter.write(df(10, 20), t3)
    assert(DeltaWriter.optimize(spark, t3).isDefined)
    def nf3(v: Long) = om.readTree(
      new String(Files.readAllBytes(crcFile(t3, v)), "UTF-8")).get("numFiles").asLong
    assert(nf3(2) == 1, s"OPTIMIZE compacts: ${nf3(1)} -> ${nf3(2)}")
    // every crc written along the way validates against its own replay
    for (v <- 0L to 3L) {
      val snap = DeltaSnapshotReader.snapshotAt(spark, t, Some(v))
      assert(snap.fileSet.count == nf(v), s"v$v")
    }
  }
}
