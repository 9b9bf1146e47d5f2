package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.io.File

/** Minor log compaction (`<start>.<end>.compacted.json`): the compacted
  * range file must be a drop-in replacement for its commits during replay
  * — proven by DELETING the covered commit JSONs and reading again. */
class LogCompactionSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = new File(sys.props("java.io.tmpdir"), s"graft_logcompact_$tag")
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    if (d.exists()) rm(d)
    DeltaSnapshotReader.invalidate(d.toString)
    d.toString
  }

  private def commitPath(table: String, v: Long) =
    new File(s"$table/_delta_log", f"$v%020d.json")

  private def rows(table: String): Seq[(Long, Long)] = {
    DeltaSnapshotReader.invalidate(table)
    DeltaSnapshotReader.load(spark, table)
      .select(col("id"), col("grp")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
  }

  private def df(from: Long, until: Long) =
    spark.range(from, until).select(col("id"), (col("id") % 7).as("grp"))

  test("compacted range replaces its commits: identical snapshot after they are deleted") {
    val t = freshDir("basic")
    DeltaWriter.write(df(0, 100), t, Nil, "overwrite")          // v0
    DeltaWriter.write(df(100, 200), t, Nil, "append")           // v1
    DeltaWriter.write(df(200, 300), t, Nil, "append")           // v2
    DeltaWriter.delete(spark, t, col("id") % 10 === 3)          // v3 (CoW remove+add)
    val expected = rows(t)
    assert(expected.nonEmpty && !expected.exists(_._1 % 10 == 3))

    val name = DeltaWriter.compactLog(spark, t, 0, 2)
    assert(name == f"${0L}%020d.${2L}%020d.compacted.json")
    // compacted file coexisting with the commits changes nothing
    assert(rows(t) == expected)

    // hard proof the compacted file is USED: remove the covered commits
    (0L to 2L).foreach(v => assert(commitPath(t, v).delete()))
    assert(rows(t) == expected)
    // tombstones from the v3 delete survive the compacted bootstrap
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.snapshot(spark, t).tombstones.nonEmpty)
  }

  test("full-range compaction: delete inside the range leaves a reconciled tombstone") {
    val t = freshDir("fullrange")
    DeltaWriter.write(df(0, 100), t, Nil, "overwrite")          // v0
    DeltaWriter.write(df(100, 200), t, Nil, "append")           // v1
    DeltaWriter.delete(spark, t, col("id") < 50)                // v2: removes v0's file
    val expected = rows(t)
    DeltaWriter.compactLog(spark, t, 0, 2)
    // keep v2 (something must carry the latest version); drop v0, v1
    (0L to 1L).foreach(v => assert(commitPath(t, v).delete()))
    assert(rows(t) == expected)
  }

  test("overlapping compactions: the longest range starting at the bootstrap wins") {
    val t = freshDir("overlap")
    DeltaWriter.write(df(0, 50), t, Nil, "overwrite")           // v0
    DeltaWriter.write(df(50, 100), t, Nil, "append")            // v1
    DeltaWriter.write(df(100, 150), t, Nil, "append")           // v2
    DeltaWriter.write(df(150, 200), t, Nil, "append")           // v3
    val expected = rows(t)
    DeltaWriter.compactLog(spark, t, 0, 1)
    DeltaWriter.compactLog(spark, t, 0, 2)                      // longer; also idempotent re-run
    DeltaWriter.compactLog(spark, t, 0, 2)
    (0L to 2L).foreach(v => assert(commitPath(t, v).delete()))
    assert(rows(t) == expected)
  }

  test("txn watermarks survive compaction; cleanupLog drops ranges below a checkpoint") {
    val t = freshDir("txn")
    DeltaWriter.write(df(0, 10), t, Nil, "overwrite")                 // v0
    DeltaWriter.writeIdempotent(df(10, 20), t, Nil, "appA", 7L)       // v1
    DeltaWriter.write(df(20, 30), t, Nil, "append")                   // v2
    val expected = rows(t)
    DeltaWriter.compactLog(spark, t, 0, 1)
    (0L to 1L).foreach(v => assert(commitPath(t, v).delete()))
    assert(rows(t) == expected)
    DeltaSnapshotReader.invalidate(t)
    val txns = DeltaSnapshotReader.snapshot(spark, t).txns
    assert(txns.exists(x => x.appId == "appA" && x.version == 7L))
    // replayed idempotency: the same (appId, version) append is a no-op
    assert(DeltaWriter.writeIdempotent(df(10, 20), t, Nil, "appA", 7L).isEmpty)

    DeltaWriter.checkpoint(spark, t)
    val deleted = DeltaWriter.cleanupLog(spark, t, retainMs = -1000)
    assert(deleted.exists(_.endsWith(".compacted.json")))
    assert(rows(t) == expected)
  }

  test("missing commit in the requested range refuses loudly") {
    val t = freshDir("missing")
    DeltaWriter.write(df(0, 10), t, Nil, "overwrite")           // v0
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.compactLog(spark, t, 0, 5)
    }
    assert(e.getMessage.contains("missing commit"))
  }
}
