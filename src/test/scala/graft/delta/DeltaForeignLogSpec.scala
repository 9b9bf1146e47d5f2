package graft.delta

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Hand-authored `_delta_log` fixtures imitating FOREIGN writers
  * (delta-spark et al.): commitInfo/txn actions, unknown fields on adds,
  * multi-part checkpoints, null partition values, re-added files. The
  * reader must tolerate everything the public protocol allows. */
class DeltaForeignLogSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_foreign").toString + "/tbl"

  /** Write one single-file parquet with the given rows under the table;
    * returns the byte size (the log must carry REAL sizes — the scan plans
    * read ranges from them). */
  private def dataFile(table: String, rel: String, rows: Seq[(Long, String)]): Long = {
    val tmp = Files.createTempDirectory("graft_part").toString + "/out"
    rows.toDF("id", "s").coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .find(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).get
    val target = Paths.get(table, rel)
    Files.createDirectories(target.getParent)
    Files.copy(Paths.get(part), target)
    Files.size(target)
  }

  private def writeLog(table: String, version: Long, lines: Seq[String]): Unit = {
    val dir = Paths.get(table, "_delta_log")
    Files.createDirectories(dir)
    Files.write(dir.resolve(f"$version%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  private val schemaJson =
    """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""

  test("foreign log: commitInfo, txn, unknown add fields, re-added file") {
    val t = newTable()
    val szA = dataFile(t, "part-a.parquet", Seq((1L, "a")))
    val szB = dataFile(t, "part-b.parquet", Seq((2L, "b")))
    writeLog(t, 0, Seq(
      """{"commitInfo":{"timestamp":1700000000000,"operation":"WRITE","operationParameters":{"mode":"Append"},"engineInfo":"someEngine/1.0"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"m-1","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""",
      """{"txn":{"appId":"app-1","version":7,"lastUpdated":1700000000000}}""",
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$szA,"modificationTime":1700000000000,"dataChange":true,"stats":"{\\"numRecords\\":1}","tags":{"INSERTION_TIME":"xyz"},"unknownFutureField":42}}""",
      s"""{"add":{"path":"part-b.parquet","partitionValues":{},"size":$szB,"modificationTime":1700000000000,"dataChange":true}}"""))
    // v1: remove b, v2: RE-ADD b — replay must keep the latest action
    writeLog(t, 1, Seq(
      """{"commitInfo":{"timestamp":1700000001000,"operation":"DELETE"}}""",
      """{"remove":{"path":"part-b.parquet","deletionTimestamp":1700000001000,"dataChange":true,"extendedFileMetadata":true}}"""))
    writeLog(t, 2, Seq(
      s"""{"add":{"path":"part-b.parquet","partitionValues":{},"size":$szB,"modificationTime":1700000002000,"dataChange":true}}"""))
    val got = DeltaSnapshotReader.load(spark, t).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
    val v1 = DeltaSnapshotReader.load(spark, t, versionAsOf = Some(1L))
      .as[(Long, String)].collect().toSet
    assert(v1 == Set((1L, "a")))
  }

  test("multi-part checkpoint is read whole") {
    val t = newTable()
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "s"), t)
    DeltaWriter.checkpoint(spark, t)
    // split the single-file checkpoint into a 2-part one
    val log = Paths.get(t, "_delta_log")
    val single = log.resolve(f"${1L}%020d.checkpoint.parquet")
    assert(Files.exists(single))
    val actions = spark.read.parquet(single.toString)
    val parts = actions.randomSplit(Array(0.5, 0.5), seed = 7)
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = Files.createTempDirectory("cp").toString + "/out"
      p.coalesce(1).write.parquet(tmp)
      val f = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(f),
        log.resolve(f"${1L}%020d.checkpoint.${i + 1}%010d.${2}%010d.parquet"))
    }
    Files.delete(single)
    // delete pre-checkpoint json commits: checkpoint must carry the state
    Files.delete(log.resolve(f"${0L}%020d.json"))
    Files.delete(log.resolve(f"${1L}%020d.json"))
    DeltaSnapshotReader.invalidate(t)
    val got = DeltaSnapshotReader.load(spark, t).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("null partition value round-trips as SQL NULL") {
    val t = newTable()
    val szN = dataFile(t, "p-null/part-0.parquet", Seq((1L, "x")))
    val sz5 = dataFile(t, "p-5/part-0.parquet", Seq((2L, "y")))
    val pSchema =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}},{\"name\":\"bucket\",\"type\":\"integer\",\"nullable\":true,\"metadata\":{}}]}"""
    writeLog(t, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"m-2","format":{"provider":"parquet","options":{}},"schemaString":"$pSchema","partitionColumns":["bucket"],"configuration":{},"createdTime":1}}""",
      s"""{"add":{"path":"p-null/part-0.parquet","partitionValues":{"bucket":null},"size":$szN,"modificationTime":1,"dataChange":true}}""",
      s"""{"add":{"path":"p-5/part-0.parquet","partitionValues":{"bucket":"5"},"size":$sz5,"modificationTime":1,"dataChange":true}}"""))
    val df = DeltaSnapshotReader.load(spark, t)
    val rows = df.select("id", "bucket").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    assert(rows == Set((1L, None), (2L, Some(5))))
  }

  test("unsupported protocol / column mapping rejected") {
    val t = newTable()
    writeLog(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      s"""{"metaData":{"id":"m-3","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}"""))
    val e = intercept[Exception](DeltaSnapshotReader.snapshot(spark, t))
    assert(e.getMessage.contains("minReaderVersion"))
  }
}
