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

  test("timestamp time travel resolves versions by commit modification time") {
    val t = newTable()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), t)
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "s"), t)
    // pin commit mtimes to known wall-clock instants
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    def ts(s: String) = java.sql.Timestamp.valueOf(s).getTime
    val times = Seq("2026-01-01 00:00:00", "2026-01-02 00:00:00", "2026-01-03 00:00:00").map(ts)
    (0 to 2).foreach { v =>
      fs.setTimes(new Path(t, f"_delta_log/$v%020d.json"), times(v), -1)
    }
    assert(DeltaSnapshotReader.versionAtTimestamp(spark, t, ts("2026-01-01 12:00:00")) == 0L)
    assert(DeltaSnapshotReader.versionAtTimestamp(spark, t, ts("2026-01-02 00:00:00")) == 1L)
    assert(DeltaSnapshotReader.versionAtTimestamp(spark, t, ts("2027-01-01 00:00:00")) == 2L)
    intercept[IllegalArgumentException](
      DeltaSnapshotReader.versionAtTimestamp(spark, t, ts("2025-01-01 00:00:00")))
    assert(DeltaSnapshotReader.loadAtTime(spark, t, ts("2026-01-02 06:00:00")).count() == 2L)
    // and through the registered data source option
    val viaSource = spark.read.format("graftdelta")
      .option("timestampAsOf", "2026-01-01 12:00:00").load(t)
    assert(viaSource.count() == 1L)
  }

  test("protocol gate: unknown v3 reader feature and v4 rejected with structured errors") {
    val t = newTable()
    writeLog(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["futureShreddedType"],"writerFeatures":["futureShreddedType"]}}""",
      s"""{"metaData":{"id":"m-3","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}"""))
    val e = intercept[DeltaUnsupportedFeatureException](DeltaSnapshotReader.snapshot(spark, t))
    assert(e.getMessage.contains("futureShreddedType"), e.getMessage)

    val t2 = newTable()
    writeLog(t2, 0, Seq(
      """{"protocol":{"minReaderVersion":4,"minWriterVersion":8}}""",
      s"""{"metaData":{"id":"m-4","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}"""))
    val e2 = intercept[DeltaUnsupportedFeatureException](DeltaSnapshotReader.snapshot(spark, t2))
    assert(e2.getMessage.contains("reader protocol 4"), e2.getMessage)
  }

  /** JSON-escape a schema JSON for embedding as a schemaString value. */
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def cmSchemaJson: String = {
    import org.apache.spark.sql.types._
    def meta(id: Int, phys: String) = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id.toLong)
      .putString("delta.columnMapping.physicalName", phys).build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, meta(1, "col-9a8b")),
      StructField("s", StringType, nullable = true, meta(2, "col-7c6d")),
      StructField("bucket", IntegerType, nullable = true, meta(3, "col-5e4f"))))
    esc(schema.json)
  }

  test("column mapping name mode: physical parquet names + physical partitionValues keys read as logical") {
    import org.apache.spark.sql.functions.col
    val t = newTable()
    // parquet files store PHYSICAL names; partition column not in the file
    def physFile(rel: String, rows: Seq[(Long, String)]): Long = {
      val tmp = Files.createTempDirectory("graft_cm").toString + "/out"
      rows.toDF("id", "s")
        .select(col("id").as("col-9a8b"), col("s").as("col-7c6d"))
        .coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .find(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).get
      val target = Paths.get(t, rel)
      Files.createDirectories(target.getParent)
      Files.copy(Paths.get(part), target)
      Files.size(target)
    }
    val sz1 = physFile("part-1.parquet", Seq((1L, "x")))
    val sz2 = physFile("part-2.parquet", Seq((2L, "y")))
    writeLog(t, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}""",
      s"""{"metaData":{"id":"m-cm","format":{"provider":"parquet","options":{}},"schemaString":"$cmSchemaJson","partitionColumns":["bucket"],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"},"createdTime":1}}""",
      s"""{"add":{"path":"part-1.parquet","partitionValues":{"col-5e4f":"5"},"size":$sz1,"modificationTime":1,"dataChange":true}}""",
      s"""{"add":{"path":"part-2.parquet","partitionValues":{"col-5e4f":"7"},"size":$sz2,"modificationTime":1,"dataChange":true}}"""))
    val df = DeltaSnapshotReader.load(spark, t)
    assert(df.columns.toSeq == Seq("id", "s", "bucket"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set((1L, "x", 5), (2L, "y", 7)))
    // partition pruning still works on the LOGICAL name
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val pruned = DeltaSnapshotReader.prunedFiles(spark, snap, col("bucket") === 5)
    assert(pruned.map(_.path) == Seq("part-1.parquet"))
    // reference join path agrees with the FileIndex path
    val viaJoin = DeltaSnapshotReader.loadViaJoin(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(viaJoin == rows)
  }

  test("column mapping id mode: parquet FIELD IDS resolve columns whose names diverge") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val t = newTable()
    // file columns named NOTHING like the physicalNames — only the parquet
    // field ids (1, 2) line up; name-based matching would read all-null
    val fidMeta = (id: Int) => new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val tmp = Files.createTempDirectory("graft_cmid").toString + "/out"
    Seq((7L, "x"), (8L, "y")).toDF("id", "s")
      .select(col("id").as("completely_other_a", fidMeta(1)),
        col("s").as("completely_other_b", fidMeta(2)))
      .coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .find(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).get
    Files.createDirectories(Paths.get(t))
    Files.copy(Paths.get(part), Paths.get(t, "part-id.parquet"))
    val sz = Files.size(Paths.get(t, "part-id.parquet"))
    // logical schema: id/s with columnMapping ids 1/2 and physicalNames that
    // do NOT match the file either
    val idSchema = {
      def meta(id: Int, phys: String) = new MetadataBuilder()
        .putLong("delta.columnMapping.id", id.toLong)
        .putString("delta.columnMapping.physicalName", phys).build()
      esc(StructType(Seq(
        StructField("id", LongType, nullable = true, meta(1, "col-zzz1")),
        StructField("s", StringType, nullable = true, meta(2, "col-zzz2")))).json)
    }
    writeLog(t, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m-id","format":{"provider":"parquet","options":{}},"schemaString":"$idSchema","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"},"createdTime":1}}""",
      s"""{"add":{"path":"part-id.parquet","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true}}"""))
    val df = DeltaSnapshotReader.load(spark, t)
    assert(df.columns.toSeq == Seq("id", "s"))
    assert(df.as[(Long, String)].collect().toSet == Set((7L, "x"), (8L, "y")))
  }

  test("DV feature accepted, unknown DV storage rejected") {
    // deletionVectors feature enabled but no DVs present: table must read
    val t2 = newTable()
    val sz = dataFile(t2, "part-a.parquet", Seq((1L, "a")))
    writeLog(t2, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"m-dv","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.enableDeletionVectors":"true"},"createdTime":1}}""",
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true}}"""))
    val got = DeltaSnapshotReader.load(spark, t2).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a")))

    // DVs themselves are applied at scan (DeletionVectorSpec); an UNKNOWN
    // storage type must still fail with a structured error at read time
    writeLog(t2, 1, Seq(
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$sz,"modificationTime":2,"dataChange":true,"deletionVector":{"storageType":"x","pathOrInlineDv":"whatever","offset":1,"sizeInBytes":36,"cardinality":1}}}"""))
    DeltaSnapshotReader.invalidate(t2)
    val e2 = intercept[Exception](
      DeltaSnapshotReader.load(spark, t2).collect())
    def chain(ex: Throwable): Seq[String] =
      Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(chain(e2).exists(m => m != null && m.contains("storageType")), chain(e2).mkString(" | "))
  }

  test("v2 checkpoint (sidecar-less json form): snapshot bootstraps from the uuid file") {
    val t = newTable()
    val szA = dataFile(t, "part-a.parquet", Seq((1L, "a")))
    val szB = dataFile(t, "part-b.parquet", Seq((2L, "b")))
    // uuid-named MAIN file carries ALL actions inline (single-file form):
    // protocol + metaData + adds + the checkpointMetadata marker
    val dir = Paths.get(t, "_delta_log")
    Files.createDirectories(dir)
    val uuid = "0aaa1bbb-2ccc-4ddd-8eee-9fff0aaa1bbb"
    Files.write(dir.resolve(f"${1L}%020d.checkpoint.$uuid%s.json"), Seq(
      """{"checkpointMetadata":{"version":1,"tags":{}}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      s"""{"metaData":{"id":"m-v2","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.checkpointPolicy":"v2"},"createdTime":1}}""",
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$szA,"modificationTime":1,"dataChange":true}}"""
    ).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    // a later plain JSON commit on top of the checkpoint
    writeLog(t, 2, Seq(
      s"""{"add":{"path":"part-b.parquet","partitionValues":{},"size":$szB,"modificationTime":2,"dataChange":true}}"""))
    val got = DeltaSnapshotReader.load(spark, t).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
    assert(DeltaSnapshotReader.snapshot(spark, t).version == 2L)
  }

  test("v2 checkpoint with sidecars: file actions read from _delta_log/_sidecars/") {
    val t = newTable()
    val szA = dataFile(t, "part-a.parquet", Seq((1L, "a")))
    val szB = dataFile(t, "part-b.parquet", Seq((2L, "b")))
    val szC = dataFile(t, "part-c.parquet", Seq((3L, "c")))
    val dir = Paths.get(t, "_delta_log")
    Files.createDirectories(dir)
    // two sidecar parquet files, each holding a slice of the add actions
    // (+ one remove tombstone: sidecars carry FILE actions of both kinds)
    import org.apache.spark.sql.Row
    def sidecar(name: String, rows: Seq[Row]): Unit = {
      val tmp = Files.createTempDirectory("sc").toString + "/out"
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), DeltaActions.actionSchema)
        .coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .find(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).get
      val target = Paths.get(t, "_delta_log", "_sidecars", name)
      Files.createDirectories(target.getParent)
      Files.copy(Paths.get(part), target)
    }
    def addRow(path: String, size: Long): Row =
      Row(Row(path, Map.empty[String, String], size, 1L, true, """{"numRecords":1}""",
          null, null, null),
        null, null, null, null, null)
    sidecar("sc-1.parquet", Seq(addRow("part-a.parquet", szA)))
    sidecar("sc-2.parquet", Seq(addRow("part-b.parquet", szB),
      Row(null, Row("part-zzz.parquet", 1L, true), null, null, null, null)))
    // main file: non-file actions + sidecar pointers only
    val uuid = "1bbb2ccc-3ddd-4eee-9fff-0aaa1bbb2ccc"
    Files.write(dir.resolve(f"${1L}%020d.checkpoint.$uuid%s.json"), Seq(
      """{"checkpointMetadata":{"version":1,"tags":{}}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      s"""{"metaData":{"id":"m-v2s","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.checkpointPolicy":"v2"},"createdTime":1}}""",
      """{"sidecar":{"path":"sc-1.parquet","sizeInBytes":1024,"modificationTime":1}}""",
      """{"sidecar":{"path":"sc-2.parquet","sizeInBytes":1024,"modificationTime":1}}"""
    ).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    writeLog(t, 2, Seq(
      s"""{"add":{"path":"part-c.parquet","partitionValues":{},"size":$szC,"modificationTime":2,"dataChange":true}}"""))
    val got = DeltaSnapshotReader.load(spark, t).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the remove tombstone from the sidecar survives replay
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.tombstones.map(_.path) == Seq("part-zzz.parquet"))
    // time travel TO the checkpoint version works without any json below it
    val atCp = DeltaSnapshotReader.load(spark, t, versionAsOf = Some(1L))
      .as[(Long, String)].collect().toSet
    assert(atCp == Set((1L, "a"), (2L, "b")))
  }

  test("scheme-qualified table roots: URI forms read/write like plain paths (s3a stand-in)") {
    import org.apache.spark.sql.functions._
    // The reference catalogs s3a:// roots (DeltaMetadataHandler.scala:95);
    // offline the exercisable equivalent is the file scheme in both its
    // one-slash (file:/tmp/x) and empty-authority (file:///tmp/x) forms —
    // the same qualification/normalization code paths an object-store URI
    // takes. Build the table THROUGH a qualified root with column mapping
    // + a DV delete active, then read it back through every form.
    val plain = newTable()
    val qualified = "file:" + plain
    val triple = "file://" + "/" + plain.stripPrefix("/")
    DeltaWriter.write((1L to 20L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartition(2), qualified, Seq.empty)
    DeltaWriter.enableColumnMapping(spark, triple)
    DeltaWriter.renameColumn(spark, qualified, "s", "label")
    DeltaWriter.deleteWithDV(spark, triple, col("id") % 5L === 0L)
    // all three forms resolve to the SAME snapshot and the same live rows
    val expected = (1L to 20L).filterNot(_ % 5 == 0).map(i => (i, s"r$i")).toSet
    Seq(plain, qualified, triple).foreach { root =>
      val got = DeltaSnapshotReader.load(spark, root)
        .as[(Long, String)].collect().toSet
      assert(got == expected, s"root form $root read ${got.size} rows")
    }
    // DML through a qualified root after the DV delete: CoW update rewrites
    // the affected (DV-carrying) files and keeps the mapping intact
    DeltaWriter.update(spark, qualified, col("id") === 1L, Map("label" -> lit("one")))
    val after = DeltaSnapshotReader.load(spark, triple)
      .filter(col("id") === 1L).select("label").as[String].head()
    assert(after == "one")
    // time travel through a qualified root sees the pre-delete snapshot
    val v0 = DeltaSnapshotReader.load(spark, qualified, versionAsOf = Some(0L))
    assert(v0.count() == 20L)
  }

  test("in-commit timestamps drive timestamp time travel when enabled") {
    val t = newTable()
    val szA = dataFile(t, "part-a.parquet", Seq((1L, "a")))
    val szB = dataFile(t, "part-b.parquet", Seq((2L, "b")))
    def ts(s: String) = java.sql.Timestamp.valueOf(s).getTime
    // ICT is a WRITER feature: reads must work; commit times come from
    // commitInfo.inCommitTimestamp, NOT the file mtime
    writeLog(t, 0, Seq(
      s"""{"commitInfo":{"timestamp":1,"inCommitTimestamp":${ts("2026-03-01 00:00:00")},"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["inCommitTimestamp"]}}""",
      s"""{"metaData":{"id":"m-ict","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.enableInCommitTimestamps":"true"},"createdTime":1}}""",
      s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$szA,"modificationTime":1,"dataChange":true}}"""))
    writeLog(t, 1, Seq(
      s"""{"commitInfo":{"timestamp":2,"inCommitTimestamp":${ts("2026-03-05 00:00:00")},"operation":"WRITE"}}""",
      s"""{"add":{"path":"part-b.parquet","partitionValues":{},"size":$szB,"modificationTime":2,"dataChange":true}}"""))
    // file mtimes are NOW (2026-08) — mtime resolution would pick version 1
    // for any 2026-03 query instant; ICT must pick version 0
    assert(DeltaSnapshotReader.versionAtTimestamp(spark, t, ts("2026-03-02 00:00:00")) == 0L)
    assert(DeltaSnapshotReader.versionAtTimestamp(spark, t, ts("2026-03-06 00:00:00")) == 1L)
    intercept[IllegalArgumentException](
      DeltaSnapshotReader.versionAtTimestamp(spark, t, ts("2026-02-01 00:00:00")))
    // history surfaces the in-commit timestamp as THE timestamp
    val h = DeltaSnapshotReader.history(spark, t).orderBy("version").collect()
    assert(h.map(_.getLong(1)).toSeq ==
      Seq(ts("2026-03-01 00:00:00"), ts("2026-03-05 00:00:00")))
  }
}
