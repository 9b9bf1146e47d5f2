package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Change Data Feed (`delta.enableChangeDataFeed=true`): the row-level
  * change log the Delta protocol layers over the file-level transaction
  * log — each commit's net row changes, tagged `insert` / `delete` /
  * `update_preimage` / `update_postimage`, consumable by version range.
  *
  * The reference connector is read-only and latest-snapshot-only
  * (DeltaMetadataHandler.scala:99,117,150), so CDF is part of this
  * engine's beyond-the-reference write surface.
  *
  * Protocol shape (public Delta spec, "Change Data Files" + "Add CDC
  * File"):
  *  - Row-level DML (DELETE / UPDATE / MERGE / DV-DELETE) on a CDF table
  *    writes its change rows as parquet under `_change_data/`, with one
  *    extra string column `_change_type`, and records each file as a
  *    `cdc` action (`dataChange=false` — snapshot replay ignores them).
  *  - Commits whose changes ARE their file actions — blind appends and
  *    full overwrites, where every added row is an insert and every
  *    removed row a delete — may omit cdc files; readers reconstruct the
  *    feed from the `add` / `remove` actions (this is why plain appends
  *    stay exactly as cheap with CDF on).
  *
  * Scale shape: the reader materializes only the ACTION metadata of the
  * requested version range on the driver (bounded by files-changed-in-
  * range — the same bound split planning already pays); the change rows
  * themselves stream through ordinary distributed parquet scans with
  * partition values injected from the log, one scan per (version, kind)
  * group, unioned lazily. */
object ChangeDataFeed {

  val ChangeTypeCol = "_change_type"
  val VersionCol = "_commit_version"
  val TimestampCol = "_commit_timestamp"

  def isEnabled(configuration: Map[String, String]): Boolean =
    configuration.get("delta.enableChangeDataFeed").exists(_.equalsIgnoreCase("true"))

  /** Write one DML commit's change rows (`changeData` = table columns +
    * [[ChangeTypeCol]]) under `_change_data/v<version>/`, hive-partitioned
    * like the data files, and render their `cdc` action lines. Runs BEFORE
    * the commit that references them (files without a commit are invisible
    * garbage, the same write-then-commit order the data files use). */
  private[delta] def writeChangeFiles(spark: SparkSession, snap: DeltaSnapshot,
                                      version: Long, changeData: DataFrame): Seq[String] = {
    val table = new Path(snap.tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = new Path(new Path(table, "_change_data"), s"v$version")
    val partitionBy = snap.partitionColumns
    // disk form is physical on column-mapped tables ([[ColumnMapping]]);
    // `_change_type` itself is never mapped (spec: CDF columns are not)
    val diskPartitionBy = partitionBy.map(snap.physicalFieldName)
    val logical = changeData.select(
      snap.schema.map(f => col(f.name)) :+ col(ChangeTypeCol).cast(StringType): _*)
    val ordered = snap.physicalSchema match {
      case Some(ps) => ColumnMapping.renameToPhysical(logical,
        StructType(snap.schema.fields :+ StructField(ChangeTypeCol, StringType)),
        StructType(ps.fields :+ StructField(ChangeTypeCol, StringType)))
      case None => logical
    }
    val writer =
      if (partitionBy.nonEmpty) ordered.write.partitionBy(diskPartitionBy: _*) else ordered.write
    writer.mode("errorifexists").parquet(dir.toString)
    DeltaWriter.listDataFiles(fs, dir).map { st =>
      val rel = DeltaWriter.relativize(table, st.getPath)
      val pv = DeltaWriter.hivePartitionValues(rel, diskPartitionBy)
        .map { case (k, v) => s"${DeltaWriter.q(k)}:${DeltaWriter.q(v)}" }
        .mkString("{", ",", "}")
      s"""{"cdc":{"path":${DeltaWriter.q(DeltaActions.encodePath(rel))},"partitionValues":$pv,"size":${st.getLen},"dataChange":false}}"""
    }
  }

  /** Action metadata the reader needs per commit (cdc is absent from the
    * replay [[DeltaActions.actionSchema]] — snapshot state never includes
    * it — so the feed reads with its own schema; remove carries its
    * optional deletionVector only to DETECT the unsupported foreign
    * shape). */
  private val cdfActionSchema = StructType(Seq(
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("deletionVector", DeltaActions.deletionVectorType)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", DeltaActions.deletionVectorType)))),
    StructField("cdc", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType)))),
    StructField("commitInfo", StructType(Seq(
      StructField("timestamp", LongType),
      StructField("inCommitTimestamp", LongType))))))

  private val commitRe = """(\d{20})\.json""".r

  /** The change feed of `[fromVersion, toVersion]` (inclusive, latest when
    * None — delta-spark's `table_changes` bounds): table columns +
    * `_change_type`, `_commit_version`, `_commit_timestamp`. Commits with
    * cdc actions read those files verbatim; commits without reconstruct
    * inserts from `add` and deletes from `remove` (the removed files are
    * still on disk until VACUUM — reading a range that VACUUM already
    * reclaimed fails, as it must). */
  def read(spark: SparkSession, tablePath: String, fromVersion: Long,
           toVersion: Option[Long] = None): DataFrame = {
    val endSnap = DeltaSnapshotReader.snapshotAt(spark, tablePath, toVersion)
    val end = endSnap.version
    require(isEnabled(endSnap.configuration),
      s"change data feed is not enabled on $tablePath (delta.enableChangeDataFeed)")
    require(fromVersion >= 0 && fromVersion <= end,
      s"version range [$fromVersion, $end] invalid for $tablePath")

    val logPath = new Path(tablePath, "_delta_log")
    val fs = logPath.getFileSystem(spark.sessionState.newHadoopConf())
    val commitFiles = fs.listStatus(logPath).flatMap { st =>
      st.getPath.getName match {
        case commitRe(v) if v.toLong >= fromVersion && v.toLong <= end =>
          Some((v.toLong, st.getModificationTime, st.getPath.toString))
        case _ => None
      }
    }.sortBy(_._1)
    require(commitFiles.length == (end - fromVersion + 1),
      s"missing commit JSONs in [$fromVersion, $end] — log truncated by checkpoint cleanup?")

    // ONE distributed pass over the range's commit JSONs; only action
    // metadata (paths + partition values) reaches the driver.
    val acts = spark.read.schema(cdfActionSchema).json(commitFiles.map(_._3).toSeq: _*)
      .withColumn("version",
        regexp_extract(input_file_name(), """(\d{20})\.json""", 1).cast(LongType))
      .collect()

    // physical → logical partition-key rename (foreign column-mapped
    // tables key cdc partitionValues by physical name, like add)
    val partKeyFix: Map[String, String] = endSnap.physicalSchema match {
      case Some(_) => endSnap.partitionColumns
        .map(c => endSnap.physicalFieldName(c) -> c).toMap
      case None => Map.empty
    }
    def fixKeys(m: Map[String, String]): Map[String, String] =
      if (partKeyFix.isEmpty) m else m.map { case (k, v) => partKeyFix.getOrElse(k, k) -> v }

    // in-commit timestamp (authoritative when present) else file mtime
    val mtimes = commitFiles.map(c => c._1 -> c._2).toMap
    val icts: Map[Long, Long] = acts
      .filter(r => !r.isNullAt(3) && !r.getStruct(3).isNullAt(1))
      .map(r => r.getLong(4) -> r.getStruct(3).getLong(1)).toMap

    case class Cdc(version: Long, file: AddFile, hasDv: Boolean = false)
    val cdcFiles = Seq.newBuilder[Cdc]
    val addFiles = Seq.newBuilder[Cdc]
    val removePaths = Seq.newBuilder[(Long, String, Boolean)]
    acts.foreach { r =>
      val v = r.getLong(4)
      if (!r.isNullAt(2)) {
        val c = r.getStruct(2)
        cdcFiles += Cdc(v, AddFile(c.getString(0),
          Option(c.getMap[String, String](1)).map(m => fixKeys(Map(m.toSeq: _*)))
            .getOrElse(Map.empty),
          if (c.isNullAt(2)) 0L else c.getLong(2), 0L))
      } else if (!r.isNullAt(0)) {
        val a = r.getStruct(0)
        if (!a.isNullAt(4) && a.getBoolean(4))
          addFiles += Cdc(v, AddFile(a.getString(0),
            Option(a.getMap[String, String](1)).map(m => fixKeys(Map(m.toSeq: _*)))
              .getOrElse(Map.empty),
            if (a.isNullAt(2)) 0L else a.getLong(2),
            if (a.isNullAt(3)) 0L else a.getLong(3),
            if (a.isNullAt(5)) None else Some(a.getString(5))), hasDv = !a.isNullAt(6))
      } else if (!r.isNullAt(1)) {
        val rm = r.getStruct(1)
        if (!rm.isNullAt(1) && rm.getBoolean(1))
          removePaths += ((v, rm.getString(0), !rm.isNullAt(2)))
      }
    }
    val cdcVersions: Set[Long] = cdcFiles.result().map(_.version).toSet
    // DV'd file actions are remove+re-add of the same path — only cdc files
    // can describe such a commit's row changes (foreign DV writers that
    // skip them make the range unreadable, loudly)
    (addFiles.result().filter(_.hasDv).map(_.version) ++
      removePaths.result().filter(_._3).map(_._1))
      .filterNot(cdcVersions.contains).headOption.foreach { v =>
        throw new IllegalArgumentException(
          s"cannot reconstruct changes of version $v of $tablePath: the commit moves " +
            "deletion vectors but wrote no cdc files")
      }

    // cdc parquet = data columns + _change_type; same partition layout
    val cdcSnapBase = endSnap.copy(
      schema = StructType(endSnap.schema.fields :+ StructField(ChangeTypeCol, StringType)),
      physicalSchema = endSnap.physicalSchema.map(ps =>
        StructType(ps.fields :+ StructField(ChangeTypeCol, StringType))))

    val outCols = endSnap.schema.map(f => col(f.name)) :+ col(ChangeTypeCol)
    def stamp(df: DataFrame, v: Long): DataFrame = df
      .withColumn(VersionCol, lit(v))
      .withColumn(TimestampCol, timestamp_millis(lit(icts.getOrElse(v, mtimes(v)))))

    val parts = Seq.newBuilder[DataFrame]
    cdcFiles.result().groupBy(_.version).toSeq.sortBy(_._1).foreach { case (v, fs) =>
      parts += stamp(
        DeltaFileIndex.relation(spark, cdcSnapBase.withFiles(fs.map(_.file)))
          .select(outCols: _*), v)
    }
    addFiles.result().groupBy(_.version).toSeq.sortBy(_._1).foreach { case (v, fs) =>
      // a commit that wrote cdc files describes itself COMPLETELY there;
      // its file actions must not be double-counted (e.g. MERGE inserts)
      if (!cdcVersions.contains(v))
        parts += stamp(
          DeltaFileIndex.relation(spark, endSnap.withFiles(fs.map(_.file)))
            .withColumn(ChangeTypeCol, lit("insert")).select(outCols: _*), v)
    }
    removePaths.result().groupBy(_._1).toSeq.sortBy(_._1).foreach { case (v, rs) =>
      if (!cdcVersions.contains(v)) {
        // the removed files' full AddFile records (partition values, DV
        // state) live in the PRE-commit snapshot
        val paths = rs.map(_._2).toSet
        val prior = DeltaSnapshotReader.snapshotAt(spark, tablePath, Some(v - 1))
        val removed = prior.fileSet.filterCollect(f => paths.contains(f.path))
        require(removed.size == paths.size,
          s"version $v of $tablePath removes ${paths.size} files but only " +
            s"${removed.size} were active at ${v - 1}")
        parts += stamp(
          DeltaFileIndex.relation(spark, prior.withFiles(removed))
            .withColumn(ChangeTypeCol, lit("delete")).select(outCols: _*), v)
      }
    }

    parts.result().reduceOption(_ unionByName _).getOrElse {
      val outSchema = StructType(endSnap.schema.fields ++ Seq(
        StructField(ChangeTypeCol, StringType),
        StructField(VersionCol, LongType, nullable = false),
        StructField(TimestampCol, TimestampType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    }
  }
}
