package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** Returns the cdc action lines AND the commit-unique directory they
    * were written under, so a conflict-checked retry loop can DELETE a
    * losing attempt's change files before re-rendering (ADVICE r12: lost
    * attempts used to orphan their `_change_data` files until VACUUM). */
  private[delta] def writeChangeFiles(spark: SparkSession, snap: DeltaSnapshot,
                                      version: Long, changeData: DataFrame): (Seq[String], Path) = {
    val table = new Path(snap.tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    // commit-unique dir (consumers resolve cdc files through the LOG's
    // action paths, never the dir name): two processes racing DML at the
    // same version must not collide on the change-file paths, and a
    // conflict-checked retry re-renders its change files under the fresh
    // version without tripping over the lost attempt's directory
    val dir = new Path(new Path(table, "_change_data"),
      s"v$version-${java.util.UUID.randomUUID().toString.take(8)}")
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
    val lines = DeltaWriter.listDataFiles(fs, dir).map { st =>
      val rel = DeltaWriter.relativize(table, st.getPath)
      val pv = DeltaWriter.hivePartitionValues(rel, diskPartitionBy)
        .map { case (k, v) => s"${DeltaWriter.q(k)}:${DeltaWriter.q(v)}" }
        .mkString("{", ",", "}")
      s"""{"cdc":{"path":${DeltaWriter.q(DeltaActions.encodePath(rel))},"partitionValues":$pv,"size":${st.getLen},"dataChange":false}}"""
    }
    (lines, dir)
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

  /** One commit's CDF-relevant actions, parsed driver-side (small-range
    * fast path of [[read]] — same action semantics as the distributed
    * summary + per-version selects). */
  private final case class LocalCdcFile(path: String,
      partitionValues: Map[String, String], size: Long)
  private final case class LocalAddFile(path: String,
      partitionValues: Map[String, String], size: Long,
      modificationTime: Long, stats: Option[String])
  private final case class LocalVerActs(nCdc: Long, cdc: Seq[LocalCdcFile],
      adds: Seq[LocalAddFile], removePaths: Seq[String], nDvMove: Long,
      ict: Option[Long])

  private val localOm = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parseCommitLocal(fs: org.apache.hadoop.fs.FileSystem,
                               file: Path): LocalVerActs = {
    import com.fasterxml.jackson.databind.JsonNode
    def optText(n: JsonNode, f: String): Option[String] =
      Option(n.get(f)).filterNot(_.isNull).map(_.asText())
    def optLong(n: JsonNode, f: String, d: Long): Long =
      Option(n.get(f)).filterNot(_.isNull).map(_.asLong()).getOrElse(d)
    def boolOf(n: JsonNode, f: String): Boolean =
      Option(n.get(f)).filterNot(_.isNull).exists(_.asBoolean())
    def strMap(n: JsonNode, f: String): Map[String, String] =
      Option(n.get(f)).filterNot(_.isNull).map { m =>
        val b = Map.newBuilder[String, String]
        val it = m.fields()
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
        }
        b.result()
      }.getOrElse(Map.empty)
    val in = fs.open(file)
    val txt = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString("UTF-8")
    } finally in.close()
    var nCdc = 0L; var nDvMove = 0L; var ict: Option[Long] = None
    val cdc = Seq.newBuilder[LocalCdcFile]
    val adds = Seq.newBuilder[LocalAddFile]
    val removePaths = scala.collection.mutable.LinkedHashSet.empty[String]
    txt.split('\n').foreach { line0 =>
      val line = line0.trim
      if (line.nonEmpty) {
        val root = try localOm.readTree(line) catch { case _: Exception => null }
        if (root != null) {
          val addN = Option(root.get("add")).filterNot(_.isNull)
          val remN = Option(root.get("remove")).filterNot(_.isNull)
          val cdcN = Option(root.get("cdc")).filterNot(_.isNull)
          cdcN.foreach { c =>
            nCdc += 1
            optText(c, "path").foreach { p =>
              cdc += LocalCdcFile(p, strMap(c, "partitionValues"), optLong(c, "size", 0L))
            }
          }
          addN.filter(boolOf(_, "dataChange")).foreach { a =>
            optText(a, "path").foreach { p =>
              adds += LocalAddFile(p, strMap(a, "partitionValues"),
                optLong(a, "size", 0L), optLong(a, "modificationTime", 0L),
                optText(a, "stats"))
            }
          }
          remN.filter(boolOf(_, "dataChange")).foreach { r =>
            optText(r, "path").foreach(removePaths += _)
          }
          val dvMove =
            addN.exists(a => boolOf(a, "dataChange") &&
              Option(a.get("deletionVector")).exists(!_.isNull)) ||
            remN.exists(r => boolOf(r, "dataChange") &&
              Option(r.get("deletionVector")).exists(!_.isNull))
          if (dvMove) nDvMove += 1
          Option(root.get("commitInfo")).filterNot(_.isNull).foreach { ci =>
            Option(ci.get("inCommitTimestamp")).filterNot(_.isNull).foreach { t =>
              ict = Some(ict.fold(t.asLong())(math.max(_, t.asLong())))
            }
          }
        }
      }
    }
    LocalVerActs(nCdc, cdc.result(), adds.result(), removePaths.toSeq, nDvMove, ict)
  }

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
          Some((v.toLong, st.getModificationTime, st.getPath.toString, st.getLen))
        case _ => None
      }
    }.sortBy(_._1)
    require(commitFiles.length == (end - fromVersion + 1),
      s"missing commit JSONs in [$fromVersion, $end] — log truncated by checkpoint cleanup?")

    // DRIVER-SIDE fast path (optimization r17, same gate as the snapshot
    // reader's localReplay): a small commit range is parsed with Jackson on
    // the driver — no summary job, and the per-version file sets are born
    // collected so planning each part costs zero jobs. Above the byte gate
    // (a range spanning a 10M-file rewrite) everything below stays on the
    // distributed pass exactly as before.
    val localMax = spark.conf.getOption("spark.graft.delta.localReplayMaxBytes")
      .map(_.toLong).getOrElse(4L * 1024 * 1024)
    val localActs: Option[Map[Long, LocalVerActs]] =
      if (commitFiles.map(_._4).sum <= localMax)
        Some(commitFiles.map(c => c._1 -> parseCommitLocal(fs, new Path(c._3))).toMap)
      else None

    // ONE distributed pass over the range's commit JSONs (when the range is
    // too big for the driver). The ACTIONS stay on executors; the driver
    // gets a per-version SUMMARY (V rows — bounded by the range length,
    // never by file count). A range spanning a 10M-file rewrite must not
    // materialize 10M action rows on the driver — the same 50k lock the
    // snapshot read path holds (DeltaScaleSpec). No persist: this
    // whole-range frame feeds exactly one job (the summary); the
    // per-version frames below each read their OWN single commit JSON, so
    // executing a part never re-scans the range.
    val summary: Array[(Long, Long, Long, Long, Long, Option[Long])] = localActs match {
      case Some(m) =>
        commitFiles.map { c =>
          val a = m(c._1)
          (c._1, a.nCdc, a.adds.size.toLong, a.removePaths.size.toLong, a.nDvMove, a.ict)
        }.sortBy(_._1)
      case None =>
        val actsDf = spark.read.schema(cdfActionSchema).json(commitFiles.map(_._3).toSeq: _*)
          .withColumn("version",
            regexp_extract(input_file_name(), """(\d{20})\.json""", 1).cast(LongType))
        actsDf.groupBy("version").agg(
          count(when(col("cdc").isNotNull, 1)).as("nCdc"),
          count(when(col("add.dataChange"), 1)).as("nAdd"),
          count_distinct(when(col("remove.dataChange"), col("remove.path"))).as("nRemove"),
          count(when((col("add.dataChange") && col("add.deletionVector").isNotNull) ||
            (col("remove.dataChange") && col("remove.deletionVector").isNotNull), 1)).as("nDvMove"),
          max(col("commitInfo.inCommitTimestamp")).as("ict"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5))))
          .sortBy(_._1)
    }

    // DV'd file actions are remove+re-add of the same path — only cdc files
    // can describe such a commit's row changes (foreign DV writers that
    // skip them make the range unreadable, loudly)
    val cdcVersions: Set[Long] = summary.filter(_._2 > 0).map(_._1).toSet
    summary.find(s => s._5 > 0 && !cdcVersions.contains(s._1)).foreach { s =>
      throw new IllegalArgumentException(
        s"cannot reconstruct changes of version ${s._1} of $tablePath: the commit moves " +
          "deletion vectors but wrote no cdc files")
    }

    // physical → logical partition-key rename (foreign column-mapped
    // tables key cdc partitionValues by physical name, like add)
    val partKeyFix: Map[String, String] = endSnap.physicalSchema match {
      case Some(_) => endSnap.partitionColumns
        .map(c => endSnap.physicalFieldName(c) -> c).toMap
      case None => Map.empty
    }
    def fixKeysCol(c: Column): Column =
      if (partKeyFix.isEmpty) c
      else transform_keys(c, (k, _) => coalesce(element_at(
        map(partKeyFix.flatMap { case (p, l) => Seq(lit(p), lit(l)) }.toSeq: _*), k), k))

    // in-commit timestamp (authoritative when present) else file mtime
    val mtimes = commitFiles.map(c => c._1 -> c._2).toMap
    val icts: Map[Long, Long] =
      summary.collect { case (v, _, _, _, _, Some(ict)) => v -> ict }.toMap

    // cdc parquet = data columns + _change_type; same partition layout
    val cdcSnapBase = endSnap.copy(
      schema = StructType(endSnap.schema.fields :+ StructField(ChangeTypeCol, StringType)),
      physicalSchema = endSnap.physicalSchema.map(ps =>
        StructType(ps.fields :+ StructField(ChangeTypeCol, StringType))))

    val outCols = endSnap.schema.map(f => col(f.name)) :+ col(ChangeTypeCol)
    def stamp(df: DataFrame, v: Long): DataFrame = df
      .withColumn(VersionCol, lit(v))
      .withColumn(TimestampCol, timestamp_millis(lit(icts.getOrElse(v, mtimes(v)))))

    // per-part file sets in [[DeltaFileSet.schema]] shape, derived from the
    // actions of THAT version's single commit JSON — file-level pruning, so
    // executing any part costs one small JSON read, not a filter over the
    // whole range. [[DeltaFileIndex]] then collects small sets for driver
    // planning and keeps large ones distributed (its own threshold), so the
    // feed's scale ceiling equals the scan path's.
    val commitPath: Map[Long, String] = commitFiles.map(c => c._1 -> c._3).toMap
    def verActs(v: Long): DataFrame =
      spark.read.schema(cdfActionSchema).json(commitPath(v))
    val nullDv = lit(null).cast(DeltaActions.deletionVectorType).as("deletionVector")
    val nullLong = (n: String) => lit(null).cast(LongType).as(n)
    def fixKeysLocal(pv: Map[String, String]): Map[String, String] =
      if (partKeyFix.isEmpty) pv
      else pv.map { case (k, v) => partKeyFix.getOrElse(k, k) -> v }
    def cdcSet(v: Long): DeltaFileSet = localActs match {
      case Some(m) => DeltaFileSet.of(m(v).cdc.map { a =>
        AddFile(a.path, fixKeysLocal(a.partitionValues), a.size, 0L, None)
      })
      case None => DeltaFileSet.fromDf(() =>
        verActs(v).where(col("cdc").isNotNull).select(
          col("cdc.path").as("path"),
          fixKeysCol(col("cdc.partitionValues")).as("partitionValues"),
          coalesce(col("cdc.size"), lit(0L)).as("size"),
          lit(0L).as("modificationTime"),
          lit(null).cast(StringType).as("stats"),
          nullDv, nullLong("baseRowId"), nullLong("defaultRowCommitVersion"),
          nullLong("addedVersion")))
    }
    def addSet(v: Long): DeltaFileSet = localActs match {
      case Some(m) => DeltaFileSet.of(m(v).adds.map { a =>
        AddFile(a.path, fixKeysLocal(a.partitionValues), a.size,
          a.modificationTime, a.stats)
      })
      case None => DeltaFileSet.fromDf(() =>
        verActs(v).where(col("add.dataChange")).select(
          col("add.path").as("path"),
          fixKeysCol(col("add.partitionValues")).as("partitionValues"),
          coalesce(col("add.size"), lit(0L)).as("size"),
          coalesce(col("add.modificationTime"), lit(0L)).as("modificationTime"),
          col("add.stats").as("stats"),
          nullDv, nullLong("baseRowId"), nullLong("defaultRowCommitVersion"),
          nullLong("addedVersion")))
    }

    val parts = Seq.newBuilder[DataFrame]
    summary.foreach { case (v, nCdc, nAdd, nRemove, _, _) =>
      if (nCdc > 0)
        parts += stamp(
          DeltaFileIndex.relation(spark, cdcSnapBase.copy(fileSet = cdcSet(v)))
            .select(outCols: _*), v)
      // a commit that wrote cdc files describes itself COMPLETELY there;
      // its file actions must not be double-counted (e.g. MERGE inserts)
      if (nAdd > 0 && nCdc == 0)
        parts += stamp(
          DeltaFileIndex.relation(spark, endSnap.copy(fileSet = addSet(v)))
            .withColumn(ChangeTypeCol, lit("insert")).select(outCols: _*), v)
      if (nRemove > 0 && nCdc == 0) {
        // the removed files' full AddFile records (partition values, DV
        // state) live in the PRE-commit snapshot — a distributed join
        // against the remove paths; the driver never sees the file list.
        // Consistency (every removed path was active at v-1) is guarded IN
        // the join via raise_error — no planning-time count() job per
        // remove-version. When the range parsed locally AND the prior
        // snapshot is already collected (small table), the lookup is a
        // driver-side map probe instead.
        val prior = DeltaSnapshotReader.snapshotAt(spark, tablePath, Some(v - 1))
        val removedSet: DeltaFileSet = localActs match {
          case Some(m) if prior.fileSet.isCollected =>
            val byPath = prior.files.map(f => f.path -> f).toMap
            DeltaFileSet.of(m(v).removePaths.sorted.map { p =>
              byPath.getOrElse(p, throw new IllegalArgumentException(
                s"version $v of $tablePath removes file $p that was not active at ${v - 1}"))
            })
          case _ =>
            val removedDf = () => {
              val rmPaths = verActs(v).where(col("remove.dataChange"))
                .select(col("remove.path").as("path")).distinct()
              rmPaths.join(prior.fileSet.df, Seq("path"), "left")
                .withColumn("path", when(col("size").isNull,
                  raise_error(concat(lit(s"version $v of $tablePath removes file "),
                    col("path"), lit(s" that was not active at ${v - 1}"))))
                  .otherwise(col("path")))
                .select(DeltaFileSet.schema.fieldNames.map(col): _*)
            }
            DeltaFileSet.fromDf(removedDf)
        }
        parts += stamp(
          DeltaFileIndex.relation(spark, prior.copy(fileSet = removedSet))
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
