package graft.delta

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** The active-file set of a [[DeltaSnapshot]], with a DISTRIBUTED canonical
  * representation.
  *
  * The reference materializes `snapshot.getAllFiles` on the driver
  * (DeltaMetadataHandler.scala:119,151) — at ~100 TB a table holds millions
  * of add actions and that list (with its per-file stats JSON) is multi-GB
  * of driver heap. Here the canonical form is a DataFrame of add rows that
  * lives on executors (persisted after the replay dedup); the driver pulls
  * back only what a consumer actually needs:
  *
  *   - query planning goes through [[df]] + distributed pruning
  *     ([[DeltaFileIndex.listFiles]]) and collects the PRUNED subset;
  *   - checkpoints write [[df]] back out as parquet without collecting;
  *   - bounded consumers (DML rewrite sets, DV-carrying files) use
  *     [[filterCollect]] — a distributed filter, then a collect of the
  *     (small) survivor set;
  *   - [[collected]] — the full driver materialization — exists for
  *     maintenance ops whose output is inherently the whole list (OPTIMIZE
  *     bin-packing, RESTORE diffs) and for small tables, and is lazy: a
  *     snapshot whose consumers never ask for it never pays for it.
  */
final class DeltaFileSet private (
    build: () => DataFrame,
    preset: Option[Seq[AddFile]]) {

  @volatile private var materialized: Option[Seq[AddFile]] = preset
  @volatile private var persisted: Option[DataFrame] = None
  @volatile private var validator: Option[() => Unit] = None
  @volatile private var validationFailure: Option[Throwable] = None
  @volatile private var validatingThread: Thread = null

  /** Arm a one-shot integrity check (the crc state validation,
    * [[graft.delta.Checksum.validate]]) that runs at the FIRST access to
    * the distributed add rows — the gateway every data-plane consumer
    * passes through (pruned planning, DML rewrite sets, checkpoints,
    * aggregates, collects) — instead of eagerly inside the snapshot-cache
    * fill (ADVICE r13: eager validation forced one distributed aggregate
    * per COLD load onto metadata-plane callers — history loops, plan-only
    * resolution — that never touch the file set). Refuse-before-serving is
    * preserved: no add row leaves this set before the validator passes,
    * and a VALUE-mismatch failure POISONS the set — every later access
    * rethrows, so the refusal can never be cached away.
    *
    * Validator contract: throw [[Checksum.ChecksumMismatchException]] to
    * refuse PERMANENTLY (the artifact disagrees with replayed state);
    * any other exception is treated as transient (a lost executor, a
    * shuffle-fetch failure) — it propagates to the caller but the
    * validator stays armed, so the next access retries instead of
    * caching a stale infrastructure error. */
  def armValidator(v: () => Unit): Unit = { validator = Some(v) }

  private def ensureValidated(): Unit = {
    validationFailure.foreach(e => throw e)
    if (validator.isDefined) {
      // the validator's own aggregate re-enters df/countBytesDigest on
      // this thread — let it through unvalidated (it IS the validation)
      if (validatingThread eq Thread.currentThread()) return
      // concurrent readers BLOCK here until validation settles: the
      // validator is cleared only AFTER it passes, so no thread can slip
      // through to the rows mid-flight (a cleared-before-run fast path
      // would serve data while a failing validation is still running)
      synchronized {
        validationFailure.foreach(e => throw e)
        validator.foreach { v =>
          validatingThread = Thread.currentThread()
          try { v(); validator = None }
          catch {
            case e: Checksum.ChecksumMismatchException =>
              // Publish the poison but leave the validator ARMED: a
              // lock-free fast-path reader that sampled
              // validationFailure==None just before this write must
              // still see validator.isDefined and be routed into the
              // synchronized block, where the under-lock re-check
              // rethrows. Clearing validator here would open a window
              // (failure not yet visible, validator already gone) where
              // that reader skips the block and is served add rows from
              // a set whose validation just failed. The armed validator
              // never re-runs: the under-lock validationFailure check
              // precedes the foreach.
              validationFailure = Some(e); throw e
            // transient: stay armed, retry at the next access
            case e: Throwable => throw e
          } finally validatingThread = null
        }
      }
    }
  }

  /** True once the full file list lives on the driver (from-Seq sets are
    * born collected). The scale-regression specs assert this stays false
    * for large snapshots through construction + pruned planning. */
  def isCollected: Boolean = materialized.isDefined

  /** The distributed add rows ([[DeltaFileSet.schema]]). Persisted on first
    * access (the replay dedup is non-trivial; every consumer after the
    * first reads the persisted form). */
  def df: DataFrame = {
    ensureValidated()
    dfUnvalidated
  }

  private def dfUnvalidated: DataFrame = persisted match {
    case Some(d) => d
    case None => synchronized {
      persisted match {
        case Some(d) => d
        case None =>
          val d = materialized match {
            case Some(files) => DeltaFileSet.dfFromSeq(files)
            case None => build().persist(StorageLevel.MEMORY_AND_DISK)
          }
          persisted = Some(d)
          d
      }
    }
  }

  /** (numFiles, totalBytes, setDigest) in ONE distributed job (free when
    * collected). The checksum writer + validator ([[graft.delta.Checksum]])
    * hit all three on every snapshot they touch, so the triple is computed
    * together — validation never pays a second pass over the add-set.
    * `setDigest` is the ORDER-INDEPENDENT file-set digest (VERDICT r13 #2):
    * XOR over `xxhash64(path, size)` of every active file, so two
    * corruptions that offset each other in count and bytes (an add/remove
    * swap, a path flip at equal size) still move the digest. XOR is exact
    * under the incremental arithmetic (add toggles in, remove toggles out)
    * and safe because add paths are unique within a snapshot. */
  def countBytesDigest: (Long, Long, Long) = {
    ensureValidated() // memoization must never outlive a poisoned set
    countBytesDigestMemo
  }

  private lazy val countBytesDigestMemo: (Long, Long, Long) = materialized match {
    case Some(files) =>
      (files.size.toLong, files.map(_.size).sum,
        files.foldLeft(0L)((d, f) => d ^ DeltaFileSet.fileDigest(f.path, f.size)))
    case None =>
      val r = df.agg(org.apache.spark.sql.functions.count(lit(1)),
        coalesce(sum(col("size")), lit(0L)),
        // same bytes the JVM-side fileDigest hashes: coalesce matches
        // decode()'s null-size-to-0 rule (SQL xxhash64 would SKIP a null)
        coalesce(expr("bit_xor(xxhash64(path, coalesce(size, 0L)))"), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** (numFiles, totalBytes) — see [[countBytesDigest]]. */
  def countAndBytes: (Long, Long) = (countBytesDigest._1, countBytesDigest._2)

  /** Per-size-bucket (fileCounts, totalBytes) over the add-set for the
    * crc's file-size histogram (delta-spark VersionChecksum `histogramOpt`
    * parity). `bounds` are the bucket lower boundaries (sorted ascending,
    * writer-declared in the crc — validation recomputes against the crc's
    * OWN boundaries, so foreign bins validate too); a file lands in the
    * greatest bucket whose boundary ≤ its size, sizes below the first
    * boundary clamp into bucket 0. One distributed groupBy job when the
    * set is large; a local fold when already collected. */
  def sizeHistogram(bounds: Array[Long]): (Array[Long], Array[Long]) = {
    ensureValidated()
    val counts = new Array[Long](bounds.length)
    val bytes = new Array[Long](bounds.length)
    materialized match {
      case Some(files) =>
        files.foreach { f =>
          val i = DeltaFileSet.histogramBucket(f.size, bounds)
          counts(i) += 1; bytes(i) += f.size
        }
      case None =>
        val bArr = array(bounds.map(lit): _*)
        val sz = coalesce(col("size"), lit(0L))
        // bucket = |{b : b <= size}| - 1 — O(|bounds|) per row, one shuffle
        // of ≤|bounds| groups
        val idx = (size(filter(bArr, b => b <= sz)) - lit(1)).as("b")
        dfUnvalidated.select(idx, sz.as("sz"))
          .groupBy(col("b"))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
            sum(col("sz")).as("s"))
          .collect().foreach { r =>
            val i = math.max(r.getInt(0), 0)
            counts(i) += r.getLong(1); bytes(i) += r.getLong(2)
          }
    }
    (counts, bytes)
  }

  /** Order-independent digest of the {(path, size)} add-set. */
  def setDigest: Long = countBytesDigest._3

  /** Number of active files (one small job when not collected). */
  def count: Long = countBytesDigest._1

  /** Total data bytes of the snapshot (distributed agg when large). */
  def totalBytes: Long = countBytesDigest._2

  /** Does any active file carry a deletion vector? (LIMIT-1 probe.) */
  def hasDeletionVectors: Boolean = {
    ensureValidated()
    hasDeletionVectorsMemo
  }

  private lazy val hasDeletionVectorsMemo: Boolean = materialized match {
    case Some(files) => files.exists(_.deletionVector.isDefined)
    case None => df.where(col("deletionVector").isNotNull).head(1).nonEmpty
  }

  /** The DV-carrying subset (bounded by the number of vectors).
    * Validated like every other accessor: the `materialized` fast branch
    * must not outlive a poisoned set (the validator itself may have
    * memoized the list mid-flight before its mismatch threw — ADVICE r14). */
  def dvFiles: Seq[AddFile] = { ensureValidated(); materialized } match {
    case Some(files) => files.filter(_.deletionVector.isDefined)
    case None =>
      df.where(col("deletionVector").isNotNull).collect()
        .map(DeltaFileSet.decode).toSeq.sortBy(_.path)
  }

  /** Distributed filter + collect of the survivors: the driver only ever
    * holds `pred`'s matches (e.g. a DML's affected files). */
  def filterCollect(pred: AddFile => Boolean): Seq[AddFile] = { ensureValidated(); materialized } match {
    case Some(files) => files.filter(pred)
    case None =>
      df.rdd.mapPartitions(_.map(DeltaFileSet.decode).filter(pred))
        .collect().toSeq.sortBy(_.path)
  }

  /** All relative/absolute add paths (strings only — no stats payload).
    * Array-shaped for API contracts that force one (FileIndex.inputFiles);
    * scale consumers should use [[pathsIterator]] instead. */
  def paths: Seq[String] = { ensureValidated(); materialized } match {
    case Some(files) => files.map(_.path)
    case None => df.select(col("path")).collect().map(_.getString(0)).toSeq.sorted
  }

  /** Add paths paged one partition at a time (`toLocalIterator`): the
    * driver holds at most one partition of path strings, so a 10M-file
    * VACUUM can fold the pages into its membership set without ever
    * materializing the full path array (and without marking the set
    * collected).
    *
    * NO ORDERING GUARANTEE: the non-materialized branch yields partition
    * order, the materialized branch insertion order — unlike [[paths]],
    * which sorts. Consumers needing determinism must fold into an
    * order-insensitive structure (set/sum) or sort their bounded result. */
  def pathsIterator: Iterator[String] = { ensureValidated(); materialized } match {
    case Some(files) => files.iterator.map(_.path)
    case None =>
      import scala.jdk.CollectionConverters._
      df.select(col("path")).toLocalIterator().asScala.map(_.getString(0))
  }

  /** Full driver materialization (memoized; sorted by path for
    * deterministic downstream iteration — same order the pre-distributed
    * implementation produced). */
  def collected: Seq[AddFile] = { ensureValidated(); materialized } match {
    case Some(files) => files
    case None => synchronized {
      materialized match {
        case Some(files) => files
        case None =>
          val files = df.collect().map(DeltaFileSet.decode).toSeq.sortBy(_.path)
          materialized = Some(files)
          files
      }
    }
  }

  def unpersist(): Unit = synchronized {
    persisted.filter(_ => preset.isEmpty).foreach(_.unpersist(blocking = false))
    persisted = None
  }
}

object DeltaFileSet {

  /** One file's contribution to [[DeltaFileSet.setDigest]]:
    * `xxhash64(path, size)` with Spark's exact semantics (seed 42, the
    * string hash seeding the long hash) so the distributed form stays the
    * codegen'd `functions.xxhash64` while the incremental crc arithmetic
    * ([[Checksum.incremental]]) computes the identical value in pure JVM
    * from the commit's own action lines. */
  def fileDigest(path: String, size: Long): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    XXH64.hashLong(size, XXH64.hashUTF8String(
      org.apache.spark.unsafe.types.UTF8String.fromString(path), 42L))
  }

  /** Bucket of `size` under `bounds` (sorted ascending lower boundaries):
    * greatest i with bounds(i) ≤ size, clamped into bucket 0 below the
    * first boundary. Pure JVM so the incremental crc arithmetic computes
    * the identical bucket from a commit's own action lines. */
  def histogramBucket(size: Long, bounds: Array[Long]): Int = {
    val i = java.util.Arrays.binarySearch(bounds, math.max(size, bounds(0)))
    if (i >= 0) i else -i - 2
  }

  /** Row shape of [[DeltaFileSet.df]]: one flattened add action. */
  val schema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("partitionValues", MapType(StringType, StringType)),
    StructField("size", LongType),
    StructField("modificationTime", LongType),
    StructField("stats", StringType),
    StructField("deletionVector", DeltaActions.deletionVectorType),
    StructField("baseRowId", LongType),
    StructField("defaultRowCommitVersion", LongType),
    StructField("addedVersion", LongType)))

  /** Wrap an already-materialized list (DML subsets, fixtures). */
  def of(files: Seq[AddFile]): DeltaFileSet =
    new DeltaFileSet(() => dfFromSeq(files), Some(files))

  /** Wrap a lazily-built distributed add-row DataFrame (log replay). */
  def fromDf(build: () => DataFrame): DeltaFileSet =
    new DeltaFileSet(build, None)

  /** Row → [[AddFile]] (null-tolerant, shared by every collect site;
    * executor-safe — referenced from RDD closures). */
  def decode(r: Row): AddFile = AddFile(
    r.getString(0),
    Option(r.getMap[String, String](1)).map(m => Map(m.toSeq: _*)).getOrElse(Map.empty),
    if (r.isNullAt(2)) 0L else r.getLong(2),
    if (r.isNullAt(3)) 0L else r.getLong(3),
    if (r.isNullAt(4)) None else Some(r.getString(4)),
    if (r.isNullAt(5)) None else {
      val dv = r.getStruct(5)
      if (dv.isNullAt(0)) None // a descriptor without storageType is malformed
      else Some(DeletionVectors.Descriptor(
        dv.getString(0), dv.getString(1),
        if (dv.isNullAt(2)) 0 else dv.getInt(2),
        if (dv.isNullAt(3)) 0 else dv.getInt(3),
        if (dv.isNullAt(4)) 0L else dv.getLong(4)))
    },
    if (r.isNullAt(6)) None else Some(r.getLong(6)),
    if (r.isNullAt(7)) None else Some(r.getLong(7)),
    if (r.length <= 8 || r.isNullAt(8)) None else Some(r.getLong(8)))

  private def dfFromSeq(files: Seq[AddFile]): DataFrame = {
    val rows = files.map { f =>
      Row(f.path, f.partitionValues, f.size, f.modificationTime, f.stats.orNull,
        f.deletionVector.map(d =>
          Row(d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes, d.cardinality)).orNull,
        f.baseRowId.map(Long.box).orNull,
        f.defaultRowCommitVersion.map(Long.box).orNull,
        f.addedVersion.map(Long.box).orNull)
    }
    val spark = SparkSession.active
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
