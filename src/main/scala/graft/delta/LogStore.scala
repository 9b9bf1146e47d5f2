package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets
import java.util.UUID

/** Pluggable version-claim protocol for `_delta_log/<version>.json`.
  *
  * Delta's commit protocol needs exactly one primitive from the storage
  * layer: "publish these bytes at this path IFF nothing exists there,
  * atomically". On HDFS-semantics stores (HDFS, local FS) that primitive
  * is a temp-file write plus no-overwrite rename; on object stores the
  * rename trick does not exist and the primitive must come from a
  * conditional PUT (S3 `If-None-Match`, GCS `ifGenerationMatch=0`, ABFS
  * ETags) or an external coordination table — exactly the LogStore seam
  * Delta itself requires (the reference connector reads S3-resident logs,
  * reference DeltaMetadataHandler.scala:27-28). Every DeltaWriter commit
  * claim routes through [[DeltaWriter.logStore]], so swapping the store
  * swaps the table's commit semantics without touching any writer logic —
  * and lets LogStoreSpec inject a foreign winner into the exact
  * check-to-publish window to prove the retry discipline.
  */
trait LogStore {

  /** Publish `lines` (newline-terminated on write) as `target` IFF no
    * object exists there. MUST be all-or-nothing: a reader may never
    * observe a partial `target`. Throws
    * [[DeltaWriter.CommitConflictException]] when the version is already
    * claimed — the caller re-resolves the snapshot and retries at the
    * next version. Any other failure mode must also leave `target`
    * absent. */
  def putIfAbsent(fs: FileSystem, target: Path, lines: Iterator[String]): Unit
}

object LogStore {
  /** Store selection through config: `-Dgraft.logStore=object` flips every
    * commit claim in the JVM to the conditional-put protocol (the two-JVM
    * ConcurrencyDrill races both ways); default is the rename store whose
    * semantics the local sandbox and HDFS share. */
  def forName(name: String): LogStore = name match {
    case "rename" => HadoopRenameLogStore
    case "object" => new ObjectStoreLogStore()
    case other => throw new IllegalArgumentException(
      s"unknown graft.logStore '$other' (expected rename|object)")
  }

  /** The JVM's configured default store ([[forName]] of `graft.logStore`). */
  def fromConfig(): LogStore =
    forName(sys.props.getOrElse("graft.logStore", "rename"))
}

/** HDFS-semantics store: stream to a hidden temp file in the log dir, then
  * one no-overwrite rename. Correct wherever rename is atomic and fails on
  * an existing destination — HDFS and the local FS the sandbox runs on.
  * The pre-rename exists() check is an optimization (skip the temp write
  * when the race is already lost), not the atomicity claim: the rename's
  * no-overwrite failure is what actually decides the winner. */
object HadoopRenameLogStore extends LogStore {
  override def putIfAbsent(fs: FileSystem, target: Path,
                           lines: Iterator[String]): Unit = {
    if (fs.exists(target))
      throw new DeltaWriter.CommitConflictException(
        s"concurrent commit: $target exists")
    val tmp = new Path(target.getParent,
      s".${target.getName}.${UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try lines.foreach { l =>
      out.write(l.getBytes(StandardCharsets.UTF_8)); out.write('\n')
    } catch {
      case t: Throwable => out.close(); fs.delete(tmp, false); throw t
    }
    out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new DeltaWriter.CommitConflictException(
        s"commit rename failed for $target")
    }
  }
}

/** Object-store-semantics commit claim: one conditional PUT, NO rename.
  *
  * On S3/GCS/ABFS — the reference's deployment world (reference
  * Config.scala:4, DeltaMetadataHandler.scala:27-28) — the atomic
  * no-overwrite rename that [[HadoopRenameLogStore]] builds on does not
  * exist; the primitive the store offers instead is an atomic CONDITIONAL
  * CREATE (S3 `If-None-Match: *` PUT, GCS `ifGenerationMatch=0`, ABFS
  * ETag `If-None-Match`). This store is that protocol, emulated faithfully
  * on the sandbox filesystems:
  *
  *  - the commit body is assembled WRITER-LOCALLY first (spilled to
  *    instance-local disk, never the log dir — an object PUT ships
  *    complete bytes, and the spill keeps commitAtomicStream's
  *    bounded-memory discipline for table-sized commits);
  *  - ONE conditional create decides the winner. On `file:` the claim is
  *    an O_EXCL open (`CREATE_NEW`) — the kernel's atomic
  *    claim — because Hadoop's LocalFileSystem `create(overwrite=false)`
  *    is a racy check-then-create that two JVMs hammering the same
  *    version WILL interleave; on HDFS-like schemes it is
  *    `create(overwrite=false)`, which is atomic there. Each backing
  *    store supplies its native conditional-create primitive — exactly
  *    how a production multi-scheme LogStore is structured;
  *  - NO pre-existence check gates the claim: object-store LISTs can be
  *    stale (visible-after-delay), so a listing is never the authority —
  *    a writer that resolved a stale snapshot simply LOSES the
  *    conditional create and goes through the normal conflict-checked
  *    retry;
  *  - a mid-body failure deletes the claimed object before rethrowing:
  *    a real PUT is all-or-nothing, so the emulation must never leave a
  *    partial object visible. The delete cannot destroy a foreign
  *    commit — only this writer's create succeeded at that path.
  *
  * [[ObjectStoreLogStore.Faults]] is the injectable failure seam the
  * specs drive: crash BEFORE the claim (nothing published, the version
  * stays claimable by anyone), crash AFTER the put (the commit is durable
  * — history continues past the dead writer), and a mid-body IO failure
  * (the cleanup path). */
final class ObjectStoreLogStore(faults: ObjectStoreLogStore.Faults)
    extends LogStore {
  def this() = this(ObjectStoreLogStore.NoFaults)

  override def putIfAbsent(fs: FileSystem, target: Path,
                           lines: Iterator[String]): Unit = {
    // 1. assemble the PUT body writer-locally (bounded memory via spill)
    val local = java.nio.file.Files.createTempFile("graft_oslog_", ".body")
    try {
      val w = java.nio.file.Files.newBufferedWriter(local, StandardCharsets.UTF_8)
      try lines.foreach { l => w.write(l); w.write('\n') } finally w.close()
      faults.beforeClaim(target)
      // 2. the atomic claim
      val out = exclusiveCreate(fs, target)
      // 3. stream the complete body into the claimed object
      try {
        faults.duringBody(target)
        val in = java.nio.file.Files.newInputStream(local)
        try {
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        out.close()
      } catch {
        case t: Throwable =>
          scala.util.Try(out.close())
          scala.util.Try(fs.delete(target, false)) // restore all-or-nothing
          throw t
      }
      faults.afterPut(target)
    } finally java.nio.file.Files.deleteIfExists(local)
  }

  private def exclusiveCreate(fs: FileSystem,
                              target: Path): java.io.OutputStream = {
    def lost() = new DeltaWriter.CommitConflictException(
      s"concurrent commit: conditional create lost for $target")
    val scheme = Option(target.toUri.getScheme).getOrElse(fs.getScheme)
    if (scheme == "file") {
      val p = java.nio.file.Paths.get(target.toUri.getPath)
      java.nio.file.Files.createDirectories(p.getParent)
      try java.nio.file.Files.newOutputStream(p,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      catch { case _: java.nio.file.FileAlreadyExistsException => throw lost() }
    } else {
      try fs.create(target, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => throw lost()
        case e: java.io.IOException if fs.exists(target) => throw lost()
      }
    }
  }
}

object ObjectStoreLogStore {
  /** Injectable failure windows (test seam; every hook defaults to a
    * no-op). Each hook may throw to simulate the writer dying — or the
    * store failing — at that exact point in the claim protocol. */
  trait Faults {
    /** Before the conditional create: a crash here published NOTHING —
      * the version remains claimable by any writer. */
    def beforeClaim(target: Path): Unit = ()
    /** With the object claimed but the body not yet landed: an IO
      * failure here exercises the partial-object cleanup. */
    def duringBody(target: Path): Unit = ()
    /** After the put is durable: a crash here is put-then-crash — the
      * commit must survive the dead writer. */
    def afterPut(target: Path): Unit = ()
  }
  object NoFaults extends Faults
}
