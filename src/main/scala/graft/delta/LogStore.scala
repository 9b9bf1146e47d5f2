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
