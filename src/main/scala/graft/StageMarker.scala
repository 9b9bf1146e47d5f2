package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Staleness signature for staged/derived fixtures, shared by every
  * marker-cached staging site (Scan.staged, the EventOps stream fixtures,
  * ScaleProbe's replica corpus): the marker RECORDS the source files'
  * (mtime, size) signature rather than relying on marker-vs-source mtime
  * ordering — a fixture regenerated within the same millisecond tick, or
  * copied in with a preserved mtime, would tie the ordering check and
  * silently reuse a stale staged copy (ADVICE r10; FIXTURES.md drift
  * class). One helper so the staleness rule lives in one place. */
object StageMarker {

  /** Order-stable (mtime:size) signature of the source files. */
  def sig(srcs: Seq[File]): String =
    srcs.map(f => f.lastModified() + ":" + f.length()).mkString(",")

  def sig(src: File): String = sig(Seq(src))

  /** True iff `marker` exists and records exactly `sig`. */
  def fresh(marker: File, sig: String): Boolean =
    marker.exists() && scala.util.Try(
      new String(Files.readAllBytes(marker.toPath), StandardCharsets.UTF_8))
      .toOption.contains(sig)

  def write(marker: File, sig: String): Unit =
    Files.write(marker.toPath, sig.getBytes(StandardCharsets.UTF_8))
}
