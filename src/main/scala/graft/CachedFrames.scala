package graft

import org.apache.spark.sql.DataFrame

/** Bounded registry for long-lived persisted frames (ADVICE r10).
  *
  * Queries that persist a loop-invariant frame (PageRank's edge list, the
  * KMV intersect's distinct-key sides, …) rely on Spark's cache-manager
  * plan dedup to keep ONE materialization per (query, sfDir) — but a
  * long-lived JVM driving multiple sfDirs would still accumulate one
  * MEMORY_AND_DISK entry per dir per query until session stop. Each such
  * query registers its persisted frames here under a stable key: a later
  * call for a DIFFERENT dir unpersists the previous dir's frames
  * (unpersist is always safe — any still-live reader plan silently falls
  * back to recomputation), so steady state is one cached generation per
  * query regardless of how many fixtures the JVM has visited.
  */
object CachedFrames {
  private val live =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[DataFrame])]()

  /** Track already-persisted `frames` as query `key`'s live cache for
    * `dir`; unpersists whatever a previous call registered for the same
    * key under a different dir. */
  def track(key: String, dir: String, frames: DataFrame*): Unit = {
    val prev = live.put(key, (dir, frames.toSeq))
    if (prev != null && prev._1 != dir)
      prev._2.foreach(df => scala.util.Try(df.unpersist(false)))
  }
}
