package graft.delta

/** Scan-parallelism planning (reference A7: one Split per data file,
  * DeltaMetadataHandler.scala:168-181). Spark's own equivalent is
  * `FilePartition` bin-packing governed by `spark.sql.files.maxPartitionBytes`
  * / `openCostInBytes`; this mirrors that greedy algorithm so split planning
  * is observable and testable as a first-class operator.
  */
object SplitPlanner {

  final case class Split(id: Int, files: Seq[AddFile]) {
    def bytes: Long = files.map(_.size).sum
  }

  /** Greedy first-fit-decreasing-order bin packing, same shape as Spark's
    * `FilePartition.getFilePartitions`: sort files by size descending, open
    * a new split when adding a file would exceed `maxSplitBytes`; every file
    * also pays `openCost` to stop thousands of tiny files collapsing into
    * one task. */
  def plan(files: Seq[AddFile], maxSplitBytes: Long = 128L * 1024 * 1024,
           openCost: Long = 4L * 1024 * 1024): Seq[Split] = {
    val sorted = files.sortBy(f => (-f.size, f.path))
    val splits = Seq.newBuilder[Split]
    var current = Vector.empty[AddFile]
    var currentBytes = 0L
    var id = 0
    def close(): Unit = if (current.nonEmpty) {
      splits += Split(id, current)
      id += 1; current = Vector.empty; currentBytes = 0L
    }
    sorted.foreach { f =>
      val cost = f.size + openCost
      if (currentBytes > 0 && currentBytes + cost > maxSplitBytes) close()
      current :+= f
      currentBytes += cost
    }
    close()
    splits.result()
  }
}
