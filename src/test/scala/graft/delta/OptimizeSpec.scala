package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** OPTIMIZE (small-file compaction): many tiny commits → one file per
  * partition; identical rows; stats merged; old versions still readable. */
class OptimizeSpec extends SparkSpec {
  import spark.implicits._

  test("compaction merges small files, preserves rows, merges stats") {
    val t = Files.createTempDirectory("graft_opt").toString + "/tbl"
    // 5 tiny commits = 5 files (the streaming-ingest small-file shape)
    (0 until 5).foreach { i =>
      DeltaWriter.write(Seq((i.toLong, s"v$i")).toDF("id", "s"), t)
    }
    val before = DeltaSnapshotReader.snapshot(spark, t)
    assert(before.files.size == 5)

    val v = DeltaWriter.optimize(spark, t)
    assert(v.contains(5L))
    val after = DeltaSnapshotReader.snapshot(spark, t)
    assert(after.files.size == 1, s"expected 1 compacted file, got ${after.files.size}")

    // identical content
    val got = DeltaSnapshotReader.load(spark, t).as[(Long, String)].collect().toSet
    assert(got == (0 until 5).map(i => (i.toLong, s"v$i")).toSet)

    // merged stats: numRecords summed, id range [0,4]
    val stats = DataSkipping.parse(after.files.head.stats.get).get
    assert(stats.numRecords.contains(5L))
    assert(stats.mins("id") == BigDecimal(0) && stats.maxs("id") == BigDecimal(4))

    // pre-compaction version still time-travels
    val v4 = DeltaSnapshotReader.load(spark, t, versionAsOf = Some(4L))
      .as[(Long, String)].collect().toSet
    assert(v4 == got)

    // idempotent: nothing left to compact
    assert(DeltaWriter.optimize(spark, t).isEmpty)
  }

  test("partitioned compaction keeps partition boundaries") {
    val t = Files.createTempDirectory("graft_opt").toString + "/tbl"
    (0 until 4).foreach { i =>
      DeltaWriter.write(
        Seq((i.toLong, 1995 + i % 2, s"r$i")).toDF("id", "yr", "s"),
        t, partitionBy = Seq("yr"))
    }
    assert(DeltaSnapshotReader.snapshot(spark, t).files.size == 4)
    DeltaWriter.optimize(spark, t)
    val after = DeltaSnapshotReader.snapshot(spark, t)
    assert(after.files.size == 2) // one per year
    assert(after.files.map(_.partitionValues("yr")).sorted == Seq("1995", "1996"))
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id", "yr").as[(Long, Int)].collect().toSet
    assert(got == Set((0L, 1995), (1L, 1996), (2L, 1995), (3L, 1996)))
  }

  test("multi-bin OPTIMIZE rewrites bins concurrently in ONE commit") {
    val t = Files.createTempDirectory("graft_opt_par").toString + "/tbl"
    // 8 partitions x 4 small files = 32 inputs → 8 bins (one per partition)
    (0 until 4).foreach { c =>
      DeltaWriter.write(
        (0 until 8).map(p => (p * 100L + c, p)).toDF("id", "p"), t, Seq("p"))
    }
    assert(DeltaSnapshotReader.snapshot(spark, t).fileSet.count == 32L)
    spark.conf.set("spark.graft.delta.optimize.maxThreads", "4")
    try {
      val v = DeltaWriter.optimize(spark, t)
      assert(v.contains(4L))
      val after = DeltaSnapshotReader.snapshot(spark, t)
      // >= 2 bins landed in the SINGLE commit (one compacted file per
      // partition), through the bounded thread pool
      assert(after.fileSet.count == 8L)
      assert(after.version == 4L)
      val got = DeltaSnapshotReader.load(spark, t)
        .select("id").as[Long].collect().toSet
      assert(got == (for (p <- 0 until 8; c <- 0 until 4) yield p * 100L + c).toSet)
      // per-bin stats survived the concurrent rewrite (merged, not lost)
      assert(after.fileSet.collected.forall(f =>
        DataSkipping.parse(f.stats.get).exists(_.numRecords.contains(4L))))
    } finally spark.conf.unset("spark.graft.delta.optimize.maxThreads")
  }
}
