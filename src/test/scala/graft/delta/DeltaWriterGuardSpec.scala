package graft.delta

import graft.SparkSpec

import java.nio.file.Files

/** Writer guard rails: schema/partitioning enforcement and commit-conflict
  * detection. */
class DeltaWriterGuardSpec extends SparkSpec {
  import spark.implicits._

  test("append with mismatched schema is rejected") {
    val t = Files.createTempDirectory("graft_guard").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((2L, 3.14)).toDF("id", "price"), t)
    }
    assert(e.getMessage.contains("schema mismatch"))
    // table unchanged
    assert(DeltaSnapshotReader.snapshot(spark, t).version == 0L)
  }

  test("append with mismatched partitioning is rejected") {
    val t = Files.createTempDirectory("graft_guard").toString + "/tbl"
    DeltaWriter.write(Seq((1L, 1995, "a")).toDF("id", "yr", "s"), t, partitionBy = Seq("yr"))
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((2L, 1996, "b")).toDF("id", "yr", "s"), t)
    }
    assert(e.getMessage.contains("partitioning mismatch"))
  }

  test("foreign commit landing first advances the version; next write builds on it") {
    val t = Files.createTempDirectory("graft_guard").toString + "/tbl"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "s"), t)
    // a concurrent writer lands version 1 (no-op commit) before our write
    val race = java.nio.file.Paths.get(t, "_delta_log", f"${1L}%020d.json")
    java.nio.file.Files.write(race, "{\"commitInfo\":{\"operation\":\"NOOP\"}}\n".getBytes)
    val v = DeltaWriter.write(Seq((2L, "b")).toDF("id", "s"), t)
    assert(v == 2L, "writer must commit ABOVE the foreign version, never overwrite it")
    val got = DeltaSnapshotReader.load(spark, t).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }
}
