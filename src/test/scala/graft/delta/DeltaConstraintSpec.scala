package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** CHECK constraints (Delta writerVersion 3, `delta.constraints.*` table
  * properties): write-time enforcement on appends, overwrites, and DML
  * rewrites; ADD CONSTRAINT validates existing rows; protocol bumps to
  * minWriterVersion 3 and survives checkpointing. */
class DeltaConstraintSpec extends SparkSpec {
  import spark.implicits._
  import DeltaWriter.ConstraintViolationException

  private def newTable(): String =
    Files.createTempDirectory("graft_ck").toString + "/tbl"

  test("append/overwrite enforce constraints; FALSE and NULL both violate") {
    val t = newTable()
    DeltaWriter.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"), t)
    DeltaWriter.setProperties(spark, t, Map("delta.constraints.price_pos" -> "price > 0"))
    // valid append passes
    DeltaWriter.write(Seq((3L, 30.0)).toDF("id", "price"), t)
    // violating append rejected, table unchanged
    val e = intercept[ConstraintViolationException](
      DeltaWriter.write(Seq((4L, -1.0)).toDF("id", "price"), t))
    assert(e.getMessage.contains("price_pos"), e.getMessage)
    assert(DeltaSnapshotReader.load(spark, t).count() == 3L)
    // NULL result counts as a violation (delta semantics)
    val e2 = intercept[ConstraintViolationException](
      DeltaWriter.write(Seq((5L, Option.empty[java.lang.Double])).toDF("id", "price"), t))
    assert(e2.getMessage.contains("price_pos"))
    // violating overwrite rejected too
    intercept[ConstraintViolationException](
      DeltaWriter.write(Seq((6L, 0.0)).toDF("id", "price"), t, Nil, "overwrite"))
    assert(DeltaSnapshotReader.load(spark, t).count() == 3L)
  }

  test("ADD CONSTRAINT validates existing rows and bumps writer protocol") {
    val t = newTable()
    DeltaWriter.write(Seq((1L, -5.0), (2L, 20.0)).toDF("id", "price"), t)
    // existing data violates → rejected, property NOT set
    intercept[ConstraintViolationException](
      DeltaWriter.setProperties(spark, t, Map("delta.constraints.price_pos" -> "price > 0")))
    assert(!DeltaSnapshotReader.snapshot(spark, t).configuration.contains("delta.constraints.price_pos"))
    // a satisfiable constraint lands and raises minWriterVersion to 3
    DeltaWriter.setProperties(spark, t, Map("delta.constraints.id_pos" -> "id > 0"))
    val logDir = java.nio.file.Paths.get(t, "_delta_log")
    val lastCommit = java.nio.file.Files.list(logDir).toArray.map(_.toString)
      .filter(_.endsWith(".json")).sorted.last
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(lastCommit)))
    assert(text.contains("\"minWriterVersion\":3"), text)
    // checkpoint preserves the bumped protocol (no downgrade to 2)
    DeltaWriter.checkpoint(spark, t)
    val cp = java.nio.file.Files.list(logDir).toArray.map(_.toString)
      .find(_.endsWith(".checkpoint.parquet")).get
    val protoRows = spark.read.parquet(cp)
      .where(col("protocol.minWriterVersion").isNotNull)
      .select("protocol.minWriterVersion").collect()
    assert(protoRows.map(_.getInt(0)).toSeq == Seq(3))
  }

  test("UPDATE/MERGE rewrites are gated; layout-only OPTIMIZE is not re-checked") {
    val t = newTable()
    DeltaWriter.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"), t)
    DeltaWriter.setProperties(spark, t, Map("delta.constraints.price_pos" -> "price > 0"))
    // an UPDATE that would break the constraint is rejected
    intercept[ConstraintViolationException](
      DeltaWriter.update(spark, t, col("id") === 1L, Map("price" -> lit(-9.0))))
    assert(DeltaSnapshotReader.load(spark, t)
      .filter(col("price") <= 0).count() == 0L)
    // a valid UPDATE passes
    DeltaWriter.update(spark, t, col("id") === 1L, Map("price" -> lit(11.0)))
    assert(DeltaSnapshotReader.load(spark, t)
      .filter(col("id") === 1L).select("price").head().getDouble(0) == 11.0)
    // dropping the constraint re-opens the gate
    DeltaWriter.setProperties(spark, t, Map.empty, removals = Seq("delta.constraints.price_pos"))
    DeltaWriter.write(Seq((9L, -1.0)).toDF("id", "price"), t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 3L)
  }
}
