package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Generated columns (`delta.generationExpression`): declaration at
  * creation, population of omitted columns on append, null-safe validation
  * of supplied values, DML consistency, and the writer-protocol-4 gate. */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_gen").toString + "/tbl"

  private def batch(rows: (Long, String)*) =
    rows.toDF("id", "d").withColumn("d", col("d").cast("date"))

  test("creation declares the expression; append populates; protocol is writer v4") {
    val t = newTable()
    DeltaWriter.write(
      GeneratedColumns.withGenerated(batch(1L -> "2024-03-05", 2L -> "2025-07-01"),
        "y", "year(d)"),
      t, partitionBy = Seq("y"))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.protocol.exists(_.minWriterVersion == 4))
    assert(GeneratedColumns.of(snap.schema).map { case (f, e) => f.name -> e } ==
      Seq("y" -> "year(d)"))
    // append WITHOUT the generated column — populated from the expression
    DeltaWriter.write(batch(3L -> "2024-12-31"), t, partitionBy = Seq("y"))
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id", "y").as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 2024), (2L, 2025), (3L, 2024)))
  }

  test("supplied values are validated null-safely; inconsistent batch refused") {
    val t = newTable()
    DeltaWriter.write(
      GeneratedColumns.withGenerated(batch(1L -> "2024-03-05"), "y", "year(d)"), t)
    // consistent explicit value (and a NULL source row: year(NULL) <=> NULL)
    DeltaWriter.write(
      batch(2L -> "2023-01-01", 3L -> null).withColumn("y", year(col("d"))), t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 3)
    val e = intercept[IllegalArgumentException](
      DeltaWriter.write(batch(4L -> "2022-06-01").withColumn("y", lit(1999)), t))
    assert(e.getMessage.contains("generated column y"), e.getMessage)
    assert(DeltaSnapshotReader.load(spark, t).count() == 3) // nothing committed
  }

  test("UPDATE violating the generated column is refused; consistent one commits") {
    val t = newTable()
    DeltaWriter.write(
      GeneratedColumns.withGenerated(batch(1L -> "2024-03-05", 2L -> "2024-08-09"),
        "y", "year(d)"), t)
    val e = intercept[IllegalArgumentException](
      DeltaWriter.update(spark, t, col("id") === 1L,
        Map("d" -> lit("2021-01-01").cast("date"))))
    assert(e.getMessage.contains("generated column y"), e.getMessage)
    // moving the date WITHIN the year keeps y consistent → commits
    DeltaWriter.update(spark, t, col("id") === 1L,
      Map("d" -> lit("2024-01-01").cast("date")))
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id", "d").as[(Long, java.sql.Date)].collect().toMap
    assert(got(1L).toString == "2024-01-01")
  }

  test("foreign writer-v4 table: writable with and without CDF (append feeds insert)") {
    val schemaJson =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"d\",\"type\":\"date\",\"nullable\":true,\"metadata\":{}}]}"""
    def mk(conf: String): String = {
      val t = newTable()
      val dir = Paths.get(t, "_delta_log")
      Files.createDirectories(dir)
      Files.write(dir.resolve(f"${0L}%020d.json"), Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
        s"""{"metaData":{"id":"m-v4","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{$conf},"createdTime":1}}"""
      ).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      t
    }
    val plain = mk("")
    DeltaWriter.write(batch(1L -> "2024-01-01"), plain)
    assert(DeltaSnapshotReader.load(spark, plain).count() == 1)
    // CDF on a writer-v4 table is implemented since round 5: the append
    // commits, and the change feed derives its rows as inserts
    val cdf = mk(""""delta.enableChangeDataFeed":"true"""")
    DeltaWriter.write(batch(1L -> "2024-01-01"), cdf)
    val changed = ChangeDataFeed.read(spark, cdf, 1L)
      .select("id", "_change_type").as[(Long, String)].collect().toSeq
    assert(changed == Seq((1L, "insert")))
  }
}
