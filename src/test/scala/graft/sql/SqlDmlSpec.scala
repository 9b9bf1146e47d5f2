package graft.sql

import graft.SparkSpec
import graft.delta.{DeltaSnapshotReader, DeltaWriter}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SQL-text DML surface: the statements run through PLAIN `spark.sql` (the
  * [[GraftSqlParser]] injected via spark.sql.extensions), and through the
  * session-agnostic [[GraftSql.sql]] dispatcher — both must hit the same
  * [[DeltaWriter]] entry points the API oracles already pin. */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String = {
    val t = Files.createTempDirectory("graft_sqldml").toString + "/tbl"
    DeltaWriter.write((0L until 20L).map(i => (i, s"r$i", i % 5 * 100.0)).toDF("id", "s", "price"), t)
    t
  }

  test("UPDATE via spark.sql (injected parser): CoW rewrite + history entry") {
    val t = newTable()
    val out = spark.sql(s"UPDATE delta.`$t` SET s = 'hot', price = price * 2 WHERE price >= 300")
    assert(out.columns.toSeq == Seq("version"))
    assert(out.as[Long].head() == 1L)
    val got = DeltaSnapshotReader.load(spark, t)
    assert(got.filter(col("s") === "hot").count() == 8) // price 300/400 rows
    assert(got.filter(col("s") === "hot").agg(sum("price")).as[Double].head() == 8 * 700.0)
    assert(DeltaSnapshotReader.history(spark, t)
      .select("operation").as[String].collect().contains("UPDATE"))
  }

  test("DELETE via spark.sql; unconditional DELETE empties the table") {
    val t = newTable()
    spark.sql(s"DELETE FROM delta.`$t` WHERE id % 2 = 0")
    assert(DeltaSnapshotReader.load(spark, t).count() == 10)
    spark.sql(s"DELETE FROM delta.`$t`")
    assert(DeltaSnapshotReader.load(spark, t).count() == 0)
  }

  test("canonical MERGE via spark.sql equals DeltaWriter.merge") {
    val t = newTable()
    Seq((3L, "m3", -1.0), (99L, "new", 9.0)).toDF("id", "s", "price")
      .createOrReplaceTempView("sqldml_src")
    spark.sql(
      s"""MERGE INTO delta.`$t` AS t USING sqldml_src AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = DeltaSnapshotReader.load(spark, t)
    assert(got.count() == 21)
    assert(got.filter(col("id") === 3L).select("s").as[String].head() == "m3")
    assert(got.filter(col("id") === 99L).select("price").as[Double].head() == 9.0)
  }

  test("non-canonical MERGE refuses with a clear message") {
    val t = newTable()
    Seq((3L, "m3", -1.0)).toDF("id", "s", "price").createOrReplaceTempView("sqldml_src2")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO delta.`$t` t USING sqldml_src2 s ON t.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin).collect())
    def chain(ex: Throwable) =
      Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).map(String.valueOf(_)).mkString("|")
    assert(chain(e).contains("canonical MERGE shape") || chain(e).contains("MERGE ON"), chain(e))
  }

  test("OPTIMIZE + VACUUM via SQL: reader-invisible, files compacted + reaped") {
    val t = Files.createTempDirectory("graft_sqldml").toString + "/tbl"
    (0 until 3).foreach { i =>
      DeltaWriter.write((0L until 10L).map(j => (i * 10L + j, s"x$j", j * 1.0))
        .toDF("id", "s", "price").repartition(2), t)
    }
    val before = DeltaSnapshotReader.snapshot(spark, t).files.size
    assert(before > 1)
    spark.sql(s"OPTIMIZE delta.`$t`")
    assert(DeltaSnapshotReader.snapshot(spark, t).files.size < before)
    val reaped = spark.sql(s"VACUUM delta.`$t` RETAIN 0 HOURS")
    assert(reaped.columns.toSeq == Seq("n_deleted"))
    assert(reaped.as[Long].head() >= before.toLong)
    assert(DeltaSnapshotReader.load(spark, t).count() == 30)
  }

  test("ZORDER via SQL clusters the declared columns") {
    val t = newTable()
    val before = DeltaSnapshotReader.snapshot(spark, t).files.map(_.path).toSet
    spark.sql(s"OPTIMIZE delta.`$t` ZORDER BY (id, price)")
    assert(DeltaSnapshotReader.load(spark, t).count() == 20)
    // a layout commit happened (zorder logs operation OPTIMIZE + zOrderBy)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.files.map(_.path).toSet != before, "no rewrite committed")
    assert(DeltaSnapshotReader.history(spark, t)
      .select("operation").as[String].collect().contains("OPTIMIZE"))
  }

  test("GraftSql.sql dispatcher routes DML and falls through for plain SQL") {
    val t = newTable()
    val out = GraftSql.sql(spark, s"UPDATE delta.`$t` SET s = 'd' WHERE id < 5")
    assert(out.as[Long].head() == 1L)
    assert(DeltaSnapshotReader.load(spark, t).filter(col("s") === "d").count() == 5)
    // non-DML text falls through to plain spark.sql
    assert(GraftSql.sql(spark, "SELECT 1 AS one").as[Int].head() == 1)
  }
}
