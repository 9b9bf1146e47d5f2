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

  test("general MERGE clause list via SQL equals DeltaWriter.mergeClauses") {
    // the same clause shape the delta_merge_clauses oracle pins, written as
    // SQL text with USER aliases (tgt/src) — conditional matched
    // DELETE/UPDATE, conditional INSERT *, NOT MATCHED BY SOURCE UPDATE
    val tSql = newTable()
    val tApi = newTable()
    Seq((3L, "m3", 950.0), (4L, "m4", 10.0), (5L, "del", 1.0),
        (99L, "new", 500.0), (98L, "low", 5.0))
      .toDF("id", "s", "price").createOrReplaceTempView("sqldml_srcg")
    val src = spark.table("sqldml_srcg")
    spark.sql(
      s"""MERGE INTO delta.`$tSql` AS tgt USING sqldml_srcg AS src
         |ON tgt.id = src.id
         |WHEN MATCHED AND tgt.price < 100 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET s = src.s, price = src.price + 1
         |WHEN NOT MATCHED AND src.price > 100 THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND tgt.price = 0 THEN UPDATE SET s = 'zeroed'
         |""".stripMargin)
    DeltaWriter.mergeClauses(spark, tApi, src, Seq("id"), Seq(
      DeltaWriter.MatchedDelete(Some(col("t.price") < 100)),
      DeltaWriter.MatchedUpdate(Map("s" -> col("s.s"), "price" -> (col("s.price") + 1))),
      DeltaWriter.NotMatchedInsertAll(Some(col("s.price") > 100)),
      DeltaWriter.NotMatchedBySourceUpdate(Map("s" -> lit("zeroed")),
        Some(col("t.price") === 0))))
    val got = DeltaSnapshotReader.load(spark, tSql).orderBy("id").collect().toSeq
    val exp = DeltaSnapshotReader.load(spark, tApi).orderBy("id").collect().toSeq
    assert(got == exp)
    // spot semantics: id=5 (target price 0 < 100) matched -> DELETE;
    // id=3 (price 300) -> update (m3, 950+1); id=99 inserted (500>100);
    // id=98 NOT inserted (5<=100); unmatched-by-source price-0 rows
    // (0,10,15) -> s='zeroed'; everything else untouched
    val bySql = got.map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(!bySql.contains(5L))
    assert(bySql(3L) == ("m3", 951.0))
    assert(bySql(99L) == ("new", 500.0))
    assert(!bySql.contains(98L))
    assert(bySql(10L)._1 == "zeroed" && bySql(7L)._1 == "r7")
  }

  test("unsupported MERGE actions refuse with a clear message") {
    val t = newTable()
    Seq((3L, "m3", -1.0)).toDF("id", "s", "price").createOrReplaceTempView("sqldml_src2")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO delta.`$t` t USING sqldml_src2 s ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)""".stripMargin).collect())
    def chain(ex: Throwable) =
      Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).map(String.valueOf(_)).mkString("|")
    assert(chain(e).contains("INSERT *"), chain(e))
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns evolve the table") {
    val t = newTable() // (id, s, price)
    Seq((3L, "m3", -1.0, "x3"), (99L, "new", 9.0, "x99"))
      .toDF("id", "s", "price", "extra").createOrReplaceTempView("sqldml_evo1")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO delta.`$t` AS t USING sqldml_evo1 AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = DeltaSnapshotReader.load(spark, t)
    assert(got.columns.toSeq == Seq("id", "s", "price", "extra"))
    assert(got.count() == 21)
    // matched + inserted rows carry the source's new column; untouched
    // target rows read null for it
    assert(got.filter(col("id") === 3L).select("extra").as[String].head() == "x3")
    assert(got.filter(col("id") === 99L).select("extra").as[String].head() == "x99")
    assert(got.filter(col("extra").isNull).count() == 19)
  }

  test("MERGE WITH SCHEMA EVOLUTION: matched rows KEEP columns the source omits") {
    val t = newTable() // (id, s, price)
    Seq((3L, 33.3, "y3"), (99L, 9.0, "y99"))
      .toDF("id", "price", "extra").createOrReplaceTempView("sqldml_evo2")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO delta.`$t` AS t USING sqldml_evo2 AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = DeltaSnapshotReader.load(spark, t)
    // the matched row keeps its target-only `s` value but takes the
    // source's price and extra; the inserted row has s = null
    val r3 = got.filter(col("id") === 3L)
      .select("s", "price", "extra").as[(String, Double, String)].head()
    assert(r3 == ("r3", 33.3, "y3"))
    assert(got.filter(col("id") === 99L).select("s").as[Option[String]].head().isEmpty)
    assert(got.filter(col("id") === 99L).select("extra").as[String].head() == "y99")
  }

  test("MERGE ON guards: one-side tautology refused; case-mismatched ON accepted") {
    val t = newTable()
    Seq((3L, "m3", -1.0), (99L, "new", 9.0)).toDF("id", "s", "price")
      .createOrReplaceTempView("sqldml_src3")
    def chain(ex: Throwable) =
      Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).map(String.valueOf(_)).mkString("|")
    // `t.id = t.id` is not a join key — refusing beats silently executing
    // different semantics than the written (degenerate) condition
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO delta.`$t` t USING sqldml_src3 s ON t.id = t.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect())
    assert(chain(e).contains("one side"), chain(e))
    // ON t.ID = s.id is valid under Spark's case-insensitive resolution
    spark.sql(
      s"""MERGE INTO delta.`$t` t USING sqldml_src3 s ON t.ID = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = DeltaSnapshotReader.load(spark, t)
    assert(got.count() == 21)
    assert(got.filter(col("id") === 3L).select("s").as[String].head() == "m3")
  }

  test("UPDATE with duplicate assignment targets refuses") {
    val t = newTable()
    def chain(ex: Throwable) =
      Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).map(String.valueOf(_)).mkString("|")
    val e = intercept[Exception](spark.sql(
      s"UPDATE delta.`$t` SET price = 0, price = price * 2 WHERE id = 1").collect())
    assert(chain(e).contains("duplicate assignment"), chain(e))
    // nothing was applied — neither assignment
    assert(DeltaSnapshotReader.load(spark, t)
      .filter(col("id") === 1L).select("price").as[Double].head() == 100.0)
  }

  test("SQL OPTIMIZE on a clustered table re-clusters incrementally, not bin-packs") {
    val t = Files.createTempDirectory("graft_sqldml").toString + "/tbl"
    (0 until 4).foreach { i =>
      DeltaWriter.write((0L until 100L).filter(_ % 4 == i)
        .map(v => (v, (v * 37) % 100, s"r$v")).toDF("a", "b", "s").coalesce(1), t)
    }
    graft.delta.Clustering.cluster(spark, t, Seq("a", "b"))
    spark.sql(s"OPTIMIZE delta.`$t`") // full clustering pass via SQL
    val clustered = DeltaSnapshotReader.snapshot(spark, t).files.map(_.path).toSet
    DeltaWriter.write((100L until 120L).map(v => (v, v % 100, s"r$v"))
      .toDF("a", "b", "s").coalesce(1), t)
    spark.sql(s"OPTIMIZE delta.`$t`")
    val after = DeltaSnapshotReader.snapshot(spark, t).files.map(_.path).toSet
    // bin-packing would have merged everything; the declared layout wins
    assert(clustered.subsetOf(after), "SQL OPTIMIZE bin-packed a clustered table")
    assert(DeltaSnapshotReader.load(spark, t).count() == 120)
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
    spark.conf.set("spark.graft.retentionDurationCheck.enabled", "false")
    val reaped =
      try spark.sql(s"VACUUM delta.`$t` RETAIN 0 HOURS")
      finally spark.conf.unset("spark.graft.retentionDurationCheck.enabled")
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

  test("DESCRIBE HISTORY via SQL lists commits newest-first with JSON params") {
    val t = newTable()
    spark.sql(s"UPDATE delta.`$t` SET s = 'h' WHERE id = 0")
    val h = spark.sql(s"DESCRIBE HISTORY delta.`$t`").collect()
    assert(h.length == 2)
    assert(h.head.getLong(0) == 1L && h.last.getLong(0) == 0L)
    assert(h.map(_.getString(2)).toSeq == Seq("UPDATE", "WRITE"))
    // parameters column is JSON text (audit-friendly, schema-stable)
    assert(h.head.getString(3).startsWith("{"), h.head.getString(3))
  }

  test("GraftSql.sql dispatcher routes DML and falls through for plain SQL") {
    val t = newTable()
    val out = GraftSql.sql(spark, s"UPDATE delta.`$t` SET s = 'd' WHERE id < 5")
    assert(out.as[Long].head() == 1L)
    assert(DeltaSnapshotReader.load(spark, t).filter(col("s") === "d").count() == 5)
    // non-DML text falls through to plain spark.sql
    assert(GraftSql.sql(spark, "SELECT 1 AS one").as[Int].head() == 1)
  }

  test("table_changes TVF: version bounds, both names, timestamp start") {
    val t = newTable() // v0: ids 0..19
    DeltaWriter.setProperties(spark, t,
      Map("delta.enableChangeDataFeed" -> "true")) // v1
    Thread.sleep(30)
    val betweenV1V2 = java.time.Instant.now()
    Thread.sleep(30)
    DeltaWriter.delete(spark, t, col("id") < 3L) // v2: 3 deletes
    DeltaWriter.write((100L until 105L).map(i => (i, s"r$i", 0.0))
      .toDF("id", "s", "price"), t) // v3: 5 inserts
    // open range [2, latest]
    val all = spark.sql(s"SELECT _change_type, COUNT(*) AS n " +
      s"FROM table_changes('delta.`$t`', 2) GROUP BY 1 ORDER BY 1")
      .as[(String, Long)].collect().toMap
    assert(all == Map("delete" -> 3L, "insert" -> 5L))
    // closed range [2, 2] via the by-path name, plain path string
    val only2 = spark.sql(s"SELECT _commit_version, _change_type " +
      s"FROM table_changes_by_path('$t', 2, 2)")
      .as[(Long, String)].collect()
    assert(only2.length == 3 && only2.forall(_ == ((2L, "delete"))))
    // timestamp start: between v1 and v2 → feed starts at v2
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    val tsStr = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneId.of(zone)).format(betweenV1V2)
    val fromTs = spark.sql(s"SELECT COUNT(*) AS n " +
      s"FROM table_changes('$t', '$tsStr')").as[Long].head()
    assert(fromTs == 8L, s"timestamp-start feed returned $fromTs rows")
    // TVF composes with joins/filters like any relation
    spark.read.format("graftdelta").load(t).createOrReplaceTempView("tvf_tbl")
    val joined = spark.sql(
      s"""SELECT c._change_type, COUNT(*) AS n
         |FROM table_changes('$t', 2) c JOIN tvf_tbl v ON c.id = v.id
         |GROUP BY 1 ORDER BY 1""".stripMargin).as[(String, Long)].collect().toMap
    assert(joined == Map("insert" -> 5L)) // deleted ids no longer in the table
  }
}
