package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

final case class Click(ad_id: Long, ts: Timestamp)
final case class Impression(ad_id: Long, ts: Timestamp, cost: Double)

/** Stream-stream interval join with watermarks on both sides — the
  * remaining Structured-Streaming join surface (impressions joined to the
  * clicks that follow them within 10 minutes). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Staging dirs are generation-suffixed (`<prefix>_g<N>x<nonce>`) since
    * the concurrent-invocation hardening; resolve the latest generation. */
  private def latestGen(prefix: String): java.io.File = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    def gen(f: java.io.File): Option[Long] = scala.util.Try(
      f.getName.stripPrefix(prefix + "_g").takeWhile(_.isDigit).toLong).toOption
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix + "_g") && gen(f).isDefined)
      .maxBy(gen(_).get)
  }

  test("stream-stream interval join matches batch semantics and expires state") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val impressions = MemoryStream[Impression]
    val clicks = MemoryStream[Click]

    val imp = impressions.toDF()
      .withColumnRenamed("ts", "imp_ts")
      .withWatermark("imp_ts", "10 minutes")
    val clk = clicks.toDF()
      .withColumnRenamed("ts", "click_ts")
      .withColumnRenamed("ad_id", "click_ad")
      .withWatermark("click_ts", "10 minutes")

    val joined = imp.join(clk,
      col("ad_id") === col("click_ad") &&
      col("click_ts") >= col("imp_ts") &&
      col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("ad_id"), unix_micros(col("imp_ts")).as("imp_us"),
        unix_micros(col("click_ts")).as("click_us"), col("cost"))

    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()

    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    impressions.addData(Impression(1, t(0), 0.5), Impression(2, t(1), 0.7))
    clicks.addData(Click(1, t(5)))             // within 10min of imp 1 → joins
    q.processAllAvailable()
    clicks.addData(Click(2, t(30)))            // 29min after imp 2 → outside interval
    clicks.addData(Click(1, t(8)))             // second click on imp 1 → joins
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def us(min: Int) = t(min).getTime * 1000L
    assert(rows == Set((1L, us(5)), (1L, us(8))),
      s"expected clicks at 10:05 and 10:08 on ad 1 only, got $rows")
  }

  test("stream_join key equals the batch interval self-join") {
    val got = EventOps.streamJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_pairs"))).toMap
    val ev = graft.Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val expected = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("cu")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected, s"stream pairs $got != batch pairs $expected")
    assert(got.nonEmpty)
  }

  test("stream_join_outer key equals the batch LEFT interval join") {
    val got = EventOps.streamJoinOuter(spark, sf).collect()
      .map(r => (r.getLong(0),
        (r.getAs[Long]("n_matched"), r.getAs[Long]("n_unmatched")))).toMap
    val ev = graft.Tables.events(spark, sf).filter(col("user_id") % 5 === 0)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val expected = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"), "left_outer")
      .groupBy(col("cu"))
      .agg(count(col("pu")).as("m"),
        sum(when(col("pu").isNull, 1L).otherwise(0L)).as("u"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"stream outer $got != batch outer $expected")
    // the outer semantics must actually show: some click with no purchase
    assert(got.values.exists(_._2 > 0), "fixture has no unmatched clicks?")
    // sentinels never leak into the output
    assert(!got.contains(-5L))
  }

  test("state partitioning: conf-sized, recorded and frozen in the checkpoint") {
    spark.conf.set("spark.graft.stream.statePartitions", "4")
    try {
      val got = EventOps.streamJoin(spark, sf).collect()
      assert(got.nonEmpty)
      val ck = new java.io.File(
        latestGen("graft_stream_join_" + sf.replaceAll("[^A-Za-z0-9.]", "_")), "_ck")
      // the join's 4-store state lives under exactly the configured
      // partition count — the layout a restart must reproduce
      val parts = new java.io.File(ck, "state/0").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.forall(_.isDigit)).map(_.toInt)
      assert(parts.sorted.toSeq == (0 until 4), s"state dirs: ${parts.mkString(",")}")
      // and the offset log RECORDS the frozen count (what makes resizing
      // require a fresh checkpoint)
      val off = new java.io.File(ck, "offsets").listFiles().sortBy(_.getName).last
      val txt = new String(java.nio.file.Files.readAllBytes(off.toPath), "UTF-8")
      assert(txt.contains("\"spark.sql.shuffle.partitions\":\"4\""), txt)
    } finally spark.conf.unset("spark.graft.stream.statePartitions")
  }

  test("stream_upsert_delta: second micro-batch UPDATES rows via MERGE") {
    val got = EventOps.streamUpsertDelta(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_events"), r.getAs[Long]("sum_scaled"))).toMap
    val expected = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 1000000) AS BIGINT)")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, "running upsert table != batch aggregate")
    // the table's history must show the initial WRITE then a MERGE — proof
    // the stream delivered two micro-batches and the second one upserted
    val table = new java.io.File(
      latestGen("graft_stream_upsert_" + sf.replaceAll("[^A-Za-z0-9.]", "_")),
      "table").toString
    val ops = graft.delta.DeltaSnapshotReader.history(spark, table)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("MERGE"), s"no MERGE commit in $ops")
    assert(ops.contains("WRITE"), s"no initial WRITE commit in $ops")
  }

  test("stream_static_join key equals the batch dimension join") {
    val got = EventOps.streamStaticJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"))).toMap
    val expected = graft.Tables.events(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected, s"stream enrich $got != batch enrich $expected")
    assert(got.nonEmpty)
  }
}
