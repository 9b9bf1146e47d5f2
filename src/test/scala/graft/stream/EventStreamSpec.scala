package graft.stream

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import java.sql.Timestamp

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                    event_type: String, value: Double)

/** True Structured-Streaming verification of the EventOps semantics
  * (SURVEY.md §2B streaming keys, all †): the same window expressions run
  * through readStream/MemoryStream must agree with the batch fixpoint. */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def eventsStream() = {
    // same physical-type sniff as EventOps.stagedEventStream: the stream's
    // reader schema comes from a batch read of the staged file, so the
    // ns-vs-µs branch in Tables.normalizeEventTs applies identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(streamDir)
    Tables.normalizeEventTs(
      spark.readStream.schema(batch.schema).parquet(streamDir))
  }

  private def runComplete(df: org.apache.spark.sql.DataFrame, name: String) = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("streaming tumbling window equals batch window()") {
    val streamed = runComplete(
      eventsStream()
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("wstart_us"),
          col("event_type"), col("n")),
      "t_tumbling")
    val batch = EventOps.tumbling(spark, sf)
      .select("wstart_us", "event_type", "n")
    assert(streamed.collect().toSet == batch.collect().toSet)
  }

  test("streaming windowed top-k (agg in stream, rank downstream) equals batch") {
    import org.apache.spark.sql.expressions.Window
    val aggStreamed = runComplete(
      eventsStream()
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("wstart_us"),
          col("event_type"), col("n")),
      "t_topk_agg")
    // the rank is applied DOWNSTREAM of the streaming aggregation's
    // emission — the composition stream_topk documents
    val w = Window.partitionBy(col("wstart_us"))
      .orderBy(col("n").desc, col("event_type"))
    val streamed = aggStreamed.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("wstart_us", "rk", "event_type", "n")
    val batch = EventOps.topkWindow(spark, sf)
    assert(streamed.collect().toSet == batch.collect().toSet)
  }

  test("chained windowed aggregations (two stateful ops) equal the batch fixpoint") {
    // stage the events file plus a far-future sentinel so the final
    // watermark closes every real 15-minute window (append mode only
    // emits closed windows); the sentinel's own windows are filtered out
    val d = java.nio.file.Files.createTempDirectory("graft_chain")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), d.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchRaw = spark.read.parquet(d.toString)
    val isNs = batchRaw.schema("ts").dataType == LongType
    val sent = batchRaw.orderBy(col("ts").desc).limit(1)
      .withColumn("ts",
        if (isNs) col("ts") + lit(10L * 86400L * 1000000000L)
        else col("ts") + expr("INTERVAL 10 DAYS"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_chain_sent")
    sent.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath, d.resolve("zz_sentinel.parquet"))

    val ev = Tables.normalizeEventTs(
      spark.readStream.schema(batchRaw.schema)
        .option("maxFilesPerTrigger", "1").parquet(d.toString))
    val chained = ev.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n5"))
      .groupBy(window(col("window"), "15 minutes"), col("event_type"))
      .agg(sum(col("n5")).as("n15"), max(col("n5")).as("max_n5"))
      .select(unix_micros(col("window.start")).as("wstart_us"),
        col("event_type"), col("n15"), col("max_n5"))
    val q = chained.writeStream.format("memory").queryName("t_chained")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_chain_ck").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val maxRealUs = Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).collect().head.getLong(0)
    val streamed = spark.table("t_chained")
      .filter(col("wstart_us") <= maxRealUs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = EventOps.chainedAgg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"chained stream ${streamed.size} rows != batch ${batch.size} rows")
    assert(streamed.nonEmpty)
  }

  test("streaming session window equals batch session_window()") {
    val streamed = runComplete(
      eventsStream()
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          col("n_events")),
      "t_session")
    val batch = EventOps.session(spark, sf)
      .select("user_id", "session_start_us", "n_events")
    assert(streamed.collect().toSet == batch.collect().toSet)
  }

  test("watermark drops late data in append mode") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val agg = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("t_late")
      .outputMode("append").start()
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // batch 1: events at 10:00 and 10:31 → watermark advances to 10:21
    ms.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(31), 1, "a", 1.0))
    q.processAllAvailable()
    // batch 2: late event at 10:02 (behind watermark) must be DROPPED,
    // on-time event at 10:32 lands in the open window
    ms.addData(Ev(3, ts(2), 1, "a", 1.0), Ev(4, ts(32), 1, "a", 1.0))
    q.processAllAvailable()
    ms.addData(Ev(5, Timestamp.valueOf("2024-01-01 11:30:00"), 1, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_late").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w1000 = unixMicros("2024-01-01 10:00:00")
    assert(out(w1000) == 1L, s"late event must not be added to closed 10:00 window: $out")
    val w1030 = unixMicros("2024-01-01 10:30:00")
    assert(out(w1030) == 2L, s"10:30 window must hold the two on-time events: $out")
  }

  test("dropDuplicatesWithinWatermark: dups drop while state lives, re-emit after expiry") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("t_dedup_wm")
      .outputMode("append").start()
    def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")
    // b1: ids 1, 2 at 10:00 → both emit; watermark advances to 09:50
    ms.addData(Ev(1, ts("10:00"), 1, "a", 1.0), Ev(2, ts("10:00"), 1, "a", 1.0))
    q.processAllAvailable()
    // b2: id 1 again at 10:05 — its state lives until the watermark passes
    // 10:00 + 10min, so this is a DUP and must drop; id 3 at 10:30 emits
    // and advances the watermark to 10:20 (beyond id 1's 10:10 expiry)
    ms.addData(Ev(1, ts("10:05"), 1, "a", 9.9), Ev(3, ts("10:30"), 1, "a", 1.0))
    q.processAllAvailable()
    // b3: id 1 at 10:25 — its state EXPIRED (bounded state is the point:
    // the store holds only the watermark window, not every key ever seen),
    // so the same id re-emits as a fresh row
    ms.addData(Ev(1, ts("10:25"), 1, "a", 5.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("t_dedup_wm").select("event_id").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(ids == Map(1L -> 2, 2L -> 1, 3L -> 1),
      s"expected id 1 twice (drop-then-expire-then-re-emit), got $ids")
  }

  test("streaming dropDuplicates dedups across batches") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = ms.toDF().dropDuplicates("event_id")
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    ms.addData(Ev(1, t, 1, "a", 1.0), Ev(2, t, 1, "a", 1.0))
    q.processAllAvailable()
    ms.addData(Ev(2, t, 1, "a", 9.9), Ev(3, t, 1, "a", 1.0)) // 2 is a dup
    q.processAllAvailable()
    q.stop()
    assert(spark.table("t_dedup").select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState running state equals batch aggregate") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    val (b1, b2) = events.splitAt(events.size / 2)
    val ms = MemoryStream[Ev]
    val out = ms.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[(Long, Long)]) =>
          val evs = it.toSeq
          val prev = state.getOption.getOrElse((0L, 0L))
          val next = (prev._1 + evs.size,
            prev._2 + evs.map(e => Math.round(e.value * 100)).sum)
          state.update(next)
          Iterator((uid, next._1, next._2))
      }
    val q = out.toDF("user_id", "n", "cents").writeStream
      .format("memory").queryName("t_state").outputMode("update").start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    // last update per key is the final state
    val fin = spark.table("t_state").groupBy("user_id")
      .agg(max_by(struct(col("n"), col("cents")), col("n")).as("s"))
      .select(col("user_id"), col("s.n"), col("s.cents"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val batch = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(fin == batch)
  }

  test("transformWithState keeps per-key state across micro-batches") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[TwsEvent]
      val out = ms.toDS().groupByKey(_.user_id)
        .transformWithState(new UserStatsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update(),
          org.apache.spark.sql.Encoders.product[TwsState])
      val q = out.writeStream.format("memory").queryName("t_tws")
        .outputMode("update").start()
      ms.addData(TwsEvent(1, 10, "a", 1.5), TwsEvent(2, 10, "b", 2.0),
        TwsEvent(3, 20, "c", -0.5))
      q.processAllAvailable()
      // batch 2: state from batch 1 must carry (count continues, last_type
      // follows the highest event_id seen overall)
      ms.addData(TwsEvent(5, 10, "d", 0.25), TwsEvent(4, 20, "e", 1.0))
      q.processAllAvailable()
      q.stop()
      val fin = spark.table("t_tws").groupBy("user_id")
        .agg(max(col("n_events")).as("n"),
          max_by(col("sum_scaled"), col("n_events")).as("s"),
          max_by(col("last_type"), col("n_events")).as("t"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(fin == Map(
        10L -> ((3L, 3750000L, "d")),
        20L -> ((2L, 500000L, "e"))))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private def unixMicros(s: String): Long =
    Timestamp.valueOf(s).getTime * 1000L
}
