package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.File

/** Scale-critical join patterns made explicit as operators (builder prompt:
  * "repartition/bucketing for co-located joins, salting for skew").
  * Both produce oracle-checkable results identical to the plain join —
  * the point is the shuffle topology, which PlanSpec pins down. */
object ScalePatterns {
  import Det._

  val SaltBuckets = 16

  /** Skew-safe join: the fact side's join key (`l_returnflag`, 3 distinct
    * values → pathological skew in a plain shuffle join) is salted into 16
    * sub-keys; the small side is replicated across the salt space. Key
    * distribution becomes uniform; results are identical to the unsalted
    * join. */
  def joinSkewSalted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val flagInfo = Seq(("A", "returned"), ("N", "kept"), ("R", "refunded"))
      .toDF("flag", "disposition")
    val salts = s.range(SaltBuckets).select(col("id").cast("int").as("salt"))
    val dimSalted = flagInfo.crossJoin(salts) // replicate small side x16
    val factSalted = Tables.lineitem(s, dir)
      .withColumn("salt", (pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(SaltBuckets)))
        .cast("int"))
    factSalted.join(dimSalted,
        factSalted("l_returnflag") === dimSalted("flag") &&
        factSalted("salt") === dimSalted("salt"))
      .groupBy(col("disposition"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("disposition"))
  }

  /** Bucketed co-located join: both sides written bucketed by the join key
    * (8 buckets on custkey); the join then needs NO shuffle of either side
    * — the 100 TB pattern for repeated fact-fact joins. PlanSpec asserts
    * the executed plan contains no Exchange. */
  def joinBucketed(s: SparkSession, dir: String): DataFrame = {
    ensureBucketedTables(s, dir)
    val c = s.table(bucketedName(dir, "customer"))
    val o = s.table(bucketedName(dir, "orders"))
    c.hint("MERGE").join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  def bucketedName(dir: String, t: String): String =
    s"graft_bkt_${t}_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  def ensureBucketedTables(s: SparkSession, dir: String): Unit = synchronized {
    val cName = bucketedName(dir, "customer")
    val oName = bucketedName(dir, "orders")
    if (!s.catalog.tableExists(cName)) {
      // a previous session may have left the managed-table location behind
      // (in-memory catalog forgets it) — clear stale dirs before creating
      val wh = s.sessionState.conf.getConfString("spark.sql.warehouse.dir")
      Seq(cName, oName).foreach { t =>
        val p = new org.apache.hadoop.fs.Path(wh, t)
        val fs = p.getFileSystem(s.sessionState.newHadoopConf())
        if (fs.exists(p)) fs.delete(p, true)
      }
      Tables.customer(s, dir).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable(cName)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable(oName)
    }
  }

  /** Runtime bloom-filter join (semi-join reduction): a selective filter on
    * the build side injects a bloom-filter `might_contain` predicate into
    * the fact side BEFORE its shuffle, so non-joining fact rows never cross
    * the wire — at 100 TB the difference between shuffling the whole fact
    * table and shuffling the matching slice. Runs in a dedicated child
    * session: the returned frame is lazy, so the fixture-scale thresholds
    * (production defaults demand a ≥10 GB application side) must still be
    * live at execution time without leaking into sibling keys' plans.
    * Broadcast is disabled to force the fact-fact shuffle shape the
    * technique exists for; results are identical to the plain join (the
    * bloom filter is a pure reduction — PlanSpec asserts the injected
    * predicate, the oracle pins the values). */
  def joinRuntimeFilter(s: SparkSession, dir: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val o = Tables.orders(s2, dir)
      .filter(col("o_totalprice") > 480000)
      .select(col("o_orderkey"))
    val l = Tables.lineitem(s2, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_skew_salted" -> (joinSkewSalted _),
    "join_bucketed" -> (joinBucketed _),
    "join_runtime_filter" -> (joinRuntimeFilter _)
  )

  val oracle: Map[String, String] = Map(
    "join_skew_salted" ->
      s"""SELECT d.disposition, COUNT(*) AS n_items, ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem l
         |JOIN (VALUES ('A','returned'),('N','kept'),('R','refunded')) d(flag, disposition)
         |  ON l.l_returnflag = d.flag
         |GROUP BY d.disposition ORDER BY d.disposition""".stripMargin,
    "join_bucketed" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_runtime_filter" ->
      s"""SELECT l.l_returnflag, COUNT(*) AS n_items, ${sqlDsum("l.l_extendedprice")} AS sum_price
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_totalprice > 480000
         |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin
  )
}
