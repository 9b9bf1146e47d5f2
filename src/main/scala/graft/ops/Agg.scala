package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Aggregation operators (SURVEY.md §2B "Aggregation").
  *
  * In the reference system these run in the Athena/Presto engine above the
  * connector's scan leaf (reference README.md:37-38); here they are Spark
  * `HashAggregateExec` plans with map-side partial aggregation — the shuffle
  * moves pre-aggregated partials, not raw rows, which is what keeps these
  * shapes viable at 100 TB.
  */
object Agg {
  import Det._

  /** TPC-H Q1 shape: scan → filter → hash agg → sort. The flagship
    * aggregation; partial aggregation reduces ~6e6 rows/SF to 6 groups
    * before the exchange. */
  def aggHash(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dfin(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 6)) - dec(col("l_discount")))))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_hash" -> (aggHash _)
  )

  val oracle: Map[String, String] = Map(
    "agg_hash" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDfin(s"SUM(${sqlDec("l_extendedprice")} * (${sqlDec("1")} - ${sqlDec("l_discount")}))")} AS sum_disc_price,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
