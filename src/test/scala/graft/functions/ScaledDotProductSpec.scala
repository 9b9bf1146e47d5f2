package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaledDotProductSpec extends SparkSpec {

  test("native dot_scaled equals the HOF aggregate/zip_with formulation") {
    ScaledDotProduct.register(spark)
    val e = Tables.embeddings(spark, sf).limit(100)
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(
        expr("dot_scaled(a.embedding, b.embedding)").as("native"),
        expr("""aggregate(zip_with(
            transform(a.embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
            transform(b.embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
            (x, y) -> x * y), CAST(0 AS BIGINT), (acc, p) -> acc + p)""").as("hof"))
    val bad = pairs.filter(col("native") =!= col("hof")).count()
    assert(bad == 0)
  }

  test("dot_scaled participates in whole-stage codegen") {
    ScaledDotProduct.register(spark)
    val df = Tables.embeddings(spark, sf)
      .select(expr("dot_scaled(embedding, embedding)").as("d"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"dot_scaled broke codegen:\n$p")
    assert(df.head().getLong(0) > 0)
  }

  test("null and length-mismatch handling") {
    ScaledDotProduct.register(spark)
    val r = spark.sql(
      """SELECT dot_scaled(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS a,
        |       dot_scaled(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(2.0 AS FLOAT))) AS b""".stripMargin).head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 1500000L * 2000000L)
  }
}
