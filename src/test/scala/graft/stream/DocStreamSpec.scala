package graft.stream

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** True Structured-Streaming verification of the corpus-quality gate
  * (`stream_quality_filter`): the SAME stateless rule + audit aggregation
  * run as a real multi-micro-batch file stream must agree with the batch
  * fixpoint the driver oracle checks. Two staged copies of the corpus with
  * `maxFilesPerTrigger=1` force at least two micro-batches, so the
  * complete-mode audit is genuinely updated incrementally. */
class DocStreamSpec extends SparkSpec {

  test("streaming quality gate equals the batch fixpoint (2 micro-batches)") {
    val d = java.nio.file.Files.createTempDirectory("graft_docs_stream")
    try {
    Seq("docs_1.parquet", "docs_2.parquet").foreach { f =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/documents.parquet"), d.resolve(f))
    }
    val schema = spark.read.parquet(d.toString + "/docs_1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(d.toString)
    val q = EventOps.qualityGate(stream)
      .writeStream.format("memory").queryName("t_doc_gate")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "stream must process at least two non-empty micro-batches")
    val streamed = spark.table("t_doc_gate").collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("chars_kept"))).toMap
    // the doubled corpus must audit exactly 2x the batch fixpoint
    val batch = EventOps.streamQualityFilter(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("chars_kept"))).toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (lang, (n, c)) =>
      assert(streamed(lang) == ((2 * n, 2 * c)),
        s"$lang: streamed ${streamed(lang)} != 2x batch ($n, $c)")
    }
    // the gate actually drops documents in every language
    val totals = Tables.documents(spark, sf).groupBy(col("lang")).count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    batch.foreach { case (lang, (n, _)) =>
      assert(n < totals(lang), s"$lang gate dropped nothing")
    }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(d.toFile)
    }
  }
}
