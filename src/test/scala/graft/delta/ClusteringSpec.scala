package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Clustered tables: CLUSTER BY declares columns in the `delta.clustering`
  * domain (writer 7, clustering + domainMetadata features); OPTIMIZE
  * clusters along the declaration; the declaration survives checkpoints
  * and clones. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_clust").toString + "/tbl"

  private def mkTable(): String = {
    val t = newTable()
    // 4 files of interleaved (a, b) values — unclustered on purpose
    (0 until 4).foreach { i =>
      DeltaWriter.write((0L until 100L).filter(_ % 4 == i)
        .map(v => (v, (v * 37) % 100, s"r$v")).toDF("a", "b", "s").coalesce(1), t)
    }
    t
  }

  test("cluster() declares columns; protocol + domain recorded; parse round-trips") {
    val t = mkTable()
    Clustering.cluster(spark, t, Seq("a", "b"))
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    val p = snap.protocol.get
    assert(p.minWriterVersion == 7)
    assert(p.writerFeatures.get.contains("clustering"))
    assert(p.writerFeatures.get.contains("domainMetadata"))
    assert(Clustering.clusteringColumns(snap) == Seq("a", "b"))
  }

  test("optimize() clusters along the DECLARED columns and preserves content") {
    val t = mkTable()
    Clustering.cluster(spark, t, Seq("a", "b"))
    val before = DeltaSnapshotReader.load(spark, t)
      .select("a", "b").as[(Long, Long)].collect().toSet
    Clustering.optimize(spark, t, targetBytes = 1024) // force several output files
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(DeltaSnapshotReader.load(spark, t)
      .select("a", "b").as[(Long, Long)].collect().toSet == before)
    // clustered files have narrow per-file ranges on the leading column:
    // each file's a-range must span less than the full 0..99 domain
    val ranges = snap.files.flatMap(_.stats.flatMap(DataSkipping.parse)).map { st =>
      (st.mins("a").asInstanceOf[BigDecimal].toLong,
        st.maxs("a").asInstanceOf[BigDecimal].toLong)
    }
    assert(ranges.size > 1)
    assert(ranges.forall { case (lo, hi) => hi - lo < 99 },
      s"unclustered ranges after optimize: $ranges")
  }

  test("incremental optimize: second pass rewrites ONLY files added since the first") {
    val t = mkTable()
    Clustering.cluster(spark, t, Seq("a", "b"))
    Clustering.optimize(spark, t) // full first pass
    val clustered = DeltaSnapshotReader.snapshot(spark, t).files.map(_.path).toSet
    // a third optimize with NOTHING new: commit-free no-op
    val vBefore = DeltaSnapshotReader.snapshot(spark, t).version
    assert(Clustering.optimize(spark, t) == vBefore, "no-new-files optimize must not commit")
    assert(DeltaSnapshotReader.snapshot(spark, t).version == vBefore)
    // append two new files, then optimize incrementally
    (0 until 2).foreach { i =>
      DeltaWriter.write((100L until 140L).filter(_ % 2 == i.toLong)
        .map(v => (v, (v * 37) % 100, s"r$v")).toDF("a", "b", "s").coalesce(1), t)
    }
    val withNew = DeltaSnapshotReader.snapshot(spark, t)
    val newFiles = withNew.files.map(_.path).toSet -- clustered
    assert(newFiles.size == 2)
    Clustering.optimize(spark, t)
    val after = DeltaSnapshotReader.snapshot(spark, t)
    // the previously-clustered files are UNTOUCHED; only the new slice moved
    assert(clustered.subsetOf(after.files.map(_.path).toSet),
      "incremental optimize rewrote already-clustered files")
    assert((after.files.map(_.path).toSet intersect newFiles).isEmpty,
      "incremental optimize left unclustered new files in place")
    // content preserved across both passes
    assert(DeltaSnapshotReader.load(spark, t).count() == 140)
    // the watermark advanced to the incremental commit's version
    val hist = DeltaSnapshotReader.history(spark, t)
      .select("operation").as[String].collect()
    assert(hist.count(_ == "OPTIMIZE") == 2)
  }

  test("declaration survives checkpoint and carries into a clone") {
    val t = mkTable()
    Clustering.cluster(spark, t, Seq("b"))
    DeltaWriter.checkpoint(spark, t)
    DeltaWriter.cleanupLog(spark, t, retainMs = -1)
    DeltaSnapshotReader.invalidate(t)
    assert(Clustering.clusteringColumns(DeltaSnapshotReader.snapshot(spark, t)) == Seq("b"))
    val c = newTable()
    DeltaWriter.shallowClone(spark, t, c)
    assert(Clustering.clusteringColumns(DeltaSnapshotReader.snapshot(spark, c)) == Seq("b"))
  }

  test("foreign CLUSTER BY NONE (empty array) parses as unclustered, no throw") {
    val t = mkTable()
    val snap0 = DeltaSnapshotReader.snapshot(spark, t)
    DeltaWriter.commitDomain(spark, snap0, Clustering.Domain,
      """{"clusteringColumns":[]}""", None, "CLUSTER BY", Map.empty)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(Clustering.clusteringColumns(snap).isEmpty)
    val e = intercept[IllegalArgumentException](Clustering.optimize(spark, t))
    assert(e.getMessage.contains("no clustering columns"), e.getMessage)
  }

  test("foreign nested clustering paths refuse instead of clustering a subset") {
    val t = mkTable()
    Clustering.cluster(spark, t, Seq("a"))
    // a FOREIGN writer re-declares clustering on a nested column path —
    // silently optimizing along just `a` would scatter the promised layout
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    DeltaWriter.commitDomain(spark, snap, Clustering.Domain,
      """{"clusteringColumns":[["user","id"],["a"]]}""", None,
      "CLUSTER BY", Map.empty)
    val snap2 = DeltaSnapshotReader.snapshot(spark, t)
    val e = intercept[DeltaUnsupportedFeatureException](
      Clustering.clusteringColumns(snap2))
    assert(e.getMessage.contains("nested"), e.getMessage)
    intercept[DeltaUnsupportedFeatureException](Clustering.optimize(spark, t))
  }

  test("validation: unknown column, partition column, undeclared optimize refuse") {
    val t = mkTable()
    intercept[IllegalArgumentException] { Clustering.cluster(spark, t, Seq("zzz")) }
    intercept[IllegalArgumentException] { Clustering.optimize(spark, t) }
    val tp = newTable()
    DeltaWriter.write(Seq((1L, "x", "a")).toDF("a", "s", "p"), tp, Seq("p"))
    intercept[IllegalArgumentException] { Clustering.cluster(spark, tp, Seq("p")) }
  }
}
