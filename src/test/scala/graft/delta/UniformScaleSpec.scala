package graft.delta

import graft.SparkSpec

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** No-driver-list lock for the UniForm export (VERDICT r15 #2), in the
  * style of [[DeltaScaleSpec]]'s 50k-file drill: the manifests must be
  * written by the DISTRIBUTED job — the export completes with
  * `fileSet.isCollected == false`, the driver holding only the
  * per-manifest summary rows (one per partition group). The read-back
  * then pins that the distributed job produced exactly the Delta state:
  * 50k entries, 100 partition-group manifests, aggregate counts. */
class UniformScaleSpec extends SparkSpec {

  private val schemaJson =
    """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"p\",\"type\":\"integer\",\"nullable\":true,\"metadata\":{}}]}"""

  private val NumFiles = 50000
  private val NumParts = 100

  /** Synthetic 50k-add log with numRecords stats (no data files — the
    * export reads metadata only). */
  private lazy val table: String = {
    val t = Files.createTempDirectory("graft_uniform_scale").toString + "/tbl"
    val dir = Paths.get(t, "_delta_log")
    Files.createDirectories(dir)
    Files.write(dir.resolve(f"${0L}%020d.json"), Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"m-uniform-scale","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["p"],"configuration":{},"createdTime":1}}"""
    ).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val adds = (0 until NumFiles).iterator.map { i =>
      val p = i % NumParts
      s"""{"add":{"path":"p=$p/part-$i.parquet","partitionValues":{"p":"$p"},"size":1024,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":10}"}}"""
    }
    Files.write(dir.resolve(f"${1L}%020d.json"),
      adds.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    t
  }

  test("UniForm export at 50k files never collects the add list") {
    IcebergUniform.export(spark, table)
    val snap = DeltaSnapshotReader.snapshot(spark, table)
    assert(!snap.fileSet.isCollected,
      "UniForm export materialized the add list on the driver")

    // one manifest per partition-value group
    val manifests = new java.io.File(table, "metadata").listFiles()
      .map(_.getName).filter(n => n.contains("-m-") && n.endsWith(".avro"))
    assert(manifests.length == NumParts,
      s"expected $NumParts partition-group manifests, got ${manifests.length}")

    // the distributed job produced exactly the Delta state
    val got = IcebergUniform.readManifestEntries(spark, table)
    assert(got.size == NumFiles)
    assert(got.map(_.records).sum == NumFiles * 10L)
    assert(got.map(_.partitionValues("p")).distinct.size == NumParts)
    assert(!snap.fileSet.isCollected,
      "post-export aggregates collected the add list")
  }
}
