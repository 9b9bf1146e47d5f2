package graft.catalog

import graft.delta.DeltaSnapshotReader
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Path-based catalog: tables discovered from storage layout, no metastore —
  * the engine analog of the reference's S3 `_$folder$` marker discovery
  * (reference A1-A3: DeltaMetadataHandler.scala:42-55, 74-88).
  *
  * A table is either `<root>/<name>.parquet` (format "parquet") or a
  * directory `<root>/<name>/` containing `_delta_log` (format "delta").
  */
final class PathCatalog(spark: SparkSession, root: String) {

  /** (tableName, format) pairs, sorted by name. */
  def listTables(): Seq[(String, String)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isFile && n.endsWith(".parquet")) Some(n.stripSuffix(".parquet") -> "parquet")
      else if (st.isDirectory && fs.exists(new Path(st.getPath, "_delta_log"))) Some(n -> "delta")
      else None
    }.sortBy(_._1)
  }

  /** Resolve a table name to a DataFrame, dispatching on format. */
  def table(name: String): DataFrame = {
    val byName = listTables().toMap
    byName.get(name) match {
      case Some("parquet") => spark.read.parquet(s"$root/$name.parquet")
      case Some("delta")   => DeltaSnapshotReader.load(spark, s"$root/$name")
      case _ => throw new IllegalArgumentException(
        s"table not found: $name under $root (have: ${byName.keys.toSeq.sorted.mkString(", ")})")
    }
  }
}
