package graft.delta

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

/** `spark.read.format("graftdelta").load(path)` — the registered data
  * source for the from-scratch Delta reader. Options:
  *   - `versionAsOf`: time travel to a specific snapshot version.
  *
  * Returns a relation over [[DeltaFileIndex]], so partition pruning /
  * filter pushdown / vectorized scan are native (partition columns appear
  * last, Spark's convention for partitioned sources).
  */
final class GraftDeltaSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graftdelta"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftdelta: 'path' option required"))
    val version = parameters.get("versionAsOf").map(_.toLong)
    val snap = DeltaSnapshotReader.snapshotAt(spark, path, version)
    val index = new DeltaFileIndex(spark, snap)
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = index.dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = parameters)(spark)
  }
}
