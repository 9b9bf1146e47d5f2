package graft.delta

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType

/** SQL-visible reads of column-mapped / DV-carrying Delta tables.
  *
  * The plain-parquet scan surfaces ([[GraftDeltaTable]]'s DSv2 scan, the v1
  * `HadoopFsRelation`) can neither rename physical parquet columns back to
  * logical names nor drop DV-masked rows, so through round 16 all three
  * SQL-visible read paths (v2 provider, V2 catalog, v1 relation) refused
  * such tables and routed users to the function API — which meant a
  * catalog-registered table with `delta.enableDeletionVectors=true` became
  * un-SQL-able after its first DELETE (reference-world interface:
  * SQL over a registered source, reference README.md:34-38).
  *
  * This rule closes the gap at analysis time: any read-side relation over
  * such a table is substituted with the engine's own proven read plan —
  * [[DeltaFileIndex.relation]], i.e. the native `HadoopFsRelation` scan in
  * PHYSICAL column names (partition pruning + stats skipping + parquet
  * pushdown intact), the broadcast-bitmap DV row filter, and the
  * physical→logical rename projection — wrapped in a `Project` that aliases
  * the engine plan's output to the original relation's attribute ids, so
  * every reference above the substituted node keeps resolving.
  *
  * Write-side plans are untouched: `V2WriteCommand.table` is not a child of
  * the command node, so `resolveOperatorsUp` never rewrites an INSERT
  * target — appends to DV'd / mapped tables keep flowing through
  * [[DeltaWriter.write]].
  *
  * Scale: the substituted plan is exactly the function-API read proven
  * under `delta_dv_*` / `delta_column_mapping` — distributed listing above
  * the driver threshold, DV bitmaps broadcast per-descriptor (∝ masked
  * files, not table size), vectorized parquet with codegen downstream.
  */
class GraftDeltaEngineReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Engine read plan for `snap`, projected onto `out`'s exprIds. */
  private def substitute(out: Seq[Attribute], snap: DeltaSnapshot): LogicalPlan = {
    val engine = DeltaFileIndex.relation(spark, snap).queryExecution.analyzed
    require(engine.output.length == out.length,
      s"engine read of ${snap.tablePath} produced ${engine.output.length} columns, " +
        s"relation expected ${out.length}")
    val projs: Seq[NamedExpression] = out.zip(engine.output).map { case (o, e) =>
      Alias(e, o.name)(exprId = o.exprId, qualifier = o.qualifier,
        explicitMetadata = Some(o.metadata))
    }
    Project(projs, engine)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftDeltaTable] &&
        r.table.asInstanceOf[GraftDeltaTable].needsEngineRead =>
      substitute(r.output, r.table.asInstanceOf[GraftDeltaTable].snap)
    case lr: LogicalRelation if lr.relation.isInstanceOf[GraftDeltaEngineRelation] =>
      substitute(lr.output, lr.relation.asInstanceOf[GraftDeltaEngineRelation].snap)
  }
}

/** v1 marker relation for column-mapped / DV-carrying snapshots: in a
  * session with [[graft.functions.GraftExtensions]] the analyzer replaces
  * it wholesale ([[GraftDeltaEngineReadRule]]) before any scan planning; in
  * a bare session the `TableScan` fallback still reads correctly by
  * executing the engine plan and handing Spark its unsafe rows directly
  * (`needConversion=false`), at the cost of a codegen boundary. */
final case class GraftDeltaEngineRelation(spark: SparkSession, snap: DeltaSnapshot)
    extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = snap.schema
  override def needConversion: Boolean = false
  override def buildScan(): RDD[Row] =
    DeltaFileIndex.relation(spark, snap).queryExecution.toRdd.asInstanceOf[RDD[Row]]
}
