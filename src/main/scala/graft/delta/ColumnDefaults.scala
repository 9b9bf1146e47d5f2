package graft.delta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Column DEFAULT values (the `allowColumnDefaults` writer table feature):
  * a column's schema metadata carries `CURRENT_DEFAULT` — a foldable,
  * deterministic SQL expression — and a write batch that OMITS the column
  * gets it filled with the default. Writer-only: data files always contain
  * the column once written, so readers need nothing (which is why the spec
  * gates this as a writer feature; adding a NEW column with a default —
  * which WOULD need read-side `EXISTS_DEFAULT` support — is refused, as
  * delta-spark does). DataFrame-API nuance: the unit of omission is the
  * whole column (there is no per-row DEFAULT keyword in a batch). */
object ColumnDefaults {

  val CurrentKey = "CURRENT_DEFAULT"

  def of(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(_.metadata.contains(CurrentKey))

  /** Fill columns the batch omits with their declared defaults, restoring
    * the table's column order (the writer's shape check is
    * order-sensitive). Columns present in the batch win over defaults.
    * Each used default is RE-validated here, not only at SET DEFAULT time:
    * a foreign writer may have declared a non-self-contained expression
    * (e.g. `id + 1`), which would otherwise silently resolve against the
    * incoming batch's columns and write per-row values. */
  def prepare(df: DataFrame, tableSchema: StructType): DataFrame = {
    val absent = of(tableSchema).filterNot(f => df.columns.contains(f.name))
    if (absent.isEmpty) df
    else {
      absent.foreach(f =>
        validate(df.sparkSession, f.name, f.metadata.getString(CurrentKey), f.dataType))
      val filled = absent.foldLeft(df)((d, f) =>
        d.withColumn(f.name, expr(f.metadata.getString(CurrentKey)).cast(f.dataType)))
      if (tableSchema.fieldNames.forall(filled.columns.contains))
        filled.select(tableSchema.fieldNames.map(col).toIndexedSeq: _*)
      else filled
    }
  }

  /** Validate a default expression: must analyze WITHOUT column references
    * (self-contained) and be deterministic — the spec's requirement, and
    * what makes an omitted-column fill well-defined. */
  private[delta] def validate(spark: SparkSession, column: String,
                              sqlExpr: String,
                              dt: org.apache.spark.sql.types.DataType): Unit = {
    // `select` analyzes eagerly, so ONE try covers parse, cast and
    // resolution; the probe relation has ZERO columns, so any column
    // reference — whatever its name — fails to resolve here rather than
    // at some later write
    val probe =
      try spark.range(1).drop("id").select(expr(sqlExpr).cast(dt).as("d"))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"default for $column must be a self-contained expression castable " +
            s"to ${dt.sql}: ${e.getMessage}")
      }
    require(probe.queryExecution.analyzed.expressions.forall(_.deterministic),
      s"default for $column must be deterministic: $sqlExpr")
  }

  /** Schema with `column`'s default set (or cleared when `sqlExpr` is
    * None). */
  private[delta] def withDefault(schema: StructType, column: String,
                                 sqlExpr: Option[String]): StructType =
    StructType(schema.fields.map { f =>
      if (f.name != column) f
      else {
        val b = new MetadataBuilder().withMetadata(f.metadata)
        sqlExpr match {
          case Some(e) => f.copy(metadata = b.putString(CurrentKey, e).build())
          case None => f.copy(metadata = b.remove(CurrentKey).build())
        }
      }
    })
}
