package graft.delta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Generated columns (`delta.generationExpression` field metadata): a
  * column whose value is defined as a SQL expression over the row's other
  * columns. The reference reads such tables transparently (the expression
  * only matters to writers); this engine is also a WRITER, so it must
  * honor the spec's writer obligations:
  *
  *  - a write that omits the column gets it POPULATED from the expression;
  *  - a write that supplies the column is VALIDATED — every row must
  *    satisfy `value <=> expression` (delta-spark enforces exactly this
  *    null-safe-equality check);
  *  - tables carrying generated columns require writer protocol 4 (legacy
  *    ladder) or the `generatedColumns` table feature.
  *
  * Population/validation are plain Catalyst expressions over the batch —
  * codegen'd, no shuffle, scale-free. */
object GeneratedColumns {

  val Key = "delta.generationExpression"

  /** (field, generation expression) for every generated column. */
  def of(schema: StructType): Seq[(StructField, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(Key) => f -> f.metadata.getString(Key)
    }

  /** Declare+populate a generated column on a DataFrame about to CREATE a
    * table: computes `sqlExpr` and attaches the generation metadata so the
    * table's schemaString carries the definition. */
  def withGenerated(df: DataFrame, name: String, sqlExpr: String): DataFrame = {
    val md = new MetadataBuilder().putString(Key, sqlExpr).build()
    df.withColumn(name, expr(sqlExpr).as(name, md))
  }

  /** Writer-side preparation of one batch against the table schema:
    * populate absent generated columns, validate present ones, and restore
    * the table's column order (population appends at the end). */
  def prepare(df: DataFrame, tableSchema: StructType, context: String): DataFrame = {
    val gens = of(tableSchema)
    if (gens.isEmpty) return df
    var out = df
    gens.foreach { case (f, sql) =>
      if (!out.columns.contains(f.name))
        out = out.withColumn(f.name, expr(sql).cast(f.dataType))
      else validate(out, f, sql, context)
    }
    if (!out.columns.sameElements(tableSchema.fieldNames) &&
        tableSchema.fieldNames.forall(out.columns.contains))
      out = out.select(tableSchema.fieldNames.toIndexedSeq.map(col): _*)
    out
  }

  /** Every row must satisfy `value <=> expression` (null-safe equality —
    * NULL value with NULL expression result is consistent). */
  def validate(df: DataFrame, f: StructField, sql: String, context: String): Unit = {
    val bad = df.filter(!(col(f.name) <=> expr(sql).cast(f.dataType))).limit(1).collect()
    bad.headOption.foreach { row =>
      throw new IllegalArgumentException(
        s"generated column ${f.name} ($sql) violated in $context by row: $row")
    }
  }
}
