package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused scaled-integer dot product over two float vectors:
  *
  *   dot_scaled(a, b) = Σ round(aᵢ·10⁶)·round(bᵢ·10⁶)   (Long arithmetic)
  *
  * The pure-DSL formulation (`aggregate(zip_with(...))`) runs interpreted
  * lambdas per element; this native expression generates a tight Java loop
  * inside whole-stage codegen (builder-prompt preference (b): custom
  * Catalyst `Expression` with `doGenCode` over a UDF). Rounding is
  * half-away-from-zero on the exact double product — DuckDB-equivalent, so
  * the oracle SQL is unchanged.
  */
case class ScaledDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_scaled expects (array<float>, array<float>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_scaled"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += ScaledDotProduct.scaled(x.getFloat(i)) * ScaledDotProduct.scaled(y.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val cls = ScaledDotProduct.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $cls.scaled($a.getFloat($i)) * $cls.scaled($b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ScaledDotProduct {
  final val Scale = 1000000L

  /** round-half-away-from-zero of x·10⁶ on the exact double product. */
  def scaled(x: Float): Long = {
    val v = x.toDouble * Scale
    if (v >= 0) Math.round(v) else -Math.round(-v)
  }

  private val info = new ExpressionInfo(
    ScaledDotProduct.getClass.getName.stripSuffix("$"), null, "dot_scaled",
    "_FUNC_(a, b) - scaled-integer dot product of two float arrays", "")

  /** Idempotently register `dot_scaled` in the session's function registry
    * (for sessions not built with GraftExtensions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_scaled"), info,
      exprs => ScaledDotProduct(exprs(0), exprs(1)))
}

/** `SparkSession.builder.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) — injects the
  * engine's native functions and the Delta SQL-DML parser
  * ([[graft.sql.GraftSqlParser]]: UPDATE/DELETE/MERGE/OPTIMIZE/VACUUM over
  * `delta.`path`` tables) at session build time. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
    // SQL reads of column-mapped / DV-carrying Delta tables: substitute the
    // engine's DV-aware, mapping-aware read plan at analysis time
    e.injectResolutionRule(spark => new graft.delta.GraftDeltaEngineReadRule(spark))
    // CDF as SQL: SELECT * FROM table_changes('delta.`/p`', start[, end])
    // (delta-spark's TVF surface; both names accept a path)
    Seq("table_changes", "table_changes_by_path").foreach { name =>
      e.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(graft.sql.TableChanges.getClass.getName.stripSuffix("$"),
          null, name,
          "_FUNC_(table, start[, end]) - change data feed rows of a Delta table " +
            "between two versions or timestamps (inclusive)", ""),
        (exprs: Seq[Expression]) => graft.sql.TableChanges.plan(exprs)))
    }
    e.injectFunction((
      FunctionIdentifier("dot_scaled"),
      new ExpressionInfo(ScaledDotProduct.getClass.getName.stripSuffix("$"), null, "dot_scaled",
        "_FUNC_(a, b) - scaled-integer dot product of two float arrays", ""),
      (exprs: Seq[Expression]) => ScaledDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("srp_bands"),
      new ExpressionInfo(SrpBands.getClass.getName.stripSuffix("$"), null, "srp_bands",
        "_FUNC_(v, bands, bits) - packed SRP sign bits of a float vector", ""),
      (exprs: Seq[Expression]) => SrpBands(exprs(0),
        exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal].value.asInstanceOf[Int],
        exprs(2).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal].value.asInstanceOf[Int])))
  }
}
