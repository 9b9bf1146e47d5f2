package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All sign-random-projection band values of a vector in ONE pass:
  *
  *   srp_bands(v, bands, bits) → array<bigint> of length `bands`, where
  *   band b packs the sign bits of hyperplanes b·bits … b·bits+bits-1.
  *
  * Accepts `array<float>` (each element scaled to the shared integer
  * domain first) or `array<bigint>` (already-scaled values, used verbatim —
  * signs are scale-invariant, so both forms band identically up to the
  * scaling round). Hyperplane weights are integer-valued in [-500, 500),
  * derived from splitmix64 on (plane, dim) — deterministic across runs and
  * JVMs, no stored plane vectors. A literal-plane formulation (bands×bits
  * separate dot-product columns) generated kilobytes of Java per projection
  * column and its janino compilation dominated the runtime at small scale;
  * this expression emits ONE static call, and the loop itself is
  * (bands·bits·dim) multiply-adds per row. */
case class SrpBands(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"srp_bands expects array<float> or array<bigint>, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  private def isLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any =
    if (isLong) SrpBands.computeLong(a.asInstanceOf[ArrayData], bands, bits)
    else SrpBands.compute(a.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SrpBands.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val fn = if (isLong) "computeLong" else "compute"
    defineCodeGen(ctx, ev, c => s"$cls.$fn($c, $bands, $bits)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SrpBands {

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** weight of hyperplane `j` at dimension `i`: [-500, 500) integer. */
  def weight(j: Int, i: Int): Long =
    java.lang.Math.floorMod(mix64(j.toLong * 0x100000000L + i), 1000L) - 500L

  def compute(v: ArrayData, bands: Int, bits: Int): ArrayData =
    bandsOf(v.numElements(), i => ScaledDotProduct.scaled(v.getFloat(i)), bands, bits)

  /** Already-scaled `array<bigint>` input: values used verbatim. */
  def computeLong(v: ArrayData, bands: Int, bits: Int): ArrayData =
    bandsOf(v.numElements(), v.getLong, bands, bits)

  private def bandsOf(n: Int, at: Int => Long, bands: Int, bits: Int): ArrayData = {
    // one band packs into ONE bigint: bits > 64 would wrap `1L << (j % bits)`
    // mod 64 and silently alias distinct hyperplanes onto the same bit,
    // degrading bands with no error — fail loudly instead (ADVICE r14)
    require(bits >= 1 && bits <= 64,
      s"srp_bands: bits must be in [1, 64] (one packed bigint per band), got $bits")
    val planes = bands * bits
    val acc = new Array[Long](planes)
    var i = 0
    while (i < n) {
      val x = at(i)
      var j = 0
      while (j < planes) {
        acc(j) += x * weight(j, i)
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var j = 0
    while (j < planes) {
      if (acc(j) >= 0) out(j / bits) |= 1L << (j % bits)
      j += 1
    }
    new GenericArrayData(out)
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"srp_bands: $what must be an integer literal, got $other")
  }

  private val info = new ExpressionInfo(
    SrpBands.getClass.getName.stripSuffix("$"), null, "srp_bands",
    "_FUNC_(v, bands, bits) - packed SRP sign bits of a float vector, one bigint per band", "")

  /** Idempotently register `srp_bands` in the session function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("srp_bands"), info,
      exprs => SrpBands(exprs(0), intLit(exprs(1), "bands"), intLit(exprs(2), "bits")))
}
