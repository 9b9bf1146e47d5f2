package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.unsafe.types.UTF8String

/** File-level data skipping from the Delta log's per-file `stats`
  * (numRecords / minValues / maxValues): a conservative interval evaluator
  * over the query's data filters. A file is dropped only when its recorded
  * range PROVES the predicate cannot match; any unknown shape, missing
  * stat, or null boundary keeps the file. This is the scan-avoidance layer
  * the reference explicitly lacks (reference README.md:66 "No predicate
  * pushdown") and that stock Spark cannot provide for a file list (it only
  * prunes hive partitions and parquet row groups after opening the file).
  */
/** Date-stat rendering shared by writer and skipper: ISO "YYYY-MM-DD",
  * valid (lexicographic == chronological) only for years 0000-9999. */
object DateStats {
  val MinEpochDay: Int = java.time.LocalDate.of(0, 1, 1).toEpochDay.toInt
  val MaxEpochDay: Int = java.time.LocalDate.of(9999, 12, 31).toEpochDay.toInt
  def render(epochDay: Int): String = {
    val d = java.time.LocalDate.ofEpochDay(epochDay.toLong)
    f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d"
  }
}

object DataSkipping {

  final case class FileStats(
      numRecords: Option[Long],
      mins: Map[String, Any],
      maxs: Map[String, Any],
      nulls: Map[String, Long] = Map.empty)

  /** Parse the protocol stats JSON (json4s ships with Spark). */
  def parse(json: String): Option[FileStats] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    try {
      val j = JsonMethods.parse(json)
      def values(field: String): Map[String, Any] = j \ field match {
        case JObject(fs) => fs.collect {
          case (k, JInt(v)) => k -> BigDecimal(v)
          case (k, JLong(v)) => k -> BigDecimal(v)
          case (k, JDouble(v)) => k -> BigDecimal(v)
          case (k, JDecimal(v)) => k -> v
          case (k, JString(v)) => k -> v
        }.toMap
        case _ => Map.empty
      }
      val n = j \ "numRecords" match {
        case JInt(v) => Some(v.toLong)
        case JLong(v) => Some(v)
        case _ => None
      }
      val nulls: Map[String, Long] = j \ "nullCount" match {
        case JObject(fs) => fs.collect {
          case (k, JInt(v)) => k -> v.toLong
          case (k, JLong(v)) => k -> v
        }.toMap
        case _ => Map.empty
      }
      Some(FileStats(n, values("minValues"), values("maxValues"), nulls))
    } catch { case _: Exception => None }
  }

  def relativePath(tablePath: String, file: Path): String = {
    val t = new Path(tablePath).toUri.getPath.stripSuffix("/")
    val f = file.toUri.getPath
    if (f.startsWith(t + "/")) f.stripPrefix(t + "/") else f
  }

  /** Could any row of a file with these stats satisfy `filter`? */
  def mayContain(stats: FileStats, filter: Expression): Boolean = filter match {
    case And(l, r) => mayContain(stats, l) && mayContain(stats, r)
    case Or(l, r) => mayContain(stats, l) || mayContain(stats, r)
    case EqualTo(a: AttributeReference, Literal(v, t)) => inRange(stats, a.name, lv(v, t), lv(v, t))
    case EqualTo(Literal(v, t), a: AttributeReference) => inRange(stats, a.name, lv(v, t), lv(v, t))
    case GreaterThan(a: AttributeReference, Literal(v, t)) => maxAbove(stats, a.name, lv(v, t), strict = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, t)) => maxAbove(stats, a.name, lv(v, t), strict = false)
    case LessThan(a: AttributeReference, Literal(v, t)) => minBelow(stats, a.name, lv(v, t), strict = true)
    case LessThanOrEqual(a: AttributeReference, Literal(v, t)) => minBelow(stats, a.name, lv(v, t), strict = false)
    // literal-first mirrors (lit < col ≡ col > lit, …)
    case GreaterThan(Literal(v, t), a: AttributeReference) => minBelow(stats, a.name, lv(v, t), strict = true)
    case GreaterThanOrEqual(Literal(v, t), a: AttributeReference) => minBelow(stats, a.name, lv(v, t), strict = false)
    case LessThan(Literal(v, t), a: AttributeReference) => maxAbove(stats, a.name, lv(v, t), strict = true)
    case LessThanOrEqual(Literal(v, t), a: AttributeReference) => maxAbove(stats, a.name, lv(v, t), strict = false)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, t) => inRange(stats, a.name, lv(v, t), lv(v, t)) }
    // null-count pruning (footer nullCount; absent -> cannot skip)
    case IsNull(a: AttributeReference) =>
      stats.nulls.get(a.name).forall(_ > 0L)
    case IsNotNull(a: AttributeReference) =>
      (stats.nulls.get(a.name), stats.numRecords) match {
        case (Some(nc), Some(n)) => nc < n // all-null file proves no non-null row
        case _ => true
      }
    // prefix pruning: s LIKE 'p%' implies p <= s < p-next in binary order
    case StartsWith(a: AttributeReference, Literal(p: UTF8String, _)) if p != null =>
      val mayMax = stats.maxs.get(a.name).flatMap(m => cmp(m, p.toString)) match {
        case Some(c) => c >= 0 // max < p proves no s >= p
        case None => true
      }
      val mayMin = stats.mins.get(a.name).flatMap(norm) match {
        case Some(mn: String) =>
          // code-point-safe truncation of min to |p| chars: if that prefix
          // already exceeds p, every s >= min exceeds the p-prefix range
          val mnU = UTF8String.fromString(mn)
          val mnPrefix = mnU.substring(0, p.numChars())
          mnPrefix.compareTo(p) <= 0
        case _ => true
      }
      mayMax && mayMin
    case _ => true // unknown shape: never skip
  }

  // ---- interval arithmetic (conservative: unknown → true) ----

  /** Type-aware literal normalization: a DateType literal (Catalyst Int =
    * days since epoch) becomes the same ISO "YYYY-MM-DD" string the writer
    * rendered into the stats — ISO order == chronological order inside the
    * 0000-9999 range. Out-of-range dates stay Int → cmp None → never skip. */
  private def lv(v: Any, dt: org.apache.spark.sql.types.DataType): Any = dt match {
    case org.apache.spark.sql.types.DateType => v match {
      case days: Int if days >= DateStats.MinEpochDay && days <= DateStats.MaxEpochDay =>
        DateStats.render(days)
      case other => other
    }
    case _ => v
  }

  private def cmp(a: Any, b: Any): Option[Int] = (norm(a), norm(b)) match {
    case (Some(x: BigDecimal), Some(y: BigDecimal)) => Some(x.compare(y))
    // Stats were produced by Spark min/max, which order strings by UTF-8
    // bytes (code points) — java.lang.String.compareTo (UTF-16 code units)
    // disagrees for supplementary characters, so compare the same way the
    // stats were computed.
    case (Some(x: String), Some(y: String)) =>
      Some(UTF8String.fromString(x).compareTo(UTF8String.fromString(y)))
    case _ => None
  }

  private def norm(v: Any): Option[Any] = v match {
    case null => None
    case i: Int => Some(BigDecimal(i))
    case l: Long => Some(BigDecimal(l))
    case s: Short => Some(BigDecimal(s.toInt))
    case b: Byte => Some(BigDecimal(b.toInt))
    // Float.toString is the shortest-decimal form the writer used when
    // rendering stats; toDouble would yield a different decimal (e.g. 0.1f
    // → 0.10000000149…) and wrongly prove non-overlap. NaN/Inf carry no
    // interval information → None (never skip).
    case f: Float if f.isNaN || f.isInfinite => None
    case f: Float => Some(BigDecimal(f.toString))
    case d: Double if d.isNaN || d.isInfinite => None
    case d: Double => Some(BigDecimal(d))
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case d: BigDecimal => Some(d)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toBigDecimal)
    case s: UTF8String => Some(s.toString)
    case s: String => Some(s)
    case _ => None
  }

  private def inRange(stats: FileStats, col: String, lo: Any, hi: Any): Boolean = {
    val belowMin = stats.mins.get(col).flatMap(m => cmp(hi, m)).exists(_ < 0)
    val aboveMax = stats.maxs.get(col).flatMap(m => cmp(lo, m)).exists(_ > 0)
    !(belowMin || aboveMax)
  }

  /** can some value be {>, >=} v ⇔ max {>, >=} v (unknown max → true). */
  private def maxAbove(stats: FileStats, col: String, v: Any, strict: Boolean): Boolean =
    stats.maxs.get(col).flatMap(m => cmp(m, v)) match {
      case Some(c) => if (strict) c > 0 else c >= 0
      case None => true
    }

  /** can some value be {<, <=} v ⇔ min {<, <=} v. */
  private def minBelow(stats: FileStats, col: String, v: Any, strict: Boolean): Boolean =
    stats.mins.get(col).flatMap(m => cmp(m, v)) match {
      case Some(c) => if (strict) c < 0 else c <= 0
      case None => true
    }
}
