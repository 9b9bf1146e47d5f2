package graft

import org.apache.spark.sql.SparkSession

/** Three-point scale-law fit (VERDICT r12 #5, ceiling lifted r13 #3): the
  * 10× ScaleProbe reports a single ratio per key; a ratio cannot
  * distinguish "sublinear everywhere" from "flat constant + a linear term
  * that dominates later". This measures the heaviest keys at factors
  * {1, 8, 64} — 1.8 decades, up from the r12 {1,5,25} (the two-level
  * replica perturbation raised the collision caps to 576/6400, see
  * [[ScaleProbe.ensureScaled]]) — and least-squares-fits
  * `ln t = a + e · ln f`, reporting the FITTED exponent plus the pairwise
  * exponents (1→8 and 8→64): a key whose tail exponent exceeds its head
  * exponent is bending UP — the shape a 100 TB extrapolation must not
  * have — even when the 64-point average still looks sublinear.
  *
  * Same stall discipline as ScaleProbe (graft round memory): per-key stat
  * is MIN of reps — stalls only ADD time — and the recorded table should
  * be the per-key min over ~3 full runs.
  *
  * Usage: runMain graft.ScaleFit [srcDir] [reps]
  * Prints one JSON line: {"metric":"scale_fit","factors":[1,5,25],
  *   "keys":{k:{"t":[…,…,…],"exp_fit":…,"exp_head":…,"exp_tail":…}}}
  */
object ScaleFit {

  /** The heaviest corpus-scaling keys by the r12 10× table (t at 10×):
    * the two ~linear-candidates (gram join, embed verification), the CoW
    * MERGE write path, the streaming upsert sink, the iterative graph
    * key, the heaviest text-quality key, and (r13 #3) the
    * persisted-index probe whose cost must track the BATCH, not the
    * 64×-grown history. */
  val fitKeys: Seq[String] = Seq(
    "dedup_ngram_jaccard", "dedup_embed_cos", "delta_merge",
    "stream_upsert_delta", "graph_pagerank", "text_lm_score",
    "dedup_incremental",
    // r15: the DV DML legs — masking cost must track the MATCHED rows
    // (probe scan + bitmap writes), not the touched files' bytes; the
    // fixture copy is a linear floor shared with delta_merge
    "delta_dv_update", "delta_dv_merge",
    // r16: the row-granular DV clause leg — a BY SOURCE clause list puts
    // the whole table in SCOPE, so the fit must show cost tracking the
    // CHANGED rows (mask + post-images), not the in-scope bytes
    "delta_dv_merge_clauses")

  val factors: Seq[Int] = Seq(1, 8, 64)

  /** Least-squares slope of ln t over ln f. */
  def fitExponent(fs: Seq[Double], ts: Seq[Double]): Double = {
    val xs = fs.map(math.log)
    val ys = ts.map(math.log)
    val xm = xs.sum / xs.size
    val ym = ys.sum / ys.size
    val num = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum
    val den = xs.map(x => (x - xm) * (x - xm)).sum
    num / den
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", sys.props("java.io.tmpdir") + "/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs: Seq[(Int, String)] = factors.map {
      case 1 => 1 -> srcDir
      case f => f -> ScaleProbe.ensureScaled(spark, srcDir, f)
    }
    val only = sys.env.get("SPARK_GRAFT_KEYS").map(_.split(",").toSet)
    val keys = fitKeys.filter(k => SparkEntry.queries.contains(k) &&
      only.forall(_.contains(k)))
    def timeKey(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min // stalls only ADD time; min is the intrinsic-cost estimator
    }
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rows = keys.map { k =>
      val ts = dirs.map { case (_, d) => timeKey(k, d) }
      val e = fitExponent(factors.map(_.toDouble), ts)
      val eHead = math.log(ts(1) / ts(0)) / math.log(factors(1).toDouble / factors(0))
      val eTail = math.log(ts(2) / ts(1)) / math.log(factors(2).toDouble / factors(1))
      System.err.println(f"[fit] $k%-22s t=${ts.map(t => f"$t%6.2f").mkString(" ")} " +
        f"exp_fit=$e%5.2f head=$eHead%5.2f tail=$eTail%5.2f")
      s""""$k":{"t":[${ts.map(f3).mkString(",")}],"exp_fit":${f3(e)},"exp_head":${f3(eHead)},"exp_tail":${f3(eTail)}}"""
    }
    println(s"""{"metric":"scale_fit","factors":[${factors.mkString(",")}],"reps":$reps,"stat":"min","src":"$srcDir","keys":${rows.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
