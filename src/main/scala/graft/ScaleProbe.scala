package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.File

/** Local scaling probe (VERDICT r10 #3): measure the HEAVIEST data-plane
  * keys at sf0.1 and at a deterministically synthesized ~10× corpus, and
  * report each key's scaling exponent `log(t_big/t_small)/log(factor)` —
  * measured evidence (not plan argument) that the banded dedup / sampled
  * ANN / one-exchange text designs scale near-linearly, the property the
  * 100 TB story rests on.
  *
  * The scaled corpus is `factor` shifted replicas of the source tables:
  *  - join/filter keys shift by a constant divisible by every modulus the
  *    query surface uses (lcm(1..16,1000)·97), so filter selectivities and
  *    join fan-outs are IDENTICAL per replica — the workload grows by
  *    exactly `factor`, nothing else changes;
  *  - document text is per-replica letter-translated (length-preserving),
  *    so each replica keeps the planted near-dup pairs of the source but
  *    no cross-replica near-dups appear — the dup RATE stays constant
  *    while the corpus grows, the realistic scaling regime for dedup;
  *  - embeddings get one per-replica coordinate bump (breaks cross-replica
  *    cos≥0.999 while keeping within-replica planted pairs).
  *
  * Usage: runMain graft.ScaleProbe [srcDir] [factor] [reps]
  * Prints one JSON line: {"metric":"scale_probe","factor":N,
  *   "keys":{k:{"t0":…,"t1":…,"exp":…}},…}
  */
object ScaleProbe {

  /** Divisible by every modulus in the query surface (lcm(1..16) lifted to
    * 5^3 for %1000, times the prime 97) and larger than any source key. */
  val Shift = 1747746000L

  /** Heaviest corpus-scaling keys: the banded dedup family, sampled ANN,
    * the gram-join text keys, a shuffle join/agg pair, the iterative
    * graph key the r10 verdict flagged, and (r11 #6) the write/streaming
    * family — CoW MERGE, CDF-driven IVM, the watermarked stream-stream
    * join and the foreachBatch upsert sink — whose cost must scale with
    * the CHANGED/streamed rows, not some hidden quadratic. */
  val probeKeys: Seq[String] = Seq(
    "dedup_exact", "dedup_ngram_jaccard", "dedup_clusters", "dedup_minhash",
    "dedup_simhash", "dedup_embed_cos", "dedup_semantic",
    "sim_ann_ivf", "sim_knn_join",
    "text_decontaminate", "text_lm_score", "text_bpe_train",
    "agg_hash", "join_sort_merge", "graph_pagerank",
    "delta_merge", "delta_ivm", "stream_join", "stream_upsert_delta",
    "dedup_incremental")

  /** One replica of one table, key-shifted / perturbed per the header. */
  private def replica(name: String, df: DataFrame, i: Int): DataFrame = {
    val s = Shift * i
    def shift(cols: String*)(d: DataFrame) =
      cols.foldLeft(d)((acc, c) => acc.withColumn(c, col(c) + lit(s)))
    name match {
      case "region" | "nation" => if (i == 0) df else df.limit(0) // dims stay fixed
      case "customer" => shift("c_custkey")(df)
      case "supplier" => shift("s_suppkey")(df)
      case "part"     => shift("p_partkey")(df)
      case "orders"   => shift("o_orderkey", "o_custkey")(df)
      case "lineitem" => shift("l_orderkey", "l_partkey", "l_suppkey")(df)
      case "events"   => shift("event_id", "user_id")(df)
      case "documents" =>
        val d = shift("doc_id")(df)
        if (i == 0) d
        else {
          // length-preserving per-replica letter rotations over THREE
          // disjoint alphabets (two-level design, VERDICT r13 #3 — the
          // two-alphabet form capped the replica factor at 65): the
          // (shift1, shift2, shift3) triple is unique per replica for
          // i < 1 + 8*9*8 = 577, and shift1 is never 0 — so no replica is
          // the identity and no two replicas share the full perturbation
          // (byte-identical cross-replica duplicates would break the
          // constant-dup-rate premise the probe measures under). For
          // i ≤ 64 the third rotation is the identity and the second
          // agrees with the old %8 form, so corpora built under the
          // two-alphabet design are byte-identical and stay valid.
          val abc1 = "etaoinshr"
          val abc2 = "dlcumwfgy"
          val abc3 = "bjkpqvxz" // the 8 letters the first two don't use
          val s1 = 1 + ((i - 1) % 8)
          val s2 = ((i - 1) / 8) % 9 // 0 allowed: s1 != 0 keeps non-identity
          val s3 = ((i - 1) / 72) % 8
          def rot(a: String, k: Int) = a.drop(k) + a.take(k)
          d.withColumn("text",
            translate(translate(translate(col("text"),
              abc1, rot(abc1, s1)), abc2, rot(abc2, s2)), abc3, rot(abc3, s3)))
        }
      case "embeddings" =>
        val d = shift("vec_id")(df)
        if (i == 0) d
        else {
          // one deterministic coordinate bump per replica: cross-replica
          // cosine falls well under the 0.999 near-dup bar
          val b1 = d.withColumn("embedding",
            expr(s"transform(embedding, (x, j) -> IF(j = ${i % 16}, " +
              s"cast(x + ${0.37 * (1 + (i % 5))} as float), x))"))
          // second-level bump (r13 #3): the single (coord, delta) pair
          // repeats with period lcm(16,5)=80; replicas ≥ 80 add a second
          // bump keyed by i/80, lifting the embedding period to 80·80.
          // Identity for i < 80 → existing corpora stay byte-identical.
          if (i < 80) b1
          else b1.withColumn("embedding",
            expr(s"transform(embedding, (x, j) -> IF(j = ${(i / 80) % 16}, " +
              s"cast(x + ${0.53 * (1 + ((i / 80) % 5))} as float), x))"))
        }
      case other => sys.error(s"no replica rule for table $other")
    }
  }

  def ensureScaled(spark: SparkSession, srcDir: String, factor: Int): String = {
    // perturbations repeat beyond these periods (text rotation triples:
    // 8·9·8 = 576; embeddings 80·80 = 6400): two replicas would collide
    // into exact cross-replica near-dups. The binding cap is the text one.
    require(factor >= 2 && factor <= 576, s"factor $factor outside [2,576]")
    val dst = new File(sys.props("java.io.tmpdir"),
      s"graft_scale_x${factor}_" + srcDir.replaceAll("[^A-Za-z0-9.]", "_"))
    // v4: events is now a single FILE (layout change for the stream keys)
    val marker = new File(dst, "_SCALED_READY_v4")
    // staleness defence ([[StageMarker]]): a regenerated source fixture
    // must rebuild the replica corpus, or t1 measures stale data
    val sig = StageMarker.sig(Tables.all.map(t => new File(s"$srcDir/$t.parquet")))
    if (StageMarker.fresh(marker, sig)) return dst.toString
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
    if (dst.exists()) rm(dst)
    dst.mkdirs()
    Tables.all.foreach { t =>
      val src = spark.read.parquet(s"$srcDir/$t.parquet")
      val out = (0 until factor).map(i => replica(t, src, i))
        .reduce(_ unionByName _)
      if (t == "events") {
        // the stream-staging fixtures (stagedEventStream /
        // upsertInputFixture) copy `events.parquet` as a single FILE —
        // the source-testdata layout — so the scaled corpus must match:
        // write one part and move it to the bare name (build-time only;
        // parquet row groups keep the read side fully parallel)
        val tmp = new File(dst, "_events_build")
        out.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          new File(dst, "events.parquet").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        rm(tmp)
      } else out.write.mode("overwrite").parquet(s"${dst}/$t.parquet")
    }
    StageMarker.write(marker, sig)
    dst.toString
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 3
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
    val scaledDir = ensureScaled(spark, srcDir, factor)

    val only = sys.env.get("SPARK_GRAFT_KEYS").map(_.split(",").toSet)
    val keys = probeKeys.filter(k => SparkEntry.queries.contains(k) &&
      only.forall(_.contains(k)))
    def timeKey(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // MIN of reps, not median: the exponent wants the operator's
      // INTRINSIC cost, and the documented noisy-neighbor stalls (10-30x
      // on single keys, invisible to CPU probes) only ever ADD time —
      // median-of-3 let one stall spanning two reps fake a superlinear
      // exponent (r12: dedup_embed_cos read exp 1.50 in a stalled run,
      // 1.05 clean). Min also absorbs rep-1 cache materialization, which
      // the median only partially did.
      ts.min
    }
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rows = keys.map { k =>
      val t0 = timeKey(k, srcDir)
      val t1 = timeKey(k, scaledDir)
      val exp = math.log(t1 / t0) / math.log(factor.toDouble)
      System.err.println(f"[scale] $k%-22s t0=${t0}%6.2f t1=${t1}%6.2f exp=${exp}%5.2f")
      s""""$k":{"t0":${f3(t0)},"t1":${f3(t1)},"exp":${f3(exp)}}"""
    }
    println(s"""{"metric":"scale_probe","factor":$factor,"reps":$reps,"src":"$srcDir","keys":${rows.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
