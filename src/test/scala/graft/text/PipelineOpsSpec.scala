package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Training-pipeline assembly ops: the packing invariant the oracle can't
  * state, mixture rates, and quality-selection proportions. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("split: the three splits partition the corpus exactly") {
    val rows = PipelineOps.split3(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count(),
      "every document must land in exactly one split")
    assert(rows.map(_.getAs[Long]("chars")).sum ==
      docs.agg(sum(col("n_chars"))).head.getLong(0))
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
    // held-out mass is small but present: each bound keeps ~3%
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.85)
    assert(bySplit.getOrElse("val", 0L) > 0 && bySplit.getOrElse("test", 0L) > 0)
    assert((bySplit("val") + bySplit("test")) / total < 0.15)
    // membership is a pure function of doc_id: recompute independently
    val h = substring(md5(col("doc_id").cast("string")), 1, 2)
    val expectVal = docs.filter(h < "08").count()
    assert(bySplit("val") == expectVal)
  }

  test("pack: every document lands in exactly one bin; bins overflow by at most one doc") {
    val bins = PipelineOps.pack(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // a bin holds every doc whose running offset falls inside it, so its
    // total minus its LAST doc's tokens must stay under the budget
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    bins.foreach { b =>
      val lastTokens = docs((b.getAs[Long]("last_doc"), b.getAs[Long]("shard")))
      assert(b.getAs[Long]("bin_tokens") - lastTokens < 2048L,
        s"bin ${b} exceeds budget before its last doc")
    }
  }

  test("mixture: per-source keep rates track the declared weights") {
    val kept = PipelineOps.mixture(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    val totals = graft.Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    def rate(srcs: Seq[String]): Double =
      srcs.map(s => kept.getOrElse(s, 0L)).sum.toDouble / srcs.map(totals).sum
    val lo = (0 to 4).map(i => s"src$i")
    val mid = (5 to 9).map(i => s"src$i")
    val hi = (10 to 19).map(i => s"src$i")
    assert(rate(lo) > rate(mid) && rate(mid) > rate(hi),
      s"rates not ordered: ${rate(lo)} / ${rate(mid)} / ${rate(hi)}")
    assert(math.abs(rate(lo) - 0xaa / 256.0) < 0.15, rate(lo).toString)
    assert(math.abs(rate(mid) - 0x55 / 256.0) < 0.15, rate(mid).toString)
  }

  test("bpe training matches a pure-Scala re-derivation merge for merge") {
    val got = PipelineOps.bpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // reference implementation on the collected corpus
    val words: Map[String, Long] = graft.Tables.documents(spark, sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    var vocab: Map[Vector[String], Long] =
      words.toSeq.map { case (w, c) => w.split("").toVector -> c }
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val expect = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (rank <- 1 to 8) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        expect += ((rank, a, b, c))
        def merge(syms: Vector[String]): Vector[String] = {
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result()
        }
        vocab = vocab.toSeq.map { case (k, v) => merge(k) -> v }
          .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
      }
    }
    assert(got.toSeq == expect.toSeq,
      s"merge tables differ:\n got    ${got.toSeq}\n expect ${expect.toSeq}")
    // merges are genuinely multi-character after round 1 on any real corpus
    assert(got.exists { case (_, a, b, _) => (a + b).length > 2 })
  }

  test("bpe encode: token counts obey the merge laws") {
    val enc = PipelineOps.bpeEncode(spark, sf).collect()
    assert(enc.nonEmpty)
    // per-doc: word chars >= bpe tokens >= words (each merge halves locally,
    // never below one token per word; zero merges would equal char count)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { r =>
      val words = docs(r.getAs[Long]("doc_id")).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty)
      val nChars = words.map(_.length.toLong).sum
      val nTok = r.getAs[Long]("n_bpe_tokens")
      assert(nTok <= nChars, s"doc ${r.get(0)}: tokens $nTok > chars $nChars")
      assert(nTok >= words.length, s"doc ${r.get(0)}: tokens below word count")
    }
    // the learned merges actually fire: corpus-wide tokens < corpus chars
    val totTok = enc.map(_.getAs[Long]("n_bpe_tokens")).sum
    val totChar = docs.values.map(_.trim.toLowerCase
      .split("\\s+").filter(_.nonEmpty).map(_.length.toLong).sum).sum
    assert(totTok < totChar, "no merge ever applied")
    // independent re-derivation for a sample of documents: apply the
    // TRAINED rule table (from the oracle-locked bpe_train output) with a
    // fold written separately from the operator's
    val rules = PipelineOps.bpeTrain(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    def encodeWord(w: String): Int = {
      var syms = w.split("").toList
      rules.foreach { case (a, b) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var rest = syms
        while (rest.nonEmpty) rest match {
          case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
          case x :: tl => out += x; rest = tl
          case Nil =>
        }
        syms = out.toList
      }
      syms.length
    }
    enc.take(25).foreach { r =>
      val expect = docs(r.getAs[Long]("doc_id")).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).map(encodeWord(_).toLong).sum
      assert(r.getAs[Long]("n_bpe_tokens") == expect,
        s"doc ${r.get(0)} encode mismatch")
    }
  }

  test("quality filter keeps ~20% per language, deterministically") {
    val kept = PipelineOps.qualityFilter(spark, sf)
    val perLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    val totals = graft.Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    totals.foreach { case (lang, n) =>
      val k = perLang.getOrElse(lang, 0L)
      // ntile(5) tile 1 holds ceil(n/5) rows
      assert(k == (n + 4) / 5, s"$lang: kept $k of $n")
    }
    assert(kept.collect().toSeq == kept.collect().toSeq) // stable
  }

  test("pipeline_chunk: stride/window laws — coverage, overlap, count") {
    val W = 64L; val S = 48L
    val chunks = PipelineOps.chunk(spark, sf).collect()
    assert(chunks.nonEmpty)
    val nToks = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(org.apache.spark.sql.functions.col("text")),
          "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, cs) =>
      val n = nToks(doc)
      val expected = if (n <= W) 1L else ((n - W) + S - 1) / S + 1
      assert(cs.length.toLong == expected, s"doc $doc: ${cs.length} chunks for $n tokens")
      val byId = cs.sortBy(_.getAs[Long]("chunk_id"))
      // every chunk but the last is full; starts advance by exactly S, so
      // consecutive full chunks overlap by W-S and the doc is fully covered
      byId.dropRight(1).foreach(c => assert(c.getAs[Long]("n_tokens") == W))
      val last = byId.last
      assert(last.getAs[Long]("n_tokens") == n - S * (expected - 1))
    }
  }

  test("pipeline_shuffle: Merkle digest pins the exact global permutation " +
    "with bounded per-group state") {
    // Independent pure-Scala re-derivation of the two-level digest from the
    // raw table (no Spark aggregation): sort each shard's (hk, doc_id) set
    // by hk — the true training order — segment by the 2-hex-char prefix
    // (sub IS a prefix of hk, so segment order == hash order), md5 each
    // segment's doc_id run, md5 the segment digests in order.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val raw = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("hk"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byShard = raw.groupBy { case (_, hk) =>
      (java.lang.Long.parseLong(hk.take(4), 16) % 8).toInt }
    val expected = byShard.view.mapValues { docs =>
      val ordered = docs.sortBy(_._2)
      val subDigests = ordered.groupBy(_._2.take(2)).toSeq.sortBy(_._1)
        .map { case (_, run) =>
          md5hex(run.sortBy(_._2).map(_._1.toString).mkString(",")) }
      md5hex(subDigests.mkString(","))
    }.toMap
    val got = PipelineOps.shuffleShards(spark, sf).collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[String]("order_digest")).toMap
    assert(got == expected, "Merkle digest must equal the flat-order re-derivation")
    // Bounded-state law (r12 VERDICT "What's wrong #1"): the largest
    // aggregation buffer is a (shard, sub) SUB-group, strictly smaller
    // than any shard — the flat form's buffer was the whole shard.
    val shardSizes = byShard.view.mapValues(_.length).toMap
    val subSizes = raw.groupBy { case (_, hk) =>
      ((java.lang.Long.parseLong(hk.take(4), 16) % 8).toInt, hk.take(2)) }
      .view.mapValues(_.length)
    assert(subSizes.values.max < shardSizes.values.min,
      "two-level bucketing must engage: every sub-buffer below every shard size")
    // and the second level is genuinely bounded: ≤ 256 sub-digests/shard
    assert(subSizes.keys.groupBy(_._1).values.map(_.size).max <= 256)
  }
}
