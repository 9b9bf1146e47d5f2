package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the quality-gate family (QualityOps); exact values are
  * hash-checked against the DuckDB oracle by the driver. */
class QualitySpec extends SparkSpec {

  test("gopher rules: metrics bounded, verdict consistent, gate discriminates") {
    val rows = QualityOps.gopherQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_words")
      val ratio = r.getAs[Double]("alpha_word_ratio")
      val mean = r.getAs[Double]("mean_word_len")
      val hits = r.getAs[Int]("stop_hits")
      val passes = r.getAs[Int]("passes")
      assert(n > 0 && ratio >= 0.0 && ratio <= 1.0 && mean > 0.0)
      val expected = (n >= 50 && n <= 100000 && mean >= 3.0 && mean <= 10.0 &&
        ratio > 0.8 && hits >= 2)
      assert(passes == (if (expected) 1 else 0), s"verdict mismatch at $r")
    }
    // fixture has 10..99-word docs, so the 50-word floor must split the corpus
    assert(rows.exists(_.getAs[Int]("passes") == 1), "no doc passes")
    assert(rows.exists(_.getAs[Int]("passes") == 0), "no doc fails")
  }

  test("boilerplate: counts bounded, verdict consistent, both classes present") {
    val rows = TextOps.boilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val c = r.getAs[Long]("n_common")
      assert(n > 0 && c >= 0 && c <= n, s"counts out of range at $r")
      assert(r.getAs[Boolean]("is_boiler") == (c * 2 >= n), s"verdict mismatch at $r")
    }
    // the synthetic shared-vocabulary corpus must contain corpus-common
    // shingles without being ALL common — both verdicts must appear or the
    // threshold discriminates nothing
    assert(rows.exists(_.getAs[Boolean]("is_boiler")), "no boilerplate doc found")
    assert(rows.exists(r => !r.getAs[Boolean]("is_boiler")), "every doc flagged")
  }

  test("repetition: duplicate fraction and top share bounded") {
    val rows = QualityOps.repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val dup = r.getAs[Long]("n_dup_bigrams")
      assert(n > 0 && dup >= 0 && dup < n)
      assert(r.getAs[Double]("dup_frac") >= 0.0 && r.getAs[Double]("dup_frac") < 1.0)
      val top = r.getAs[Double]("top_share")
      assert(top >= 1.0 / n && top <= 1.0)
    }
  }

  test("lm familiarity: every occurrence counts itself; oov bounded") {
    val rows = QualityOps.lmScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val fam = r.getAs[Long]("familiarity")
      val oov = r.getAs[Long]("n_oov")
      assert(fam >= n, "corpus count of an occurring gram is at least 1")
      assert(oov >= 0 && oov <= n)
      assert(r.getAs[Double]("mean_fam") >= 1.0)
    }
  }

  test("line dedup: matches a full brute-force oracle and drops the planted line") {
    val got = QualityOps.lineDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Int]("n_lines"), r.getAs[Long]("n_kept"), r.getAs[String]("clean_md5"))))
      .toMap
    // brute-force reimplementation in plain Scala over the collected corpus
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val lines: Map[Long, Vector[String]] = docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
      val nat = toks.grouped(5).map(_.mkString(" ")).toVector
      id -> (if (id % 4 == 0) nat :+ QualityOps.BoilerLine else nat)
    }.toMap
    val df = lines.toSeq.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.size }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expect = lines.flatMap { case (id, ls) =>
      val kept = ls.filter(l => df(l) < 3)
      if (kept.isEmpty) None
      else Some(id -> (ls.size, kept.size.toLong, md5hex(kept.mkString(" "))))
    }
    assert(got == expect)
    // the planted footer is corpus-common, so every 4th doc must lose it
    val footerDocs = lines.keys.filter(_ % 4 == 0)
    assert(footerDocs.size >= 3, "fixture too small to make the footer common")
    footerDocs.foreach { id =>
      // a doc absent from the output dropped ALL lines (footer included);
      // a present one must have lost at least the footer
      got.get(id).foreach { case (nLines, nKept, _) =>
        assert(nKept < nLines, s"doc $id kept the planted boilerplate line")
      }
    }
  }
}
