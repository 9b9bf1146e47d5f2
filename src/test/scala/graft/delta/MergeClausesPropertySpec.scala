package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import java.nio.file.Files

/** Property check for the multi-clause MERGE: random target/source
  * contents and random clause lists must match a straightforward
  * in-memory evaluator of the first-applicable-wins semantics. Catches
  * category routing (matched / not-matched / not-matched-by-source),
  * condition evaluation and clause-order bugs that a fixed fixture can
  * miss. */
class MergeClausesPropertySpec extends SparkSpec {
  import DeltaWriter._
  import spark.implicits._

  // mirrored clause forms: (Column form, reference evaluator)
  // t = target row value, s = source row value (by the shared key)
  private case class RefClause(col: MergeClause,
                               kind: String, // matched | insert | bySource
                               applies: (Option[Int], Option[Int]) => Boolean,
                               apply: (Option[Int], Option[Int]) => Option[Int])

  private def clausePool(th: Int): Seq[RefClause] = Seq(
    RefClause(MatchedDelete(Some(col("t.v") < th)), "matched",
      (t, _) => t.exists(_ < th), (_, _) => None),
    RefClause(MatchedUpdateAll(), "matched",
      (_, _) => true, (_, s) => s),
    RefClause(MatchedUpdate(Map("v" -> (col("t.v") + col("s.v"))),
      Some(col("s.v") % 2 === 0)), "matched",
      (_, s) => s.exists(_ % 2 == 0), (t, s) => Some(t.get + s.get)),
    RefClause(NotMatchedInsertAll(Some(col("s.v") >= th)), "insert",
      (_, s) => s.exists(_ >= th), (_, s) => s),
    RefClause(NotMatchedInsertAll(), "insert",
      (_, _) => true, (_, s) => s),
    RefClause(NotMatchedBySourceDelete(Some(col("t.v") % 3 === 0)), "bySource",
      (t, _) => t.exists(_ % 3 == 0), (_, _) => None),
    RefClause(NotMatchedBySourceUpdate(Map("v" -> (col("t.v") + lit(1000))),
      Some(col("t.v") >= th)), "bySource",
      (t, _) => t.exists(_ >= th), (t, _) => Some(t.get + 1000)))

  private def reference(target: Map[Long, Int], source: Map[Long, Int],
                        clauses: Seq[RefClause]): Map[Long, Int] = {
    val out = Map.newBuilder[Long, Int]
    target.foreach { case (id, tv) =>
      val sv = source.get(id)
      val pool = if (sv.isDefined) clauses.filter(_.kind == "matched")
      else clauses.filter(_.kind == "bySource")
      pool.find(_.applies(Some(tv), sv)) match {
        case Some(c) => c.apply(Some(tv), sv).foreach(v => out += id -> v)
        case None => out += id -> tv // no clause covers it → keep
      }
    }
    source.foreach { case (id, sv) =>
      if (!target.contains(id)) {
        clauses.filter(_.kind == "insert").find(_.applies(None, Some(sv)))
          .foreach(c => c.apply(None, Some(sv)).foreach(v => out += id -> v))
      }
    }
    out.result()
  }

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default.withSize(40)
    var seed = org.scalacheck.rng.Seed(7L)
    (0 until n).flatMap { _ =>
      val r = g.apply(params, seed)
      seed = seed.next
      r
    }
  }

  test("random contents + random clause lists match the reference evaluator") {
    val genCase = for {
      tgtIds <- Gen.someOf(0L until 12L)
      srcIds <- Gen.someOf(6L until 18L)
      tVals <- Gen.listOfN(tgtIds.size, Gen.choose(0, 100))
      sVals <- Gen.listOfN(srcIds.size, Gen.choose(0, 100))
      th <- Gen.choose(20, 80)
      nClauses <- Gen.choose(1, 4)
      order <- Gen.pick(nClauses, 0 until 7)
    } yield (tgtIds.zip(tVals).toMap, srcIds.zip(sVals).toMap, th, order.toSeq)

    samples(genCase, 8).zipWithIndex.foreach {
      case ((target, source, th, order), i) =>
        if (target.nonEmpty) {
          val pool = clausePool(th)
          val clauses = order.map(pool)
          val t = Files.createTempDirectory(s"graft_mcp$i").toString + "/tbl"
          DeltaWriter.write(target.toSeq.toDF("id", "v").coalesce(1), t)
          DeltaWriter.mergeClauses(spark, t,
            source.toSeq.toDF("id", "v"), Seq("id"), clauses.map(_.col))
          val got = DeltaSnapshotReader.load(spark, t)
            .select("id", "v").as[(Long, Int)].collect().toMap
          val exp = reference(target, source, clauses)
          assert(got == exp,
            s"case $i: clauses=${clauses.map(_.col.getClass.getSimpleName)} th=$th\n" +
              s"  target=$target\n  source=$source\n  got=$got\n  exp=$exp")
        }
    }
  }
}
