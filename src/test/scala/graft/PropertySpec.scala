package graft

import graft.dedup.DedupOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based checks (SURVEY.md §5.3): algebraic identities the engine
  * must preserve, driven by ScalaCheck generators over the real tables
  * (sampled manually — the scalatest/scalacheck bridge artifact is not in
  * the offline cache). */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default.withSize(50)
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).flatMap { _ =>
      val r = g.apply(params, seed)
      seed = seed.next
      r
    }
  }

  private lazy val li = Tables.lineitem(spark, sf).cache()

  test("filter fusion: filter(p).filter(q) == filter(p && q)") {
    samples(Gen.zip(Gen.choose(1.0, 50.0), Gen.choose(0.0, 0.1)), 10).foreach {
      case (q, d) =>
        val a = li.filter(col("l_quantity") >= q).filter(col("l_discount") <= d).count()
        val b = li.filter(col("l_quantity") >= q && col("l_discount") <= d).count()
        assert(a == b, s"q=$q d=$d: $a != $b")
    }
  }

  test("row-id assignment: ranges contiguous, disjoint, monotone for any file mix") {
    import graft.delta.{AddFile, RowTracking}
    val genFile = for {
      n <- Gen.choose(1L, 10000L)
      name <- Gen.identifier.map(_.take(12))
    } yield AddFile(s"$name.parquet", Map.empty, 1L, 0L,
      stats = Some(s"""{"numRecords":$n}"""))
    samples(Gen.zip(Gen.listOfN(8, genFile), Gen.choose(-1L, 1000000L)), 20).foreach {
      case (files, hwm) =>
        val uniq = files.groupBy(_.path).map(_._2.head).toSeq
        val (assigned, newHwm) = RowTracking.assign(uniq, hwm, 7L)
        // sorted by path, each range starts where the previous ended
        val sorted = assigned.sortBy(_.path)
        assert(assigned == sorted)
        var next = hwm + 1
        sorted.foreach { f =>
          assert(f.baseRowId.contains(next), s"gap at ${f.path}")
          assert(f.defaultRowCommitVersion.contains(7L))
          next += f.stats.flatMap(graft.delta.DataSkipping.parse).flatMap(_.numRecords).get
        }
        assert(newHwm == next - 1)
        assert(newHwm - hwm ==
          uniq.map(_.stats.flatMap(graft.delta.DataSkipping.parse).flatMap(_.numRecords).get).sum)
    }
  }

  test("projection commutes with filter on retained columns") {
    samples(Gen.choose(1.0, 50.0), 5).foreach { q =>
      val a = li.select(col("l_orderkey"), col("l_quantity"))
        .filter(col("l_quantity") >= q).count()
      val b = li.filter(col("l_quantity") >= q)
        .select(col("l_orderkey"), col("l_quantity")).count()
      assert(a == b, s"q=$q: $a != $b")
    }
  }

  test("dedup idempotence: dropDuplicates twice == once") {
    val docs = Tables.documents(spark, sf)
    val once = docs.dropDuplicates("text")
    assert(once.count() == once.dropDuplicates("text").count())
  }

  test("minhash self-agreement is total") {
    val sig = DedupOps.minhashSignatures(spark, sf).limit(20).collect()
    sig.foreach { r =>
      val hs = (0 until DedupOps.NumPerms).map(i => r.getLong(r.fieldIndex(s"h$i")))
      assert(hs.zip(hs).count { case (a, b) => a == b } == DedupOps.NumPerms)
    }
  }

  test("union cardinality and except containment") {
    samples(Gen.choose(100000.0, 500000.0), 5).foreach { t =>
      val o = Tables.orders(spark, sf)
      val a = o.filter(col("o_totalprice") > t).select("o_orderkey")
      val b = o.filter(col("o_orderstatus") === "F").select("o_orderkey")
      assert(a.unionAll(b).count() == a.count() + b.count())
      assert(a.exceptAll(b).count() <= a.count())
    }
  }

  test("delta writer/reader roundtrip preserves arbitrary rows") {
    import spark.implicits._
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 1000L), Gen.alphaNumStr.map(_.take(12))))
    samples(rowGen, 5).foreach { rows =>
      val t = java.nio.file.Files.createTempDirectory("graft_prop").toString + "/t"
      val df = rows.toDF("id", "s")
      graft.delta.DeltaWriter.write(df, t)
      val back = graft.delta.DeltaSnapshotReader.load(spark, t)
        .as[(Long, String)].collect().sorted.toSeq
      assert(back == rows.sorted, s"roundtrip mismatch at $t")
    }
  }

  test("kmv sketch: for any multiset, buffer == k smallest distinct values") {
    import graft.ops.KmvSketchAgg
    val genSet = Gen.listOfN(900, Gen.choose(Long.MinValue, Long.MaxValue))
    samples(genSet, 8).foreach { xs =>
      val viaAgg = xs.foldLeft(KmvSketchAgg.zero)(KmvSketchAgg.reduce).hs.toSeq
      val expect = xs.distinct.sorted.take(KmvSketchAgg.K)
      assert(viaAgg == expect, s"sketch != k-smallest-distinct for n=${xs.size}")
      // splitting arbitrarily and merging gives the identical sketch
      val (l, r) = xs.splitAt(xs.size / 3)
      val merged = KmvSketchAgg.merge(
        l.foldLeft(KmvSketchAgg.zero)(KmvSketchAgg.reduce),
        r.foldLeft(KmvSketchAgg.zero)(KmvSketchAgg.reduce)).hs.toSeq
      assert(merged == expect)
    }
  }

  test("kmv estimator: distinct-count error within 5/sqrt(K) for uniform draws") {
    import graft.ops.KmvSketchAgg
    val rnd = new scala.util.Random(7)
    Seq(2000, 20000, 100000).foreach { n =>
      // distinct longs via a splitmix-style scramble of 1..n (uniform-ish)
      val hs = (1 to n).map { i =>
        var z = i.toLong * -7046029254386353131L
        z = (z ^ (z >>> 30)) * -4658895280553007687L
        (z ^ (z >>> 31))
      }
      val sk = hs.foldLeft(KmvSketchAgg.zero)(KmvSketchAgg.reduce).hs
      val k = KmvSketchAgg.K
      def u(h: Long): Double = h.toDouble / 1.8446744073709552e19 + 0.5
      val est = if (sk.size < k) sk.size.toDouble else (k - 1) / u(sk.last)
      val rel = math.abs(est - n) / n
      assert(rel < 5.0 / math.sqrt(k), f"n=$n est=$est%.0f rel=$rel%.3f")
    }
  }

  test("triangle census: distributed degree-oriented count == brute force on random graphs") {
    import spark.implicits._
    val genGraph = for {
      n <- Gen.choose(4, 16)
      m <- Gen.choose(3, 40)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield es.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2).toLong, math.max(e._1, e._2).toLong))
      .distinct
    samples(genGraph, 10).filter(_.nonEmpty).foreach { es =>
      val (_, tri) = graft.ops.GraphOps.orientedTriangles(es.toDF("a", "b"))
      val got = tri.count()
      // brute force: each triangle is counted once per edge via common
      // neighbours of the endpoints, so divide by 3
      val adj = es.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val brute = es.map { case (a, b) => (adj(a) & adj(b)).size }.sum / 3
      assert(got == brute.toLong,
        s"census $got != brute $brute on ${es.size}-edge graph $es")
    }
  }

  test("streaks: for any (user, day) set, streak lens partition the days") {
    // pure-logic law on the gaps-and-islands construction used by
    // events_streaks: islands of consecutive ints partition the set
    val genDays = Gen.listOfN(40, Gen.choose(0, 60)).map(_.distinct.sorted)
    samples(genDays, 12).filter(_.nonEmpty).foreach { days =>
      val islands = days.zipWithIndex.groupBy { case (d, i) => d - i }
        .values.map(_.map(_._1)).toSeq
      assert(islands.map(_.size).sum == days.size)
      islands.foreach { run =>
        assert(run.max - run.min + 1 == run.size, s"non-contiguous island $run")
      }
    }
  }
}
