package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-stall drill for the bench scoreboard's key-level flag
  * (VERDICT r12 #1): `Bench.keySuspects` must catch the two documented
  * stall shapes — a stall hitting SOME reps (median ≫ own min) and a
  * stall hitting ALL reps (median ≫ prior record) — while staying quiet
  * on clean keys, sub-second jitter, and legitimate regressions below the
  * factor. Pure-function tests: no Spark session needed. */
class BenchSuspectSpec extends AnyFunSuite {

  test("clean keys are not flagged") {
    val stats = Seq(("a", 1.0, 1.1), ("b", 2.4, 2.6), ("c", 0.05, 0.06))
    assert(Bench.keySuspects(stats, Map("a" -> 1.0, "b" -> 2.5)) == Seq())
  }

  test("stall hitting some reps: median >> own min") {
    // r12 shape: delta_dpo median 14.3 s, clean rep ~2 s
    val stats = Seq(("delta_dpo", 2.0, 14.3), ("ok", 2.0, 2.2))
    assert(Bench.keySuspects(stats, Map.empty) == Seq("delta_dpo"))
  }

  test("stall hitting all reps: min blind, prior record catches it") {
    // all three reps stalled: min == median == 13.4, history says ~1.6
    val stats = Seq(("delta_dv_delete", 13.0, 13.4))
    assert(Bench.keySuspects(stats, Map("delta_dv_delete" -> 1.6)) ==
      Seq("delta_dv_delete"))
    // ...and with no history the all-reps stall is undetectable by design
    assert(Bench.keySuspects(stats, Map.empty) == Seq())
  }

  test("sub-second keys never flag (floor), regardless of ratio") {
    val stats = Seq(("tiny", 0.02, 0.4)) // 20x ratio but under floorSec
    assert(Bench.keySuspects(stats, Map("tiny" -> 0.03)) == Seq())
  }

  test("legitimate 2-3x regression is reported as a number, not a stall") {
    val stats = Seq(("slower", 3.0, 3.4))
    assert(Bench.keySuspects(stats, Map("slower" -> 1.2)) == Seq())
  }

  test("a key absent from the prior record uses only the min rule") {
    val stats = Seq(("new_key", 1.0, 1.2))
    assert(Bench.keySuspects(stats, Map("other" -> 0.1)) == Seq())
  }

  test("readPrior prefers the stall-resistant min over the median") {
    val f = java.nio.file.Files.createTempFile("graft_bench_prior_", ".json")
    try {
      // prior record itself contaminated: median 14.3, min 1.9 — the next
      // run must compare against 1.9 or a repeat stall would be masked
      java.nio.file.Files.write(f,
        """{"queries":{"delta_dpo":14.3,"ok":2.0},"queries_min":{"delta_dpo":1.9,"ok":1.8}}"""
          .getBytes("UTF-8"))
      val prior = Bench.readPrior(f.toString)
      assert(prior == Map("delta_dpo" -> 1.9, "ok" -> 1.8))
      val stats = Seq(("delta_dpo", 12.0, 12.5)) // repeat all-reps stall
      assert(Bench.keySuspects(stats, prior) == Seq("delta_dpo"))
    } finally java.nio.file.Files.delete(f)
  }

  test("spliceRequeue: clean improvement splices; dirty or non-improving never does") {
    // the r13 incident shape: recorded 13.28 s, clean standalone 2.44 s
    assert(Bench.spliceRequeue(13.28, 2.44, probesClean = true))
    // re-run on a loaded host must NEVER enter the record, even if faster
    assert(!Bench.spliceRequeue(13.28, 2.44, probesClean = false))
    // any clean improvement splices, however small...
    assert(Bench.spliceRequeue(13.28, 13.10, probesClean = true))
    // ...but an equal or worse re-run is a genuine regression: keep the
    // measurement, keep the flag
    assert(!Bench.spliceRequeue(13.28, 13.28, probesClean = true))
    assert(!Bench.spliceRequeue(13.28, 14.00, probesClean = true))
  }

  test("spliced values unflag the key; a reproduced slow median stays flagged") {
    // after splicing (median 2.44, min 2.31) the min-rule ratio is ~1
    assert(Bench.keySuspects(Seq(("stream_tws", 2.31, 2.44)), Map.empty) == Seq())
    // a requeue that reproduced the slow value leaves median >> min → flagged
    assert(Bench.keySuspects(Seq(("stream_tws", 2.31, 13.1)), Map.empty) ==
      Seq("stream_tws"))
  }

  test("readPrior is SF-scoped: a record from another scale factor is ignored") {
    val f = java.nio.file.Files.createTempFile("graft_bench_prior_", ".json")
    try {
      java.nio.file.Files.write(f,
        """{"queries":{"a":0.01},"sf":"/root/testdata/sf0.001"}""".getBytes("UTF-8"))
      // an sf0.001 record (e.g. a requeue drill) would make every sf0.1
      // key read as 4x-prior suspect → requeue storm; scope drops it
      assert(Bench.readPrior(f.toString, "/root/testdata/sf0.1") == Map.empty)
      assert(Bench.readPrior(f.toString, "/root/testdata/sf0.001") == Map("a" -> 0.01))
      assert(Bench.readPrior(f.toString) == Map("a" -> 0.01)) // unscoped: legacy
    } finally java.nio.file.Files.delete(f)
  }

  test("familyDrift reports a systematic family slowdown the key flag misses") {
    // the r14 incident shape: every stream key 2-3x prior — each under the
    // 4x key flag, the family median unmistakably drifted
    val cur = Seq(("stream_join", 9.9), ("stream_join_full", 14.4),
      ("stream_join_outer", 11.5), ("stream_tws", 4.2), ("stream_cdf", 2.0),
      ("agg_hash", 0.27), ("agg_cube", 0.44), ("agg_mode", 0.52))
    val prior = Map("stream_join" -> 2.8, "stream_join_full" -> 4.3,
      "stream_join_outer" -> 3.6, "stream_tws" -> 1.8, "stream_cdf" -> 1.0,
      "agg_hash" -> 0.27, "agg_cube" -> 0.44, "agg_mode" -> 0.52)
    val drift = Bench.familyDrift(cur, prior)
    assert(drift.keySet == Set("stream"), drift)
    assert(drift("stream") > 2.0 && drift("stream") < 4.0)
    // none of those stream keys trips the KEY flag (all under 4x prior)
    val stats = cur.collect { case (k, v) if k.startsWith("stream") => (k, v, v) }
    assert(Bench.keySuspects(stats, prior) == Seq())
  }

  test("familyDrift stays silent on small families, tiny keys, and one-off stalls") {
    // two qualifying keys only: a key problem, not a family signal
    assert(Bench.familyDrift(
      Seq(("graph_pagerank", 9.0), ("graph_triangles", 6.0)),
      Map("graph_pagerank" -> 3.0, "graph_triangles" -> 2.0)).isEmpty)
    // sub-floor priors never feed a ratio (scheduler jitter on 0.1s keys)
    assert(Bench.familyDrift(
      Seq(("fn_a", 0.4), ("fn_b", 0.4), ("fn_c", 0.4)),
      Map("fn_a" -> 0.1, "fn_b" -> 0.1, "fn_c" -> 0.1)).isEmpty)
    // ONE stalled key in a healthy family: the median holds the family quiet
    assert(Bench.familyDrift(
      Seq(("delta_merge", 12.0), ("delta_update", 2.1), ("delta_delete", 2.0),
        ("delta_ivm", 3.8)),
      Map("delta_merge" -> 3.1, "delta_update" -> 2.1, "delta_delete" -> 2.0,
        "delta_ivm" -> 3.9)).isEmpty)
    // failed keys (-1) never feed a ratio
    assert(Bench.familyDrift(
      Seq(("x_a", -1.0), ("x_b", -1.0), ("x_c", -1.0)),
      Map("x_a" -> 1.0, "x_b" -> 1.0, "x_c" -> 1.0)).isEmpty)
  }

  test("readPrior tolerates a pre-r13 record (no queries_min) and junk") {
    val f = java.nio.file.Files.createTempFile("graft_bench_prior_", ".json")
    try {
      java.nio.file.Files.write(f,
        """{"queries":{"a":1.5,"failed_key":-1.0}}""".getBytes("UTF-8"))
      assert(Bench.readPrior(f.toString) == Map("a" -> 1.5)) // -1 dropped
      java.nio.file.Files.write(f, "not json".getBytes("UTF-8"))
      assert(Bench.readPrior(f.toString) == Map.empty)
      assert(Bench.readPrior("/nonexistent/path.json") == Map.empty)
    } finally java.nio.file.Files.delete(f)
  }

  test("history-seeded prior: clean runs only, per-key flags excluded, SF-scoped, torn lines skipped") {
    val f = java.nio.file.Files.createTempFile("graft_bench_hist_", ".jsonl")
    try {
      java.nio.file.Files.write(f, Seq(
        // clean run: both keys count
        """{"head":"aaa111","sf":"/d/sf0.1","load_suspect":false,"total":100.0,"key_suspect":[],"queries_min":{"a":2.0,"b":5.0}}""",
        // loaded run: NOTHING counts (its 0.5 for a would otherwise win)
        """{"head":"bbb222","sf":"/d/sf0.1","load_suspect":true,"total":50.0,"key_suspect":[],"queries_min":{"a":0.5,"b":0.5}}""",
        // clean run with key b flagged: a counts (improves), b excluded
        """{"head":"ccc333","sf":"/d/sf0.1","load_suspect":false,"total":90.0,"key_suspect":["b"],"queries_min":{"a":1.5,"b":0.4}}""",
        // other SF: ignored entirely
        """{"head":"ddd444","sf":"/d/sf0.001","load_suspect":false,"total":5.0,"key_suspect":[],"queries_min":{"a":0.1}}""",
        "torn {json").mkString("", "\n", "\n").getBytes("UTF-8"))
      assert(Bench.readHistoryMins(f.toString, "/d/sf0.1") == Map("a" -> 1.5, "b" -> 5.0))
      // best clean FULL run (no per-key flags): aaa111 beats ccc333 (flagged)
      assert(Bench.bestCleanRun(f.toString, "/d/sf0.1") == Some(("aaa111", 100.0)))
      assert(Bench.bestCleanRun(f.toString, "/d/sf9") == None)
      assert(Bench.readHistoryMins("/nonexistent.jsonl", "/d/sf0.1") == Map.empty)
    } finally java.nio.file.Files.delete(f)
  }

  test("family-scoped history (r17): a loaded run's CLEAN families still contribute") {
    val f = java.nio.file.Files.createTempFile("graft_bench_fam_", ".jsonl")
    try {
      java.nio.file.Files.write(f, Seq(
        // clean baseline
        """{"head":"aaa111","sf":"/d/sf0.1","load_suspect":false,"total":100.0,"key_suspect":[],"queries_min":{"agg_hash":2.0,"join_left":5.0}}""",
        // loaded run that NAMES its dirty window: only the join family is
        // suspect, so agg_hash's better 1.0 counts and join_left's 0.5 must not
        """{"head":"eee555","sf":"/d/sf0.1","load_suspect":true,"family_suspect":["join"],"total":60.0,"key_suspect":[],"queries_min":{"agg_hash":1.0,"join_left":0.5}}""",
        // legacy loaded run without the list: still all-or-nothing
        """{"head":"fff666","sf":"/d/sf0.1","load_suspect":true,"total":40.0,"key_suspect":[],"queries_min":{"agg_hash":0.2,"join_left":0.2}}"""
      ).mkString("", "\n", "\n").getBytes("UTF-8"))
      assert(Bench.readHistoryMins(f.toString, "/d/sf0.1") ==
        Map("agg_hash" -> 1.0, "join_left" -> 5.0))
      // a fully-clean family-scoped record behaves like any clean run
      java.nio.file.Files.write(f,
        ("""{"head":"ggg777","sf":"/d/sf0.1","load_suspect":false,"family_suspect":[],"total":80.0,"key_suspect":[],"queries_min":{"agg_hash":0.9,"join_left":4.0}}""" + "\n")
          .getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.APPEND)
      assert(Bench.readHistoryMins(f.toString, "/d/sf0.1") ==
        Map("agg_hash" -> 0.9, "join_left" -> 4.0))
    } finally java.nio.file.Files.delete(f)
  }

  test("deferred requeue: a stall clearing only after the cooldown still lands the splice (VERDICT r14 #7)") {
    var now = 0L
    var slept = Seq.empty[Long]
    var cleanAfter = 120L // host goes quiet at t=120; cooldown is 60s
    def probes() = now >= cleanAfter
    val runs = scala.collection.mutable.ArrayBuffer[String]()
    val spliced = Bench.requeueLoop(
      Seq("stalled"), Map("stalled" -> 14.0),
      runKey = { k => runs += k; now += 1; Some((2.0, 1.8)) },
      probesClean = () => probes(),
      cooldownMs = 60000L,
      sleep = ms => { slept :+= ms; now += ms / 500 }) // sleep advances past the stall
    assert(slept == Seq(60000L), "exactly one bounded cooldown")
    assert(spliced == Map("stalled" -> (14.0, 2.0, 1.8)),
      s"the deferred pass must splice: $spliced")
    // without the deferred pass the same drill loses the value forever
    now = 0L; cleanAfter = Long.MaxValue
    val none = Bench.requeueLoop(Seq("stalled"), Map("stalled" -> 14.0),
      runKey = _ => Some((2.0, 1.8)), probesClean = () => false,
      cooldownMs = 60000L, sleep = _ => ())
    assert(none.isEmpty, "a host that never goes quiet must never splice")
  }

  test("requeueLoop: clean regression keeps the original and never re-sleeps; a broken key gives up") {
    var sleeps = 0
    val out = Bench.requeueLoop(
      Seq("regressed", "broken"), Map("regressed" -> 3.0, "broken" -> 9.0),
      runKey = {
        case "regressed" => Some((3.2, 3.1)) // clean but NOT improved
        case _ => None                        // throws on re-run
      },
      probesClean = () => true, cooldownMs = 60000L, sleep = _ => sleeps += 1)
    assert(out.isEmpty, s"nothing splices: $out")
    assert(sleeps == 0, "no deferral when every window was clean")
  }
}
