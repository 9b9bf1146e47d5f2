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
}
