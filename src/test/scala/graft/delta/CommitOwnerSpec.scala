package graft.delta

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Catalog-owned commits (coordinated-commits shape, VERDICT r12 #7):
  * stage → one-link claim → backfill, with the registry as the authority.
  * Drills every crash window single-JVM (the cross-process race lives in
  * ConcurrencyDrillSpec): claim-then-die recovers via the NEXT owner
  * operation or the catalog read path; losers' staged bodies are
  * reclaimed; plain-log readers see only backfilled commits. */
class CommitOwnerSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("graft_cco").toString + "/tbl"

  private def commitsDir(t: String) =
    Paths.get(t, "_delta_log", CatalogCommitOwner.CommitsDirName)

  private def df(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1)

  test("owner-routed commits publish a normal log plus a claim registry") {
    val t = newTable()
    DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      DeltaWriter.write(df(0, 10), t)
      DeltaWriter.write(df(10, 20), t)
      DeltaWriter.delete(spark, t, col("id") < 5)
    }
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 15)
    // plain log is gapless and byte-identical to the staged winners
    for (v <- 0L to 2L) {
      val json = Paths.get(t, "_delta_log", f"$v%020d.json")
      assert(Files.exists(json), s"missing backfilled v$v")
      val claim = commitsDir(t).resolve(f"$v%020d.claim")
      assert(Files.exists(claim), s"missing claim v$v")
      val uuid = new String(Files.readAllBytes(claim), StandardCharsets.UTF_8).trim
      val staged = commitsDir(t).resolve(f"$v%020d.$uuid.json")
      assert(Files.exists(staged), s"missing winning staged body v$v")
      assert(Files.readAllBytes(json).toSeq == Files.readAllBytes(staged).toSeq,
        s"backfill must publish the claimed body verbatim at v$v")
    }
    // and the DuckDB-replayable plain log carries no owner artifacts that
    // would confuse a foreign reader (the registry hides under _commits)
    val top = new java.io.File(t, "_delta_log").listFiles().map(_.getName)
    assert(top.filter(_.endsWith(".json")).forall(_.matches("\\d{20}\\.json")))
  }

  test("claim-then-die: the next owner commit completes the backfill; history is gapless") {
    val t = newTable()
    DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      DeltaWriter.write(df(0, 10), t) // v0
    }
    // simulate a winner dead between claim and backfill: stage a real v1
    // body + claim it, but never publish <v1>.json
    val lines = Seq(
      """{"commitInfo":{"operation":"WRITE","operationParameters":{"mode":"append"}}}""",
      // a re-add of v0's file is a harmless, valid action set for the drill
      new String(Files.readAllBytes(Paths.get(t, "_delta_log", f"${0L}%020d.json")),
        StandardCharsets.UTF_8).linesIterator.find(_.contains("\"add\"")).get)
    val uuid = "deadbeef1234"
    Files.write(commitsDir(t).resolve(f"${1L}%020d.$uuid.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Files.write(commitsDir(t).resolve(f"${1L}%020d.claim"),
      uuid.getBytes(StandardCharsets.UTF_8))
    assert(!Files.exists(Paths.get(t, "_delta_log", f"${1L}%020d.json")))
    // the ENGINE reader is coordinator-aware since r14 (ADVICE r13:
    // readers route too): a cold load completes the pending backfill and
    // sees the DECIDED commit — the invisible window exists only for
    // foreign plain-log readers, and only until any engine operation
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.snapshot(spark, t).version == 1L,
      "coordinator-aware reader must surface the claimed-but-unbackfilled commit")
    assert(Files.exists(Paths.get(t, "_delta_log", f"${1L}%020d.json")),
      "the read must have completed the backfill for plain-log readers")
    // the next owner-routed commit lands AFTER the recovered version
    DeltaSnapshotReader.invalidate(t)
    val v = DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      DeltaWriter.write(df(10, 15), t)
    }
    assert(v == 2L, s"writer must land AFTER the recovered commit, got v$v")
    assert(Files.exists(Paths.get(t, "_delta_log", f"${1L}%020d.json")),
      "recovery must backfill the dead winner's commit")
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.snapshot(spark, t).version == 2L)
  }

  test("claim-then-die: the catalog READ path also completes the backfill") {
    val t = newTable()
    DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      DeltaWriter.write(df(0, 10), t) // v0
    }
    val uuid = "cafecafe0000"
    val add = new String(Files.readAllBytes(
      Paths.get(t, "_delta_log", f"${0L}%020d.json")), StandardCharsets.UTF_8)
      .linesIterator.find(_.contains("\"add\"")).get
    Files.write(commitsDir(t).resolve(f"${1L}%020d.$uuid.json"),
      (add + "\n").getBytes(StandardCharsets.UTF_8))
    Files.write(commitsDir(t).resolve(f"${1L}%020d.claim"),
      uuid.getBytes(StandardCharsets.UTF_8))
    CatalogCommitOwner.recoverTable(t)
    assert(Files.exists(Paths.get(t, "_delta_log", f"${1L}%020d.json")),
      "coordinator-aware read must complete the pending backfill")
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.snapshot(spark, t).version == 1L)
  }

  test("retention interplay: cleanupLog ages the registry and crcs; recovery never resurrects cleaned commits") {
    val t = newTable()
    DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      (0 until 5).foreach(i => DeltaWriter.write(df(i * 10, i * 10 + 10), t))
      DeltaWriter.checkpoint(spark, t) // bootstrap floor at v4
      val deleted = DeltaWriter.cleanupLog(spark, t, retainMs = -60000L)
      // commits 0-3, their crcs, their claims AND staged bodies all age out
      assert(deleted.count(_.matches("""\d{20}\.json""")) == 4, deleted.mkString(","))
      assert(deleted.count(_.matches("""\d{20}\.crc""")) == 4, deleted.mkString(","))
      assert(deleted.count(_.contains(".claim")) == 4, deleted.mkString(","))
      // recovery on the truncated log must NOT resurrect v0-v3 (their
      // claims are gone here, but even a surviving stale claim is gated by
      // the newest-published-version rule) and must not throw
      CatalogCommitOwner.recoverTable(t)
      for (v <- 0L to 3L)
        assert(!Files.exists(Paths.get(t, "_delta_log", f"$v%020d.json")),
          s"cleaned v$v resurrected")
      // the owner keeps committing on the truncated log
      val v = DeltaWriter.write(df(100, 110), t)
      assert(v == 5L)
      DeltaSnapshotReader.invalidate(t)
      assert(DeltaSnapshotReader.load(spark, t).count() == 60)
    }
    // a stale claim WITHOUT its json (simulating cleanup that removed the
    // json but a lagging registry): recovery leaves it alone — below the
    // newest published version — instead of resurrecting or crashing
    Files.write(commitsDir(t).resolve(f"${2L}%020d.claim"),
      "feedfeedfeed".getBytes(StandardCharsets.UTF_8))
    CatalogCommitOwner.recoverTable(t)
    assert(!Files.exists(Paths.get(t, "_delta_log", f"${2L}%020d.json")))
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 60)
  }

  test("losers reclaim their staged bodies; a raced version keeps one claim") {
    val t = newTable()
    DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      DeltaWriter.write(df(0, 10), t) // v0
    }
    // claim v1 out from under a writer mid-protocol: the loser must raise
    // the typed conflict and leave no staged body behind
    val uuid = "aaaaaaaaaaaa"
    Files.write(commitsDir(t).resolve(f"${1L}%020d.claim"),
      uuid.getBytes(StandardCharsets.UTF_8))
    Files.write(commitsDir(t).resolve(f"${1L}%020d.$uuid.json"),
      "{}\n".getBytes(StandardCharsets.UTF_8))
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    intercept[DeltaWriter.CommitConflictException] {
      CatalogCommitOwner.commit(fs,
        new org.apache.hadoop.fs.Path(t, "_delta_log"), 1L,
        Iterator("""{"commitInfo":{"operation":"LOSER"}}"""))
    }
    val staged = Files.list(commitsDir(t)).toArray.map(_.toString)
      .filter(_.contains(f"${1L}%020d."))
    assert(staged.forall(s => s.endsWith(".claim") || s.contains(uuid)),
      s"loser left its staged body: ${staged.mkString(",")}")
  }

  test("ownership is TABLE STATE: a default-configured writer routes through the declared owner") {
    // ADVICE r13: ownership as a JVM property let a default writer bypass
    // the catalog claim. Declared in table configuration, EVERY conformant
    // writer routes — no withCommitOwner / sys-prop needed.
    val t = newTable()
    DeltaWriter.write(df(0, 10), t) // v0, plain logstore commit
    assert(!Files.isDirectory(commitsDir(t)), "undeclared table has no registry")
    DeltaWriter.setProperties(spark, t,
      Map("graft.commitOwner" -> "catalog")) // v1, still logstore (old config)
    DeltaSnapshotReader.invalidate(t)
    DeltaWriter.write(df(10, 20), t) // v2: MUST route via the catalog owner
    val claim = commitsDir(t).resolve(f"${2L}%020d.claim")
    assert(Files.exists(claim),
      "a writer with default JVM config must honor the table-declared owner")
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.load(spark, t).count() == 20)
    // and the declaration survives replay: the resolved snapshot carries it
    assert(DeltaSnapshotReader.snapshot(spark, t)
      .configuration.get("graft.commitOwner").contains("catalog"))
  }

  test("backfill screams on owner bypass: <v>.json exists with foreign content") {
    val t = newTable()
    DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      DeltaWriter.write(df(0, 10), t) // v0
    }
    // a catalog writer stages + claims v1, then (before its backfill) a
    // non-conformant writer publishes a DIFFERENT v1 straight to the log
    val uuid = "beefbeef0001"
    Files.write(commitsDir(t).resolve(f"${1L}%020d.$uuid.json"),
      """{"commitInfo":{"operation":"OWNED"}}""".concat("\n")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(commitsDir(t).resolve(f"${1L}%020d.claim"),
      uuid.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(t, "_delta_log", f"${1L}%020d.json"),
      """{"commitInfo":{"operation":"BYPASS"}}""".concat("\n")
        .getBytes(StandardCharsets.UTF_8))
    // any owner operation that would complete the backfill detects the
    // divergence loudly — never a silent skip that drops the owned body
    val ex = intercept[CatalogCommitOwner.OwnerBypassException] {
      CatalogCommitOwner.recoverTable(t)
    }
    assert(ex.getMessage.contains("bypassed"))
    // identical content (our own hard link, recovery re-entry) stays quiet
    Files.delete(Paths.get(t, "_delta_log", f"${1L}%020d.json"))
    Files.createLink(Paths.get(t, "_delta_log", f"${1L}%020d.json"),
      commitsDir(t).resolve(f"${1L}%020d.$uuid.json"))
    CatalogCommitOwner.recoverTable(t) // no throw
  }
}
