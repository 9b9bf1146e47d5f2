package graft.ops

import graft.{Det, Tables}
import graft.delta.{DeltaSnapshotReader, DeltaWriter, SplitPlanner}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.File

/** Delta-lake operator surface (reference A3-A7, A10): snapshot resolution,
  * partition enumeration/pruning/injection, split planning, time travel.
  *
  * The driver's oracle checks run DuckDB over the *source* `orders` parquet;
  * these keys therefore build a deterministic Delta table FROM `orders`
  * (partitioned by order year, three commits + a checkpoint) and assert that
  * reading it back through the from-scratch log reader reproduces exactly
  * what SQL over the source table says — end-to-end log-replay correctness.
  */
object DeltaOps {
  import Det._

  /** Build (once per sfDir per JVM) the demo Delta table:
    * v0 overwrite years ≤1997, v1 append 1998-1999, checkpoint, v2 append
    * ≥2000 — exercising add/remove replay, checkpoint + JSON tail, and
    * hive-partitioned data files. */
  /** Deterministic demo-table location for `sfDir` (shared by
    * [[ensureDemoTable]] and the snapshot-files oracle renderer). */
  private def demoDirFor(sfDir: String): File = new File(
    sys.props("java.io.tmpdir"),
    // demo7: the crc format gained the file-size histogram (r15) — a
    // demo6 fixture cached from the pre-histogram code carries crcs the
    // extended delta_crc_state oracle would read as NULL hist columns
    "graft_delta_demo7_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))

  /** The sfDir of the LAST ensureDemoTable call: the `delta_snapshot_files`
    * oracle must read the ACTUAL `_delta_log` of the demo table, and Verify
    * dumps `oracleSql` only AFTER running every query — by which point this
    * records the run's real fixture path. Seeded with the test SF so the
    * key is present (contract: every key carries exactly one oracle) even
    * before any query has run in the JVM. */
  @volatile private var lastDemoSfDir: String = "/root/testdata/sf0.001"

  def ensureDemoTable(spark: SparkSession, sfDir: String): String = synchronized {
    // v3 suffix: the demo log gained commitInfo actions this round — a
    // stale marker-cached table from an earlier round would fail the
    // history oracle
    lastDemoSfDir = sfDir
    val dir = demoDirFor(sfDir)
    val marker = new File(dir, "_DEMO_READY")
    // signature against the SOURCE fixture ([[graft.StageMarker]]): a
    // driver-regenerated orders.parquet must rebuild the demo table, or
    // every delta_* oracle silently compares against stale data
    val sig = graft.StageMarker.sig(new File(s"$sfDir/orders.parquet"))
    if (!graft.StageMarker.fresh(marker, sig)) {
      if (dir.exists()) {
        def rm(f: File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
      graft.delta.DeltaSnapshotReader.invalidate(dir.toString)
      val orders = Tables.orders(spark, sfDir)
        .withColumn("o_year", year(col("o_orderdate")))
      DeltaWriter.write(orders.filter(col("o_year") <= 1997), dir.toString, Seq("o_year"), "overwrite")
      DeltaWriter.write(orders.filter(col("o_year").between(1998, 1999)), dir.toString, Seq("o_year"))
      DeltaWriter.checkpoint(spark, dir.toString)
      DeltaWriter.write(orders.filter(col("o_year") >= 2000), dir.toString, Seq("o_year"))
      graft.StageMarker.write(marker, sig)
    }
    dir.toString
  }

  /** GENERATE symlink_format_manifest, then query THROUGH it: the manifest
    * files (one per partition dir, absolute data-file URIs) are the scan
    * plan a manifest-based engine (Athena/Presto/Hive — the reference's
    * consumer world) uses. Rows are read from EXACTLY the listed files and
    * the partition value comes ONLY from the manifest's directory name —
    * a missed or stale file breaks the hash against SQL over source
    * `orders`. The file-list collect is metadata-plane (what any manifest
    * consumer does), bounded by file count, never rows. */
  def deltaManifest(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    DeltaWriter.generateManifest(s, t)
    graft.functions.PathNorm.register(s)
    val entries = s.read.text(s"$t/_symlink_format_manifest/*/manifest")
      .select(call_function("norm_uri_path", col("value")).as("__f"),
        regexp_extract(input_file_name(), "o_year=([0-9]+)", 1).cast("int").as("o_year"))
    val paths = entries.select(col("__f")).distinct().collect().map(_.getString(0))
    val data = s.read.parquet(paths.toSeq: _*)
      .withColumn("__f", call_function("norm_uri_path", input_file_name()))
    data.join(broadcast(entries), Seq("__f"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_year"))
  }

  /** Collated column THROUGH Delta metadata (`collations-preview`): the
    * table is created with a UTF8_LCASE segment column holding MIXED-case
    * values (odd custkeys lowercased); grouping the LOADED column must
    * merge the case variants via the collation replayed from the log's
    * `__COLLATIONS` field metadata — a binary-collated read would return
    * twice the groups and fail the row-count compare, so the oracle
    * checks the collation semantics end-to-end, not just the metadata. */
  def deltaCollated(s: SparkSession, dir: String): DataFrame = {
    val t = new File(sys.props("java.io.tmpdir"),
      "graft_delta_collated_" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val marker = new File(t, "_READY")
    val sig = graft.StageMarker.sig(new File(s"$dir/customer.parquet"))
    if (!graft.StageMarker.fresh(marker, sig)) {
      graft.delta.DeltaSnapshotReader.invalidate(t.toString)
      DeltaWriter.write(
        Tables.customer(s, dir).select(col("c_custkey"),
          expr("collate(CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment " +
            "ELSE lower(c_mktsegment) END, 'UTF8_LCASE')").as("seg"),
          col("c_acctbal")),
        t.toString, Nil, "overwrite")
      graft.StageMarker.write(marker, sig)
    }
    DeltaSnapshotReader.load(s, t.toString)
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .select(lower(col("seg")).as("seg"), col("n_cust"), col("sum_bal"))
      .orderBy(col("seg"))
  }

  /** VARIANT column THROUGH Delta (`variantType` reader+writer feature,
    * protocol gated by DeltaWriter, semantics locked in VariantTypeSpec):
    * semi-structured order records are parsed into the binary variant
    * encoding at write time, round-trip the Delta parquet, and are
    * re-extracted with typed `variant_get` paths at read — the aggregate
    * over the EXTRACTED fields must equal SQL over the flat source, so a
    * corrupted encoding or a wrong path extraction breaks the hash. */
  def deltaVariant(s: SparkSession, dir: String): DataFrame = {
    val t = new File(sys.props("java.io.tmpdir"),
      "graft_delta_variant_" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val marker = new File(t, "_READY")
    val sig = graft.StageMarker.sig(new File(s"$dir/orders.parquet"))
    if (!graft.StageMarker.fresh(marker, sig)) {
      graft.delta.DeltaSnapshotReader.invalidate(t.toString)
      DeltaWriter.write(
        Tables.orders(s, dir).select(col("o_orderkey"),
          expr("parse_json(to_json(struct(o_orderkey AS k, " +
            "o_orderstatus AS st, o_totalprice AS tp)))").as("v")),
        t.toString, Nil, "overwrite")
      graft.StageMarker.write(marker, sig)
    }
    DeltaSnapshotReader.load(s, t.toString)
      .select(expr("variant_get(v, '$.st', 'string')").as("st"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("variant_get(v, '$.tp', 'double')").as("tp"))
      .groupBy(col("st"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        dsum(col("tp")).as("sum_tp"))
      .orderBy(col("st"))
  }

  /** Full scan through the log reader; must equal SQL over source orders. */
  def deltaScanFull(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    DeltaSnapshotReader.load(s, t)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_year"))
      .orderBy(col("o_orderkey"))
  }

  /** Partition enumeration straight from the log — no data file opened
    * (reference A5, DeltaMetadataHandler.scala:109-139). */
  def partitionEnum(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    val snap = DeltaSnapshotReader.snapshot(s, t)
    DeltaSnapshotReader.partitionValuesDf(s, snap)
      .select(col("o_year")).distinct().orderBy(col("o_year"))
  }

  /** Catalyst-evaluated partition pruning before any scan (reference A6). */
  def partitionPrune(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    DeltaSnapshotReader.loadWhere(s, t, col("o_year").between(1996, 1998))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_year"))
  }

  /** Partition-value injection: partition column served from the log, not
    * the data files (reference A10). */
  def partitionInject(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    DeltaSnapshotReader.load(s, t)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_year"))
  }

  /** Time travel to v0 (before the two appends). */
  def deltaTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    DeltaSnapshotReader.load(s, t, versionAsOf = Some(0L))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_year"))
  }

  /** The SAME v0 time travel, but as SQL `VERSION AS OF` through the V2
    * [[graft.catalog.GraftCatalog]] — Spark resolves the clause via the
    * catalog's `loadTable(ident, version)` overload, landing on the
    * engine's [[graft.delta.GraftDeltaTable]] scan. Must hash-match the
    * `delta_time_travel` oracle (one semantics, two resolution paths). */
  def catalogTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val t = new java.io.File(ensureDemoTable(s, dir))
    s.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.root", t.getParent)
    s.sql(
      s"""SELECT o_year, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM graft_cat.default.`${t.getName}` VERSION AS OF 0
         |GROUP BY o_year ORDER BY o_year""".stripMargin)
  }

  /** Active file set of the snapshot (reference A4) — served straight from
    * the DISTRIBUTED file-set DataFrame (the driver never materializes the
    * list; at 10M files this is a distributed projection, not a collect).
    * Hash-checked since r12: the oracle replays the `_delta_log` JSON in
    * DuckDB (`read_json` add/remove reconciliation, last-action-wins with
    * same-version re-add beating the remove) — two independent log-replay
    * implementations over the same commit files must agree file-for-file. */
  def deltaSnapshotFiles(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    val snap = DeltaSnapshotReader.snapshot(s, t)
    snap.fileSet.df
      .select(col("path"), element_at(col("partitionValues"), "o_year").as("o_year"),
        col("size"))
      .orderBy(col("path"))
  }

  /** Split planning over the active file set (reference A7). Rows-only. */
  def splitPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = ensureDemoTable(s, dir)
    val snap = DeltaSnapshotReader.snapshot(s, t)
    // small maxSplitBytes to force multi-file packing at test scale
    SplitPlanner.plan(snap.files, maxSplitBytes = 256 * 1024, openCost = 16 * 1024)
      .map(sp => (sp.id, sp.files.size, sp.bytes))
      .toDF("split_id", "n_files", "bytes").orderBy(col("split_id"))
  }

  /** Per-version state checksums, cross-checked (r13, digest r14): Spark
    * RECOMPUTES each version's (numFiles, tableSizeBytes, setDigest) by
    * replaying the log — the digest is the order-independent XOR of
    * xxhash64(path, size) over the replayed add-set — while the DuckDB
    * oracle independently PARSES the `<version>.crc` artifacts every
    * commit emitted ([[graft.delta.Checksum]]). A hash match proves a
    * foreign reader consuming the checksum files sees exactly the state an
    * independent replay derives, for every version in the history,
    * including the file-IDENTITY digest that catches corruptions the two
    * scalar aggregates offset away (VERDICT r13 #2). Driver-side loop is
    * bounded by the version count (metadata-plane). */
  def deltaCrcState(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = ensureDemoTable(s, dir)
    val latest = DeltaSnapshotReader.latestVersion(s, t)
    // echo PRESENCE comes from the artifact (the incremental writer may
    // legitimately omit the field — e.g. a table that shrank back under
    // the threshold on a digest-less chain); the echo VALUES are replay-
    // derived, so when an echo exists its length, entry-size sum and path
    // range must match the independently replayed add-set. collected() is
    // bounded by the threshold guard (never the crc's own claim).
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def crcNode(v: Long): Option[com.fasterxml.jackson.databind.JsonNode] = try {
      val p = new File(t, f"_delta_log/$v%020d.crc")
      if (!p.exists()) None else Option(om.readTree(p))
    } catch { case _: Exception => None }
    (0L to latest).map { v =>
      val node = crcNode(v)
      def crcHas(field: String): Boolean = node.exists(_.has(field))
      val snap = DeltaSnapshotReader.snapshotAt(s, t, Some(v))
      val (nf, bytes, digest) = snap.fileSet.countBytesDigest
      val (en, eb, emin, emax) =
        if (crcHas("allFiles") && nf <= graft.delta.Checksum.AllFilesEchoThreshold) {
          val files = snap.fileSet.collected
          (Some(nf),
            if (files.isEmpty) None else Some(files.map(_.size).sum),
            files.map(_.path).minOption, files.map(_.path).maxOption)
        } else (None, None, None, None)
      // histogram columns (r15): PRESENCE from the artifact (incremental
      // chains may legitimately drop the field), VALUES replay-derived —
      // bucket sums must re-agree with the scalar aggregates, and the
      // occupied/top-bucket shape pins the per-bucket layout the oracle
      // reads straight from the artifact's own arrays. The replay buckets
      // against the artifact's DECLARED boundaries (ADVICE r15): a foreign
      // crc with non-default bins is tolerated by validation, so assuming
      // the default bins here would make engine and oracle disagree on it.
      val (hn, hbytes, hnzb, htop) =
        if (!crcHas("histogramOpt")) (None, None, None, None)
        else {
          val bounds = node
            .flatMap(graft.delta.Checksum.declaredHistogramBoundaries)
            .getOrElse(graft.delta.Checksum.DefaultHistogramBoundaries)
          val (hc, hb) = snap.fileSet.sizeHistogram(bounds)
          (Some(hc.sum), Some(hb.sum), Some(hc.count(_ > 0).toLong),
            Some(hc.indexOf(hc.max).toLong))
        }
      (v, nf, bytes, digest, en, eb, emin, emax, hn, hbytes, hnzb, htop)
    }.toDF("version", "num_files", "size_bytes", "set_digest",
        "echo_n", "echo_bytes", "echo_min_path", "echo_max_path",
        "hist_n", "hist_bytes", "hist_nzb", "hist_top")
      .orderBy(col("version"))
  }

  /** UniForm-lite round-trip ([[graft.delta.IcebergUniform]], VERDICT r14
    * #8): export the demo table's ICEBERG metadata (spec-v2 metadata.json
    * + avro manifest list + manifest), then read the file set back through
    * that chain EXACTLY as a HadoopTables Iceberg reader resolves it and
    * aggregate per partition value. The DuckDB oracle replays the Delta
    * log independently ([[snapshotFilesOracle]]'s CTE + per-file
    * numRecords from the stats JSON) — so the Iceberg artifacts' CONTENT
    * (paths→partition mapping, sizes, record counts) is hash-checked
    * against a foreign derivation of the same table state. */
  def deltaUniform(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = ensureDemoTable(s, dir)
    graft.delta.IcebergUniform.export(s, t)
    graft.delta.IcebergUniform.readManifestEntries(s, t)
      .map(u => (u.partitionValues("o_year").toInt, u.size, u.records))
      .toDF("o_year", "size", "records")
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_files"), sum(col("size")).as("total_bytes"),
        sum(col("records")).as("total_records"))
      .orderBy(col("o_year"))
  }

  /** UniForm over a DV-CARRYING table (r17 stretch): the export emits
    * Iceberg v2 POSITION DELETES instead of refusing — per DV'd partition
    * group one sorted (file_path, pos) parquet delete file, a content=1
    * delete manifest, and summary totals — so an Iceberg v2 reader
    * subtracts exactly the rows the Delta DV masks, with NO purge rewrite
    * of the data. The key reports, per partition: data files, FULL record
    * counts (Iceberg keeps the file's physical count; deletes subtract at
    * read), delete files, and masked positions. The DuckDB oracle replays
    * the Delta log independently — last add per path wins, carrying its
    * `deletionVector.cardinality` — so the exported delete chain is
    * hash-checked against a foreign derivation of the same log. */
  def deltaUniformDv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = ensureUniformDvTable(s, dir)
    val data = graft.delta.IcebergUniform.readManifestEntries(s, t)
      .map(u => (u.partitionValues("o_year").toInt, u.records))
      .toDF("o_year", "records")
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_files"), sum(col("records")).as("total_records"))
    val dels = graft.delta.IcebergUniform.readDeleteEntries(s, t)
      .map(u => (u.partitionValues("o_year").toInt, u.records))
      .toDF("o_year", "del_records")
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_delete_files"),
        sum(col("del_records")).as("n_pos_deletes"))
    data.join(dels, Seq("o_year"), "left")
      .na.fill(0L, Seq("n_delete_files", "n_pos_deletes"))
      .select(col("o_year"), col("n_files"), col("total_records"),
        col("n_delete_files"), col("n_pos_deletes"))
      .orderBy(col("o_year"))
  }

  @volatile private var lastUniformDvSfDir: String = "/root/testdata/sf0.001"

  private def uniformDvDirFor(sfDir: String): File =
    new File(sys.props("java.io.tmpdir"),
      "graft_uniform_dv1_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))

  /** Marker-cached fixture: orders quarter partitioned by o_year, DVs
    * enabled, one DV DELETE (low-price F rows), explicit export. Immutable
    * after build — the export is part of the recipe. */
  private def ensureUniformDvTable(s: SparkSession, sfDir: String): String =
    synchronized {
      lastUniformDvSfDir = sfDir
      val dir = uniformDvDirFor(sfDir)
      val marker = new File(dir, "_READY")
      val sig = graft.StageMarker.sig(new File(s"$sfDir/orders.parquet"))
      if (!graft.StageMarker.fresh(marker, sig)) {
        if (dir.exists()) {
          def rm(f: File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(dir)
        }
        graft.delta.DeltaSnapshotReader.invalidate(dir.toString)
        val orders = Tables.orders(s, sfDir)
          .filter(col("o_orderkey") % 4 === 2)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            year(col("o_orderdate")).as("o_year"))
        DeltaWriter.write(orders, dir.toString, Seq("o_year"), "overwrite")
        DeltaWriter.setProperties(s, dir.toString,
          Map("delta.enableDeletionVectors" -> "true"))
        DeltaWriter.deleteWithDV(s, dir.toString,
          col("o_orderstatus") === "F" && col("o_totalprice") < 100000)
        graft.delta.IcebergUniform.export(s, dir.toString)
        graft.StageMarker.write(marker, sig)
      }
      dir.toString
    }

  /** UniForm over a NESTED, partitioned table (VERDICT r15 #8) with
    * AUTO-export (VERDICT r15 #3) proven end-to-end: the fixture table —
    * per-order `array<struct<ln,qty,price>>` + `map<flag,count>` columns,
    * partitioned by `pmod` — sets `delta.universalFormat.enabledFormats=
    * iceberg` and then APPENDS; no explicit export is ever called, so the
    * Iceberg chain this key reads exists only because the commit funnel
    * re-exported. The DuckDB oracle replays the Delta log independently,
    * so the chain's content (paths→partition mapping, sizes, record
    * counts) is hash-checked against a foreign derivation. */
  def deltaUniformNested(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = ensureNestedUniformTable(s, dir)
    graft.delta.IcebergUniform.readManifestEntries(s, t)
      .map(u => (u.partitionValues("pmod").toInt, u.size, u.records))
      .toDF("pmod", "size", "records")
      .groupBy(col("pmod"))
      .agg(count(lit(1)).as("n_files"), sum(col("size")).as("total_bytes"),
        sum(col("records")).as("total_records"))
      .orderBy(col("pmod"))
  }

  @volatile private var lastNestedUniformDir: String = "/root/testdata/sf0.001"

  private def nestedUniformDirFor(sfDir: String): File =
    new File(sys.props("java.io.tmpdir"),
      "graft_uniform_nested_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))

  private def ensureNestedUniformTable(s: SparkSession, sfDir: String): String =
    synchronized {
      lastNestedUniformDir = sfDir
      val dir = nestedUniformDirFor(sfDir)
      val marker = new File(dir, "_READY")
      val sig = graft.StageMarker.sig(new File(s"$sfDir/lineitem.parquet"))
      if (!graft.StageMarker.fresh(marker, sig)) {
        if (dir.exists()) {
          def rm(f: File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(dir)
        }
        graft.delta.DeltaSnapshotReader.invalidate(dir.toString)
        val li = Tables.lineitem(s, sfDir).filter(col("l_orderkey") % 7 === 0)
        val items = li.groupBy(col("l_orderkey")).agg(
          sort_array(collect_list(struct(
            col("l_linenumber").as("ln"),
            col("l_quantity").as("qty"),
            col("l_extendedprice").as("price")))).as("items"))
        val flags = li.groupBy(col("l_orderkey"), col("l_returnflag")).count()
          .groupBy(col("l_orderkey"))
          .agg(map_from_entries(sort_array(collect_list(
            struct(col("l_returnflag"), col("count"))))).as("lines_by_flag"))
        val nested = items.join(flags, "l_orderkey")
          .withColumn("pmod", (col("l_orderkey") % 4).cast("int"))
        DeltaWriter.write(nested.filter(col("pmod") < 3), dir.toString,
          Seq("pmod"), "overwrite")
        DeltaWriter.setProperties(s, dir.toString,
          Map("delta.universalFormat.enabledFormats" -> "iceberg"))
        // this append is the LAST data commit — the Iceberg metadata the
        // query reads must come from the funnel's auto-export of it
        DeltaWriter.write(nested.filter(col("pmod") === 3), dir.toString,
          Seq("pmod"))
        graft.StageMarker.write(marker, sig)
      }
      dir.toString
    }

  private def uniformOracle(t: String, partCol: String = "o_year"): String =
    s"""WITH log AS (
       |  SELECT CAST(regexp_extract(filename, '(\\d+)\\.json', 1) AS BIGINT) AS v,
       |    ("add").path AS add_path, ("add")."partitionValues" AS pv,
       |    ("add").size AS sz, ("add").stats AS st, ("remove").path AS rm_path
       |  FROM read_json('$t/_delta_log/*.json', filename = true,
       |    columns = {'add': 'STRUCT(path VARCHAR, "partitionValues" JSON, size BIGINT, stats VARCHAR)',
       |               'remove': 'STRUCT(path VARCHAR)'})),
       |adds AS (SELECT add_path AS path, max(v) AS av FROM log
       |         WHERE add_path IS NOT NULL GROUP BY 1),
       |rms AS (SELECT rm_path AS path, max(v) AS rv FROM log
       |        WHERE rm_path IS NOT NULL GROUP BY 1),
       |last_add AS (
       |  SELECT l.add_path AS path, l.pv, l.sz, l.st, l.v
       |  FROM log l JOIN adds a ON l.add_path = a.path AND l.v = a.av),
       |active AS (
       |  SELECT la.path, la.pv, la.sz, la.st FROM last_add la
       |  LEFT JOIN rms r ON la.path = r.path
       |  WHERE r.path IS NULL OR r.rv <= la.v)
       |SELECT CAST(pv->>'$partCol' AS INTEGER) AS $partCol, COUNT(*) AS n_files,
       |  CAST(SUM(sz) AS BIGINT) AS total_bytes,
       |  CAST(SUM(CAST(json_extract_string(st, '$$.numRecords') AS BIGINT)) AS BIGINT) AS total_records
       |FROM active GROUP BY 1 ORDER BY $partCol""".stripMargin

  /** Independent DuckDB replay for [[deltaUniformDv]]: last add per path
    * wins CARRYING ITS deletionVector (the DV commit re-adds the path with
    * the descriptor — exactly the state the export translated), removes
    * cancel, and the per-partition rollup restates data files / physical
    * records / delete files (1 per DV'd group) / masked positions. */
  private def uniformDvOracle(t: String): String =
    s"""WITH log AS (
       |  SELECT CAST(regexp_extract(filename, '(\\d+)\\.json', 1) AS BIGINT) AS v,
       |    ("add").path AS add_path, ("add")."partitionValues" AS pv,
       |    ("add").stats AS st, ("add")."deletionVector".cardinality AS dvc,
       |    ("remove").path AS rm_path
       |  FROM read_json('$t/_delta_log/*.json', filename = true,
       |    columns = {'add': 'STRUCT(path VARCHAR, "partitionValues" JSON, stats VARCHAR, "deletionVector" STRUCT(cardinality BIGINT))',
       |               'remove': 'STRUCT(path VARCHAR)'})),
       |adds AS (SELECT add_path AS path, max(v) AS av FROM log
       |         WHERE add_path IS NOT NULL GROUP BY 1),
       |rms AS (SELECT rm_path AS path, max(v) AS rv FROM log
       |        WHERE rm_path IS NOT NULL GROUP BY 1),
       |last_add AS (
       |  SELECT l.add_path AS path, l.pv, l.st, l.dvc, l.v
       |  FROM log l JOIN adds a ON l.add_path = a.path AND l.v = a.av),
       |active AS (
       |  SELECT la.path, la.pv, la.st, COALESCE(la.dvc, 0) AS dvc FROM last_add la
       |  LEFT JOIN rms r ON la.path = r.path
       |  WHERE r.path IS NULL OR r.rv <= la.v)
       |SELECT CAST(pv->>'o_year' AS INTEGER) AS o_year,
       |  COUNT(*) AS n_files,
       |  CAST(SUM(CAST(json_extract_string(st, '$$.numRecords') AS BIGINT)) AS BIGINT) AS total_records,
       |  CAST(CASE WHEN SUM(dvc) > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_delete_files,
       |  CAST(SUM(dvc) AS BIGINT) AS n_pos_deletes
       |FROM active GROUP BY 1 ORDER BY o_year""".stripMargin

  /** Data filter on a non-partition column through the native reader —
    * exercises the stats-based file-skipping path (DataSkipping) with an
    * oracle-checked result. */
  def deltaDataSkip(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    DeltaSnapshotReader.load(s, t)
      .filter(col("o_totalprice") > 400000)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_big"), dsum(col("o_totalprice")).as("sum_big"))
      .orderBy(col("o_orderstatus"))
  }

  /** METADATA-ONLY aggregation: COUNT / MIN / MAX answered from the log's
    * per-file footer stats (numRecords/minValues/maxValues) without opening
    * a single data file — at 100 TB the difference between a sub-second
    * planner-side answer and a full scan. Runs distributed over the
    * file-set DataFrame (one row per file, never a driver-collected list).
    * Falls back to the real scan when the stats cannot answer exactly:
    * any file missing stats (undercount would be silent) or carrying a
    * deletion vector (its numRecords still counts DV-deleted rows). */
  def deltaStatsAgg(s: SparkSession, dir: String): DataFrame =
    statsOnlyAgg(s, ensureDemoTable(s, dir), "o_orderkey")

  /** The reusable stats-only plan behind [[deltaStatsAgg]] (public for the
    * spec, which proves the no-data-read property by deleting every parquet
    * file and asking again). */
  def statsOnlyAgg(s: SparkSession, tablePath: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    val snap = DeltaSnapshotReader.snapshot(s, tablePath)
    val statsSchema = StructType(Seq(
      StructField("numRecords", LongType),
      StructField("minValues", StructType(Seq(StructField(keyCol, LongType)))),
      StructField("maxValues", StructType(Seq(StructField(keyCol, LongType))))))
    val parsed = snap.fileSet.df
      .select(from_json(col("stats"), statsSchema).as("st"))
    // ONE distributed pass answers both "can the stats answer exactly?"
    // (any file missing numRecords/min/max would silently undercount) and
    // the aggregate itself; a DV file's numRecords still counts DV-deleted
    // rows, so their presence forces the scan fallback before any job runs
    val row =
      if (snap.fileSet.hasDeletionVectors) None
      else Some(parsed.agg(
        sum(when(col("st.numRecords").isNull
          || col(s"st.minValues.$keyCol").isNull
          || col(s"st.maxValues.$keyCol").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(col("st.numRecords")).as("n_rows"),
        min(col(s"st.minValues.$keyCol")).as("min_key"),
        max(col(s"st.maxValues.$keyCol")).as("max_key")).collect().head)
    row match {
      case Some(r) if !r.isNullAt(0) && r.getLong(0) == 0 =>
        s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(r.get(1), r.get(2), r.get(3))),
          StructType(Seq(StructField("n_rows", LongType),
            StructField("min_key", LongType), StructField("max_key", LongType))))
      case _ =>
        DeltaSnapshotReader.load(s, tablePath).agg(
          count(lit(1)).as("n_rows"),
          min(col(keyCol)).as("min_key"),
          max(col(keyCol)).as("max_key"))
    }
  }

  /** Metadata-only GROUP BY: per-partition row counts from
    * `add.partitionValues` × footer `numRecords` — the `SHOW PARTITIONS` /
    * partition-profile query a 100 TB table answers from its log in
    * milliseconds. Same exactness guard as [[statsOnlyAgg]]. */
  def deltaStatsByPartition(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val t = ensureDemoTable(s, dir)
    val snap = DeltaSnapshotReader.snapshot(s, t)
    val nSchema = StructType(Seq(StructField("numRecords", LongType)))
    val perFile = snap.fileSet.df.select(
      element_at(col("partitionValues"), "o_year").cast("int").as("o_year"),
      from_json(col("stats"), nSchema).getField("numRecords").as("nr"))
    // ONE grouped pass: per-partition row counts plus a per-group missing-
    // stats tally. The collect is bounded by partition cardinality (the
    // SHOW PARTITIONS result itself), never by file count.
    val grouped =
      if (snap.fileSet.hasDeletionVectors) None
      else Some(perFile.groupBy(col("o_year")).agg(
        sum(when(col("nr").isNull, 1L).otherwise(0L)).as("n_miss"),
        sum(col("nr")).as("n_rows")).collect())
    grouped match {
      case Some(gs) if gs.forall(r => !r.isNullAt(0) && r.getLong(1) == 0) =>
        val rows = gs.sortBy(_.getInt(0)).map(r =>
          org.apache.spark.sql.Row(r.getInt(0), r.getLong(2)))
        s.createDataFrame(java.util.Arrays.asList(rows: _*),
          StructType(Seq(StructField("o_year", IntegerType),
            StructField("n_rows", LongType))))
      case _ =>
        DeltaSnapshotReader.load(s, t).groupBy(col("o_year"))
          .agg(count(lit(1)).as("n_rows")).orderBy(col("o_year"))
    }
  }

  /** The same pruned-and-projected scan through the DataSource V2 provider
    * (`graftdelta2`, [[graft.delta.GraftDeltaV2Provider]]): partition
    * filter consumed by the scan, projection narrowing the parquet read
    * schema, aggregation downstream — the connector-API expression of
    * reference A6+A9+A10, oracle-checked against source orders. */
  def deltaScanDsv2(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    s.read.format("graftdelta2").load(t)
      .filter(col("o_year").between(1996, 1998))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_year"))
  }

  /** Build (once per sfDir per JVM) the TYPE-BREADTH Delta table: decimal /
    * short / byte / date / timestamp-µs columns written through DeltaWriter
    * across two commits — exercising the writer's parquet encoding + footer
    * stats and the log reader's schema round-trip for every exotic scalar
    * type the reference maps explicitly (reference:
    * DeltaMetadataHandler.scala:57-72, DeltaRecordHandler.scala:42-107). */
  def ensureTypesTable(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = new File(
      sys.props("java.io.tmpdir"),
      "graft_delta_types_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
    val marker = new File(dir, "_DEMO_READY")
    // staleness defence ([[graft.StageMarker]]): regenerated source orders
    // must rebuild this derived table, or its oracle compares stale data
    val sig = graft.StageMarker.sig(new File(s"$sfDir/orders.parquet"))
    if (!graft.StageMarker.fresh(marker, sig)) {
      graft.delta.DeltaSnapshotReader.invalidate(dir.toString)
      if (dir.exists()) {
        def rm(f: File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
      val src = Tables.orders(spark, sfDir)
        .select(
          col("o_orderkey").as("k"),
          col("o_totalprice").cast("decimal(12,2)").as("dv"),
          (col("o_orderkey") % 1000).cast("short").as("sv"),
          (col("o_orderkey") % 100).cast("byte").as("bv"),
          col("o_orderdate").cast("date").as("dt"),
          timestamp_micros(col("o_orderkey") * 1000000L + 123456L).as("ts"))
      DeltaWriter.write(src.filter(col("k") % 2 === 0), dir.toString, Nil, "overwrite")
      DeltaWriter.write(src.filter(col("k") % 2 === 1), dir.toString)
      graft.StageMarker.write(marker, sig)
    }
    dir.toString
  }

  /** Decimal/short/byte/date/timestamp-µs round-trip through
    * DeltaWriter → log → reader, oracle-checked per the determinism
    * cookbook (timestamps surfaced as epoch-µs BIGINT, decimal sums cast
    * to double at scale ≤ 4). */
  def deltaTypesRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val t = ensureTypesTable(s, dir)
    DeltaSnapshotReader.load(s, t)
      .groupBy((col("bv").cast("int") % 10).as("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("dv")).cast("double").as("sum_dv"),
        min(col("sv")).cast("int").as("min_sv"),
        max(col("sv")).cast("int").as("max_sv"),
        min(col("bv")).cast("int").as("min_bv"),
        max(col("bv")).cast("int").as("max_bv"),
        min(col("dt")).as("min_dt"),
        max(col("dt")).as("max_dt"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .orderBy(col("grp"))
  }

  /** Full SQL text through `spark.sql` over the native Delta scan + a
    * parquet dim — the interface an Athena user actually has. The Delta
    * table and source tables register as views; the analyzer resolves,
    * Catalyst prunes partitions (o_year is a partition predicate against
    * [[graft.delta.DeltaFileIndex]]), and the join broadcasts the dim. */
  def sqlOverDelta(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    DeltaSnapshotReader.load(s, t).createOrReplaceTempView("delta_orders")
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    s.sql(
      s"""SELECT o.o_year, c.c_mktsegment, COUNT(*) AS n,
         |  ${sqlDsum("o.o_totalprice")} AS sum_price
         |FROM delta_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
         |WHERE o.o_year BETWEEN 1995 AND 1997
         |GROUP BY o.o_year, c.c_mktsegment
         |ORDER BY o.o_year, c.c_mktsegment""".stripMargin)
  }

  /** Build (once per sfDir per JVM) a table guarded by a CHECK constraint
    * (`delta.constraints.*`, writerVersion 3): create → ADD CONSTRAINT
    * (validates existing rows, bumps protocol) → valid append → violating
    * append REJECTED (asserted here — reaching the query at all proves
    * enforcement). */
  def ensureConstraintTable(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = new File(
      sys.props("java.io.tmpdir"),
      "graft_delta_ck_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
    val marker = new File(dir, "_DEMO_READY")
    // staleness defence ([[graft.StageMarker]]): regenerated source orders
    // must rebuild this derived table, or its oracle compares stale data
    val sig = graft.StageMarker.sig(new File(s"$sfDir/orders.parquet"))
    if (!graft.StageMarker.fresh(marker, sig)) {
      graft.delta.DeltaSnapshotReader.invalidate(dir.toString)
      if (dir.exists()) {
        def rm(f: File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
      val src = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      DeltaWriter.write(src.filter(col("o_orderkey") % 4 === 1), dir.toString, Nil, "overwrite")
      DeltaWriter.setProperties(spark, dir.toString,
        Map("delta.constraints.price_pos" -> "o_totalprice > 0"))
      DeltaWriter.write(src.filter(col("o_orderkey") % 4 === 3), dir.toString)
      val rejected =
        try {
          DeltaWriter.write(src.limit(1).withColumn("o_totalprice", lit(-1.0)), dir.toString)
          false
        } catch { case _: DeltaWriter.ConstraintViolationException => true }
      require(rejected, "CHECK constraint failed to reject a violating append")
      graft.StageMarker.write(marker, sig)
    }
    dir.toString
  }

  /** Build (once per sfDir per JVM) a Delta table with a GENERATED
    * partition column (`o_year` = `year(o_orderdate)`, declared via
    * `delta.generationExpression` — writer protocol 4): v0 creates it with
    * the column computed+declared; v1 appends a batch that OMITS the
    * column entirely, so the writer must populate it from the declared
    * expression. */
  def ensureGeneratedTable(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = new File(
      sys.props("java.io.tmpdir"),
      "graft_delta_gen1_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
    val marker = new File(dir, "_DEMO_READY")
    // staleness defence ([[graft.StageMarker]]): regenerated source orders
    // must rebuild this derived table, or its oracle compares stale data
    val sig = graft.StageMarker.sig(new File(s"$sfDir/orders.parquet"))
    if (!graft.StageMarker.fresh(marker, sig)) {
      graft.delta.DeltaSnapshotReader.invalidate(dir.toString)
      if (dir.exists()) {
        def rm(f: File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
      val orders = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      DeltaWriter.write(
        graft.delta.GeneratedColumns.withGenerated(
          orders.filter(year(col("o_orderdate")) <= 1997), "o_year", "year(o_orderdate)"),
        dir.toString, Seq("o_year"), "overwrite")
      DeltaWriter.write(orders.filter(year(col("o_orderdate")) >= 1998),
        dir.toString, Seq("o_year"))
      graft.StageMarker.write(marker, sig)
    }
    dir.toString
  }

  /** Generated-column table read back: grouping on the populated column
    * must equal SQL computing the expression from the source directly. */
  def deltaGenerated(s: SparkSession, dir: String): DataFrame = {
    val t = ensureGeneratedTable(s, dir)
    DeltaSnapshotReader.load(s, t)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_year"))
  }

  /** Read back the constraint-guarded table; contents must equal exactly
    * the two valid commits (the rejected batch must have left no trace). */
  def deltaConstraints(s: SparkSession, dir: String): DataFrame = {
    val t = ensureConstraintTable(s, dir)
    DeltaSnapshotReader.load(s, t)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Build (once per sfDir per JVM) a ROW-TRACKED table exercising the
    * whole id-stability pipeline: v0 creates one sorted file, v1 enables
    * row tracking (backfills `baseRowId` 0..n-1 in file order), v2 appends
    * a second sorted file (fresh range above the high-water mark), v3
    * DV-deletes a slice (a DV marks rows without rewriting the file), v4
    * UPDATEs a slice (copy-on-write rewrite — ids materialize into the new
    * files, modified rows stamped with v4), v5 OPTIMIZE compacts
    * everything (ids ride the materialized columns again). */
  def ensureRowTrackedTable(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = new File(
      sys.props("java.io.tmpdir"),
      "graft_delta_rowtrk2_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
    val marker = new File(dir, "_DEMO_READY")
    // staleness defence ([[graft.StageMarker]]): regenerated source orders
    // must rebuild this derived table, or its oracle compares stale data
    val sig = graft.StageMarker.sig(new File(s"$sfDir/orders.parquet"))
    if (!graft.StageMarker.fresh(marker, sig)) {
      graft.delta.DeltaSnapshotReader.invalidate(dir.toString)
      if (dir.exists()) {
        def rm(f: File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
      val src = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_totalprice"))
      def oneSortedFile(df: DataFrame) =
        df.repartition(1).sortWithinPartitions("o_orderkey")
      DeltaWriter.write(oneSortedFile(src.filter(col("o_orderkey") % 8 === 0)), dir.toString)
      DeltaWriter.enableRowTracking(spark, dir.toString)                       // v1
      DeltaWriter.write(oneSortedFile(src.filter(col("o_orderkey") % 8 === 1)), dir.toString) // v2
      DeltaWriter.deleteWithDV(spark, dir.toString, col("o_orderkey") % 16 === 0) // v3
      DeltaWriter.update(spark, dir.toString, col("o_orderkey") % 16 === 8,
        Map("o_totalprice" -> lit(0.0)))                                       // v4
      DeltaWriter.optimize(spark, dir.toString)                                // v5
      graft.StageMarker.write(marker, sig)
    }
    dir.toString
  }

  /** Row tracking read back: `_row_id` = materialized-or-(`baseRowId` +
    * row index), `_row_commit_version` = the last modifying commit. The
    * oracle PINS the exact ids by reconstructing the assignment rule
    * (contiguous ranges in sorted-file order: backfill 0.., append above
    * the mark) — every surviving id must come through the DV delete, the
    * copy-on-write UPDATE and the OPTIMIZE compaction untouched, and the
    * updated slice must carry the update commit (4) as its version. */
  def deltaRowTracking(s: SparkSession, dir: String): DataFrame = {
    val t = ensureRowTrackedTable(s, dir)
    graft.delta.RowTracking.readWithRowIds(s, t)
      .select(col("o_orderkey"), col("_row_id").as("row_id"),
        col("_row_commit_version").as("commit_version"))
      .orderBy(col("o_orderkey"))
  }

  /** Build (once per sfDir per JVM) a CLUSTERED table: small unordered
    * appends → `CLUSTER BY (o_custkey, o_orderkey)` declared in the
    * `delta.clustering` domain → OPTIMIZE clusters along the DECLARATION
    * (Morton curve), so later reads skip files on either column. */
  def ensureClusteredTable(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = new File(
      sys.props("java.io.tmpdir"),
      "graft_delta_clust_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
    val marker = new File(dir, "_DEMO_READY")
    // staleness defence ([[graft.StageMarker]]): regenerated source orders
    // must rebuild this derived table, or its oracle compares stale data
    val sig = graft.StageMarker.sig(new File(s"$sfDir/orders.parquet"))
    if (!graft.StageMarker.fresh(marker, sig)) {
      graft.delta.DeltaSnapshotReader.invalidate(dir.toString)
      if (dir.exists()) {
        def rm(f: File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
      val src = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      (0 to 2).foreach(i =>
        DeltaWriter.write(src.filter(col("o_orderkey") % 3 === i).coalesce(1), dir.toString))
      graft.delta.Clustering.cluster(spark, dir.toString, Seq("o_custkey", "o_orderkey"))
      graft.delta.Clustering.optimize(spark, dir.toString)
      graft.StageMarker.write(marker, sig)
    }
    dir.toString
  }

  /** Clustered-table read back: a selective filter on a DECLARED clustering
    * column over the optimized layout (file skipping on the curve ranges);
    * content must equal SQL over the source — clustering moves rows, never
    * changes them. */
  def deltaClustered(s: SparkSession, dir: String): DataFrame = {
    val t = ensureClusteredTable(s, dir)
    DeltaSnapshotReader.load(s, t)
      .filter(col("o_custkey") % 10 === 3 && col("o_custkey") <= 300)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** DESCRIBE HISTORY over the demo table: per-commit provenance from the
    * writer's commitInfo actions (version/operation/mode are deterministic;
    * wall-clock timestamps are projected out for the oracle). */
  def deltaHistory(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    DeltaSnapshotReader.history(s, t)
      .select(col("version"), col("operation"),
        element_at(col("operationParameters"), "mode").as("mode"))
      .orderBy(col("version"))
  }

  /** SHALLOW CLONE of the demo table (zero data copied — the clone's log
    * references the source files by absolute URI), read back through the
    * log reader; must equal SQL over the source. */
  def deltaClone(s: SparkSession, dir: String): DataFrame = synchronized {
    val src = ensureDemoTable(s, dir)
    val dst = new File(
      sys.props("java.io.tmpdir"),
      "graft_delta_clone6_" + dir.replaceAll("[^A-Za-z0-9.]", "_")) // suffix tracks demo6
    // a SHALLOW clone references the source's absolute file paths, so a
    // rebuilt demo table (fresh commit dirs, old tree rm'd) strands any
    // existing clone — signature the clone against the same source the
    // demo table is signed with ([[graft.StageMarker]]; this exact
    // staleness broke the r12 bench once before this guard)
    val marker = new File(dst, "_CLONE_READY")
    val sig = graft.StageMarker.sig(new File(s"$dir/orders.parquet"))
    if (!graft.StageMarker.fresh(marker, sig)) {
      if (dst.exists()) {
        def rmr(f: File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rmr); f.delete()
        }
        rmr(dst)
      }
      DeltaSnapshotReader.invalidate(dst.toString)
      DeltaWriter.shallowClone(s, src, dst.toString)
      graft.StageMarker.write(marker, sig)
    }
    DeltaSnapshotReader.load(s, dst.toString)
      .filter(col("o_year").between(1996, 1998)) // partition pruning on the clone
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_year"))
  }

  /** Catalog-name SQL: tables resolved through the SESSION catalog (no temp
    * views) — `graft.<name>` for every discovered source table plus the
    * demo Delta table registered `USING graftdelta`, so the query text is
    * exactly what an Athena user writes against the registered data source
    * (reference README.md:34-38). Partition pruning (o_year), dim
    * broadcast, and parquet pushdown all survive the catalog path
    * (asserted in PlanSpec). */
  def catalogSqlDelta(s: SparkSession, dir: String): DataFrame = {
    val t = ensureDemoTable(s, dir)
    val pc = new graft.catalog.PathCatalog(s, dir)
    pc.registerAll("graft")
    pc.register("graft", "delta_orders", "graftdelta", t)
    s.sql(
      s"""SELECT n.n_name, COUNT(*) AS n_orders,
         |  ${sqlDsum("o.o_totalprice")} AS sum_price
         |FROM graft.delta_orders o
         |JOIN graft.customer c ON o.o_custkey = c.c_custkey
         |JOIN graft.nation n ON c.c_nationkey = n.n_nationkey
         |WHERE o.o_year BETWEEN 1996 AND 1997
         |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "delta_row_tracking" -> (deltaRowTracking _),
    "delta_clustered" -> (deltaClustered _),
    "delta_types_roundtrip" -> (deltaTypesRoundtrip _),
    "delta_constraints" -> (deltaConstraints _),
    "delta_generated" -> (deltaGenerated _),
    "delta_history" -> (deltaHistory _),
    "delta_clone" -> (deltaClone _),
    "catalog_sql_delta" -> (catalogSqlDelta _),
    "sql_over_delta" -> (sqlOverDelta _),
    "delta_data_skip" -> (deltaDataSkip _),
    "delta_stats_agg" -> (deltaStatsAgg _),
    "delta_stats_by_partition" -> (deltaStatsByPartition _),
    "delta_scan_full" -> (deltaScanFull _),
    "delta_scan_dsv2" -> (deltaScanDsv2 _),
    "partition_enum" -> (partitionEnum _),
    "partition_prune" -> (partitionPrune _),
    "partition_inject" -> (partitionInject _),
    "delta_time_travel" -> (deltaTimeTravel _),
    "catalog_time_travel" -> (catalogTimeTravel _),
    "delta_snapshot_files" -> (deltaSnapshotFiles _),
    "delta_crc_state" -> (deltaCrcState _),
    "delta_uniform" -> (deltaUniform _),
    "delta_uniform_dv" -> (deltaUniformDv _),
    "delta_uniform_nested" -> (deltaUniformNested _),
    "delta_manifest" -> (deltaManifest _),
    "delta_collated" -> (deltaCollated _),
    "delta_variant" -> (deltaVariant _),
    "split_plan" -> (splitPlan _)
  )

  /** Independent DuckDB log replay for [[deltaSnapshotFiles]]: reconcile
    * every add/remove across the commit JSONs (the checkpoint is an
    * optimization, never extra truth — the JSON tail back to v0 is intact
    * in the demo fixture), last action per path wins, a same-version
    * re-add beats the remove (Delta's in-commit ordering rule, the same
    * one DeltaSnapshotReader implements and DeltaForeignLogSpec locks). */
  private def snapshotFilesOracle(t: String): String =
    s"""WITH log AS (
       |  SELECT CAST(regexp_extract(filename, '(\\d+)\\.json', 1) AS BIGINT) AS v,
       |    ("add").path AS add_path, ("add")."partitionValues" AS pv,
       |    ("add").size AS sz, ("remove").path AS rm_path
       |  FROM read_json('$t/_delta_log/*.json', filename = true,
       |    columns = {'add': 'STRUCT(path VARCHAR, "partitionValues" JSON, size BIGINT)',
       |               'remove': 'STRUCT(path VARCHAR)'})),
       |adds AS (SELECT add_path AS path, max(v) AS av FROM log
       |         WHERE add_path IS NOT NULL GROUP BY 1),
       |rms AS (SELECT rm_path AS path, max(v) AS rv FROM log
       |        WHERE rm_path IS NOT NULL GROUP BY 1),
       |last_add AS (
       |  SELECT l.add_path AS path, l.pv, l.sz, l.v
       |  FROM log l JOIN adds a ON l.add_path = a.path AND l.v = a.av),
       |active AS (
       |  SELECT la.path, la.pv, la.sz FROM last_add la
       |  LEFT JOIN rms r ON la.path = r.path
       |  WHERE r.path IS NULL OR r.rv <= la.v)
       |SELECT path, pv->>'o_year' AS o_year, CAST(sz AS BIGINT) AS size
       |FROM active ORDER BY path""".stripMargin

  /** Independent DuckDB recompute for [[splitPlan]]: the same log replay
    * as [[snapshotFilesOracle]] yields the active (path, size) set — the
    * add actions' `size` field is the authoritative byte count — and a
    * RECURSIVE CTE re-runs the greedy packing fold exactly as
    * [[graft.delta.SplitPlanner.plan]] states it: files in (size DESC,
    * path) order, each paying size + openCost (16 KiB), a split closing
    * when the accumulated cost would exceed maxSplitBytes (256 KiB). The
    * recursion is one row per FILE — metadata-scale, never row-scale —
    * which is what makes the sequential fold affordable in SQL. */
  private def splitPlanOracle(t: String): String =
    s"""WITH RECURSIVE log AS (
       |  SELECT CAST(regexp_extract(filename, '(\\d+)\\.json', 1) AS BIGINT) AS v,
       |    ("add").path AS add_path, ("add").size AS sz, ("remove").path AS rm_path
       |  FROM read_json('$t/_delta_log/*.json', filename = true,
       |    columns = {'add': 'STRUCT(path VARCHAR, size BIGINT)',
       |               'remove': 'STRUCT(path VARCHAR)'})),
       |adds AS (SELECT add_path AS path, max(v) AS av FROM log
       |         WHERE add_path IS NOT NULL GROUP BY 1),
       |rms AS (SELECT rm_path AS path, max(v) AS rv FROM log
       |        WHERE rm_path IS NOT NULL GROUP BY 1),
       |last_add AS (
       |  SELECT l.add_path AS path, l.sz, l.v
       |  FROM log l JOIN adds a ON l.add_path = a.path AND l.v = a.av),
       |active AS (
       |  SELECT la.path, la.sz FROM last_add la
       |  LEFT JOIN rms r ON la.path = r.path
       |  WHERE r.path IS NULL OR r.rv <= la.v),
       |f AS (
       |  SELECT path, sz, row_number() OVER (ORDER BY sz DESC, path) AS rn
       |  FROM active),
       |pack AS (
       |  SELECT rn, sz, 0 AS split_id, sz + 16384 AS acc FROM f WHERE rn = 1
       |  UNION ALL
       |  SELECT f.rn, f.sz,
       |    CASE WHEN p.acc + f.sz + 16384 > 262144
       |         THEN p.split_id + 1 ELSE p.split_id END,
       |    CASE WHEN p.acc + f.sz + 16384 > 262144
       |         THEN f.sz + 16384 ELSE p.acc + f.sz + 16384 END
       |  FROM pack p JOIN f ON f.rn = p.rn + 1)
       |SELECT CAST(split_id AS INTEGER) AS split_id,
       |  CAST(COUNT(*) AS INTEGER) AS n_files, CAST(SUM(sz) AS BIGINT) AS bytes
       |FROM pack GROUP BY 1 ORDER BY split_id""".stripMargin

  /** `def`, not `val`: the snapshot-files and split-plan entries are
    * rendered against the demo-table path of the CURRENT run (see
    * [[lastDemoSfDir]]). */
  /** DuckDB parses the crc ARTIFACTS themselves with its own JSON reader;
    * the Spark side derives its rows from log replay. The check is not
    * fully independent — snapshotAt itself validates the same two fields
    * and would THROW (a loud correctness error, not a row mismatch) on a
    * crc-vs-replay disagreement — but it still pins what a FOREIGN
    * consumer of the artifacts sees: rendering bugs, stale crcs, or a
    * field delta-spark would misparse all surface as hash mismatches
    * here. The `[0-9]*` glob keeps the local FS's dot-prefixed binary
    * shadow files (`.N.crc.crc`) out — DuckDB's glob, unlike POSIX
    * shells, matches leading dots with `*`. */
  private def crcStateOracle(t: String): String =
    s"""SELECT CAST(regexp_extract(filename, '(\\d+)\\.crc', 1) AS BIGINT) AS version,
       |  CAST("numFiles" AS BIGINT) AS num_files,
       |  CAST("tableSizeBytes" AS BIGINT) AS size_bytes,
       |  CAST("setDigest" AS BIGINT) AS set_digest,
       |  CAST(len("allFiles") AS BIGINT) AS echo_n,
       |  CAST(list_aggregate(list_transform("allFiles", f -> f."size"), 'sum')
       |    AS BIGINT) AS echo_bytes,
       |  list_aggregate(list_transform("allFiles", f -> f."path"), 'min')
       |    AS echo_min_path,
       |  list_aggregate(list_transform("allFiles", f -> f."path"), 'max')
       |    AS echo_max_path,
       |  CAST(list_aggregate("histogramOpt"."fileCounts", 'sum') AS BIGINT) AS hist_n,
       |  CAST(list_aggregate("histogramOpt"."totalBytes", 'sum') AS BIGINT) AS hist_bytes,
       |  CAST(len(list_filter("histogramOpt"."fileCounts", x -> x > 0)) AS BIGINT) AS hist_nzb,
       |  CAST(list_indexof("histogramOpt"."fileCounts",
       |    list_aggregate("histogramOpt"."fileCounts", 'max')) - 1 AS BIGINT) AS hist_top
       |FROM read_json('$t/_delta_log/[0-9]*.crc', filename = true,
       |  columns = {'numFiles': 'BIGINT', 'tableSizeBytes': 'BIGINT',
       |             'setDigest': 'BIGINT',
       |             'allFiles': 'STRUCT(path VARCHAR, size BIGINT)[]',
       |             'histogramOpt': 'STRUCT(sortedBinBoundaries BIGINT[], fileCounts BIGINT[], totalBytes BIGINT[])'})
       |ORDER BY version""".stripMargin

  def oracle: Map[String, String] = oracleStatic +
    ("delta_snapshot_files" ->
      snapshotFilesOracle(demoDirFor(lastDemoSfDir).toString)) +
    ("split_plan" ->
      splitPlanOracle(demoDirFor(lastDemoSfDir).toString)) +
    ("delta_crc_state" ->
      crcStateOracle(demoDirFor(lastDemoSfDir).toString)) +
    ("delta_uniform" ->
      uniformOracle(demoDirFor(lastDemoSfDir).toString)) +
    ("delta_uniform_nested" ->
      uniformOracle(nestedUniformDirFor(lastNestedUniformDir).toString, "pmod")) +
    ("delta_uniform_dv" ->
      uniformDvOracle(uniformDvDirFor(lastUniformDvSfDir).toString))

  private val oracleStatic: Map[String, String] = Map(
    "delta_variant" ->
      s"""SELECT o_orderstatus AS st, COUNT(*) AS n,
         |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_k,
         |  ${sqlDsum("o_totalprice")} AS sum_tp
         |FROM orders GROUP BY 1 ORDER BY st""".stripMargin,
    "delta_collated" ->
      s"""SELECT lower(c_mktsegment) AS seg, COUNT(*) AS n_cust,
         |  ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer GROUP BY 1 ORDER BY seg""".stripMargin,
    "delta_manifest" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "delta_clustered" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE o_custkey % 10 = 3 AND o_custkey <= 300
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "delta_row_tracking" ->
      """WITH b1 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 8 = 0),
        |b2 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 8 = 1),
        |i1 AS (SELECT o_orderkey,
        |         row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id,
        |         1 AS commit_version FROM b1),
        |i2 AS (SELECT o_orderkey,
        |         (SELECT COUNT(*) FROM b1) + row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id,
        |         2 AS commit_version FROM b2),
        |u AS (SELECT * FROM i1 UNION ALL SELECT * FROM i2)
        |SELECT o_orderkey, CAST(row_id AS BIGINT) AS row_id,
        |  CAST(CASE WHEN o_orderkey % 16 = 8 THEN 4 ELSE commit_version END AS BIGINT)
        |    AS commit_version
        |FROM u WHERE o_orderkey % 16 <> 0 ORDER BY o_orderkey""".stripMargin,
    "delta_types_roundtrip" ->
      """WITH t AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_totalprice AS DECIMAL(12,2)) AS dv,
        |    CAST(o_orderkey % 1000 AS SMALLINT) AS sv,
        |    CAST(o_orderkey % 100 AS TINYINT) AS bv,
        |    CAST(o_orderdate AS DATE) AS dt,
        |    o_orderkey * 1000000 + 123456 AS ts_us
        |  FROM orders)
        |SELECT CAST(CAST(bv AS INTEGER) % 10 AS INTEGER) AS grp, COUNT(*) AS n,
        |  CAST(SUM(dv) AS DOUBLE) AS sum_dv,
        |  CAST(MIN(sv) AS INTEGER) AS min_sv, CAST(MAX(sv) AS INTEGER) AS max_sv,
        |  CAST(MIN(bv) AS INTEGER) AS min_bv, CAST(MAX(bv) AS INTEGER) AS max_bv,
        |  MIN(dt) AS min_dt, MAX(dt) AS max_dt,
        |  CAST(MIN(ts_us) AS BIGINT) AS min_ts_us, CAST(MAX(ts_us) AS BIGINT) AS max_ts_us
        |FROM t GROUP BY 1 ORDER BY grp""".stripMargin,
    "delta_constraints" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE o_orderkey % 4 IN (1, 3)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "delta_generated" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "delta_history" ->
      """SELECT CAST(v AS BIGINT) AS version, operation, mode
        |FROM (VALUES (0, 'WRITE', 'overwrite'), (1, 'WRITE', 'append'),
        |             (2, 'WRITE', 'append')) AS t(v, operation, mode)
        |ORDER BY version""".stripMargin,
    "delta_clone" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1998
         |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "catalog_sql_delta" ->
      s"""SELECT n.n_name, COUNT(*) AS n_orders, ${sqlDsum("o.o_totalprice")} AS sum_price
         |FROM orders o
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE year(o.o_orderdate) BETWEEN 1996 AND 1997
         |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "sql_over_delta" ->
      s"""SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year, c.c_mktsegment,
         |  COUNT(*) AS n, ${sqlDsum("o.o_totalprice")} AS sum_price
         |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE year(o.o_orderdate) BETWEEN 1995 AND 1997
         |GROUP BY 1, 2 ORDER BY o_year, c_mktsegment""".stripMargin,
    "delta_data_skip" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_big, ${sqlDsum("o_totalprice")} AS sum_big
         |FROM orders WHERE o_totalprice > 400000
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "delta_stats_agg" ->
      """SELECT COUNT(*) AS n_rows, MIN(o_orderkey) AS min_key,
        |  MAX(o_orderkey) AS max_key FROM orders""".stripMargin,
    "delta_stats_by_partition" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, COUNT(*) AS n_rows
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "delta_scan_full" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "delta_scan_dsv2" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1998
         |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "partition_enum" ->
      """SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS o_year
        |FROM orders ORDER BY o_year""".stripMargin,
    "partition_prune" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1998
         |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "partition_inject" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "delta_time_travel" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE year(o_orderdate) <= 1997
         |GROUP BY 1 ORDER BY o_year""".stripMargin,
    // identical semantics to delta_time_travel — the key pins the V2
    // catalog resolution path (SQL VERSION AS OF), not new query logic
    "catalog_time_travel" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE year(o_orderdate) <= 1997
         |GROUP BY 1 ORDER BY o_year""".stripMargin
  )
}
