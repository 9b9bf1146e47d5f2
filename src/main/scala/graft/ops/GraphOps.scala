package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph and event-sequence operators: fixed-iteration PageRank over the
  * part–supplier co-purchase graph, the event-type Markov transition matrix,
  * and gaps-and-islands activity streaks.
  *
  * In the reference these would be hand-written Athena SQL over the
  * connector's scan (reference README.md:37-38); here each is a declarative
  * Spark plan. PageRank is the canonical pregel-as-join shape: each
  * iteration is one shuffle on the node key (join ranks to edges on `src`,
  * re-aggregate on `dst`), so an N-iteration run is N co-partitioned
  * shuffles — at 100 TB you persist each rank generation to cut the lineage
  * (and let AQE size the exchanges); at bench scale the declarative
  * three-deep plan is cheaper than the persist round-trips.
  */
object GraphOps {

  /** Damped PageRank (d=0.85), 3 unrolled iterations, over the undirected
    * bipartite part–supplier graph from distinct `lineitem` pairs. The
    * symmetric edge set means no dangling nodes, so no dangling-mass term.
    *
    * Engine-deterministic float discipline (SURVEY.md §5.1): each edge
    * contribution rank/degree is one IEEE double division, quantized to
    * DECIMAL(18,12) so the per-node reduction is an EXACT decimal sum
    * (order-independent across Spark's parallel partial aggregates and
    * DuckDB's serial one); only the summed value returns to double for the
    * closed-form damping arithmetic. */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    // integer node encoding (parts even, suppliers odd): long join keys and
    // long shuffle payloads instead of strings — the id scheme a 100 TB
    // graph would use
    val pairs = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val fwd = pairs.select((col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg) PERSISTED across the three iterations — the textbook
    // iterative-graph move: without it every iteration re-derives the edge
    // list from the fact scan (7 scans for 3 rounds). The cache manager
    // dedups by canonical plan, so repeated calls share ONE materialization
    // per session instead of leaking copies.
    val ew = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CachedFrames.track("graph_pagerank", dir, ew)
    // n is one bounded driver-side scalar (like the k-means sample bounds,
    // SimOps) — inlining it keeps every iteration's plan free of the extra
    // nodes-count subtree
    val n = ew.select(col("src")).distinct().count()
    // Iteration 1 FOLDED (optimization r17): every node starts at the same
    // rank 1/n, so the first iteration's join-with-ranks is a constant —
    // contrib = (1/n)/deg per edge, computed straight off the edge frame.
    // Bit-identical to the joined form (same double literal, same division,
    // same DECIMAL quantization), minus one distinct, one broadcast build
    // and one join.
    var ranks = ew
      .select(col("dst"), (lit(1.0 / n) / col("deg")).cast(DecimalType(18, 12)).as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      .select(col("dst").as("node"),
        (lit(0.15 / n) + lit(0.85) * col("sc").cast("double")).as("r"))
    // Broadcast the per-iteration rank frame ONLY when the node count is
    // provably small (one 16-byte row per node, well under the default
    // 10 MB autoBroadcastJoinThreshold); on a general graph the rank frame
    // grows with the data and a forced broadcast is a driver OOM — there
    // the iteration falls back to the co-partitioned shuffle join the
    // header describes, and AQE may still choose broadcast from runtime
    // stats. (VERDICT r10: never force-broadcast an unbounded frame.)
    val hintRanks: DataFrame => DataFrame =
      if (n <= 200000L) broadcast(_) else identity
    for (_ <- 2 to 3) {
      val contrib = ew.join(hintRanks(ranks), ew("src") === col("node"))
        .select(col("dst"),
          (col("r") / col("deg")).cast(DecimalType(18, 12)).as("c"))
      ranks = contrib.groupBy(col("dst")).agg(sum(col("c")).as("sc"))
        .select(col("dst").as("node"),
          (lit(0.15 / n) + lit(0.85) * col("sc").cast("double")).as("r"))
    }
    ranks.select(col("node"), round(col("r"), 8).as("rank"))
      .orderBy(col("rank").desc, col("node")).limit(20)
  }

  /** Exact triangle census of the part co-purchase graph (edge = two parts
    * appearing in the same order), with the wedge count and global
    * clustering coefficient. The triangle join uses the degree-ordered
    * orientation (each undirected edge points toward its higher-(degree,id)
    * endpoint): every triangle then materializes exactly once, and — the
    * reason this is THE 100 TB triangle algorithm — the path-join fanout is
    * bounded by graph arboricity (O(m^1.5) total work) instead of blowing
    * up on hub nodes the way a naive id-ordered orientation does on skewed
    * degree distributions. Three co-partitioned shuffles on edge keys: the
    * oriented wedge build, then a semi-join probe back into the edge set;
    * no all-pairs stage anywhere. The wedge count is closed-form from the
    * degree frame (Σ d·(d−1)/2), not a join. */
  def graphTriangles(s: SparkSession, dir: String): DataFrame = {
    // deterministic 1/3-of-orders slice: the co-purchase graph is dense
    // (avg degree ~100 at sf0.1) and wedge work grows ∝ Σd², so the full
    // fixture is ~50M wedges of pure recount; the slice keeps the exact
    // census semantics and every plan property at ~1/9 the arithmetic
    // (same move as sql_recursive_cte's custkey bound)
    val ip = Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    // per-order pair fanout is bounded by orders' line counts (≤7 in this
    // corpus — C(7,2)=21 pairs/order), so the co-occurrence self-join is a
    // co-partitioned equi-join on the order key, never quadratic in |parts|
    val e = ip.as("x").join(ip.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CachedFrames.track("graph_triangles_e", dir, e)
    val (deg, tri) = orientedTriangles(e)
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val nTri = tri.agg(count(lit(1)).as("n_triangles"))
    nodeStats.crossJoin(nEdges).crossJoin(nTri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        (lit(3.0) * col("n_triangles").cast("double") /
          col("n_wedges").cast("double")).as("global_cc"))
  }

  /** The census core, shared with PropertySpec's random-graph law: given a
    * distinct undirected edge set `(a, b)` with `a < b`, returns the degree
    * frame and a frame holding ONE row per triangle. Degree-ordered
    * orientation + wedge join + closing semi-join:
    *  - the wedge join exchanges only the EDGE set (2×1.2M rows at sf0.1 —
    *    trivial); the wedge EXPANSION (49M rows) is generated and consumed
    *    inside the same pipeline by probing a broadcast of the edge set
    *    (2 longs/edge ≈ 20 MB), so the expansion never hits an exchange
    *    (the shuffled form paid a ~1 GB shuffle here). Like pagerank's
    *    rank frame (:66), the hint is GATED — in BYTES, not edges
    *    (VERDICT r12 #6): the RAW payload is 16 B per oriented edge (two
    *    longs), but the executor-resident HashedRelation costs ~3-4× that
    *    (UnsafeRow headers + LongToUnsafeRowMap slots/padding), so the
    *    gate prices each edge at 56 B (ADVICE r13 — the 16 B constant let
    *    a "256 MiB" budget admit a ~1 GB resident relation, the exact
    *    failure the byte gate exists to prevent). The broadcast is
    *    admitted only while m × 56 B ≤ `broadcastBudgetBytes` (default
    *    256 MiB — a safe slice of a 4-8 GiB executor heap; resident cost
    *    at the boundary ≈ the budget, not a multiple of it). Past the
    *    budget the closing semi-join
    *    falls back to the partitioned hash/sort-merge form, where the
    *    orientation bound (work ∝ m^1.5 via arboricity) is what keeps it
    *    alive at 100 TB. (VERDICT r11 #3: never force-broadcast a
    *    data-sized frame.)
    *
    * `edgeCount`: caller-supplied edge-count estimate for the gate. When
    * given, CONSTRUCTION stays fully lazy (no job); when None, the gate
    * measures `o.count()` eagerly — see the trade note at the count. */
  private[graft] def orientedTriangles(
      e: DataFrame,
      broadcastBudgetBytes: Long = 256L * 1024 * 1024,
      edgeCount: Option[Long] = None): (DataFrame, DataFrame) = {
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient toward the higher (degree, id) endpoint
    val o = e.join(deg.as("da"), col("a") === col("da.v"))
      .join(deg.as("db"), col("b") === col("db.v"))
      .select(
        when(col("da.d") < col("db.d") ||
             (col("da.d") === col("db.d") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // keyed by the caller's edge plan so two different edge sets don't
    // evict each other; same one-generation bound as the dir-keyed sites
    graft.CachedFrames.track("graph_oriented_edges",
      e.queryExecution.logical.semanticHash().toString, o)
    val paths = o.as("e1").join(o.as("e2"), col("e1.w") === col("e2.u"))
      .select(col("e1.u").as("pa"), col("e2.w").as("pc"))
    // gate the hint — see the scale note in the header. Without a
    // caller-supplied estimate this measures o.count(), which also
    // materializes the persisted cache (reused by e1/e2/e3 immediately
    // after). Deliberate trade: the count makes DataFrame CONSTRUCTION
    // run the orientation job — accepted because the hint must be decided
    // at plan time, AQE's 10 MB default would reject the ~20 MB edge
    // broadcast that saves the ~1 GB wedge exchange, and every EXECUTING
    // caller needs the materialization anyway; a plan-only caller avoids
    // the job by passing `edgeCount` (ADVICE r12).
    val m = edgeCount.getOrElse(o.count())
    val estBytes = m * 56L // resident HashedRelation bytes/edge, not raw payload
    val hintEdges: DataFrame => DataFrame =
      if (estBytes <= broadcastBudgetBytes) broadcast(_) else identity
    val tri = paths.join(hintEdges(o.as("e3")),
      col("pa") === col("e3.u") && col("pc") === col("e3.w"), "left_semi")
    (deg, tri)
  }

  /** First-order Markov transition matrix of event types: per user, order
    * events by (ts, event_id), pair each with its successor via `lead`, and
    * count transitions. One shuffle on `user_id` for the window, one
    * map-side-combining aggregation on the (from, to) pair — the pair space
    * is |types|², so the final state is tiny no matter the corpus size. */
  def eventsMarkov(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val pairs = e.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val c = pairs.groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    c.withColumn("p",
        round(col("n") / sum(col("n")).over(Window.partitionBy(col("event_type")))
          .cast("double"), 6))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** Gaps-and-islands: contiguous runs of daily activity per user. The
    * classic trick — day minus the per-user day rank is constant within a
    * run — turns streak detection into one window pass plus one aggregation,
    * both on the same `user_id` shuffle (Catalyst reuses the exchange). */
  def eventsStreaks(s: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    du.withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("day")).cast("string").as("streak_start"),
        max(col("day")).cast("string").as("streak_end"),
        count(lit(1)).as("len"))
      .select(col("user_id"), col("streak_start"), col("streak_end"), col("len"))
      .orderBy(col("user_id"), col("streak_start"))
  }

  /** Top-25 three-step behavioural paths (the "user journey" n-gram): two
    * `lead`s over the per-user event order produce each sliding trigram of
    * event types; one map-side-combining count over the |types|³-bounded
    * path space follows. Same single `user_id` shuffle as `events_markov`. */
  def eventsPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
    e.select(concat_ws(">", col("event_type"), col("t1"), col("t2")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(25)
  }

  /** SQL-text recursive CTE (Spark 4's `WITH RECURSIVE` / UnionLoopExec):
    * walks each customer's order chain in date order, accumulating an exact
    * DECIMAL running total — the linked-list traversal shape (org charts,
    * BOM explosions) that only a recursive CTE expresses in pure SQL. The
    * recursion depth is the longest per-customer chain (≈30 at sf0.1), far
    * under the engine's level limit; each step is one co-partitioned join
    * on (custkey, rn). The running total is re-cast to DECIMAL(18,2) every
    * step so anchor and recursive branches keep the identical type (a
    * recursive-CTE requirement on both engines) and stay bit-exact. */
  def sqlRecursiveCte(s: SparkSession, dir: String): DataFrame = {
    // the recursion references `ord` once per LEVEL (~30 levels at sf0.1);
    // persist the tiny numbered-chain base so each level joins the cached
    // ~2k rows instead of rescanning + re-windowing the fact table
    // (cache-manager plan dedup keeps one materialization per session)
    val ord = Tables.orders(s, dir).filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))).as("rn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CachedFrames.track("sql_recursive_cte", dir, ord)
    ord.createOrReplaceTempView("graft_ord_rec")
    s.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT o_custkey, rn, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS run_total
        |  FROM graft_ord_rec WHERE rn = 1
        |  UNION ALL
        |  SELECT o.o_custkey, o.rn, o.o_orderkey,
        |    CAST(c.run_total + CAST(o.o_totalprice AS DECIMAL(18,2))
        |         AS DECIMAL(18,2)) AS run_total
        |  FROM graft_ord_rec o JOIN chain c
        |    ON o.o_custkey = c.o_custkey AND o.rn = c.rn + 1)
        |SELECT o_custkey, rn, o_orderkey, CAST(run_total AS DOUBLE) AS run_total
        |FROM chain ORDER BY o_custkey, rn""".stripMargin)
  }

  /** RFM (recency / frequency / monetary) customer segmentation over
    * purchase events: per-user metrics from one purchase-filtered
    * aggregation, then quintile scores via deterministic `ntile` (metric +
    * user_id total order, so no tie ambiguity). The unpartitioned ntile
    * windows run over the USER dimension (already reduced — bounded), never
    * raw events; at larger user counts the scale form broadcasts
    * approx-quantile boundaries instead of a global sort. */
  def eventsRfm(s: SparkSession, dir: String): DataFrame = {
    import graft.Det._
    val p = Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        dec(col("value")).as("v"))
    // ONE pass over the raw purchases: per-user reduce first, then join
    // the 1-row global max (= max of the per-user maxima) onto the
    // bounded user-dimension frame — never onto raw events
    val per = p.groupBy(col("user_id"))
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("frequency"),
        dfin(sum(col("v"))).as("monetary"))
    val mx = per.agg(max(col("last_us")).as("maxus"))
    val agg = per.crossJoin(mx)
      .select(col("user_id"),
        expr("(maxus - last_us) div 86400000000").as("recency_days"),
        col("frequency"), col("monetary"))
    agg.select(col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
        ntile(5).over(Window.orderBy(col("recency_days"), col("user_id"))).as("r_score"),
        ntile(5).over(Window.orderBy(col("frequency").desc, col("user_id"))).as("f_score"),
        ntile(5).over(Window.orderBy(col("monetary").desc, col("user_id"))).as("m_score"))
      .orderBy(col("user_id"))
  }

  /** Last-touch attribution: each purchase credits the most recent
    * PRECEDING non-purchase event (the `last(ignoreNulls)` over a
    * rows-to-1-preceding frame — the attribution lookback as one window
    * pass on the user_id shuffle, no self-join). Rolled up to credited
    * type with exact counts and the mean credit-to-purchase gap. */
  def eventsAttribution(s: SparkSession, dir: String): DataFrame = {
    val win = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("attr_type",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(win))
      .withColumn("attr_us",
        last(when(col("event_type") =!= "purchase", col("us")),
          ignoreNulls = true).over(win))
    e.filter(col("event_type") === "purchase" && col("attr_type").isNotNull)
      .groupBy(col("attr_type"))
      .agg(count(lit(1)).as("n_purchases"),
        (sum(col("us") - col("attr_us")).cast("double") / count(lit(1)))
          .as("avg_gap_us"))
      .orderBy(col("attr_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _),
    "graph_triangles" -> (graphTriangles _),
    "events_markov" -> (eventsMarkov _),
    "events_paths" -> (eventsPaths _),
    "events_streaks" -> (eventsStreaks _),
    "events_rfm" -> (eventsRfm _),
    "events_attribution" -> (eventsAttribution _),
    "sql_recursive_cte" -> (sqlRecursiveCte _)
  )

  val oracle: Map[String, String] = Map(
    // the oracle counts with the simpler id-ordered (a<b) orientation:
    // any consistent orientation materializes each triangle exactly once,
    // so the census equals the engine's degree-ordered form by construction
    "graph_triangles" ->
      """WITH ip AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |            WHERE l_orderkey % 3 = 0),
        |e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |      FROM ip a JOIN ip b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT v, COUNT(*) AS d FROM
        |  (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v),
        |w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS nw FROM deg),
        |tri AS (SELECT COUNT(*) AS t FROM e e1
        |        JOIN e e2 ON e1.b = e2.a
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
        |  (SELECT COUNT(*) FROM e) AS n_edges,
        |  (SELECT nw FROM w) AS n_wedges,
        |  (SELECT t FROM tri) AS n_triangles,
        |  CAST(3 AS DOUBLE) * (SELECT t FROM tri) / (SELECT nw FROM w)
        |    AS global_cc""".stripMargin,
    "graph_pagerank" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |e AS (
        |  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM pairs
        |  UNION ALL
        |  SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM pairs),
        |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        |ew AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src)),
        |n AS (SELECT COUNT(DISTINCT src) AS n FROM e),
        |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / (SELECT n FROM n) AS r
        |       FROM (SELECT DISTINCT src FROM e) s),
        |r1 AS (SELECT ew.dst AS node,
        |    CAST(0.15 AS DOUBLE) / (SELECT n FROM n) + CAST(0.85 AS DOUBLE) *
        |      CAST(SUM(CAST(r0.r / ew.deg AS DECIMAL(18,12))) AS DOUBLE) AS r
        |  FROM ew JOIN r0 ON ew.src = r0.node GROUP BY ew.dst),
        |r2 AS (SELECT ew.dst AS node,
        |    CAST(0.15 AS DOUBLE) / (SELECT n FROM n) + CAST(0.85 AS DOUBLE) *
        |      CAST(SUM(CAST(r1.r / ew.deg AS DECIMAL(18,12))) AS DOUBLE) AS r
        |  FROM ew JOIN r1 ON ew.src = r1.node GROUP BY ew.dst),
        |r3 AS (SELECT ew.dst AS node,
        |    CAST(0.15 AS DOUBLE) / (SELECT n FROM n) + CAST(0.85 AS DOUBLE) *
        |      CAST(SUM(CAST(r2.r / ew.deg AS DECIMAL(18,12))) AS DOUBLE) AS r
        |  FROM ew JOIN r2 ON ew.src = r2.node GROUP BY ew.dst)
        |SELECT node, round(r, 8) AS rank FROM r3
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin,
    "events_markov" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        |p AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS next_type
        |  FROM e),
        |c AS (SELECT event_type, next_type, COUNT(*) AS n FROM p
        |      WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |  round(n / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE), 6) AS p
        |FROM c ORDER BY event_type, next_type""".stripMargin,
    "events_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        |t AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT event_type || '>' || t1 || '>' || t2 AS path, COUNT(*) AS n
        |FROM t WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 25""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE ord AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders WHERE o_custkey < 200),
        |chain AS (
        |  SELECT o_custkey, rn, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS run_total
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.o_custkey, o.rn, o.o_orderkey,
        |    CAST(c.run_total + CAST(o.o_totalprice AS DECIMAL(18,2))
        |         AS DECIMAL(18,2)) AS run_total
        |  FROM ord o JOIN chain c
        |    ON o.o_custkey = c.o_custkey AND o.rn = c.rn + 1)
        |SELECT o_custkey, rn, o_orderkey, CAST(run_total AS DOUBLE) AS run_total
        |FROM chain ORDER BY o_custkey, rn""".stripMargin,
    "events_rfm" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS us, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT MAX(us) AS maxus FROM p),
        |agg AS (
        |  SELECT user_id,
        |    ((SELECT maxus FROM mx) - MAX(us)) // 86400000000 AS recency_days,
        |    COUNT(*) AS frequency,
        |    CAST(CAST(SUM(v) AS DECIMAL(38,4)) AS DOUBLE) AS monetary
        |  FROM p GROUP BY user_id)
        |SELECT user_id, recency_days, frequency, monetary,
        |  NTILE(5) OVER (ORDER BY recency_days, user_id) AS r_score,
        |  NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
        |  NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS m_score
        |FROM agg ORDER BY user_id""".stripMargin,
    "events_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        |w AS (
        |  SELECT event_type, us,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER win AS attr_type,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN us END
        |      IGNORE NULLS) OVER win AS attr_us
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT attr_type, COUNT(*) AS n_purchases,
        |  CAST(SUM(us - attr_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
        |FROM w WHERE event_type = 'purchase' AND attr_type IS NOT NULL
        |GROUP BY attr_type ORDER BY attr_type""".stripMargin,
    "events_streaks" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (SELECT user_id, day,
        |    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
        |               AS INTEGER) AS grp
        |  FROM du)
        |SELECT user_id, CAST(MIN(day) AS VARCHAR) AS streak_start,
        |  CAST(MAX(day) AS VARCHAR) AS streak_end, COUNT(*) AS len
        |FROM g GROUP BY user_id, grp ORDER BY user_id, streak_start""".stripMargin
  )
}
