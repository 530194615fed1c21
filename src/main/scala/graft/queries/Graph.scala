package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q71: PageRank centrality — the graph-derived importance signal a
  * corpus build uses for domain-authority quality weighting (rank a
  * node by who trades with it, recursively). Reference scope: none (no
  * graph ops in the reference or Athena); this is extension surface,
  * exercised on the customer↔supplier trade graph because the flowlog
  * corpus's graph is degenerate by construction (every srcaddr has
  * exactly one dstaddr — closed-form ids), while the trade graph has
  * real degree variance on both sides.
  *
  * Semantics: undirected weighted PageRank, damping 0.85, uniform init
  * 1/N, THREE unrolled power iterations. Edges are (customer, supplier)
  * pairs weighted by lineitem count, materialized in both directions —
  * symmetric edges mean every node has out-weight, so there is no
  * dangling mass to redistribute and the update is exactly
  *   r'(v) = 0.15/N + 0.85 · Σ_{(u,v)∈E} r(u) · w(u,v) / W(u).
  *
  * Determinism contract: weights and out-weights are exact integers;
  * each iteration's rank is round(·,12) on both engines — the rounding
  * grid sits ~1e9 above double-ulp noise, absorbing the one
  * order-sensitive reduction (the incoming-contribution sum) before it
  * feeds the next iteration, the same re-sync policy as q70's
  * centroids. Top-k output orders by the ROUNDED rank with a node-id
  * tie-break, so the cut is engine-independent.
  *
  * Scale shape: the edge frame (with its out-weight attached once) is
  * aggregated ONCE and cached, hash-partitioned by src — each power
  * iteration is then one equi-join (edges reuse their partitioning;
  * only the node-sized rank frame shuffles) plus one partial-aggregated
  * groupBy(dst). Nothing driver-sided but the node COUNT (one scalar);
  * ranks never collect. At 100 TB-graph scale this is the Pregel
  * message-passing shape expressed declaratively — iteration count is
  * fixed (3), so lineage stays shallow and no checkpointing is needed
  * (q50's checkpointed loop is the unbounded-iteration variant).
  */
object Graph {

  private val Damping = 0.85
  private val TopN = 30

  private def q71(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(s, dir, "orders")
    val lineitem = Tables.table(s, dir, "lineitem")
    // the one corpus-sized stage (fact⋈dim + aggregate) runs ONCE: the
    // aggregated pair frame (≤ |C|×|S| rows, typically ≪ fact) is cached
    // and everything downstream — both union directions, out-weights,
    // the node count, the per-iteration joins — derives from it.
    // Node ids are INTEGERS (custkey→2k, suppkey→2k+1, disjoint by
    // parity): every shuffle/join/aggregate key in the loop is 8 bytes,
    // not a rendered string — the dictionary-encoding any production
    // graph engine applies; labels materialize only in the TopN output.
    // Tracked via Dedup.tcache so Bench/Verify release it between runs.
    val pairs = graft.llm.Dedup.tcache(
      s,
      lineitem
        .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
        .groupBy(
          (col("o_custkey") * 2).as("ca"),
          (col("l_suppkey") * 2 + 1).as("sb")
        )
        .agg(count(lit(1)).as("w"))
    )
    val und = pairs
      .select(col("ca").as("src"), col("sb").as("dst"), col("w"))
      .unionAll(pairs.select(col("sb").as("src"), col("ca").as("dst"), col("w")))
    // out-weight attached once and FOLDED into a normalized contribution
    // weight w/wout at cache time: the cached frame is 3 narrow columns
    // and each iteration multiplies instead of re-dividing exact
    // integers — same IEEE result (w/wout each iteration vs once is the
    // identical double), smaller cache, less per-iteration work. The
    // und⋈wout equi-join leaves its output hash-partitioned on src and
    // the cache preserves that layout, so every iteration's join reuses
    // it and only the node-sized rank frame shuffles.
    val wout = und.groupBy("src").agg(sum("w").as("wout"))
    // The layout the scaladoc promises is made EXPLICIT here (r16): left
    // to the planner, the und⋈wout equi-join broadcasts the node-sized
    // wout, which leaves the cached frame with the UNION's (unknown)
    // partitioning — and every power iteration then re-ran Exchange+Sort
    // over the cached edge frame (the before plan's
    // `Sort+Exchange+InMemoryTableScan` join arm). The MERGE hint makes
    // the build join itself sort-merge: its output is already
    // hash-partitioned AND sorted by src, the cache preserves both, and
    // each iteration's join consumes the cache as-is — only the
    // node-sized rank frame shuffles per round (guide §2.4). The build
    // pays the one src-exchange it needed anyway instead of the
    // iterations re-paying it every round.
    val edges = graft.llm.Dedup.tcache(
      s,
      und
        .hint("merge")
        .join(wout, "src")
        .select(
          col("src"),
          col("dst"),
          (col("w").cast("double") / col("wout").cast("double")).as("wn")
        )
    )
    val nodes = und.select(col("src").as("node")).distinct()
    // |V| via bipartite identity: node ids are disjoint by parity, so
    // |V| = |distinct customers| + |distinct suppliers| — ONE pass over
    // the small cached pair frame, not a distinct over the 2×-unioned
    // edge frame
    val n = pairs
      .agg((countDistinct("ca") + countDistinct("sb")).as("n"))
      .head()
      .getLong(0)
    val base = 0.15 / n // same IEEE division the oracle performs
    var r = nodes.select(col("node"), (lit(1.0) / n).as("r"))
    for (_ <- 1 to 3) {
      r = edges
        .join(r, edges("src") === r("node"))
        .groupBy(col("dst").as("node"))
        .agg(
          round(
            lit(base) + lit(Damping) * sum(col("r") * col("wn")),
            12
          ).as("r")
        )
        .select(col("node"), col("r"))
    }
    // top-N via orderBy+limit (TakeOrderedAndProject: per-partition heaps
    // over the |V|-sized rank frame — not a single-task global window);
    // the rank window then numbers only the TopN survivors
    val out = r
      .orderBy(desc("r"), col("node"))
      .limit(TopN)
      .withColumn(
        "pos",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(desc("r"), col("node"))
        )
      )
      .select(
        col("pos"),
        when(col("node") % 2 === 0, concat(lit("C"), expr("node div 2")))
          .otherwise(concat(lit("S"), expr("(node - 1) div 2")))
          .as("node"),
        (round(col("r"), 8) + lit(0d)).as("rank")
      )
      .orderBy("pos")
    out
  }

  /** q80: triangle counting over the supplier co-occurrence graph
    * (suppliers appearing in the same order are connected) — the graph
    * statistic behind clustering-coefficient / community-density
    * signals, and the classic test of whether a distributed engine can
    * do better than the naive 3-way self-join.
    *
    * Scale shape — degree-ordered orientation (the standard trick):
    * orient every undirected edge from its lower-(degree, id) endpoint
    * to the higher one. Every triangle then has EXACTLY ONE node with
    * two out-edges, so counting (wedge ⋈ closing-edge) over the
    * DIRECTED frame counts each triangle once, and the wedge frame is
    * Σ C(outdeg⁺, 2) where orientation bounds outdeg⁺ at O(√m) — a hub
    * with a million co-occurrences contributes ~no wedges because its
    * edges all point INTO it. The naive undirected wedge join is
    * Σ C(deg, 2), quadratic in the hub degree; orientation is the
    * difference between a bounded shuffle and a blown-up one at 100 TB.
    * The triangle COUNT is orientation-invariant, so the oracle replays
    * the naive a<b<c 3-way join and must land on the same integer.
    *
    * Everything is exact integer arithmetic; the edge-building self-join
    * is bounded per order by (items-per-order choose 2), never by
    * corpus size.
    */
  /** Canonical thresholded co-occurrence edges (a < b by id), shared by
    * q80/q80b. ONE corpus shuffle: per-order supplier sets are assembled
    * with collect_set (items-per-order is bounded by order size, so the
    * arrays are tiny and skew-free) and pairs expand MAP-SIDE inside the
    * sorted array — vs the previous self-join spelling, which shuffled
    * the fact frame twice and hash-joined it against itself. Edges are
    * kept only when the pair co-occurs MORE than the average pair does —
    * the data-adaptive support threshold that yields real structure at
    * any SF (a fixed absolute cutoff is complete-graph at one scale and
    * empty at another). avg is sum/count of exact integers,
    * IEEE-identical on both engines.
    */
  /** The raw per-order co-occurring supplier pair stream (a < b
    * canonical by the sorted-array construction) — ONE map-side expand,
    * no shuffle; shared by the exact build (which counts ALL of it) and
    * the q80b sampled build (which filters it by pair key FIRST, so the
    * count shuffle itself shrinks by the sampling rate).
    */
  private def pairStream(s: SparkSession, dir: String): DataFrame = {
    // hash-spread (r16, Tables.spread note): the single-row-group
    // lineitem scan pins the collect_set partial aggregate to one task
    // otherwise; q80b re-pays this build cold every reading
    val grouped = Tables
      .spread(
        Tables
          .table(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")),
        "ok"
      )
      .groupBy("ok")
      .agg(sort_array(collect_set("sk")).as("s"))
    // (s[i], s[j]) for i < j: the array is sorted, so pairs are canonical
    // a < b by construction
    grouped
      .select(
        explode(
          expr(
            "flatten(transform(s, (x, i) -> " +
              "transform(slice(s, i + 2, size(s)), y -> struct(x AS a, y AS b))))"
          )
        ).as("p")
      )
      .select(col("p.a").as("a"), col("p.b").as("b"))
  }

  private def cooccurrenceEdges(s: SparkSession, dir: String): DataFrame =
    weightedCooccurrenceEdges(s, dir).select("a", "b")

  /** The thresholded co-occurrence graph WITH its count weight — q148's
    * edge lengths; q80/q80b/q106 drop the weight via cooccurrenceEdges.
    */
  private def weightedCooccurrenceEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = pairStream(s, dir)
    // the counted frame feeds BOTH the avg threshold and the filter, and
    // q80/q80b/q106/q148 all build from it — cache it once per
    // (session, dir) like the q26/q27 shingle corpus: in production the
    // co-occurrence graph is computed once and consumed by many graph
    // queries, so the one-time build is amortized (Bench reports it
    // untimed as edge_warm_sec, the shingle_warm_sec convention)
    val counted = cachedPairCounts.synchronized {
      cachedPairCounts.getOrElseUpdate(
        (s, dir),
        pairs.groupBy("a", "b").agg(count(lit(1)).as("c")).cache()
      )
    }
    counted
      .crossJoin(broadcast(counted.agg(avg("c").as("cavg"))))
      .filter(col("c") > col("cavg"))
      .select("a", "b", "c")
  }

  /** One cached co-occurrence pair-count frame per (session, dir) —
    * the q80/q80b shared edge source (the Dedup.shingleCache pattern).
    */
  private val cachedPairCounts =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  /** Materialize the shared co-occurrence counts outside a timed region
    * (Bench), so q80/q80b numbers measure the triangle operators, not
    * the one-time graph build they share with each other (and with any
    * other co-occurrence consumer) in a long-lived session.
    */
  def warmEdges(s: SparkSession, dir: String): Unit = {
    cooccurrenceEdges(s, dir) // populates the cache as a side effect
    cachedPairCounts.synchronized(cachedPairCounts((s, dir))).foreach(_ => ())
  }

  /** Unpersist this module's session caches (Bench/Verify end-of-run). */
  def releaseCaches(s: SparkSession): Unit = {
    cachedPairCounts.synchronized {
      cachedPairCounts.filterInPlace { case ((sess, _), df) =>
        if (sess eq s) { df.unpersist(); false } else true
      }
    }
    trackedRdds.synchronized {
      trackedRdds.filterInPlace { case ((sess, _), rdd) =>
        if (sess eq s) { rdd.unpersist(); false } else true
      }
    }
  }

  /** Final-round RDDs of iterative queries (q151) — persisted so the
    * caller can consume the result without recomputing the loop, and
    * released with the module's other session caches. Keyed by
    * (session, query) with replace-and-unpersist semantics (the
    * cachedPairCounts convention): re-invoking the same query in one
    * session — e.g. the bench's median-of-3 — releases the superseded
    * round's blocks instead of accumulating them.
    */
  private val trackedRdds =
    scala.collection.mutable.Map
      .empty[(SparkSession, String), org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]

  private def trackRdd(
      s: SparkSession,
      query: String,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]
  ): Unit =
    trackedRdds.synchronized {
      trackedRdds.put((s, query), rdd).foreach(_.unpersist())
    }

  /** Materialize a round as a persisted row RDD + a frame over it — the
    * q50 loop discipline (unlike `localCheckpoint`, the RDD can be
    * unpersisted to release the superseded round's blocks).
    */
  private def checkpointRound(
      df: DataFrame
  ): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val rdd =
      df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** (n_nodes, n_edges, n_triangles) for a canonical a<b edge frame via
    * the EDGE-ITERATOR algorithm: orient low-(degree, id) → high, build
    * each node's out-neighbor array, and count per directed edge (u, v)
    * the intersection |N⁺(u) ∩ N⁺(v)| — every triangle has exactly one
    * node with two out-edges, so each is counted once. The intersection
    * happens INSIDE a codegen'd expression (array_intersect) on
    * node-sized adjacency arrays: unlike the wedge-join spelling, the
    * Σ C(outdeg⁺, 2) wedge frame (28.7M rows at sf0.1, super-linear in
    * density) is never materialized or shuffled — the only shuffled
    * frames are edge-sized and node-sized, which is what survives a
    * 100× scale-up. Orientation still bounds the per-edge work: both
    * arrays are out-neighbor lists, O(√m) long at the worst hub.
    * `edges` must be cached by the caller (three consumers).
    */
  private def triangleStats(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    // materialize the caller's cached edge frame before the fan-out: the
    // three crossJoined output aggregates (and the multi-arm joins
    // below) otherwise race the unpopulated cache from concurrent AQE
    // stages and each re-runs the edge build (the Dedup bandedBuckets
    // race note)
    edges.count()
    val deg = edges
      .select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v")
      .agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) → high-(deg, id); deg is node-sized, AQE
    // picks the broadcast side
    // cached + materialized (r16): directed feeds BOTH perEdge join arms
    // plus the adjacency build — three concurrent consumers that each
    // re-ran the two orientation joins when left lazy
    val directed = graft.llm.Dedup.tcache(
      s,
      edges
        .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
        .select(
          when(
            col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("src"), col("b").as("dst"))
          ).otherwise(struct(col("b").as("src"), col("a").as("dst")))
            .as("e")
        )
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    )
    directed.count()
    // cached + materialized: both perEdge arms consume the adjacency
    // frame; node-sized (arrays total Σ outdeg = m longs)
    val adj = graft.llm.Dedup.tcache(
      s,
      directed
        .groupBy("src")
        .agg(sort_array(collect_list("dst")).as("nbrs"))
    )
    adj.count()
    // inner joins drop edges whose endpoint has no out-neighbors — those
    // close no triangle at that edge, so the sum is unchanged; coalesce
    // covers the all-dropped (e.g. star-graph) case
    val perEdge = directed
      .join(adj.select(col("src").as("src"), col("nbrs").as("nu")), "src")
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), "dst")
      .select(size(array_intersect(col("nu"), col("nv"))).cast("long").as("k"))
    deg
      .agg(count(lit(1)).as("n_nodes"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .crossJoin(
        perEdge.agg(coalesce(sum("k"), lit(0L)).as("n_triangles"))
      )
  }

  private def q80(s: SparkSession, dir: String): DataFrame =
    triangleStats(graft.llm.Dedup.tcache(s, cooccurrenceEdges(s, dir)))

  /** q80b: DOULION-style sampled triangle estimate — the documented
    * 100 TB swap-in for q80, with the sampling applied where it saves
    * real work: the PAIR STREAM is filtered by a deterministic hash keep
    * on the pair key (p = 1/5 via the q43 md5-bucket convention — never
    * rand(), so the sample is identical across engines, retries, and
    * re-runs) BEFORE the groupBy count, so the dominant corpus-sized
    * count shuffle itself shrinks by p; kept keys retain their EXACT
    * counts (key-sampling, not occurrence-sampling). The support
    * threshold is recomputed on the sampled counts — a uniform key
    * sample, so avg(c) is an unbiased estimate of the full-graph
    * threshold (error measured in SCALE.md alongside the triangle
    * estimator's). The edge-iterator count then runs on the sparsified
    * graph and scales by 1/p³ = 125 (Tsourakakis et al., DOULION,
    * KDD'09; relative error O(1/√(p³·T))). Unlike the round-9 spelling,
    * NOTHING here touches the full pair-count frame — q80b cold is
    * strictly cheaper than q80 cold, which is what a swap-in is for.
    * All-integer output (125·count), so the gate hash-checks exactly.
    */
  private def q80b(s: SparkSession, dir: String): DataFrame = {
    // cached (released per Bench iteration): the sampled counts feed the
    // threshold aggregate AND the edge filter — the exact path's
    // `counted` convention at 1/5 the size
    val sampledCounts = graft.llm.Dedup.tcache(
      s,
      pairStream(s, dir)
        .filter(
          graft.llm.Sampling.bucket100(concat_ws(",", col("a"), col("b"))) < 20
        )
        .groupBy("a", "b")
        .agg(count(lit(1)).as("c"))
    )
    // materialize both caches in order (r16): triangleStats' three
    // crossJoined aggregates (and the edge-iterator's own multi-branch
    // joins) otherwise race the unpopulated caches from concurrent AQE
    // stages, each re-running the full corpus pair stream + md5 keep
    // (the Dedup bandedBuckets race note; measured ~20 duplicate
    // pair-count jobs in one q80b run).
    sampledCounts.count()
    val sampled = graft.llm.Dedup.tcache(
      s,
      sampledCounts
        .crossJoin(broadcast(sampledCounts.agg(avg("c").as("cavg"))))
        .filter(col("c") > col("cavg"))
        .select("a", "b")
    )
    sampled.count()
    triangleStats(sampled)
      .select(
        col("n_nodes"),
        col("n_edges"),
        col("n_triangles").as("n_triangles_sampled"),
        (col("n_triangles") * 125).as("est_triangles")
      )
  }

  /** q106: recursive CTE (WITH RECURSIVE, new in Spark 4.x) — the
    * hierarchical/reachability SQL surface the DataFrame loop queries
    * (q50's checkpointed label propagation, q71's unrolled power
    * iterations) express imperatively: BFS hop levels from the
    * smallest supplier over the thresholded co-occurrence graph, depth
    * ≤ 2, entirely inside ONE declarative SQL statement. Spark plans
    * each recursion step as a join against the previous frontier (a
    * UnionLoop in the plan), so per-step work is frontier×degree-
    * bounded — the frontier is never collected to the driver, unlike a
    * driver-side BFS loop.
    *
    * Semantics: the naive UNION ALL recursion re-reaches nodes along
    * every path, so the outer min(hops) per node is what makes the
    * result the BFS level function; depth is capped at 2 because the
    * co-occurrence graph is dense (avg degree ~430 at sf0.1 — level
    * explosion is a property of THIS graph's density, documented, not
    * of the operator). Output: per hop level, node count + id extremes
    * + an exact id checksum. All integers; the seed (min node id) is
    * deterministic on both engines.
    */
  private def q106(s: SparkSession, dir: String): DataFrame = {
    val edges = cooccurrenceEdges(s, dir)
    edges
      .select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .createOrReplaceTempView("graft_q106_und")
    s.sql(
      """WITH RECURSIVE reach(node, hops) AS (
        |  SELECT (SELECT min(src) FROM graft_q106_und) AS node, 0 AS hops
        |  UNION ALL
        |  SELECT u.dst AS node, r.hops + 1 AS hops
        |  FROM reach r JOIN graft_q106_und u ON u.src = r.node
        |  WHERE r.hops < 2),
        |lvl AS (SELECT node, min(hops) AS hops FROM reach GROUP BY node)
        |SELECT hops, count(*) AS n_nodes,
        |  min(node) AS min_node, max(node) AS max_node,
        |  sum(node) AS node_sum
        |FROM lvl GROUP BY hops ORDER BY hops""".stripMargin
    )
  }

  /** q148: bounded-hop WEIGHTED single-source shortest paths — the
    * routing/centrality primitive q106's unweighted BFS cannot express
    * (cheapest multi-hop connection, not fewest hops). Edge length =
    * the co-occurrence count (exact integer), source = the smallest
    * node id, bound = 3 edges. Three SYNCHRONOUS Bellman-Ford rounds:
    * dist_k(v) = min cost over paths of ≤ k edges — each round joins
    * the start-of-round distance frame against the cached edge frame
    * and takes a per-node min, so round k+1 never sees round k+1's own
    * improvements (exactly the ≤-k-edges semantics the oracle's
    * hop-bounded path enumeration defines). All arithmetic is exact
    * integers; the top-20 output orders by (dist, node) — a total
    * order, node ids are unique.
    *
    * Scale shape: the edge frame is built/cached once (shared with
    * q80/q106 via cachedPairCounts); each round shuffles only the
    * NODE-sized distance frame (one equi-join + one partial-aggregated
    * min). Fixed 3 rounds ⇒ shallow lineage, no checkpoint needed
    * (q50's checkpointed loop is the unbounded variant). At 100 TB the
    * frontier frame stays ≪ edges, the Pregel SSSP shape expressed
    * declaratively.
    */
  private def q148(s: SparkSession, dir: String): DataFrame = {
    val e = weightedCooccurrenceEdges(s, dir)
    val und = graft.llm.Dedup.tcache(
      s,
      e.select(col("a").as("src"), col("b").as("dst"), col("c").as("w"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst"), col("c").as("w")))
    )
    // materialize: the source-seed aggregate and round-1's join race the
    // unpopulated cache otherwise (bandedBuckets race note)
    und.count()
    var dist = und
      .agg(min("src").as("node"))
      .withColumn("dist", lit(0L))
    for (_ <- 1 to 3) {
      val d = dist.select(col("node").as("u"), col("dist").as("du"))
      val relaxed = d
        .join(und, d("u") === und("src"))
        .select(col("dst").as("node"), (col("du") + col("w")).as("dist"))
      dist = dist
        .unionAll(relaxed)
        .groupBy("node")
        .agg(min("dist").as("dist"))
    }
    dist.orderBy("dist", "node").limit(20)
  }

  /** q151: k-core decomposition (k = 3) — the standard dense-substructure
    * screen (community seeds, spam-ring candidates, "remove the
    * dangling fringe before expensive graph analytics"): iteratively
    * drop every node whose degree falls below k until fixpoint; emit
    * each surviving node with its degree INSIDE the core subgraph.
    * The base graph is q71's customer–supplier bipartite (even/odd
    * node encoding) thresholded at ≥ 3 shared orders: the supplier
    * co-occurrence graph is near-complete (min degree 30 at sf0.01),
    * so a small-k core there is vacuous, while the bipartite peel
    * genuinely CASCADES — dropping thin customers starves suppliers,
    * which drops more customers (5 rounds to fixpoint at sf0.01).
    *
    * Scale shape: the loop state is the symmetrized edge frame, which
    * only SHRINKS; each round is one node-sized degree aggregate plus
    * two semi-joins, with the superseded round's blocks released and
    * convergence detected by the edge count reaching a fixpoint (the
    * q50 loop discipline — and like q50 it THROWS past maxRounds, so
    * the gate can never silently emit a non-fixpoint). The ORACLE
    * unrolls the same peel as an 8-round WITH chain — sound because
    * peeling is monotone (a fixpoint is invariant under further
    * rounds); KCoreSpec pins convergence well under 8 on this corpus
    * and replays the peel naively.
    */
  private def q151(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    val maxRounds = 8
    val e = Tables
      .table(s, dir, "lineitem")
      .join(Tables.table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        (col("o_custkey") * 2).as("bu"),
        (col("l_suppkey") * 2 + 1).as("bv")
      )
      .agg(countDistinct("o_orderkey").as("w"))
      .filter(col("w") >= 3)
    var (cur, curRdd) = checkpointRound(
      e.select(col("bu").as("u"), col("bv").as("v"))
        .unionAll(e.select(col("bv").as("u"), col("bu").as("v")))
    )
    var prevEdges = cur.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val keep = cur
        .groupBy("u")
        .agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select("u")
      val (next, nextRdd) = checkpointRound(
        cur
          .join(keep, Seq("u"), "left_semi")
          .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
          .select("u", "v")
      )
      val nEdges = next.count()
      converged = nEdges == prevEdges
      prevEdges = nEdges
      curRdd.unpersist()
      cur = next
      curRdd = nextRdd
      round += 1
    }
    if (!converged) {
      curRdd.unpersist()
      throw new IllegalStateException(
        s"k-core peel did not converge within $maxRounds rounds — the " +
          "unrolled oracle would be unsound; raise maxRounds (and the " +
          "oracle's unroll depth) together"
      )
    }
    trackRdd(s, "q151", curRdd)
    cur
      .groupBy("u")
      .agg(count(lit(1)).as("core_degree"))
      .select(
        when(col("u") % 2 === 0, concat(lit("C"), expr("u div 2")))
          .otherwise(concat(lit("S"), expr("(u - 1) div 2")))
          .as("node"),
        col("core_degree")
      )
      .orderBy("node")
  }

  // ------------------------- q181: Adamic–Adar link prediction scores

  /** q181: Adamic–Adar link prediction over the co-occurrence graph —
    * "which supplier pairs that have never co-served an order are most
    * LIKELY to?" (recommendation/anomaly triage on any co-occurrence
    * graph): for each non-adjacent pair (a, b),
    * AA = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z) — a shared RARE partner
    * (low-degree z) is strong evidence, a hub partner is weak. Top-20
    * by score.
    *
    * Determinism: 1/ln(deg z) is floor-snapped to the 1e-9 grid per
    * CENTER (one ln per node, q174's ln convention), so pair scores
    * are EXACT BIGINT sums and the top-20 order (score9 desc, a, b)
    * can never split on a float ulp; the emitted double is the one
    * gridded division.
    *
    * Scale shape: wedge enumeration is MAP-SIDE — per center, the
    * sorted neighbor array expands its a<b pairs inline (the
    * pairStream array trick, spelled as two Generate stages — see the
    * body comment; the first spelling self-joined und⋈und on the
    * center and measured 15.7 s at sf0.1 where this measures 6.6 s:
    * the dense thresholded graph has Σ deg²/2 ≈ 92M wedges over a
    * ≤500k pair space, so the wedge stream must flow straight into
    * the partial aggregate, never through a join shuffle — generation
    * is now ~1 s and the remaining cost IS that partial aggregate,
    * the irreducible Σ deg² term exact AA pays); one (a, b)
    * hash aggregate (map-side combined against the small pair space),
    * a left_anti against the edge set, and a TakeOrdered top-20;
    * degrees/weights ride the node-sized array frame.
    */
  private def q181(s: SparkSession, dir: String): DataFrame =
    adamicAdar(s, dir, samplePct = 100)

  /** The q181 computation with its dense-graph swap-in as CODE, not
    * prose (the q159/q160 convention): `samplePct < 100` keeps only
    * the md5-bucketed fraction of CENTERS and scales each kept
    * center's grid weight by 100/samplePct — an unbiased Horvitz–
    * Thompson estimate of every pair score whose wedge stream shrinks
    * by the sampling rate BEFORE the aggregate (the q80b DOULION
    * pattern, applied to centers because AA's cost is Σ deg² over
    * centers). On THIS corpus the thresholded co-occurrence graph
    * densifies with SF (the measured sweep: 0.84 s → 6.87 s per 10×
    * data, wedge count ~1000×), so the sampled path is the production
    * spelling wherever the graph is dense/hub-heavy; natural sparse
    * graphs keep the exact path. Deterministic: the md5 center keep
    * is the q43 hash, so the estimate is a FIXED value, not a random
    * one — AdamicAdarSampleSpec pins its top-20 overlap with the
    * exact gate. The exact form stays the GATE (hash-checkable).
    */
  private[graft] def adamicAdar(
      s: SparkSession,
      dir: String,
      samplePct: Int
  ): DataFrame = {
    val e = graft.llm.Dedup.tcache(s, cooccurrenceEdges(s, dir))
    val und = e
      .select(col("a").as("z"), col("b").as("n"))
      .union(e.select(col("b").as("z"), col("a").as("n")))
    val arr0 = und
      .groupBy("z")
      .agg(sort_array(collect_set(col("n"))).as("ns"))
      .withColumn("deg", size(col("ns")))
      .filter(col("deg") >= 2) // deg-1 centers form no wedge; ln(1)=0
    val arr = (if (samplePct >= 100) arr0
               else
                 arr0.filter(
                   graft.llm.Sampling.bucket100(col("z")) < samplePct
                 ))
      .withColumn(
        "w9",
        expr(
          s"CAST(floor(1.0e9 / ln(CAST(deg AS DOUBLE)) * (100.0 / $samplePct)) AS BIGINT)"
        )
      )
    // (ns[i], ns[j]) for i < j via TWO Generate stages (posexplode the
    // anchor, then explode the tail slice): the sorted array makes
    // pairs canonical a < b, and no row ever materializes more than a
    // deg-sized slice — the single-stage nested-struct flatten builds
    // a deg²/2-struct array per center row (145k structs at deg=540)
    // and measured 11.3 s of pure generation at sf0.1 vs 0.98 s for
    // this spelling (the q159 materialize-in-chunks lesson)
    val wedges = arr
      .select(col("w9"), col("ns"), posexplode(col("ns")).as(Seq("i", "a")))
      .select(
        col("a"),
        explode(expr("slice(ns, i + 2, size(ns))")).as("b"),
        col("w9")
      )
    wedges
      .groupBy("a", "b")
      .agg(sum(col("w9")).as("score9"), count(lit(1)).as("common_neighbors"))
      .join(e, Seq("a", "b"), "left_anti")
      .orderBy(col("score9").desc, col("a"), col("b"))
      .limit(20)
      .select(
        col("a"),
        col("b"),
        col("common_neighbors"),
        col("score9"),
        (round(col("score9").cast("double") / 1.0e9, 6) + 0.0).as("aa_score")
      )
  }

  // --------------------- q182: local clustering coefficient per node

  /** q182: local clustering coefficient — "how clique-like is each
    * node's neighborhood?" (2·T(v)/(deg·(deg−1))), the per-node
    * refinement of q80's global triangle census: a high-degree node
    * with coefficient ≈ 0 is a pure hub/broker, ≈ 1 is an embedded
    * community member — the first structural triage on any
    * co-occurrence graph. One row per node of degree ≥ 2, ordered by
    * node id (node-set-sized output, never pair-sized).
    *
    * Scale shape (r16 rework — the r15 verdict flagged this as the one
    * graph gate without a dense-graph story): wedges are generated
    * MAP-SIDE from each center's sorted neighbor array (the q181
    * two-stage posexplode + tail-slice explode), and the closing join
    * BROADCASTS the canonical a<b edge set (pair-space-bounded — the
    * same catalog² argument q181's left_anti rides), so the Σ deg²/2
    * wedge stream flows straight through a broadcast-hash probe into
    * the per-center partial aggregate WITHOUT EVER SHUFFLING — the
    * previous und⋈und spelling shuffled all 92M wedges at sf0.1. The
    * only shuffled frames are node-sized. The coefficient is a single
    * division of exact integers (correctly-rounded IEEE — identical on
    * both engines).
    */
  private def q182(s: SparkSession, dir: String): DataFrame =
    clusteringCoeff(s, dir, samplePct = 100)

  /** The q182 computation with its dense-graph swap-in as CODE, not
    * prose (the q181/q159/q160 convention): `samplePct < 100` keeps
    * only the md5-bucketed fraction of each center's WEDGES (keyed on
    * the full (z, a, b) wedge identity, so the kept set is a fixed
    * deterministic value) and estimates the coefficient as the ratio
    * closed-sampled / sampled — the per-node mean of the closure
    * indicator over a uniform wedge subsample, unbiased by the same
    * argument as q181's center-sampled HT totals (a coefficient IS a
    * per-node mean). The wedge stream — the Σ deg² term that owns this
    * query's cost on a densifying corpus — shrinks by the sampling
    * rate BEFORE the probe and aggregate. The sampled `triangles`
    * column reports the SAMPLED closure count, unscaled (documented,
    * not an estimate of T(v)); a center whose wedges are all sampled
    * away emits a NULL coefficient rather than a fabricated 0.
    * ClusteringCoeffSampleSpec pins samplePct=100 ≡ the gate and the
    * 50% estimate against the exact coefficients. The exact form stays
    * the GATE (hash-checkable).
    */
  private[graft] def clusteringCoeff(
      s: SparkSession,
      dir: String,
      samplePct: Int
  ): DataFrame = {
    val e = graft.llm.Dedup.tcache(s, cooccurrenceEdges(s, dir))
    val und = e
      .select(col("a").as("z"), col("b").as("n"))
      .union(e.select(col("b").as("z"), col("a").as("n")))
    val arr = und
      .groupBy("z")
      .agg(sort_array(collect_set(col("n"))).as("ns"))
      .withColumn("deg", size(col("ns")))
      .filter(col("deg") >= 2)
    val wedges0 = arr
      .select(col("z"), col("ns"), posexplode(col("ns")).as(Seq("i", "a")))
      .select(
        col("z"),
        col("a"),
        explode(expr("slice(ns, i + 2, size(ns))")).as("b")
      )
    val wedges =
      if (samplePct >= 100) wedges0
      else
        wedges0.filter(
          graft.llm.Sampling
            .bucket100(concat_ws(":", col("z"), col("a"), col("b"))) < samplePct
        )
    val per = wedges
      .join(broadcast(e.withColumn("closed", lit(1L))), Seq("a", "b"), "left")
      .groupBy("z")
      .agg(
        count(lit(1)).as("wedges_seen"),
        sum(coalesce(col("closed"), lit(0L))).as("triangles")
      )
    val out = arr.select(col("z"), col("deg")).join(per, Seq("z"), "left")
    val coeff =
      if (samplePct >= 100)
        // exact: wedges_seen = C(deg,2) by construction, so the gate
        // keeps its original 2T/(deg(deg−1)) spelling bit-for-bit
        round(
          (coalesce(col("triangles"), lit(0L)) * 2).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"),
          6
        ) + 0.0
      else
        round(
          coalesce(col("triangles"), lit(0L)).cast("double") /
            nullif(col("wedges_seen").cast("double"), lit(0.0d)),
          6
        ) + 0.0
    out
      .select(
        col("z").as("node"),
        col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        coeff.as("clustering_coeff")
      )
      .orderBy("node")
  }

  // --------------- q207: degree assortativity coefficient

  /** q207: Newman's degree assortativity r — "do hubs link to hubs?"
    * — the one-number mixing summary read BEFORE trusting any
    * sampled/pruned graph computation (q80b, q181's HT sampling): a
    * disassortative graph (r < 0, hubs link to leaves) degrades very
    * differently under center sampling than an assortative one.
    * r = Pearson correlation of (deg(u), deg(v)) over directed edge
    * ends (each undirected edge counted in both orientations — the
    * standard convention, which makes Σx = Σy by symmetry; the dag
    * keeps the general spelling).
    *
    * Determinism: degrees are exact integers; the five moments are
    * DECIMAL(38) exact sums (deg² products overflow BIGINT at ~10⁵
    * avg-degree hubs) cast once; r is a single √-and-divide dag with
    * the nullif degeneracy guard (a regular graph has zero variance).
    *
    * Scale shape: the degree frame is node-sized, the two joins key
    * the edge list by endpoint (shuffle = 2m rows of two ints), the
    * moment aggregate is map-side partial — nothing beyond O(m).
    */
  private def q207(s: SparkSession, dir: String): DataFrame = {
    val e = graft.llm.Dedup.tcache(s, cooccurrenceEdges(s, dir))
    val und = e
      .select(col("a").as("z"), col("b").as("n"))
      .union(e.select(col("b").as("z"), col("a").as("n")))
    val deg = und.groupBy("z").agg(count(lit(1)).as("deg"))
    val ends = und
      .join(deg.select(col("z"), col("deg").as("x")), "z")
      .join(deg.select(col("z").as("n"), col("deg").as("y")), "n")
    ends
      .agg(
        count(lit(1)).as("m2"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double").as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double").as("sxy"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double").as("syy")
      )
      .select(
        expr("m2 div 2").as("n_edges"),
        (round(
          (col("m2").cast("double") * col("sxy") - col("sx") * col("sy")) /
            nullif(
              sqrt(
                (col("m2").cast("double") * col("sxx") - col("sx") * col("sx")) *
                  (col("m2").cast("double") * col("syy") - col("sy") * col("sy"))
              ),
              lit(0.0d)
            ),
          6
        ) + 0.0).as("assortativity")
      )
  }

  // --------------- q220: HITS hubs and authorities

  /** q220: HITS (hubs & authorities) on the DIRECTED customer→supplier
    * trade graph — the second classic eigen-centrality next to q71's
    * PageRank, and the one that actually fits a bipartite buy/sell
    * graph: a good hub (customer) is one that buys from good
    * authorities (suppliers), a good authority is one bought from by
    * good hubs — two mutually-recursive scores where PageRank's single
    * score conflates the two roles. Kleinberg's iteration, TWO full
    * rounds (authority update then hub update each), L1-normalized
    * each half-step, uniform init.
    *
    * Determinism: scores live on a 1e-12 integer grid end to end —
    * each half-step is an exact BIGINT sum of the opposite side's
    * gridded scores over the edge list, renormalized by EXACT
    * DECIMAL(38) floor-division (raw·10¹² div total), so every
    * iteration is engine-exact with no float sum anywhere (the
    * q192/q197 grid convention, here with integer renormalization
    * replacing the norm dag). Top-10 per role ordered by (gridded
    * score desc, node) — no ulp can move the cut.
    *
    * Scale shape: the distinct pair frame builds once (q71's cached
    * builder shape); each half-step is one equi-join of the edge list
    * against a node-sized score frame + one partial-aggregated groupBy
    * — the Pregel message-passing shape, fixed 4 half-steps, shallow
    * lineage. Output 20 rows.
    */
  private def q220(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(s, dir, "orders")
    val lineitem = Tables.table(s, dir, "lineitem")
    // DUAL-LAYOUT edge cache (r16, guide §2.4): the two half-steps join
    // the edge list on DIFFERENT keys (authority update on cu, hub
    // update on su), so a single cache satisfies at most one of them and
    // the other re-shuffled the edge frame every round (the before
    // plan's Sort+Exchange over InMemoryTableScan in each half-step).
    // Caching the distinct pair frame twice — once partitioned+sorted by
    // each key — is the standard Pregel dual-layout for bipartite
    // message passing: the one-time second repartition is paid at build,
    // and all 4 half-step joins then consume a cache as-is, shuffling
    // only node-sized score frames.
    val pairsDistinct = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .select(col("o_custkey").as("cu"), col("l_suppkey").as("su"))
      .distinct()
    val edgesByCu = graft.llm.Dedup.tcache(
      s,
      pairsDistinct.repartition(col("cu")).sortWithinPartitions("cu")
    )
    // materialize byCu before bySu derives from it, and both before the
    // half-step fan-out: the score-init distinct and the round-1 join
    // otherwise race the unpopulated cache from concurrent AQE stages
    // (the Dedup bandedBuckets race note)
    edgesByCu.count()
    val edgesBySu = graft.llm.Dedup.tcache(
      s,
      edgesByCu.repartition(col("su")).sortWithinPartitions("su")
    )
    edgesBySu.count()
    val G = 1000000000000L // the 1e-12 score grid
    // renormalize a raw DECIMAL(38) score sum to the grid: raw·10¹²
    // div total — exact integer arithmetic on both engines (the sums
    // ride DECIMAL(38): gridded scores × edge count overflows BIGINT
    // at ~10⁷-edge graphs)
    def renorm(df: DataFrame, key: String, raw: String): DataFrame =
      df.crossJoin(broadcast(df.agg(sum(col(raw)).as("tot"))))
        .select(
          col(key),
          expr(s"CAST($raw * $G div tot AS BIGINT)").as("sc")
        )
    // each half-step's raw-sum frame is CACHED before renorm: renorm
    // references its input twice (total + join), so an uncached chain
    // doubles the logical subtree per half-step — the q197 lineage-
    // blowup failure mode (measured 9.7 s at sf0.001 for 4 half-steps
    // vs ~0.5 s cached). The cached frames are node-sized.
    var h = edgesByCu.select(col("cu")).distinct().withColumn("sc", lit(G))
    var a: DataFrame = null
    for (_ <- 1 to 2) {
      a = renorm(
        graft.llm.Dedup.tcache(
          s,
          edgesByCu
            .join(h.withColumnRenamed("sc", "hs"), "cu")
            .groupBy("su")
            .agg(sum(col("hs").cast("decimal(38,0)")).as("raw"))
        ),
        "su",
        "raw"
      )
      h = renorm(
        graft.llm.Dedup.tcache(
          s,
          edgesBySu
            .join(a.withColumnRenamed("sc", "as_"), "su")
            .groupBy("cu")
            .agg(sum(col("as_").cast("decimal(38,0)")).as("raw"))
        ),
        "cu",
        "raw"
      )
    }
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("role")
      .orderBy(desc("sc"), col("node"))
    h.select(lit("hub").as("role"), concat(lit("C"), col("cu")).as("node"), col("sc"))
      .unionAll(
        a.select(
          lit("authority").as("role"),
          concat(lit("S"), col("su")).as("node"),
          col("sc")
        )
      )
      .withColumn("pos", row_number().over(wRank))
      .filter(col("pos") <= 10)
      .select(
        col("role"),
        col("pos"),
        col("node"),
        (round(col("sc").cast("double") / 1.0e12, 8) + 0.0).as("score")
      )
      .orderBy("role", "pos")
  }

  // --------------- q221: label-propagation communities

  /** q221: label-propagation community detection over the supplier
    * co-occurrence graph — the linear-time community pass run before
    * any per-community rollup (q50's connected components answer "what
    * is TRANSITIVELY linked"; LPA answers "where is the dense core
    * structure", splitting a connected hairball into its actual
    * clusters): label₀(v) = v, then THREE synchronous rounds of
    * "adopt the most frequent neighbor label", ties broken by the
    * smallest label — the deterministic variant of Raghavan et al.'s
    * algorithm (the standard random-order sweep is irreproducible by
    * construction; synchronous + min-tie-break is what a verifiable
    * pipeline runs).
    *
    * Determinism: label counts are exact integers; the argmax is a
    * row_number over (count desc, label asc) — no float anywhere, no
    * tie a shuffle order can flip.
    *
    * Scale shape: each round is one edge⋈label equi-join, one
    * (node, label) count aggregate, one node-partitioned argmax window
    * (partitions bounded by a node's distinct neighbor labels ≤ deg).
    * Fixed 3 rounds → shallow lineage; the community rollup is
    * node-sized. Output: top-20 communities by (size desc, label).
    */
  private def lpaLabels(s: SparkSession, dir: String): DataFrame = {
    val e = graft.llm.Dedup.tcache(s, cooccurrenceEdges(s, dir))
    val und = e
      .select(col("a").as("z"), col("b").as("n"))
      .union(e.select(col("b").as("z"), col("a").as("n")))
    var lab = und.select(col("z").as("node")).distinct()
      .withColumn("lab", col("node"))
    for (_ <- 1 to 3) {
      val prev = lab.select(col("node").as("n"), col("lab").as("nl"))
      // argmax via max_by over (count, −label) — the identical
      // (count desc, label asc) winner the previous row_number window
      // computed, with a UNIQUE ordering key (the label rides inside
      // it), so no tie exists for max_by to break arbitrarily. One
      // hash aggregate instead of Exchange+Sort+Window per round
      // (guide §2.4 — the window's sort bought nothing but the top-1).
      // prev is node-sized (supplier catalog — the q182 broadcast
      // argument), so the message join never shuffles the edge frame.
      // ONE exchange per round: the message stream repartitions by the
      // center z once, and BOTH aggregates (the (z, label) count and the
      // per-z argmax) then ride that partitioning shuffle-free —
      // hashpartitioning(z) satisfies each one's clustering.
      lab = und
        .join(broadcast(prev), "n")
        .repartition(col("z"))
        .groupBy(col("z"), col("nl").as("lab"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("z").as("node"))
        .agg(max_by(col("lab"), struct(col("c"), -col("lab"))).as("lab"))
    }
    lab
  }

  private def q221(s: SparkSession, dir: String): DataFrame =
    lpaLabels(s, dir)
      .groupBy("lab")
      .agg(count(lit(1)).as("size"), min("node").as("min_node"))
      .orderBy(desc("size"), col("lab"))
      .limit(20)
      .select(
        concat(lit("S"), col("lab")).as("community"),
        col("size"),
        concat(lit("S"), col("min_node")).as("min_node")
      )

  // --------------- q222: modularity of the LPA partition

  /** q222: Newman modularity Q of the q221 label-propagation partition
    * — the quality number that says whether the communities MEAN
    * anything (Q ≈ 0: no better than random wiring given the degree
    * sequence; Q ≳ 0.3: real structure — the accept/reject gate on any
    * community algorithm's output, and the honest companion a gated
    * LPA needs): Q = Σ_c [l_c/m − (d_c/2m)²] with l_c = intra-community
    * edges, d_c = total degree in c, m = |E|.
    *
    * Determinism: spelled as the EXACT BIGINT cross-product
    * Q = (4m·Σl_c − Σd_c²) / (4m²) — numerator exact integers, one
    * final division (no per-community float sum). Shares lpaLabels
    * with q221 — the gated modularity can never drift from the gated
    * partition.
    *
    * Scale shape: two label joins onto the a<b edge frame (edge-
    * sized), one node-sized degree rollup, community-sized sums, a
    * 1-row dag.
    */
  private def q222(s: SparkSession, dir: String): DataFrame = {
    val e = graft.llm.Dedup.tcache(s, cooccurrenceEdges(s, dir))
    // cached (tracked, released per bench iteration): the label frame is
    // referenced THREE times below (la, lb, and the degree rollup) —
    // uncached, the whole 3-round LPA pipeline re-executes per reference
    // (measured 5.3 s at sf0.1 vs ~2.4 s cached; the q197/q220 shared-
    // subtree discipline). The frame is node-sized.
    val lab = graft.llm.Dedup.tcache(s, lpaLabels(s, dir))
    // materialize: WITHOUT this the three consumers below race the
    // unpopulated cache from concurrent AQE stages and each re-runs the
    // whole 3-round LPA (the cache alone did not change the measured
    // time; the barrier is what makes it one run)
    lab.count()
    val la = lab.select(col("node").as("a"), col("lab").as("la"))
    val lb = lab.select(col("node").as("b"), col("lab").as("lb"))
    val intra = e
      .join(la, "a")
      .join(lb, "b")
      .agg(
        count(lit(1)).as("m"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("sum_intra")
      )
    val und = e
      .select(col("a").as("z"), col("b").as("n"))
      .union(e.select(col("b").as("z"), col("a").as("n")))
    val dc = und
      .groupBy("z")
      .agg(count(lit(1)).as("deg"))
      .join(lab.withColumnRenamed("node", "z"), "z")
      .groupBy("lab")
      .agg(sum("deg").as("d_c"))
    val sq = dc.agg(
      count(lit(1)).as("n_communities"),
      sum(col("d_c") * col("d_c")).as("sum_d2")
    )
    intra
      .crossJoin(broadcast(sq))
      .select(
        col("m").as("n_edges"),
        col("n_communities"),
        col("sum_intra"),
        (round(
          (lit(4L) * col("m") * col("sum_intra") - col("sum_d2"))
            .cast("double") /
            (lit(4L) * col("m") * col("m")).cast("double"),
          6
        ) + 0.0).as("modularity")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q220_hits" -> q220,
    "q221_label_propagation" -> q221,
    "q222_modularity" -> q222,
    "q207_assortativity" -> q207,
    "q71_pagerank" -> q71,
    "q80_triangle_count" -> q80,
    "q80b_triangle_sample" -> q80b,
    "q181_adamic_adar" -> q181,
    "q182_clustering_coeff" -> q182,
    "q106_recursive_reachability" -> q106,
    "q148_weighted_sssp" -> q148,
    "q151_kcore" -> q151
  )

  // One power iteration as SQL — contribution spelled r * wn (wn the
  // pre-normalized w/wout, divided ONCE exactly as the Spark cache
  // does) and the update 0.15/N + 0.85 * sum(...), the exact operand
  // order and associativity of the Spark column expression above.
  private def iterSql(prev: String): String =
    s"""SELECT e.dst AS node,
       |    round(0.15 / (SELECT n FROM nn) + 0.85 * sum(p.r * e.wn), 12) AS r
       |  FROM edges e JOIN $prev p ON p.node = e.src
       |  GROUP BY e.dst""".stripMargin

  // One k-core peel round as SQL: keep only edges whose BOTH endpoints
  // still clear the degree bar in the previous round's edge set — the
  // exact semantics of the Spark loop's two semi-joins.
  private def kcorePeelSql(prev: String): String =
    s"""SELECT u, v FROM $prev
       |  WHERE u IN (SELECT u FROM $prev GROUP BY u HAVING count(*) >= 3)
       |    AND v IN (SELECT u FROM $prev GROUP BY u HAVING count(*) >= 3)""".stripMargin

  private val kcoreOracleSql: String = {
    // MATERIALIZED is load-bearing: each round references its
    // predecessor three times (FROM + two IN subqueries); with inlined
    // CTEs the 8-round chain expands to 3^8 scans of the base table
    val rounds = (1 to 8)
      .map(i => s"s$i AS MATERIALIZED (${kcorePeelSql(s"s${i - 1}")})")
      .mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT o_custkey * 2 AS bu, l_suppkey * 2 + 1 AS bv,
       |         count(DISTINCT o_orderkey) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |e AS (SELECT bu, bv FROM pairs WHERE w >= 3),
       |s0 AS MATERIALIZED (
       |  SELECT bu AS u, bv AS v FROM e UNION ALL SELECT bv, bu FROM e),
       |$rounds
       |SELECT CASE WHEN u % 2 = 0 THEN 'C' || (u // 2)
       |            ELSE 'S' || ((u - 1) // 2) END AS node,
       |       CAST(count(*) AS BIGINT) AS core_degree
       |FROM s8 GROUP BY u ORDER BY node""".stripMargin
  }

  // One LPA round as SQL: count neighbor labels, adopt the most
  // frequent with the min-label tie-break — the exact argmax window
  // the Spark loop spells.
  private def lpaRoundSql(prev: String, k: Int): String =
    s"""c$k AS (
       |  SELECT u.z, p.lab AS nl, count(*) AS c
       |  FROM und u JOIN $prev p ON p.node = u.n GROUP BY u.z, p.lab),
       |l$k AS MATERIALIZED (
       |  SELECT z AS node, nl AS lab FROM (
       |    SELECT z, nl,
       |      row_number() OVER (PARTITION BY z ORDER BY c DESC, nl) AS rk
       |    FROM c$k) WHERE rk = 1)""".stripMargin

  private val lpaOracleCtes: String = {
    val rounds = (1 to 3).map(i => lpaRoundSql(s"l${i - 1}", i)).mkString(",\n")
    s"""li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
       |ec AS (SELECT x.sk AS a, y.sk AS b, count(*) AS c
       |       FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk
       |       GROUP BY x.sk, y.sk),
       |e AS (SELECT a, b FROM ec WHERE c > (SELECT avg(c) FROM ec)),
       |und AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
       |l0 AS MATERIALIZED (SELECT DISTINCT z AS node, z AS lab FROM und),
       |$rounds""".stripMargin
  }

  // One HITS half-step as SQL: exact HUGEINT sum of the opposite
  // side's gridded scores, renormalized by exact integer floor-division
  // — the Spark renorm verbatim.
  private def hitsHalfSql(
      out: String,
      in: String,
      key: String,
      joinKey: String
  ): String =
    s"""${out}r AS MATERIALIZED (
       |  SELECT e.$key, CAST(sum(CAST(p.sc AS HUGEINT)) AS HUGEINT) AS raw
       |  FROM e JOIN $in p USING ($joinKey) GROUP BY e.$key),
       |$out AS MATERIALIZED (
       |  SELECT $key,
       |    CAST(raw * 1000000000000 // (SELECT sum(raw) FROM ${out}r)
       |         AS BIGINT) AS sc
       |  FROM ${out}r)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // same distinct directed pair frame, same 1e-12 grid + exact
    // integer renormalization each half-step, same (score, node) top-10
    "q220_hits" -> {
      val steps = Seq(
        hitsHalfSql("a1", "h0", "su", "cu"),
        hitsHalfSql("h1", "a1", "cu", "su"),
        hitsHalfSql("a2", "h1", "su", "cu"),
        hitsHalfSql("h2", "a2", "cu", "su")
      ).mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey AS cu, l_suppkey AS su
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |h0 AS MATERIALIZED (
         |  SELECT DISTINCT cu, CAST(1000000000000 AS BIGINT) AS sc FROM e),
         |$steps,
         |roles AS (
         |  SELECT 'hub' AS role, 'C' || cu AS node, sc FROM h2
         |  UNION ALL
         |  SELECT 'authority' AS role, 'S' || su AS node, sc FROM a2),
         |ranked AS (
         |  SELECT role, node, sc,
         |    row_number() OVER (PARTITION BY role ORDER BY sc DESC, node) AS pos
         |  FROM roles)
         |SELECT role, CAST(pos AS INT) AS pos, node,
         |  round(CAST(sc AS DOUBLE) / 1.0e12, 8) + 0.0 AS score
         |FROM ranked WHERE pos <= 10 ORDER BY role, pos""".stripMargin
    },
    // same edge CTEs, three synchronous min-tie-break rounds, same
    // (size desc, label) top-20
    "q221_label_propagation" ->
      s"""WITH $lpaOracleCtes
         |SELECT 'S' || lab AS community, CAST(count(*) AS BIGINT) AS size,
         |  'S' || min(node) AS min_node
         |FROM l3 GROUP BY lab ORDER BY count(*) DESC, lab LIMIT 20""".stripMargin,
    // same label rounds, exact BIGINT intra/degree sums, the exact
    // cross-product modularity dag
    "q222_modularity" ->
      s"""WITH $lpaOracleCtes,
         |intra AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(CASE WHEN la.lab = lb.lab THEN 1 ELSE 0 END) AS BIGINT)
         |      AS sum_intra
         |  FROM e JOIN l3 la ON la.node = e.a JOIN l3 lb ON lb.node = e.b),
         |dc AS (
         |  SELECT l.lab, CAST(sum(d.deg) AS BIGINT) AS d_c
         |  FROM (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY z) d
         |  JOIN l3 l ON l.node = d.z GROUP BY l.lab),
         |sq AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |    CAST(sum(d_c * d_c) AS BIGINT) AS sum_d2
         |  FROM dc)
         |SELECT m AS n_edges, n_communities, sum_intra,
         |  round(CAST(4 * m * sum_intra - sum_d2 AS DOUBLE)
         |        / CAST(4 * m * m AS DOUBLE), 6) + 0.0 AS modularity
         |FROM intra, sq""".stripMargin,
    "q151_kcore" -> kcoreOracleSql,
    "q71_pagerank" ->
      s"""WITH pairs AS (
         |  SELECT o_custkey * 2 AS ca, l_suppkey * 2 + 1 AS sb,
         |         CAST(count(*) AS BIGINT) AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |und AS (
         |  SELECT ca AS src, sb AS dst, w FROM pairs
         |  UNION ALL
         |  SELECT sb AS src, ca AS dst, w FROM pairs),
         |wo AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM und GROUP BY src),
         |edges AS (SELECT u.src, u.dst,
         |            CAST(u.w AS DOUBLE) / CAST(wo.wout AS DOUBLE) AS wn
         |          FROM und u JOIN wo USING (src)),
         |nodes AS (SELECT DISTINCT src AS node FROM und),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
         |r1 AS (${iterSql("r0")}),
         |r2 AS (${iterSql("r1")}),
         |r3 AS (${iterSql("r2")}),
         |ranked AS (
         |  SELECT node, r,
         |    row_number() OVER (ORDER BY r DESC, node) AS pos
         |  FROM r3)
         |SELECT pos,
         |  CASE WHEN node % 2 = 0 THEN 'C' || (node // 2)
         |       ELSE 'S' || ((node - 1) // 2) END AS node,
         |  round(r, 8) + 0.0 AS rank
         |FROM ranked WHERE pos <= $TopN
         |ORDER BY pos""".stripMargin,
    // same thresholded edge set, same per-center 1e-9 ln grid, exact
    // BIGINT pair sums, same (score9 desc, a, b) top-20 order
    "q181_adamic_adar" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |            FROM lineitem),
        |ec AS (SELECT x.sk AS a, y.sk AS b, count(*) AS c
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk
        |       GROUP BY x.sk, y.sk),
        |e AS (SELECT a, b FROM ec WHERE c > (SELECT avg(c) FROM ec)),
        |und AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
        |w AS (SELECT z, CAST(count(*) AS BIGINT) AS deg,
        |        CAST(floor(1.0e9 / ln(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w9
        |      FROM und GROUP BY z HAVING count(*) >= 2),
        |x AS (SELECT u.z, u.n, w.w9 FROM und u JOIN w USING (z)),
        |wed AS (SELECT l.n AS a, r.n AS b, l.w9
        |        FROM x l JOIN x r ON l.z = r.z AND l.n < r.n),
        |sc AS (SELECT a, b, CAST(sum(w9) AS BIGINT) AS score9,
        |              CAST(count(*) AS BIGINT) AS common_neighbors
        |       FROM wed GROUP BY 1, 2),
        |nw AS (SELECT sc.a, sc.b, sc.common_neighbors, sc.score9
        |       FROM sc LEFT JOIN e ON sc.a = e.a AND sc.b = e.b
        |       WHERE e.a IS NULL)
        |SELECT a, b, common_neighbors, score9,
        |  round(CAST(score9 AS DOUBLE) / 1.0e9, 6) + 0.0 AS aa_score
        |FROM nw ORDER BY score9 DESC, a, b LIMIT 20""".stripMargin,
    // same wedge-closure triangle credit per vertex, one division of
    // exact integers
    // same edge CTEs, same both-orientation ends, same exact HUGEINT
    // moments and single guarded √-and-divide dag
    "q207_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |            FROM lineitem),
        |ec AS (SELECT x.sk AS a, y.sk AS b, count(*) AS c
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk
        |       GROUP BY x.sk, y.sk),
        |e AS (SELECT a, b FROM ec WHERE c > (SELECT avg(c) FROM ec)),
        |und AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
        |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY z),
        |ends AS (
        |  SELECT dz.deg AS x, dn.deg AS y
        |  FROM und JOIN deg dz ON dz.z = und.z JOIN deg dn ON dn.z = und.n),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m2,
        |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        |  FROM ends)
        |SELECT m2 // 2 AS n_edges,
        |  round((CAST(m2 AS DOUBLE) * sxy - sx * sy)
        |        / nullif(sqrt((CAST(m2 AS DOUBLE) * sxx - sx * sx)
        |                      * (CAST(m2 AS DOUBLE) * syy - sy * sy)), 0.0),
        |        6) + 0.0 AS assortativity
        |FROM m""".stripMargin,
    "q182_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |            FROM lineitem),
        |ec AS (SELECT x.sk AS a, y.sk AS b, count(*) AS c
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk
        |       GROUP BY x.sk, y.sk),
        |e AS (SELECT a, b FROM ec WHERE c > (SELECT avg(c) FROM ec)),
        |und AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
        |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY z),
        |wed AS (SELECT l.z, l.n AS a, r.n AS b
        |        FROM und l JOIN und r ON l.z = r.z AND l.n < r.n),
        |tri AS (SELECT w.z, CAST(count(*) AS BIGINT) AS triangles
        |        FROM wed w JOIN e ON w.a = e.a AND w.b = e.b GROUP BY w.z)
        |SELECT d.z AS node, d.deg,
        |  CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
        |  round(CAST(coalesce(t.triangles, 0) * 2 AS DOUBLE)
        |        / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6) + 0.0
        |    AS clustering_coeff
        |FROM deg d LEFT JOIN tri t USING (z)
        |WHERE d.deg >= 2 ORDER BY node""".stripMargin,
    // naive a<b<c 3-way join — orientation-invariant count, so the
    // oracle needn't replay the degree ordering
    "q80_triangle_count" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |            FROM lineitem),
        |ec AS (SELECT x.sk AS a, y.sk AS b, count(*) AS c
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk
        |       GROUP BY x.sk, y.sk),
        |e AS (SELECT a, b FROM ec WHERE c > (SELECT avg(c) FROM ec)),
        |nodes AS (SELECT a AS v FROM e UNION SELECT b FROM e)
        |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
        |       (SELECT count(*) FROM e) AS n_edges,
        |       (SELECT count(*)
        |        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |                  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        |         AS n_triangles""".stripMargin,
    // naive replay with the SAME pre-count key-sampling: the md5 keep
    // (q43 bucket spelling) applies to the pair stream BEFORE the count,
    // and the support threshold is avg(c) over the SAMPLED counts — the
    // triangle count over the resulting edge set is orientation-
    // invariant, so the tail is unchanged
    "q80b_triangle_sample" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |            FROM lineitem),
        |ec AS (SELECT x.sk AS a, y.sk AS b, count(*) AS c
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk
        |       WHERE CAST('0x' || substr(
        |               md5(CAST(x.sk AS VARCHAR) || ',' || CAST(y.sk AS VARCHAR)),
        |               1, 15) AS BIGINT) % 100 < 20
        |       GROUP BY x.sk, y.sk),
        |e AS (SELECT a, b FROM ec WHERE c > (SELECT avg(c) FROM ec)),
        |nodes AS (SELECT a AS v FROM e UNION SELECT b FROM e),
        |t AS (SELECT count(*) AS n_triangles_sampled
        |      FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
        |       (SELECT count(*) FROM e) AS n_edges,
        |       n_triangles_sampled,
        |       n_triangles_sampled * 125 AS est_triangles
        |FROM t""".stripMargin,
    // the identical recursive CTE over the identically-derived edge set
    // — DuckDB's native WITH RECURSIVE against Spark's
    "q106_recursive_reachability" ->
      """WITH RECURSIVE
        |li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |       FROM lineitem),
        |ec AS (SELECT x.sk AS a, y.sk AS b, count(*) AS c
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk
        |       GROUP BY x.sk, y.sk),
        |e AS (SELECT a, b FROM ec WHERE c > (SELECT avg(c) FROM ec)),
        |und AS (SELECT a AS src, b AS dst FROM e
        |        UNION ALL SELECT b AS src, a AS dst FROM e),
        |reach(node, hops) AS (
        |  SELECT (SELECT min(src) FROM und) AS node, 0 AS hops
        |  UNION ALL
        |  SELECT u.dst AS node, r.hops + 1 AS hops
        |  FROM reach r JOIN und u ON u.src = r.node
        |  WHERE r.hops < 2),
        |lvl AS (SELECT node, min(hops) AS hops FROM reach GROUP BY node)
        |SELECT CAST(hops AS INT) AS hops, CAST(count(*) AS BIGINT) AS n_nodes,
        |  min(node) AS min_node, max(node) AS max_node,
        |  CAST(sum(node) AS BIGINT) AS node_sum
        |FROM lvl GROUP BY hops ORDER BY hops""".stripMargin,
    "q148_weighted_sssp" ->
      """WITH RECURSIVE
        |li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |       FROM lineitem),
        |ec AS (SELECT x.sk AS a, y.sk AS b, count(*) AS c
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk
        |       GROUP BY x.sk, y.sk),
        |e AS (SELECT a, b, c FROM ec WHERE c > (SELECT avg(c) FROM ec)),
        |und AS (SELECT a AS src, b AS dst, c AS w FROM e
        |        UNION ALL SELECT b AS src, a AS dst, c AS w FROM e),
        |walk(node, dist, hops) AS (
        |  SELECT (SELECT min(src) FROM und) AS node,
        |         CAST(0 AS BIGINT) AS dist, 0 AS hops
        |  UNION ALL
        |  SELECT u.dst AS node, w.dist + u.w AS dist, w.hops + 1 AS hops
        |  FROM walk w JOIN und u ON u.src = w.node WHERE w.hops < 3),
        |sp AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
        |SELECT node, CAST(dist AS BIGINT) AS dist
        |FROM sp ORDER BY dist, node LIMIT 20""".stripMargin
  )
}
