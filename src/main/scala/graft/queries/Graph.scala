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
    // out-weight attached once; the und⋈wout equi-join already leaves
    // its output hash-partitioned on src (no explicit repartition — that
    // would be a second full shuffle of the edge frame), and the cache
    // preserves that layout so every iteration's join reuses it and only
    // the node-sized rank frame shuffles
    val wout = und.groupBy("src").agg(sum("w").as("wout"))
    val edges = graft.llm.Dedup.tcache(s, und.join(wout, "src"))
    val nodes = und.select(col("src").as("node")).distinct()
    val n = nodes.count() // scalar action: |V|, never the data
    val base = 0.15 / n // same IEEE division the oracle performs
    var r = nodes.select(col("node"), (lit(1.0) / n).as("r"))
    for (_ <- 1 to 3) {
      r = edges
        .join(r, edges("src") === r("node"))
        .groupBy(col("dst").as("node"))
        .agg(
          round(
            lit(base) + lit(Damping) * sum(col("r") * col("w") / col("wout")),
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
  private def q80(s: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .table(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    // canonical undirected edges a < b (by id), kept only when the pair
    // co-occurs MORE than the average pair does — the data-adaptive
    // support threshold that yields real structure at any SF (a fixed
    // absolute cutoff is complete-graph at one scale and empty at
    // another; the testdata's raw co-occurrence graph is K_n). avg is
    // sum/count of exact integers, IEEE-identical on both engines.
    val counted = li
      .as("x")
      .join(li.as("y"), col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .groupBy(col("x.sk").as("a"), col("y.sk").as("b"))
      .agg(count(lit(1)).as("c"))
    val edges = counted
      .crossJoin(broadcast(counted.agg(avg("c").as("cavg"))))
      .filter(col("c") > col("cavg"))
      .select("a", "b")
    val deg = edges
      .select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v")
      .agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) → high-(deg, id)
    val directed = edges
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
    // wedges at each center (two out-neighbors, canonical by id) close
    // against the UNDIRECTED canonical edge set
    val wedges = directed
      .as("e1")
      .join(
        directed.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst")
      )
      .select(col("e1.dst").as("a"), col("e2.dst").as("b"))
    // three 1-row aggregates cross-joined in-plan (bounded by
    // construction; no driver-side count actions)
    deg
      .agg(count(lit(1)).as("n_nodes"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .crossJoin(
        wedges.join(edges, Seq("a", "b")).agg(count(lit(1)).as("n_triangles"))
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_pagerank" -> q71,
    "q80_triangle_count" -> q80
  )

  // One power iteration as SQL — contribution spelled r * w / wout and
  // the update 0.15/N + 0.85 * sum(...), the exact operand order and
  // associativity of the Spark column expression above.
  private def iterSql(prev: String): String =
    s"""SELECT e.dst AS node,
       |    round(0.15 / (SELECT n FROM nn) + 0.85 * sum(p.r * e.w / e.wout), 12) AS r
       |  FROM edges e JOIN $prev p ON p.node = e.src
       |  GROUP BY e.dst""".stripMargin

  val oracleSql: Map[String, String] = Map(
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
         |edges AS (SELECT u.src, u.dst, u.w, wo.wout FROM und u JOIN wo USING (src)),
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
        |         AS n_triangles""".stripMargin
  )
}
