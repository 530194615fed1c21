package graft

import org.apache.spark.sql.functions._

/** Pins for the q151 k-core decomposition: the distributed peel must
  * equal a naive driver-side iterative replay on independently
  * recomputed edges, converge well under the 8-round oracle unroll
  * (the soundness condition for the unrolled WITH chain), actually
  * remove a fringe (non-vacuous), and leave every survivor with
  * core-degree ≥ k.
  */
class KCoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val K = 3

  /** Independently recomputed bipartite edge set (customer 2c /
    * supplier 2s+1, kept when they share ≥ 3 orders) — driver-side,
    * from the raw tables.
    */
  private def naiveEdges(): Seq[(Long, Long)] = {
    val li = graft.queries.Tables
      .table(spark, sf, "lineitem")
      .select(col("l_orderkey").cast("long"), col("l_suppkey").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custOf = graft.queries.Tables
      .table(spark, sf, "orders")
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    // count DISTINCT orders per (cust, supp)
    val orderSets =
      scala.collection.mutable.Map.empty[(Long, Long), Set[Long]]
    for ((ok, sk) <- li; ck <- custOf.get(ok)) {
      val key = (ck * 2, sk * 2 + 1)
      orderSets(key) = orderSets.getOrElse(key, Set.empty) + ok
    }
    // NB: .toSeq BEFORE the filter-to-pairs — collect-ing (a, b) tuples
    // out of a Map rebuilds a Map and silently dedups by `a`
    orderSets.toSeq.collect { case (p, oks) if oks.size >= 3 => p }
  }

  private def label(u: Long): String =
    if (u % 2 == 0) s"C${u / 2}" else s"S${(u - 1) / 2}"

  test("q151 equals a naive iterative peel; converges under the oracle unroll") {
    val got = SparkEntry
      .queries("q151_kcore")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq

    // naive peel to fixpoint, counting rounds
    var adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
    for ((a, b) <- naiveEdges()) {
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    val initialNodes = adj.size
    var rounds = 0
    var changed = true
    while (changed) {
      val drop = adj.collect { case (v, ns) if ns.size < K => v }.toSet
      changed = drop.nonEmpty
      if (changed) {
        adj = adj.collect {
          case (v, ns) if !drop(v) => (v, ns -- drop)
        }
        rounds += 1
      }
    }
    val want =
      adj.toSeq.map { case (v, ns) => (label(v), ns.size.toLong) }.sorted

    assert(got.sorted == want, s"core mismatch: got=$got want=$want")
    // non-vacuous: the peel removed a fringe but did not empty the graph
    assert(adj.nonEmpty && adj.size < initialNodes)
    // every survivor clears the bar
    assert(got.forall(_._2 >= K))
    // oracle-unroll soundness: fixpoint reached well inside 8 rounds
    assert(rounds < 8, s"corpus peels in $rounds rounds; raise the unroll")
  }
}
