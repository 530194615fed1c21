package graft

/** q70 k-means + q71 PageRank: full plain-Scala replays (same fold
  * order, rounding re-sync, and tie-breaks as the Spark/oracle pair),
  * algorithmic invariants (Lloyd inertia monotonicity, PageRank mass
  * conservation), and the q70 map-only plan pin.
  */
class GraphKMeansSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, d: Int): Double =
    BigDecimal(v).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  test("q70 k-means replays exactly in plain Scala; inertia is monotone") {
    val K = 10
    val rows = graft.queries.Tables
      .table(spark, sf, "embeddings")
      .select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

    def assign(cent: Array[Array[Float]]): Array[(Long, Int, Double)] =
      rows.map { case (id, x) =>
        val xx = dot(x, x)
        var bd = Double.MaxValue; var bc = -1
        for (j <- 0 until K) {
          val d = xx - 2.0 * dot(x, cent(j)) + dot(cent(j), cent(j))
          if (d < bd) { bd = d; bc = j } // strict < : ties keep smaller j
        }
        (id, bc, bd)
      }

    def update(
        a: Array[(Long, Int, Double)],
        prev: Array[Array[Float]]
    ): Array[Array[Float]] = {
      val byId = rows.toMap
      Array.tabulate(K) { j =>
        val members = a.collect { case (id, c, _) if c == j => byId(id) }
        if (members.isEmpty) prev(j)
        else
          Array.tabulate(64) { i =>
            rnd(members.map(_(i).toDouble).sum / members.length, 6).toFloat
          }
      }
    }

    val c0 = rows.take(K).map(_._2)
    val a0 = assign(c0)
    val c1 = update(a0, c0)
    val a1 = assign(c1)
    val c2 = update(a1, c1)
    val a2 = assign(c2)

    // Lloyd guarantee (rounding the centroids to 6 decimals can nudge it
    // by a hair, hence the epsilon): inertia never increases
    def inertia(a: Array[(Long, Int, Double)]): Double = a.map(_._3).sum
    assert(inertia(a1) <= inertia(a0) + 0.05)
    assert(inertia(a2) <= inertia(a1) + 0.05)

    val got = SparkEntry
      .queries("q70_kmeans")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = a2.map { case (id, c, d) => (id, c, rnd(d, 4) + 0.0) }
    assert(got.toSeq == expected.toSeq)
    assert(got.map(_._2).distinct.length == K, "an emptied cluster at sf0.001?")
  }

  test("KMeans.train refuses a frame without vec_id (init determinism)") {
    // the fail-loudly contract: first-k init needs a total order;
    // limit-without-sort would silently vary across plans/retries
    import spark.implicits._
    val noId = Seq((Array(1f, 0f)), (Array(0f, 1f)))
      .toDF("embedding")
    val e = intercept[IllegalArgumentException] {
      graft.llm.KMeans.train(noId, k = 2, iterations = 1)
    }
    assert(e.getMessage.contains("vec_id"))
  }

  test("q70 assignment plan is map-only: no join anywhere") {
    val plan = SparkEntry
      .queries("q70_kmeans")(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Join"), s"broadcast-centroid k-means must not join:\n$plan")
  }

  test("q71 PageRank replays exactly in plain Scala; mass is conserved") {
    val ord = graft.queries.Tables
      .table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val li = graft.queries.Tables
      .table(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // integer node ids, parity-disjoint: custkey→2k, suppkey→2k+1
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    li.foreach { case (ok, sk) =>
      val key = (ord(ok) * 2, sk * 2 + 1)
      w(key) = w.getOrElse(key, 0L) + 1
    }
    val edges = w.toSeq.flatMap { case ((c, s2), n) =>
      Seq((c, s2, n), (s2, c, n))
    }
    val wout = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.length
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val acc = scala.collection.mutable.Map.empty[Long, Double]
      edges.foreach { case (u, v, ew) =>
        acc(v) = acc.getOrElse(v, 0.0) + r(u) * ew / wout(u)
      }
      r = nodes.map(v => v -> rnd(0.15 / n + 0.85 * acc(v), 12)).toMap
    }
    // symmetric edges ⇒ no dangling mass: Σr stays 1 up to rounding
    assert(math.abs(r.values.sum - 1.0) < 1e-6)

    def label(id: Long): String =
      if (id % 2 == 0) "C" + (id / 2) else "S" + ((id - 1) / 2)
    val expected = r.toSeq
      .sortBy { case (node, rv) => (-rv, node) }
      .take(30)
      .zipWithIndex
      .map { case ((node, rv), i) => (i + 1, label(node), rnd(rv, 8) + 0.0) }
    val got = SparkEntry
      .queries("q71_pagerank")(spark, sf)
      .collect()
      .map(r2 => (r2.getInt(0), r2.getString(1), r2.getDouble(2)))
    assert(got.toSeq == expected)
    // degree dominance: suppliers aggregate ~15× a customer's trade
    // volume, so the head of the ranking must be all-supplier
    assert(got.take(10).forall(_._2.startsWith("S")))
  }
}
