package graft

import org.apache.spark.sql.functions._

/** Semantic pins for q147 (2-D skyline via monotone sweep) and q148
  * (bounded-hop weighted SSSP via synchronous relaxation): each must
  * equal an independent naive driver-side replay — quadratic dominance
  * scan for the skyline, exhaustive ≤3-edge path enumeration for the
  * shortest paths — plus the structural frontier/distance properties.
  */
class FrontierSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q147 skyline equals the quadratic dominance scan and is a staircase") {
    val rows = SparkEntry
      .queries("q147_skyline")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    val parts = graft.queries.Tables
      .table(spark, sf, "part")
      .select(
        col("p_partkey"),
        round(col("p_retailprice") * 100.0, 0).cast("long").as("pc"),
        col("p_size")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    val naive = parts
      .filter { case (_, pc, sz) =>
        !parts.exists { case (_, qc, qz) =>
          qc <= pc && qz >= sz && (qc < pc || qz > sz)
        }
      }
      .sortBy(t => (t._2, t._1))
    assert(rows.toSeq == naive.toSeq, s"skyline ${rows.length} vs naive ${naive.length}")
    assert(rows.nonEmpty) // the min-price point always survives

    // staircase property: as price strictly increases along the
    // frontier, size strictly increases too (otherwise the cheaper
    // point would dominate); equal-price duplicates share one size
    for (Seq((_, pc1, sz1), (_, pc2, sz2)) <- rows.toSeq.sliding(2)) {
      if (pc1 == pc2) assert(sz1 == sz2)
      else assert(pc1 < pc2 && sz1 < sz2, s"($pc1,$sz1) !< ($pc2,$sz2)")
    }
  }

  test("q148 distances equal exhaustive <=3-edge path enumeration") {
    val rows = SparkEntry
      .queries("q148_weighted_sssp")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // independent edge replay: distinct (order, supplier) pairs →
    // co-occurrence counts → above-average threshold, undirected
    val pairs = graft.queries.Tables
      .table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values
      .flatMap { grp =>
        val sks = grp.map(_._2).sorted
        for (i <- sks.indices; j <- (i + 1) until sks.length)
          yield (sks(i), sks(j))
      }
      .groupBy(identity)
      .map { case (k, v) => (k, v.size.toLong) }
    val cavg = pairs.values.sum.toDouble / pairs.size
    val und = pairs.toSeq
      .filter(_._2 > cavg)
      .flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
    val src = und.map(_._1).min

    var dist = Map(src -> 0L)
    for (_ <- 1 to 3) {
      val relaxed = for ((u, v, w) <- und; du <- dist.get(u)) yield (v, du + w)
      dist = (dist.toSeq ++ relaxed)
        .groupBy(_._1)
        .map { case (k, vs) => (k, vs.map(_._2).min) }
    }
    val naive = dist.toSeq.sortBy(t => (t._2, t._1)).take(20)
    assert(rows.toSeq == naive, s"sssp ${rows.take(5).toSeq} vs ${naive.take(5)}")
    assert(rows.head == ((src, 0L))) // source at distance 0
    assert(rows.forall(_._2 >= 0L))
  }
}
