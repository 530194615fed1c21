package graft

import graft.llm.Clustering

/** Connected components over synthetic graphs whose closures are known:
  * a 5-vertex path (diameter 4 — forces multiple propagation rounds), a
  * triangle with a redundant edge, an isolated pair, and the empty graph.
  */
class ClusteringSpec extends SparkSpec {

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clustering
      .connectedComponents(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("path graph collapses to its min vertex across rounds") {
    val got = components(Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct labels") {
    val got = components(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
    )
    assert(
      got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
        20L -> 20L, 21L -> 20L)
    )
  }

  test("empty edge set yields empty labeling") {
    assert(components(Seq.empty).isEmpty)
  }

  test("non-convergence within maxIters throws instead of returning wrong labels") {
    import spark.implicits._
    // a 12-vertex path needs ~10 rounds; cap at 2 must be loud
    val chain = (1L to 11L).map(i => (i, i + 1))
    assertThrows[IllegalStateException] {
      Clustering
        .connectedComponents(chain.toDF("src", "dst"), maxIters = 2)
        .count()
    }
  }
}
