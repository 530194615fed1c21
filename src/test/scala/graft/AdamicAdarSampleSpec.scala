package graft

/** The q181 dense-graph swap-in (center-sampled Horvitz–Thompson
  * Adamic–Adar) is CODE behind a parameter, pinned here against the
  * exact gate (the q159/q160 swap-in convention): the md5 center keep
  * is deterministic, so the sampled estimate is a fixed value — the
  * assertions below are stable, not statistical.
  */
class AdamicAdarSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("samplePct = 100 IS the exact gate") {
    val gate = SparkEntry
      .queries("q181_adamic_adar")(spark, dir)
      .collect()
      .map(_.toSeq)
      .toSeq
    val full = graft.queries.Graph
      .adamicAdar(spark, dir, samplePct = 100)
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(gate === full)
  }

  test("50%-center sample: top-20 overlap + unbiased total within band") {
    def pairsAndScores(pct: Int): Seq[((Long, Long), Long)] =
      graft.queries.Graph
        .adamicAdar(spark, dir, samplePct = pct)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3)))
        .toSeq
    val exact = pairsAndScores(100)
    val sampled = pairsAndScores(50)
    assert(exact.nonEmpty && sampled.nonEmpty)
    val overlap = exact.map(_._1).toSet.intersect(sampled.map(_._1).toSet).size
    info(s"top-20 overlap: $overlap; sums exact=${exact.map(_._2).sum} sampled=${sampled.map(_._2).sum}")
    // deterministic fixed corpus ⇒ fixed overlap; the bound documents
    // the quality floor a 2× wedge-stream cut buys on this graph
    assert(overlap >= 8, s"sampled top-20 diverged too far: $overlap/20 overlap")
    // Horvitz–Thompson totals over the shared top pairs stay in a
    // 2× band of the exact totals (per-pair variance at 50% keep)
    val ratio = sampled.map(_._2).sum.toDouble / exact.map(_._2).sum
    assert(ratio > 0.5 && ratio < 2.0, s"score mass ratio $ratio")
  }
}
