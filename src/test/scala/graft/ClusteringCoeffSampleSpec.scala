package graft

/** The q182 dense-graph swap-in (wedge-sampled clustering-coefficient
  * estimator) is CODE behind a parameter, pinned here against the exact
  * gate (the q181/q159/q160 swap-in convention): the md5 wedge keep is
  * keyed on the full (z, a, b) wedge identity, so the sampled estimate
  * is a fixed deterministic value — the assertions below are stable,
  * not statistical.
  */
class ClusteringCoeffSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("samplePct = 100 IS the exact gate") {
    val gate = SparkEntry
      .queries("q182_clustering_coeff")(spark, dir)
      .collect()
      .map(_.toSeq)
      .toSeq
    val full = graft.queries.Graph
      .clusteringCoeff(spark, dir, samplePct = 100)
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(gate === full)
  }

  test("50%-wedge sample: per-node ratio estimates track the exact coefficients") {
    // sf0.01, not sf0.001: the estimator's variance is 1/√wedges per
    // node, and the sf0.001 graph has single-digit wedge counts (9
    // nodes; a 50% cut of 3 wedges is a coarse ratio grid) — sf0.01's
    // denser neighborhoods are the regime the swap-in exists for
    val sampleDir = "/root/testdata/sf0.01"
    def coeffs(pct: Int): Map[Long, Option[Double]] =
      graft.queries.Graph
        .clusteringCoeff(spark, sampleDir, samplePct = pct)
        .collect()
        .map(r =>
          r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))
        )
        .toMap
    val exact = coeffs(100)
    val sampled = coeffs(50)
    assert(exact.nonEmpty)
    // every node survives (deg ≥ 2 frame is unsampled); a node may
    // carry a NULL estimate only when ALL its wedges sampled away
    assert(sampled.keySet === exact.keySet)
    val paired = exact.toSeq.flatMap { case (n, e) =>
      for { ev <- e; sv <- sampled(n) } yield (ev, sv)
    }
    assert(paired.size >= exact.size / 2, "too many NULL estimates at 50%")
    val mad = paired.map { case (e, s) => math.abs(e - s) }.sum / paired.size
    info(s"paired nodes: ${paired.size}/${exact.size}; mean |Δcoeff| = $mad")
    // coefficients live in [0,1]; a 2× wedge cut must keep the mean
    // absolute error well under the signal range on this fixed corpus
    assert(mad < 0.15, s"mean |Δcoeff| too large: $mad")
  }
}
