package graft

/** The documented 100 TB swap-ins of q159/q160 exist as code paths and
  * stay within tolerance of the exact gates on the test corpus — the
  * promise is executable, not prose (r13 verdict ask #5).
  */
class ApproxSwapInSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q159 approx_count_distinct diversity within 5% of exact") {
    val exact = graft.llm.TextAnalysis
      .ngramDiversity(spark, dir, useApprox = false)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val approx = graft.llm.TextAnalysis
      .ngramDiversity(spark, dir, useApprox = true)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(exact.keySet === Set(1, 2, 3))
    assert(approx.keySet === Set(1, 2, 3))
    exact.foreach { case (n, (total, distinct)) =>
      val (aTotal, aDistinct) = approx(n)
      // totals are exact counts on both paths
      assert(aTotal === total, s"n=$n total")
      // HLL++ at rsd 1%: 5% is generous margin, failure means the
      // swap-in changed semantics, not sketch noise
      val rel = math.abs(aDistinct - distinct).toDouble / distinct
      assert(rel <= 0.05, s"n=$n distinct exact=$distinct approx=$aDistinct")
    }
  }

  test("q160 approx_percentile medians give the exact gate's pair set") {
    def pairs(useApprox: Boolean): Set[(Long, Long)] =
      graft.llm.Dedup
        .phashNearDup(spark, dir, useApprox)
        .select("va", "vb")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
    val exact = pairs(useApprox = false)
    val approx = pairs(useApprox = true)
    // the 50 planted twins (vec_id v paired with v + 1000000) must be
    // found by BOTH paths — the detector stays load-bearing
    val planted = (0L until 50L).map(v => (v, v + 1000000L)).toSet
    assert(planted.subsetOf(exact), "exact path lost planted twins")
    assert(planted.subsetOf(approx), "approx path lost planted twins")
    // on this corpus the sketch median lands close enough that the
    // candidate/verify outcome is identical; any drift would show as a
    // symmetric difference here (tolerated size: none observed, pin 0)
    assert(approx === exact, {
      val onlyA = approx -- exact
      val onlyE = exact -- approx
      s"approx-only=$onlyA exact-only=$onlyE"
    })
  }
}
