package graft

/** Pins q242's production catalog-cap swap-in (the q181-HT-sample
  * convention: the scale path ships as code with a spec against the
  * exact gate): with the cap above the corpus's max catalog the capped
  * form IS the exact gate; with a tight cap it still produces a valid
  * ranked pair list whose dots can only shrink.
  */
class ItemCfCapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cap above max catalog reproduces the exact q242 ranking") {
    val exact = SparkEntry
      .queries("q242_item_cf")(spark, dir)
      .collect()
      .toSeq
    val capped = graft.queries.Basket
      .itemCfCapped(spark, dir, 200)
      .collect()
      .toSeq
    assert(capped === exact)
  }

  test("a tight cap bounds pair volume and keeps a valid ranking") {
    val capped = graft.queries.Basket
      .itemCfCapped(spark, dir, 10)
      .collect()
      .toSeq
    assert(capped.nonEmpty && capped.size <= 20)
    // cosines sorted desc with (pa, pb) tie-break
    val cosines = capped.map(_.getDouble(4))
    assert(cosines === cosines.sortBy(-_))
    // all similarities remain in [0, 1]
    assert(cosines.forall(c => c >= 0.0 && c <= 1.0 + 1e-9))
  }
}
