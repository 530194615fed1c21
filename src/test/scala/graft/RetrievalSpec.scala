package graft

import graft.llm.Retrieval

/** BM25 (q90) and preference-pair assembly (q91): semantic invariants
  * beyond the DuckDB hash gate.
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bm25 scores are positive, ranked desc, and bounded by the idf sum") {
    val rows = Retrieval
      .queries("q90_bm25")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.nonEmpty, "no BM25 hits — query terms vanished from the corpus?")
    // ranked: scores non-increasing, ties broken by doc_id ascending
    rows.sliding(2).foreach {
      case Array((id1, s1), (id2, s2)) =>
        assert(s1 > s2 || (s1 == s2 && id1 < id2), s"order violated: ($id1,$s1) then ($id2,$s2)")
      case _ =>
    }
    // every score positive (Lucene idf variant is positive even at df=N)
    assert(rows.forall(_._2 > 0))
    // tf saturation bound: per-term contribution < idf·(k1+1); with
    // idf ≤ ln(2N+1) the score cannot exceed |terms|·ln(2N+1)·2.2
    val n = graft.queries.Tables.table(spark, sf, "documents").count()
    val bound = Retrieval.QueryTerms.size * math.log(2.0 * n + 1) * 2.2
    assert(rows.forall(_._2 < bound), s"score exceeds saturation bound $bound")
  }

  test("preference pairs: chosen beats rejected, ids distinct, margins consistent") {
    val rows = Retrieval
      .queries("q91_preference_pairs")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (chId, chR) = (r.getLong(3), r.getDouble(4))
      val (rjId, rjR) = (r.getLong(5), r.getDouble(6))
      val margin = r.getDouble(7)
      assert(chId != rjId, s"self-pair in stratum ${r.getString(0)}/${r.getString(1)}")
      assert(chR >= rjR, s"chosen reward $chR < rejected $rjR")
      assert(math.abs(margin - BigDecimal(chR - rjR).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(r.getLong(2) >= 2, "stratum with < 2 docs emitted a pair")
    }
  }
}
