package graft

import graft.llm.Retrieval

/** BM25 (q90), preference-pair assembly (q91), RRF fusion (q92) and SFT
  * sample assembly (q94): semantic invariants beyond the DuckDB hash
  * gate.
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

  test("rrf fusion: score follows from the ranks, order correct, both lists contribute") {
    val rows = Retrieval
      .queries("q92_rrf_fusion")(spark, sf)
      .collect()
      .map { r =>
        val ra = if (r.isNullAt(1)) None else Some(r.getInt(1))
        val rb = if (r.isNullAt(2)) None else Some(r.getInt(2))
        (r.getLong(0), ra, rb, r.getDouble(3))
      }
    assert(rows.nonEmpty)
    rows.foreach { case (id, ra, rb, rrf) =>
      val expect = ra.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rb.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(
        math.abs(rrf - BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
        s"doc $id: rrf $rrf != formula($ra, $rb)"
      )
      assert(ra.nonEmpty || rb.nonEmpty, s"doc $id in fusion but in neither list")
    }
    rows.sliding(2).foreach {
      case Array((id1, _, _, s1), (id2, _, _, s2)) =>
        assert(s1 > s2 || (s1 == s2 && id1 < id2), "fusion order violated")
      case _ =>
    }
    // a doc ranked top-5 by BOTH lists must out-score any doc present in
    // only one list at rank >= 5 — the property fusion exists to provide
    val dual = rows.filter(r => r._2.exists(_ <= 5) && r._3.exists(_ <= 5)).map(_._4)
    val single = rows.filter(r => r._2.isEmpty || r._3.isEmpty).map(_._4)
    if (dual.nonEmpty && single.nonEmpty)
      assert(dual.min > single.max, "dual-list doc outranked by single-list doc")
  }

  test("snippets contain their term at the expected offset, bounded length") {
    val rows = graft.llm.Retrieval
      .queries("q90b_snippets")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, term, pos, snippet) =>
      assert(pos >= 1)
      // the term sits at (pos - snip_start) inside the snippet
      val expectAt = (pos - math.max(pos - 40, 1)).toInt
      assert(
        snippet.regionMatches(expectAt, term, 0, term.length),
        s"doc $id '$term': term not at offset $expectAt in '$snippet'"
      )
      assert(snippet.length <= term.length + 80, s"doc $id snippet overlong")
    }
    // each (doc, term) appears at most once — first occurrence only
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("sft assembly: budget respected, md5/token counts replay in plain Scala") {
    val out = graft.llm.Sft
      .queries("q94_sft_assembly")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(out.nonEmpty)
    val docs = graft.queries.Tables
      .table(spark, sf, "documents")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    var checked = 0
    docs.foreach { case (id, text) =>
      val p = text.indexOf('.')
      val (prompt, response) =
        if (p >= 0) (text.substring(0, p + 1), text.substring(p + 1).replaceAll("^ +", ""))
        else (text, "")
      val rendered = s"<|user|>\n$prompt\n<|assistant|>\n$response"
      val nTok = rendered.split(" ", -1).length
      if (nTok >= 8 && nTok <= 512) {
        val md = java.security.MessageDigest
          .getInstance("MD5")
          .digest(rendered.getBytes("UTF-8"))
          .map("%02x".format(_))
          .mkString
        val (gotTok, gotChars, gotMd5) =
          out.getOrElse(id, fail(s"doc $id within budget but missing from q94"))
        assert(gotTok == nTok && gotChars == rendered.length && gotMd5 == md, s"doc $id mismatch")
        checked += 1
      } else assert(!out.contains(id), s"doc $id outside budget but emitted")
    }
    assert(checked == out.size)
  }

  test("q115 NDCG/MRR replay in plain Scala from the gated BM25 list") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val row = SparkEntry.queries("q115_ndcg_mrr")(spark, sf).collect().head
    val (nRel, dcg10, idcg10, ndcg10, rr) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getDouble(4))

    // relevance = #query terms whose first occurrence is in the first
    // 200 chars (locate between 1 and 200 ⇔ 0-based indexOf in [0, 200))
    val terms = Seq("spark", "join", "filter")
    val rels: Map[Long, Int] = graft.queries.Tables
      .table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect()
      .map { r =>
        val t = r.getString(1)
        r.getLong(0) -> terms.count { q =>
          val i = t.indexOf(q); i >= 0 && i < 200
        }
      }
      .collect { case (id, c) if c > 0 => id -> c }
      .toMap
    assert(nRel == rels.size.toLong)

    // the ranked list: q92's list convention replayed through the gated
    // q90 output is round-4; re-derive ranks from the spec's own naive
    // BM25 is overkill — instead pin structure + the ideal half exactly.
    val gains = rels.values.map(r => (1 << r) - 1).toSeq.sorted.reverse.take(10)
    val idealNaive = gains.zipWithIndex.map { case (g, i) =>
      g.toDouble / (math.log(i + 2.0) / math.log(2.0))
    }.sum
    // 2e-6 tolerance: idcg is gridded round-6 and the replay's libm log
    // may differ by an ulp from the engine's log2 at a grid boundary
    assert(math.abs(idcg10 - math.rint(idealNaive * 1e6) / 1e6) < 2e-6)
    assert(dcg10 >= 0.0 && dcg10 <= idcg10 + 1e-9)
    assert(ndcg10 >= 0.0 && ndcg10 <= 1.0 + 1e-9)
    assert(
      math.abs(ndcg10 - math.rint(dcg10 / idcg10 * 1e6) / 1e6) < 2e-6,
      s"$ndcg10 vs ${dcg10 / idcg10}"
    )
    // reciprocal rank is 0 or 1/r for r in 1..10
    assert(
      rr == 0.0 ||
        (1 to 10).exists(r => math.abs(rr - math.rint(1e6 / r) / 1e6) < 1e-9),
      s"rr=$rr"
    )
  }
}
