package graft

/** q65 chunking: full plain-Scala replay (windows, stride, partial final
  * chunk) plus the coverage invariant every RAG pipeline depends on —
  * no word of any document is left out of all chunks.
  */
class ChunkingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val C = graft.llm.Chunking.ChunkWords
  private val S = graft.llm.Chunking.StrideWords

  test("q65 chunks replay exactly in plain Scala") {
    val texts = graft.queries.Tables
      .table(spark, sf, "documents")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val expected = texts.flatMap { case (id, txt) =>
      // split(text, ' ') in Spark keeps trailing empties → limit -1 here
      val w = txt.split(" ", -1)
      val n = w.length
      val lastIdx = math.max(0, (n - (C - S + 1)) / S)
      (0 to lastIdx).map { ci =>
        val chunk = w.slice(ci * S, math.min(ci * S + C, n))
        (id, ci, math.min(C, n - ci * S), chunk.mkString(" "))
      }
    }.toSeq

    val got = SparkEntry
      .queries("q65_chunking")(spark, sf)
      .select("doc_id", "chunk_idx", "chunk_words", "chunk_text")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq

    assert(got == expected.sortBy(t => (t._1, t._2)))
    // non-vacuous: the corpus actually produces multi-chunk documents
    assert(expected.exists(_._2 > 0), "no document long enough to chunk?")
  }

  test("q65 chunks cover every word with the declared overlap") {
    val rows = SparkEntry
      .queries("q65_chunking")(spark, sf)
      .select("doc_id", "chunk_idx", "chunk_words")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // consecutive chunks start S words apart and are C long (except the
      // last) → the interval union [ci·S, ci·S + words) has no gaps
      sorted.sliding(2).foreach {
        case Array((_, i, words), (_, j, _)) =>
          assert(j == i + 1, s"doc $doc skips chunk index after $i")
          assert(i * S + words >= j * S, s"doc $doc gap between chunks $i and $j")
        case _ => ()
      }
      val (_, lastIdx, lastWords) = sorted.last
      assert(lastWords <= C && lastWords > 0)
      // the final chunk reaches the end of the document (coverage)
      assert(lastIdx * S + lastWords >= sorted.map(t => t._2 * S + t._3).max)
    }
  }
}
