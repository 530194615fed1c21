package graft

import graft.functions.MinHashAggregator
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** The typed Aggregator must produce bit-identical signatures to the
  * declarative 64-column min-agg form q27 uses, and we record which is
  * faster (the declarative form stays on the hot path).
  */
class MinHashAggregatorSpec extends SparkSpec {

  test("udaf signature == declarative 64-column signature") {
    import spark.implicits._
    val p = Dedup.MinHashP
    val (a, b) = Dedup.hashA -> Dedup.hashB

    val hashes = Seq((1L, 123456L), (1L, 987654L), (2L, 5L), (2L, 42L), (2L, 7L))
      .toDF("doc_id", "h")

    val agg = udaf(new MinHashAggregator(a, b, p))
    val typedSig = hashes
      .groupBy("doc_id")
      .agg(agg(col("h")).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
      .toMap

    val minAggs = (0 until Dedup.NumHashes).map { i =>
      min(pmod(col("h") * lit(a(i)) + lit(b(i)), lit(p))).as(s"mh$i")
    }
    val declSig = hashes
      .groupBy("doc_id")
      .agg(minAggs.head, minAggs.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to Dedup.NumHashes).map(r.getLong).toSeq)
      .toMap

    assert(typedSig == declSig)
  }
}
