package graft

import graft.functions.SimHashAggregator
import org.apache.spark.sql.functions._

/** The typed SimHash aggregator must pack the same signature as the
  * declarative form it replaced in Dedup.q28: groupBy(doc, term) counts,
  * 60 independent sum(cnt · ±1) columns, then bit packing. Per-occurrence
  * ±1 votes are integer-identical to count-weighted votes, so both forms
  * must agree exactly — including vote ties (sum == 0 → bit clear).
  */
class SimHashAggregatorSpec extends SparkSpec {

  private val Bits = 60

  test("udaf signature == declarative count-weighted 60-column signature") {
    import spark.implicits._
    // Repeated terms per doc (exercises the weighting) plus a term pair
    // engineered to tie some bit votes (h and its complement-ish value).
    val occ = Seq(
      (1L, 5L), (1L, 5L), (1L, 9L), (2L, 1023L), (2L, 1023L), (2L, 0L),
      (3L, 0x7fffffffffffffL), (3L, 0L) // every bit ties at 0 → sig 0
    ).toDF("doc_id", "h")

    val agg = udaf(new SimHashAggregator(Bits))
    val typed = occ
      .groupBy("doc_id")
      .agg(agg(col("h")).as("simhash"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    val counted = occ.groupBy("doc_id", "h").agg(count(lit(1)).as("cnt"))
    val bitSums = (0 until Bits).map { j =>
      sum(
        col("cnt") * when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1)
      ).as(s"s$j")
    }
    val sums = counted.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val packed = (0 until Bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val decl = sums
      .select(col("doc_id"), packed.as("simhash"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    assert(typed == decl)
    assert(typed(3L) == 0L) // tied votes resolve to bit-clear on both paths
  }
}
