package graft

import graft.functions.{CountMinAggregator, MinHashAggregator, SimHashAggregator}
import graft.llm.{Dedup, FrequentItems}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Distributed-correctness properties of the typed aggregators: a
  * partial-aggregation plan splits the input arbitrarily across
  * partitions and merge order is scheduler-dependent, so the result must
  * be invariant under ANY permutation and ANY partitioning of the input.
  * ScalaCheck-generated streams run through 1-partition and 8-partition
  * plans (shuffled) and must agree exactly.
  */
class AggregatorPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(11)

  private def streams(n: Int): Seq[List[Long]] =
    Gen
      .listOfN(n, Gen.nonEmptyListOf(Gen.chooseNum(0L, FrequentItems.P - 1)))
      .sample
      .getOrElse(fail("generator exhausted"))

  private def viaSpark(hs: Seq[Long], parts: Int, agg: Column): Any = {
    import spark.implicits._
    hs.toDF("h").repartition(parts).agg(agg).collect()(0).get(0)
  }

  private def invariant(agg: Column): Unit =
    streams(5).foreach { hs =>
      val one = viaSpark(hs, 1, agg)
      val eight = viaSpark(rnd.shuffle(hs), 8, agg)
      assert(one == eight, s"partitioning changed the aggregate for n=${hs.size}")
    }

  test("CMS sketch is partitioning- and order-invariant") {
    invariant(
      udaf(
        new CountMinAggregator(
          FrequentItems.Depth,
          FrequentItems.Width,
          FrequentItems.P,
          FrequentItems.cmA,
          FrequentItems.cmB
        )
      ).apply(col("h"))
    )
  }

  test("SimHash signature is partitioning- and order-invariant") {
    invariant(udaf(new SimHashAggregator(60)).apply(col("h")))
  }

  test("MinHash signature is partitioning- and order-invariant") {
    invariant(
      udaf(new MinHashAggregator(Dedup.hashA, Dedup.hashB, Dedup.MinHashP)).apply(col("h"))
    )
  }
}
