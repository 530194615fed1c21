package graft

import graft.functions.CountMinAggregator
import graft.llm.FrequentItems
import org.apache.spark.sql.functions._

/** Count-Min sketch guarantees on a deterministic Zipf-ish stream:
  * estimates never fall below true counts, overshoot respects the
  * eps·N bound, and the distributed (partitioned, merged) sketch equals
  * the single-pass brute-force sketch exactly.
  */
class CountMinSpec extends SparkSpec {

  private val P = FrequentItems.P
  private val D = FrequentItems.Depth
  private val W = FrequentItems.Width
  private lazy val (a, b) = (FrequentItems.cmA, FrequentItems.cmB)

  // key k appears ~N/k times (harmonic/Zipf) — heavy head, long tail
  private val stream: Seq[Long] =
    (1 to 200).flatMap(k => Seq.fill(400 / k)(k.toLong))

  private def hashOf(k: Long): Long = {
    // any deterministic base hash works for the property tests
    val h = java.lang.Long.rotateLeft(k * 0x9e3779b97f4a7c15L, 31)
    ((h % P) + P) % P
  }

  test("distributed sketch == brute-force sketch; bounds hold") {
    import spark.implicits._
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    val brute = new Array[Long](D * W)
    stream.foreach { k =>
      val h = hashOf(k)
      (0 until D).foreach(i => brute(i * W + (((a(i) * h + b(i)) % P) % W).toInt) += 1L)
    }

    val agg = udaf(new CountMinAggregator(D, W, P, a, b))
    val sketch = stream
      .map(hashOf)
      .toDF("h")
      .repartition(8) // force multi-partition partials + merge
      .agg(agg(col("h")).as("sk"))
      .collect()(0)
      .getSeq[Long](0)
      .toArray

    assert(sketch.sameElements(brute))

    val n = stream.size.toLong
    val eps = math.E / W
    truth.foreach { case (k, cnt) =>
      val h = hashOf(k)
      val est = (0 until D)
        .map(i => sketch(i * W + (((a(i) * h + b(i)) % P) % W).toInt))
        .min
      assert(est >= cnt, s"CMS underestimated key $k")
      assert(est - cnt <= eps * n, s"key $k overshoot ${est - cnt} > eps*N")
    }
  }

  test("CMS heavy hitters are a superset of exact heavy hitters (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry
      .queries("q48_heavy_hitters")(spark, dir)
      .select("w")
      .collect()
      .map(_.getString(0))
      .toSet
    val cms = SparkEntry
      .queries("q48b_heavy_hitters_cms")(spark, dir)
      .select("w")
      .collect()
      .map(_.getString(0))
      .toSet
    assert(exact.subsetOf(cms))
    assert(exact.nonEmpty)
  }
}
