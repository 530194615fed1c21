package graft

import graft.queries.SaltedJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation proof on actually-skewed data. The synthetic testdata
  * tables are uniform, so SaltedJoin and AQE's skew-join machinery never
  * meet a hot key there; this spec builds a Zipf-shaped fact frame (one
  * key owning ~30% of all rows — the hot-account / hot-user shape of real
  * flowlog and event corpora) and proves, on it:
  *
  *  1. salting is semantics-preserving: SaltedJoin.inner returns exactly
  *     the plain join's aggregate (the mitigation must never change
  *     results, only the task-size distribution);
  *  2. the salt actually splits the hot key across sub-keys (the largest
  *     post-salt group shrinks by ~saltFactor), which is the property
  *     that bounds the largest shuffle task at 100 TB;
  *  3. AQE's runtime skew-join split fires on the hot partition of an
  *     unsalted sort-merge join (thresholds lowered to make the test
  *     corpus eligible — the rewrite, not the byte constants, is the
  *     contract) and returns the same result.
  *
  * The measured wall-clock side of this story (hot-key medians with and
  * without mitigation at 30M rows) is graft.SkewBench → SCALE.md.
  */
class SkewSpec extends SparkSpec {

  private val NKeys = 1000

  /** ~30% of rows on key 0, remainder uniform over NKeys. xxhash64 of the
    * row id keeps the assignment deterministic across retries/partitions
    * (a rand()-based skew would not reproduce).
    */
  private def skewedFact(n: Long): DataFrame =
    spark
      .range(n)
      .select(
        when(pmod(xxhash64(col("id")), lit(100)) < 30, lit(0L))
          .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(NKeys)))
          .as("k"),
        (col("id") % 1000).as("payload")
      )

  private def dim: DataFrame =
    spark
      .range(NKeys)
      .select(col("id").as("k"), (col("id") * 2 + 1).as("weight"))

  private def summarize(joined: DataFrame): Seq[org.apache.spark.sql.Row] =
    joined
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("payload") * col("weight")).as("s"))
      .orderBy("k")
      .collect()
      .toSeq

  test("salted join on Zipf-skewed data returns exactly the plain join result") {
    val fact = skewedFact(200000L)
    val plain = summarize(fact.join(dim, Seq("k")))
    val salted = summarize(SaltedJoin.inner(fact, dim, "k", 8))
    // sanity: the skew is real — key 0 holds ~30% of the fact rows
    val hot = plain.find(_.getLong(0) == 0L).get.getLong(1)
    assert(hot > 50000L, s"hot key not hot: $hot rows")
    assert(plain == salted)
  }

  test("salt splits the hot key: largest post-salt group shrinks ~saltFactor x") {
    val saltFactor = 8
    val fact = skewedFact(200000L)
    val salted = fact.withColumn(
      "_graft_salt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(saltFactor))
        .cast("int")
    )
    val unsaltedMax = fact
      .groupBy("k")
      .count()
      .agg(max("count"))
      .head()
      .getLong(0)
    val saltedMax = salted
      .groupBy("k", "_graft_salt")
      .count()
      .agg(max("count"))
      .head()
      .getLong(0)
    // xxhash64 spreads the hot key's rows near-uniformly over the
    // sub-keys; allow 30% slack over the ideal 1/saltFactor
    assert(
      saltedMax <= (unsaltedMax / saltFactor * 13) / 10,
      s"salt did not split the hot key: max group $unsaltedMax -> $saltedMax"
    )
  }

  test("AQE skew join splits the hot partition of an unsalted SMJ (same result)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // coalescing merges the small partitions and would mask the skew
      // detection on this tiny corpus; production keeps it on
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false"
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = skewedFact(1000000L)
      // a GLOBAL aggregate downstream, deliberately: a groupBy(k) right
      // after the join would reuse the join's hash partitioning, and
      // OptimizeSkewedJoin declines to split when that would introduce
      // an extra shuffle (forceOptimizeSkewedJoin=false, the production
      // default). The global-agg shape is the one AQE mitigates for free.
      def report(df: DataFrame) = df
        .join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("payload") * col("weight")).as("s"))
      val joined = report(fact)
      val rows = joined.collect().toSeq
      val plan = joined.queryExecution.executedPlan.toString
      assert(
        plan.toLowerCase.contains("skew"),
        s"AQE did not mark the hot partition as skewed:\n$plan"
      )
      // parity vs the same join with skew handling off
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      assert(rows == report(fact).collect().toSeq)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("aggregation needs NO skew mitigation: partial aggregation absorbs the hot key map-side") {
    // The fourth arm of the skew story, and the reason the repo salts
    // joins but never aggregates: a hash aggregate pre-aggregates each
    // input partition BEFORE the shuffle, so the hot key contributes at
    // most one row per map task to the exchange — the reduce-side task
    // for key 0 receives #map-tasks rows, not 30% of the corpus.
    val fact = skewedFact(1000000L)
    val agg = fact.groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    // partial_count/partial_sum below the exchange = map-side combine
    val partialIdx = plan.indexOf("partial_count")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(partialIdx >= 0, s"no partial aggregation in plan:\n$plan")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"partial agg not below the exchange (plans print top-down):\n$plan")
    // and the result is exactly right on the skewed data
    val row0 = agg.filter(col("k") === 0).collect()(0)
    val total = agg.agg(sum("n")).collect()(0).getLong(0)
    assert(total == 1000000L)
    assert(row0.getLong(1) > 250000L, s"hot key smaller than built: ${row0.getLong(1)}")
  }
}
