package graft

import graft.queries.SaltedJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured skew-mitigation numbers for SCALE.md (the SkewSpec proves
  * semantics; this measures the wall-clock story on the same shape).
  *
  * Builds a Zipf-skewed fact (one key owning ~30% of N rows, remainder
  * uniform over 100k keys), joins a 100k-row dimension, aggregates — and
  * times three plans: unmitigated SMJ (AQE skew-split off), AQE
  * skew-split on, and SaltedJoin. Broadcast is disabled throughout:
  * a 100k-row dim would broadcast at this size, and the point is to
  * measure the shuffle-join skew behavior a corpus-sized dim forces.
  *
  * Usage: tools/run_main.sh graft.SkewBench [nRows] [iters] [hotPct]
  */
object SkewBench {

  private val NKeys = 100000

  private def skewedFact(s: org.apache.spark.sql.SparkSession, n: Long, hotPct: Int): DataFrame =
    s.range(n)
      .select(
        when(pmod(xxhash64(col("id")), lit(100)) < hotPct, lit(0L))
          .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(NKeys)))
          .as("k"),
        (col("id") % 1000).as("payload")
      )

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(30000000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val hotPct = args.lift(2).map(_.toInt).getOrElse(30)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-skewbench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val fact = skewedFact(spark, n, hotPct).cache()
    fact.count() // materialize outside the timed region
    val dim = spark
      .range(NKeys)
      .select(col("id").as("k"), (col("id") * 2 + 1).as("weight"))

    // GLOBAL aggregate after the join (the scan-heavy report shape): a
    // groupBy(k) here would reuse the join's partitioning and
    // OptimizeSkewedJoin would decline to split rather than add a
    // shuffle (SkewSpec documents this), making the AQE arm a no-op.
    def agg(joined: DataFrame): Long =
      joined
        .agg(count(lit(1)).as("cnt"), sum(col("payload") * col("weight")).as("s"))
        .head()
        .getLong(0)

    def time(label: String)(body: => Long): Double = {
      val ts = (1 to iters).map { i =>
        val t0 = System.nanoTime()
        val rows = body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$label iter$i $dt%.3f s ($rows groups)")
        dt
      }
      val med = median(ts)
      println(f"$label MEDIAN $med%.3f s")
      med
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val unmitigated = time("plain_smj_no_skew_handling")(agg(fact.join(dim, Seq("k"))))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // proportional thresholds: the defaults (256 MB partition floor,
    // 64 MB advisory) are cluster-sized; at this bench's single-digit-GB
    // shuffle the hot partition sits near the floor and AQE would split
    // it into only a handful of pieces. 32 MB/8 MB keeps piece count
    // proportional to what a 100 TB hot partition would get.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    val aqe = time("aqe_skew_join")(agg(fact.join(dim, Seq("k"))))
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    val salted = time("salted_join_f8")(agg(SaltedJoin.inner(fact, dim, "k", 8)))

    // ---- keyed-aggregate-after-join arm: the shape where salting WINS.
    // groupBy(join key) directly downstream reuses the join's hash
    // partitioning, so OptimizeSkewedJoin declines to split the hot
    // partition rather than add a shuffle (SkewSpec pins this in the
    // plan) — the AQE arm degenerates to the unmitigated one and the
    // whole hot key lands in ONE task through join AND aggregate. The
    // salt bounds that task by construction: the join runs on
    // (k, salt), the partial aggregation collapses each salt shard
    // map-side, and the final groupBy(k) shuffles saltFactor rows per
    // hot key, not 30% of the corpus.
    def aggKeyed(joined: DataFrame): Long =
      joined
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("payload") * col("weight")).as("s"))
        .agg(count(lit(1)))
        .head()
        .getLong(0)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val unmitigatedKeyed =
      time("keyed_plain_smj")(aggKeyed(fact.join(dim, Seq("k"))))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    val aqeKeyed = time("keyed_aqe_skew_join")(aggKeyed(fact.join(dim, Seq("k"))))
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    val saltedKeyed =
      time("keyed_salted_join_f8")(aggKeyed(SaltedJoin.inner(fact, dim, "k", 8)))

    println(
      f"""{"n":$n,"hot_share":${hotPct / 100.0}%.2f,"unmitigated_sec":$unmitigated%.3f,""" +
        f""""aqe_skew_sec":$aqe%.3f,"salted_sec":$salted%.3f,""" +
        f""""keyed_unmitigated_sec":$unmitigatedKeyed%.3f,""" +
        f""""keyed_aqe_sec":$aqeKeyed%.3f,"keyed_salted_sec":$saltedKeyed%.3f}"""
    )
    spark.stop()
  }
}
