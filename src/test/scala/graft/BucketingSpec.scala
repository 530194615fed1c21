package graft

import graft.queries.{Bucketing, Tables}
import org.apache.spark.sql.functions._

/** Bucketed-layout proof: the same equi-join that shuffles both sides on
  * plain parquet plans with ZERO Exchange over bucketed tables, with
  * identical results — the write-once/amortize-forever trade SCALE.md
  * describes. Runs with broadcast disabled so the shuffle-join path is
  * actually exercised (otherwise AQE broadcasts the small side and the
  * assertion would be vacuous at test scale).
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def withShuffleJoinOnly[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed equi-join plans with zero Exchange; plain parquet join shuffles") {
    val orders = Tables.table(spark, sf, "orders")
    val customer = Tables.table(spark, sf, "customer")
    Bucketing.writeBucketed(
      orders.withColumnRenamed("o_custkey", "custkey"),
      "bkt_orders",
      "custkey",
      8
    )
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "custkey"),
      "bkt_customer",
      "custkey",
      8
    )
    try {
      withShuffleJoinOnly {
        val bucketed = Bucketing.coLocatedJoin(spark, "bkt_orders", "bkt_customer", "custkey")
        val bucketedPlan = bucketed.queryExecution.executedPlan.toString
        assert(
          !bucketedPlan.contains("Exchange"),
          s"bucketed join still shuffles:\n$bucketedPlan"
        )

        // control: the identical join over the plain parquet tables DOES
        // exchange both sides — the cost bucketing pre-pays
        val plain = orders
          .withColumnRenamed("o_custkey", "custkey")
          .join(customer.withColumnRenamed("c_custkey", "custkey"), "custkey")
        val plainPlan = plain.queryExecution.executedPlan.toString
        assert(plainPlan.contains("Exchange"), s"control join did not shuffle:\n$plainPlan")

        // same rows either way
        assert(bucketed.count() == plain.count())

        // bucketing serves aggregation on the key too: no Exchange before
        // the hash aggregate
        val agg = spark
          .table("bkt_orders")
          .groupBy("custkey")
          .agg(count(lit(1)).as("n"))
        val aggPlan = agg.queryExecution.executedPlan.toString
        assert(!aggPlan.contains("Exchange"), s"bucketed aggregate shuffled:\n$aggPlan")
        assert(agg.count() == orders.select("o_custkey").distinct().count())
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }
}
