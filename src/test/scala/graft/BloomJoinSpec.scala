package graft

import graft.queries.{BloomJoin, Tables}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join (q75 / BloomJoin): exact-result parity
  * with the plain join, real pruning on the fact side, and the SQL
  * registration of the bloom pair.
  */
class BloomJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def orders = Tables.table(spark, sf, "orders")
  private def lineitem = Tables.table(spark, sf, "lineitem")
  private def hotOrders = orders.filter(col("o_totalprice") > 400000)

  test("semiJoinPruned is bit-identical to the plain left-semi join") {
    val pruned = BloomJoin
      .semiJoinPruned(
        lineitem,
        hotOrders.select("o_orderkey"),
        "l_orderkey",
        "o_orderkey",
        expectedItems = 10000
      )
      .orderBy("l_orderkey", "l_linenumber")
      .collect()
    val plain = lineitem
      .join(
        hotOrders.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"),
        "left_semi"
      )
      .orderBy("l_orderkey", "l_linenumber")
      .collect()
    assert(pruned.length == plain.length && pruned.sameElements(plain))
  }

  test("the bloom pre-filter actually prunes non-joining fact rows") {
    val bf = hotOrders
      .agg(BloomJoin.bloomAgg(col("o_orderkey"), 10000).as("bf"))
      .head()
      .getAs[Array[Byte]]("bf")
    val factRows = lineitem.count()
    val exact = lineitem
      .join(
        hotOrders.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"),
        "left_semi"
      )
      .count()
    val afterBloom =
      lineitem.filter(BloomJoin.mightContain(lit(bf), col("l_orderkey"))).count()
    // sound: no exact match may be bloom-rejected
    assert(afterBloom >= exact)
    // effective: with ~20% of orders hot, the filter must drop a large
    // share of the fact (fpp ~3% on the cold 80% leaves plenty of slack)
    assert(
      afterBloom < factRows / 2,
      s"bloom pruned too little: $afterBloom of $factRows fact rows survived"
    )
  }

  test("SQL spelling (scalar subquery) matches the unpruned query") {
    orders.createOrReplaceTempView("graft_orders")
    lineitem.createOrReplaceTempView("graft_lineitem")
    val withBloom = spark
      .sql("""
        SELECT l_orderkey FROM graft_lineitem
        WHERE graft_might_contain(
                (SELECT graft_bloom_filter_agg(xxhash64(o_orderkey), 10000)
                 FROM graft_orders WHERE o_totalprice > 400000),
                xxhash64(l_orderkey))
          AND l_orderkey IN (SELECT o_orderkey FROM graft_orders
                             WHERE o_totalprice > 400000)
        ORDER BY l_orderkey
      """)
      .collect()
    val plain = spark
      .sql("""
        SELECT l_orderkey FROM graft_lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM graft_orders
                             WHERE o_totalprice > 400000)
        ORDER BY l_orderkey
      """)
      .collect()
    assert(withBloom.sameElements(plain))
  }

  test("q75 executed plan probes the bloom filter on the fact side") {
    val df = SparkEntry.queries("q75_bloom_prefilter")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(
      plan.contains("might_contain"),
      s"bloom probe missing from plan:\n$plan"
    )
  }

  test("SQL registrations reject wrong arity loudly") {
    orders.createOrReplaceTempView("graft_orders")
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_bloom_filter_agg() FROM graft_orders").collect()
    }
    assert(e1.getMessage.contains("graft_bloom_filter_agg"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_might_contain(CAST(NULL AS BINARY)) ").collect()
    }
    assert(e2.getMessage.contains("graft_might_contain"))
  }
}
