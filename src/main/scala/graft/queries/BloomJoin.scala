package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Explicit bloom-filter semi-join pruning — the manual twin of Spark's
  * own `InjectRuntimeFilter` optimization, exposed as an operator so a
  * pipeline can prune a fact scan against a filtered dimension even where
  * the automatic rule declines to fire (non-shuffle-join plans, pruning
  * ahead of an expensive per-row stage, cross-job reuse of a built
  * filter).
  *
  * Why this matters at 100 TB: a selective dimension predicate
  * ("high-value orders", "flagged accounts") typically reaches the fact
  * table only AT the join, after the full fact has been scanned and
  * shuffled. A bloom filter over the dimension keys is a few MB —
  * model-parameter-sized, independent of fact cardinality — and applied
  * as a fact-side pre-filter it drops non-joining rows BEFORE the
  * exchange, which is exactly where the 100× win lives (shuffle bytes
  * scale with fact rows, the filter build with dim rows). False
  * positives pass the bloom and are removed by the exact join that
  * follows, so results are bit-identical to the unpruned plan — the
  * oracle for q75 is therefore the PLAIN semi join, and any bloom bug
  * that changed results would hash-fail.
  *
  * Both halves are Spark's own codegen'd catalyst expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair
  * `InjectRuntimeFilter` plants), reached through the same
  * `ColumnBridge` the vector kernels use; `GraftExtensions` also
  * registers them as SQL functions (`graft_bloom_filter_agg` /
  * `graft_might_contain`) so the scalar-subquery spelling below runs
  * from pure `spark.sql` — the filter is built, broadcast, and applied
  * entirely in-plan (the subquery materializes once, no driver collect
  * in user code).
  *
  * Keys are hashed to int64 with `xxhash64` on BOTH sides (the
  * aggregate's contract: it sketches pre-hashed longs), seed-stable
  * across jobs, so a filter built today prunes tomorrow's facts.
  */
object BloomJoin {

  /** Aggregate: build a bloom filter over pre-hashed (`xxhash64`) keys.
    * `expectedItems` sizes the bit array (fpp ~3% at the default
    * bits-per-item); overshooting wastes only filter bytes, never
    * correctness.
    */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expr(xxhash64(key)),
        expectedItems
      ).toAggregateExpression()
    )

  /** Probe: true if `key` might be in `bloom` (false ⇒ definitely not —
    * the direction that makes pre-filtering sound).
    */
  def mightContain(bloom: Column, key: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        ColumnBridge.expr(bloom),
        ColumnBridge.expr(xxhash64(key))
      )
    )

  /** Column-API form: left-semi join `fact` to `dim` on
    * `factKey == dimKey`, with a bloom pre-filter on the fact side built
    * from the (already filtered) dimension. The one-row aggregate pull is
    * filter-sized (KBs–MBs, bounded by `expectedItems`), the same class
    * of driver traffic as a broadcast-hash-join build — and the filter
    * value returns to every executor as a literal, exactly how
    * `InjectRuntimeFilter`'s materialized subquery travels.
    */
  def semiJoinPruned(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long
  ): DataFrame = {
    val bf = dim
      .agg(bloomAgg(col(dimKey), expectedItems).as("bf"))
      .head()
      .getAs[Array[Byte]]("bf")
    fact
      .filter(mightContain(lit(bf), col(factKey)))
      .join(
        dim.select(col(dimKey).as(factKey)),
        Seq(factKey),
        "left_semi"
      )
  }

  /** q75: per-order line summary restricted to high-value orders, with
    * the bloom pre-filter built and probed in a single SQL statement —
    * the scalar subquery materializes the filter once and broadcasts it
    * to the fact scan. The trailing IN provides exactness; the oracle is
    * the same query WITHOUT the bloom clause (results must be
    * bit-identical by construction).
    */
  private def q75(s: SparkSession, dir: String): DataFrame = {
    Tables.table(s, dir, "orders").createOrReplaceTempView("graft_orders")
    Tables.table(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
    s.sql("""
      SELECT l_orderkey,
             count(*) AS n_items,
             round(sum(l_extendedprice), 2) AS revenue
      FROM graft_lineitem
      WHERE graft_might_contain(
              (SELECT graft_bloom_filter_agg(xxhash64(o_orderkey), 100000)
               FROM graft_orders WHERE o_totalprice > 400000),
              xxhash64(l_orderkey))
        AND l_orderkey IN (SELECT o_orderkey FROM graft_orders
                           WHERE o_totalprice > 400000)
      GROUP BY l_orderkey
      ORDER BY l_orderkey
    """)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_bloom_prefilter" -> q75
  )

  val oracleSql: Map[String, String] = Map(
    "q75_bloom_prefilter" ->
      """SELECT l_orderkey,
        |       count(*) AS n_items,
        |       round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_totalprice > 400000)
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin
  )
}
