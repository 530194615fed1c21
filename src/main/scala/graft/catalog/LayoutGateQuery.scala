package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q102: Z-order layout + two-dimensional pruned scan as a driver-gated
  * query — completing the physical-layout trilogy behind the oracle:
  * partition pruning (the reference's own design, E11–E13), bucketed
  * join layout (q100), and now multi-column Z-order clustering. The
  * reference prunes whole (account, dt) directories
  * (`convert.go:20-35`, `template.yml:122-126`); [[Layout.writeZOrdered]]
  * extends pruning INSIDE a table to rectangles of two high-cardinality
  * filter columns via Morton-curve file cuts.
  *
  * Gate construction: lineitem is rewritten ONCE per JVM onto the
  * Z-curve over (l_partkey, l_suppkey) (16 grid-aligned files,
  * app-id-keyed tmpdir), then a RECTANGLE probe — a range filter on
  * BOTH dimensions, the access pattern Z-order exists for — aggregates
  * per supplier. The oracle computes the identical aggregate from the
  * ORIGINAL parquet: equality proves the curve rewrite round-tripped
  * every row and the footer-pruned scan (LayoutSpec pins the pruning
  * fractions and grid-aligned file cuts) dropped none. Filter constants
  * sit inside every SF's key domain (partkey ≥ 200 values, suppkey ≥ 10
  * values at sf0.001), so the gate is SF-portable.
  *
  * Numeric determinism: quantity/price snap to exact BIGINT centi-units
  * before summing (the q100 convention).
  */
object LayoutGateQuery {

  private def ensureZOrdered(s: SparkSession, dir: String): String =
    synchronized {
      val out = graft.TempDirs.deleteOnExit(
        new java.io.File(
          sys.props("java.io.tmpdir"),
          s"graft_zorder_gate_${s.sparkContext.applicationId}_" +
            dir.replaceAll("[^a-zA-Z0-9.]", "_")
        ).getPath
      )
      if (!new java.io.File(out, "_SUCCESS").exists())
        Layout.writeZOrdered(
          graft.queries.Tables
            .table(s, dir, "lineitem")
            .select(
              col("l_orderkey"),
              col("l_partkey"),
              col("l_suppkey"),
              col("l_quantity"),
              col("l_extendedprice")
            ),
          out,
          numFiles = 16,
          "l_partkey",
          "l_suppkey"
        )
      out
    }

  private def q102(s: SparkSession, dir: String): DataFrame =
    s.read
      .parquet(ensureZOrdered(s, dir))
      .filter(
        col("l_partkey") >= 20 && col("l_partkey") < 90 &&
          col("l_suppkey") >= 2 && col("l_suppkey") < 7
      )
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_rows"),
        (sum(round(col("l_quantity") * 100.0, 0).cast("long")) / 100.0)
          .as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100.0, 0).cast("long")) / 100.0)
          .as("sum_price"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok")
      )
      .orderBy("l_suppkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_zorder_pruned_scan" -> q102
  )

  // The oracle reads the ORIGINAL lineitem — equality proves the
  // Z-order rewrite + pruned rectangle scan computed the same relation.
  val oracleSql: Map[String, String] = Map(
    "q102_zorder_pruned_scan" ->
      """SELECT l_suppkey,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS BIGINT)
        |    / 100.0 AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT)
        |    / 100.0 AS sum_price,
        |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
        |FROM lineitem
        |WHERE l_partkey >= 20 AND l_partkey < 90
        |  AND l_suppkey >= 2 AND l_suppkey < 7
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin
  )
}
