package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the governance audits (queries/Audit): the FK
  * report's counts must match independent per-table aggregates, and the
  * k-anonymity report must partition the customer table with naively
  * recomputed flags.
  */
class AuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q117 FK audit matches independent counts; testdata has no orphans") {
    val rows = SparkEntry
      .queries("q117_fk_audit")(spark, sf)
      .collect()
      .map(r =>
        r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      )
      .toMap
    assert(rows.size == 5)
    def cnt(t: String): Long =
      graft.queries.Tables.table(spark, sf, t).count()
    assert(rows("lineitem.orders")._1 == cnt("lineitem"))
    assert(rows("orders.customer")._1 == cnt("orders"))
    assert(rows("customer.nation")._1 == cnt("customer"))
    rows.foreach { case (name, (child, nulls, orphans, refd, parents)) =>
      assert(nulls == 0 && orphans == 0, s"$name: unexpected orphans")
      assert(refd <= parents, name)
      assert(child >= refd, name)
    }
    // every nation key is referenced by some customer (dense synthetic data)
    assert(rows("customer.nation")._4 == cnt("nation"))
  }

  test("q118 k-anonymity partitions customer; flags recomputed naively") {
    val out = SparkEntry
      .queries("q118_k_anonymity")(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      )
      .toMap
    val cust = graft.queries.Tables
      .table(spark, sf, "customer")
      .select(
        col("c_nationkey").cast("long"),
        col("c_mktsegment"),
        round(col("c_acctbal") * 100.0, 0).cast("long").as("ac")
      )
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    assert(out.values.map(_._1).sum == cust.length.toLong)
    cust.groupBy(_._1).foreach { case (qi, grp) =>
      val buckets = grp.map(g => Math.floorDiv(g._2, 100000L)).distinct.length
      val (n, l, kOk, lOk) = out(qi)
      assert(n == grp.length && l == buckets, s"$qi")
      assert(kOk == (n >= 5) && lOk == (l >= 3), s"$qi")
    }
  }

  test("q127 Benford digits partition orders; expected law sums to 1") {
    val rows = SparkEntry
      .queries("q127_benford_audit")(spark, sf)
      .collect()
    // naive replay: first digit from the exact centi string
    val naive = graft.queries.Tables
      .table(spark, sf, "orders")
      .select(round(col("o_totalprice") * 100.0, 0).cast("long").as("c"))
      .collect()
      .map(_.getLong(0))
      .filter(_ > 0)
      .groupBy(_.toString.head.asDigit)
      .map { case (d, v) => d.toLong -> v.length.toLong }
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == naive)
    assert(rows.map(_.getLong(1)).sum == naive.values.sum)
    // the gridded Benford mass function must sum to ~1 and each observed
    // share to exactly n/total
    val total = naive.values.sum.toDouble
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-5)
    rows.foreach { r =>
      assert(
        math.abs(r.getDouble(2) - r.getLong(1) / total) < 1e-6,
        s"digit ${r.getLong(0)}"
      )
      assert(r.getDouble(4) >= 0.0) // chi-square terms are non-negative
    }
  }

  test("q130 bucket-pruned diff is complete: equals the direct full-table compare") {
    val got = SparkEntry
      .queries("q130_table_diff")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    // direct compare with NO bucket machinery: full join of the replicas
    val (ra, rb) = graft.queries.Audit.q130Replicas(spark, sf)
    val a = ra.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = rb.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ((a.keySet ++ b.keySet).toSeq.sorted.flatMap { k =>
      (a.get(k), b.get(k)) match {
        case (Some(_), None)                      => Some(k -> "missing_in_b")
        case (None, Some(_))                      => Some(k -> "missing_in_a")
        case (Some(x), Some(y)) if x != y         => Some(k -> "value_mismatch")
        case _                                    => None
      }
    })
    assert(got == want, s"got ${got.size} diffs, want ${want.size}")
    assert(want.nonEmpty, "constructed divergence produced no diffs")
    assert(want.exists(_._2 == "missing_in_b") && want.exists(_._2 == "value_mismatch"))
    // the point of bucketing: the key join touches a small fraction of rows
    val diffs = want.size.toDouble
    assert(diffs / a.size < 0.05, s"diff density ${diffs / a.size} too high for the prune story")
  }

  test("q130 diff reports st-only divergence (every hashed column is compared)") {
    import spark.implicits._
    // rh hashes pc AND st; a pair differing only in st must surface as
    // value_mismatch, not vanish after the bucket flag (the under-report
    // an earlier pc-only compare would have produced)
    val a = Seq((1L, 100L, "O"), (2L, 200L, "F"), (3L, 300L, "P"))
      .toDF("k", "pc", "st")
    val b = Seq((1L, 100L, "O"), (2L, 200L, "X"), (3L, 301L, "P"))
      .toDF("k", "pc", "st")
    val got = graft.queries.Audit
      .tableDiff(a, b)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    assert(got == Seq(2L -> "value_mismatch", 3L -> "value_mismatch"), got.mkString(", "))
  }
}
