package graft

import org.apache.spark.sql.functions._

/** Pins for the custom as-of join operator (plans/AsOfJoin.scala):
  * crafted-corpus semantics (inclusive boundary, key isolation,
  * unmatched-left NULLs, null-time rows), equality with a naive
  * driver-side as-of on the real events data, the plan shape (the
  * custom exec, one exchange per side, no Window / no candidate-pair
  * join), and the disjoint-attributes guard.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def asOf(
      l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame
  ) = graft.plans.AsOf.join(l, r, "lk", "rk", "lt", "rt")

  test("crafted semantics: inclusive boundary, key isolation, outer NULLs") {
    val left = Seq(
      (1L, 10L, "p_a"), // matches rt=10 (inclusive boundary)
      (1L, 25L, "p_b"), // matches rt=20, not key 2's rt=24
      (2L, 5L, "p_c"), // before key 2's first right row: NULL
      (3L, 99L, "p_d") // key with no right rows at all: NULL
    ).toDF("lk", "lt", "pl")
    val right = Seq(
      (1L, 10L, "v10"),
      (1L, 20L, "v20"),
      (2L, 24L, "v24")
    ).toDF("rk", "rt", "pv")
    val got = asOf(left, right)
      .select("pl", "pv", "rt")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1)
    assert(
      got.toSeq == Seq(
        ("p_a", Some("v10"), 10L),
        ("p_b", Some("v20"), 20L),
        ("p_c", None, -1L),
        ("p_d", None, -1L)
      ),
      got.mkString(", ")
    )
  }

  test("tolerance: beyond-bound matches revert to unmatched, per LEFT row") {
    val left = Seq(
      (1L, 15L, "near"), // gap 5 ≤ 10: matches v10
      (1L, 40L, "far"), // latest is still v10 but gap 30 > 10: NULL
      (1L, 55L, "near2") // latest is v50, gap 5: matches
    ).toDF("lk", "lt", "pl")
    val right = Seq((1L, 10L, "v10"), (1L, 50L, "v50")).toDF("rk", "rt", "pv")
    val got = graft.plans.AsOf
      .join(left, right, "lk", "rk", "lt", "rt", Some(10L))
      .select("pl", "pv")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
      .sortBy(_._1)
    // the SAME candidate (v10) is in range for lt=15 and stale for
    // lt=40 — the bound must be re-checked per left row, not once at
    // candidate load
    assert(
      got.toSeq == Seq(
        ("far", None),
        ("near", Some("v10")),
        ("near2", Some("v50"))
      ),
      got.mkString(", ")
    )
  }

  test("q143's one-hour bound is load-bearing on the real corpus") {
    val sf = "/root/testdata/sf0.001"
    val unbounded = SparkEntry
      .queries("q124_asof_custom_operator")(spark, sf)
      .collect()
    val bounded = SparkEntry
      .queries("q143_asof_tolerance")(spark, sf)
      .collect()
    assert(unbounded.length == bounded.length) // left outer: same rows
    val reverted = unbounded.zip(bounded).count { case (u, b) =>
      !u.isNullAt(2) && b.isNullAt(2)
    }
    // some purchase's latest view is over an hour stale, and every
    // surviving match agrees with the unbounded operator
    assert(reverted > 0, "tolerance never fired — bound not load-bearing")
    unbounded.zip(bounded).foreach { case (u, b) =>
      if (!b.isNullAt(2)) assert(u.getLong(2) == b.getLong(2) && u.getLong(4) <= 3600L * 1000000L)
    }
  }

  test("forward direction: earliest at-or-after, inclusive boundary, tolerance") {
    val left = Seq(
      (1L, 10L, "p_a"), // rt=10 at the boundary: inclusive
      (1L, 11L, "p_b"), // earliest ≥ 11 is rt=20
      (1L, 21L, "p_c"), // earliest ≥ 21 is rt=90 — beyond tol 30: NULL
      (2L, 50L, "p_d"), // key 2 has only earlier rows: NULL
      (3L, 7L, "p_e") // no right rows for key: NULL
    ).toDF("lk", "lt", "pl")
    val right = Seq(
      (1L, 10L, "v10"),
      (1L, 20L, "v20"),
      (1L, 90L, "v90"),
      (2L, 24L, "v24")
    ).toDF("rk", "rt", "pv")
    val got = graft.plans.AsOf
      .join(left, right, "lk", "rk", "lt", "rt", Some(30L), "forward")
      .select("pl", "pv")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
      .sortBy(_._1)
    assert(
      got.toSeq == Seq(
        ("p_a", Some("v10")),
        ("p_b", Some("v20")),
        ("p_c", None),
        ("p_d", None),
        ("p_e", None)
      ),
      got.mkString(", ")
    )
    // a consumed earlier row must not leak into forward matches, and the
    // SAME forward row may serve multiple left rows
    val multi = graft.plans.AsOf
      .join(
        Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("lk", "lt", "pl"),
        Seq((1L, 5L, "v5")).toDF("rk", "rt", "pv"),
        "lk", "rk", "lt", "rt", None, "forward"
      )
      .select("pv")
      .collect()
      .map(_.getString(0))
    assert(multi.toSeq == Seq("v5", "v5"))
  }

  test("nearest direction: closer side wins, ties to backward, tolerance per side") {
    val left = Seq(
      (1L, 14L, "p_a"), // b=10 (d4) vs f=20 (d6) → backward v10
      (1L, 17L, "p_b"), // b=10 (d7) vs f=20 (d3) → forward v20
      (1L, 15L, "p_c"), // tie d5/d5 → backward v10
      (1L, 100L, "p_d"), // only backward 20 at d80 — beyond tol: NULL
      (2L, 3L, "p_e") // only forward 24 at d21 within tol → v24
    ).toDF("lk", "lt", "pl")
    val right = Seq(
      (1L, 10L, "v10"),
      (1L, 20L, "v20"),
      (2L, 24L, "v24")
    ).toDF("rk", "rt", "pv")
    val got = graft.plans.AsOf
      .join(left, right, "lk", "rk", "lt", "rt", Some(30L), "nearest")
      .select("pl", "pv")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
      .sortBy(_._1)
    assert(
      got.toSeq == Seq(
        ("p_a", Some("v10")),
        ("p_b", Some("v20")),
        ("p_c", Some("v10")),
        ("p_d", None),
        ("p_e", Some("v24"))
      ),
      got.mkString(", ")
    )
  }

  test("forward/nearest equal a naive driver-side replay on the real corpus") {
    val e = queries.Tables
      .table(spark, "/root/testdata/sf0.001", "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us")
      )
    val p = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("puser"), col("event_id").as("pid"), col("us").as("pt"))
    val v = e
      .filter(col("event_type") === "view")
      .groupBy(col("user_id").as("vuser"), col("us").as("vt"))
      .agg(max("event_id").as("vid"))
    val vRows = v.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = vRows.groupBy(_._1).map { case (u, rs) => u -> rs.sortBy(_._2) }
    val tol = 3600L * 1000000L
    def naive(direction: String): Map[Long, Option[Long]] =
      p.collect()
        .map { r =>
          val (u, pid, pt) = (r.getLong(0), r.getLong(1), r.getLong(2))
          val vs = byUser.getOrElse(u, Array.empty[(Long, Long, Long)])
          val b = vs.filter(x => x._2 <= pt && pt - x._2 <= tol).lastOption
          val f = vs.find(x => x._2 >= pt && x._2 - pt <= tol)
          val pick = direction match {
            case "forward" => f
            case "nearest" =>
              (b, f) match {
                case (Some(bb), Some(ff)) =>
                  if (pt - bb._2 <= ff._2 - pt) Some(bb) else Some(ff)
                case _ => b.orElse(f)
              }
          }
          pid -> pick.map(_._3)
        }
        .toMap
    Seq("forward", "nearest").foreach { d =>
      val got = graft.plans.AsOf
        .join(p, v, "puser", "vuser", "pt", "vt", Some(tol), d)
        .select("pid", "vid")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == naive(d), s"direction $d diverged from the naive replay")
    }
  }

  test("composite keys: both columns gate the match; any-null key never matches") {
    val left = Seq(
      (1L, Some(10L), 100L, "p_a"), // matches (1,10) rt=95
      (1L, Some(11L), 100L, "p_b"), // same user, DIFFERENT day: only rt=99
      (2L, Some(10L), 100L, "p_c"), // different user entirely: NULL
      (1L, None: Option[Long], 100L, "p_d") // null key field: NULL
    ).toDF("lk1", "lk2", "lt", "pl")
    val right = Seq(
      (1L, Some(10L), 95L, "v95"),
      (1L, Some(11L), 99L, "v99"),
      (1L, None: Option[Long], 90L, "vnull") // null key field: never matches
    ).toDF("rk1", "rk2", "rt", "pv")
    val got = graft.plans.AsOf
      .joinKeys(left, right, Seq("lk1", "lk2"), Seq("rk1", "rk2"), "lt", "rt")
      .select("pl", "pv")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
      .sortBy(_._1)
    assert(
      got.toSeq == Seq(
        ("p_a", Some("v95")),
        ("p_b", Some("v99")),
        ("p_c", None),
        ("p_d", None)
      ),
      got.mkString(", ")
    )
  }

  test("null times never match and never block later right rows") {
    val left = Seq((1L, Some(30L), "p"), (1L, Option.empty[Long], "pnull"))
      .toDF("lk", "lt", "pl")
    val right = Seq((1L, Option.empty[Long], "vnull"), (1L, Some(7L), "v7"))
      .toDF("rk", "rt", "pv")
    val got = asOf(left, right)
      .select("pl", "pv")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
      .toMap
    // the null-time right row (sorted NULLS FIRST) must not stop the scan
    assert(got("p") == Some("v7"))
    // a null-time left row matches nothing
    assert(got("pnull").isEmpty)
  }

  test("null keys never match (SQL equi-join semantics, not NULL==NULL)") {
    val left = Seq(
      (Option.empty[Long], 30L, "knull"), // null left key: unmatched
      (Option(1L), 30L, "k1")
    ).toDF("lk", "lt", "pl")
    val right = Seq(
      (Option.empty[Long], 10L, "vnull"), // null right key: invisible
      (Option(1L), 7L, "v7")
    ).toDF("rk", "rt", "pv")
    val got = asOf(left, right)
      .select("pl", "pv")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
      .toMap
    // the natural ordering says NULL == NULL, but equi-join (and DuckDB
    // ASOF JOIN) never match NULL keys — both null-key paths must be dead
    assert(got("knull").isEmpty)
    assert(got("k1") == Some("v7"))
  }

  test("equals a naive driver-side as-of on the real events corpus") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry
      .queries("q124_asof_custom_operator")(spark, sf)
      .collect()
      .map(r =>
        r.getLong(1) -> (if (r.isNullAt(3)) None else Some((r.getLong(2), r.getLong(3))))
      )
      .toMap
    val ev = graft.queries.Tables
      .table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val viewsByUser = ev
      .filter(_._3 == "view")
      .groupBy(e => (e._2, e._4)) // dedup ties: max event_id per (user, ts)
      .map { case ((u, t), rows) => (u, t, rows.map(_._1).max) }
      .toSeq
      .groupBy(_._1)
    val purchases = ev.filter(_._3 == "purchase")
    assert(got.size == purchases.length)
    purchases.foreach { p =>
      val naive = viewsByUser
        .getOrElse(p._2, Seq.empty)
        .filter(_._2 <= p._4)
        .sortBy(v => (v._2, v._3))
        .lastOption
        .map(v => (v._3, v._2))
      assert(got(p._1) == naive, s"purchase ${p._1}: ${got(p._1)} vs $naive")
    }
    assert(got.values.exists(_.nonEmpty) && got.values.exists(_.isEmpty))
  }

  test("plan: AsOfJoinExec, one exchange per side, no window/candidate join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, SortMergeJoinExec}
    val df = SparkEntry.queries("q124_asof_custom_operator")(spark, "/root/testdata/sf0.001")
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p.collect {
        case q: QueryStageExec        => q +: nodes(q.plan)
        case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
        case other                    => Seq(other)
      }.flatten
    val all = nodes(df.queryExecution.executedPlan)
    assert(all.exists(_.isInstanceOf[graft.plans.AsOfJoinExec]), "custom exec missing")
    assert(!all.exists(_.isInstanceOf[WindowExec]), "no row_number de-rank expected")
    assert(
      !all.exists(n => n.isInstanceOf[SortMergeJoinExec] || n.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "no composed candidate-pair join expected"
    )
    val exchanges = all.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(exchanges <= 3, s"expected ≤3 exchanges (1/side + output sort), got $exchanges")
    // composite-key twin (q124b): the (user, day) pre-partition must
    // serve both the dedup aggregate and the join — same ≤3 budget
    val dfB = SparkEntry.queries("q124b_asof_composite_key")(spark, "/root/testdata/sf0.001")
    dfB.collect()
    val allB = nodes(dfB.queryExecution.executedPlan)
    assert(allB.exists(_.isInstanceOf[graft.plans.AsOfJoinExec]))
    val exchangesB = allB.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(exchangesB <= 3, s"composite-key: expected ≤3 exchanges, got $exchangesB")
  }

  test("shared-attribute sides are rejected loudly") {
    val base = Seq((1L, 1L)).toDF("lk", "lt")
    // a bare filter keeps the parent's attribute ids — the broken shape
    val err = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(base, base.filter(col("lk") > 0), "lk", "lk", "lt", "lt")
    }
    assert(err.getMessage.contains("alias"))
  }
}
