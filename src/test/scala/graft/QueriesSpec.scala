package graft

import org.apache.spark.sql.functions._

/** Smoke + semantic checks of the query inventory. Full value-level
  * correctness runs against the DuckDB oracle (tools/verify_local.py, and
  * the driver's gate); these specs assert structural/semantic invariants
  * that the oracle can't (approx bounds, flagship non-empty, etc).
  */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query entry") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql keys without queries: $unknown")
  }

  test("q12c merged weekly sketch is BIT-EQUAL to a direct sketch of the week") {
    import org.apache.spark.sql.functions._
    val e = graft.queries.Tables.table(spark, sf, "events")
    // direct: one sketch straight over each week's rows (no daily stage)
    val direct = e
      .groupBy(to_date(date_trunc("week", col("ts"))).as("wk"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
      .toMap
    // the gate now emits exact twin + bound boolean (hash-checked by the
    // driver); the raw merged estimate is recomputed here with the same
    // two-stage shape for the BIT-equality pin
    val merged = e
      .groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(to_date(date_trunc("week", col("d"))).as("wk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
      .toMap
    // register merge is lossless and order-independent: EXACT equality,
    // not a tolerance — any drift means the rollup lost sketch state
    assert(merged == direct, s"merged $merged != direct $direct")
    // and the gate's in-plan bound holds on every week
    val gate = SparkEntry.queries("q12c_sketch_rollup")(spark, sf).collect()
    assert(gate.nonEmpty)
    gate.foreach { r =>
      assert(r.getAs[Boolean]("est_within_5pct"), s"week ${r.get(0)} out of bound")
    }
  }

  test("q162 collation join equals an explicit-lower replay and folds the case variants") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry
      .queries("q162_collation_join")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val naive = graft.queries.Tables
      .table(spark, sf, "events")
      .select(col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2)
      .map { case (t, g) =>
        // the gate's mangle: UPPER on even ids, so a type with both
        // parities present observes exactly 2 case variants
        val variants = g.map { case (id, tt) => if (id % 2 == 0) tt.toUpperCase else tt }.distinct
        t -> (g.length.toLong, variants.length.toLong)
      }
    assert(rows == naive, s"gate $rows vs naive $naive")
    // the collation was load-bearing: at least one type folded 2 variants
    assert(rows.values.exists(_._2 == 2L))
  }

  test("q163 SQL UDF inlines to the exact integer arithmetic; q164 variable round-trips") {
    import org.apache.spark.sql.functions._
    // the UDF-computed group sums equal a direct DataFrame recompute
    val udf = SparkEntry
      .queries("q163_sql_udf")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val direct = graft.queries.Tables
      .table(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(
          round(col("l_extendedprice") * 100.0, 0).cast("long") *
            round((lit(1.0) - col("l_discount")) * 100.0, 0).cast("long")
        ).as("rev")
      )
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(udf == direct)
    // the SQL UDF is analyzer-inlined: no black-box UDF node in the plan
    val plan = SparkEntry
      .queries("q163_sql_udf")(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan.take(500))

    // q164: every returned group sits strictly above the variable's cutoff
    val rows = SparkEntry.queries("q164_session_variables")(spark, sf).collect()
    assert(rows.nonEmpty)
    val vc = graft.queries.Tables
      .table(spark, sf, "orders")
      .select(round(col("o_totalprice") * 100.0, 0).cast("long").as("v"))
      .collect()
      .map(_.getLong(0))
    val cut = vc.sum / vc.length
    rows.foreach(r => assert(r.getLong(2) > cut, s"${r.getString(0)} min ≤ cutoff"))
    // and the counts partition the above-cutoff population exactly
    assert(rows.map(_.getLong(1)).sum == vc.count(_ > cut).toLong)
  }

  test("q154 sketch-overlap estimate tracks the exact intersection") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q154_sketch_overlap")(spark, sf).collect().head
    val (nA, nB, nBoth) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(r.getBoolean(3), "in-plan 15% bound tripped")
    // overlap can never exceed either side, and both populations exist
    assert(nBoth <= math.min(nA, nB) && nA > 0 && nB > 0)
    // the raw inclusion-exclusion estimate, recomputed with the same
    // sketch expressions, lands inside the gate's bound
    val e = graft.queries.Tables
      .table(spark, sf, "events")
      .filter(col("event_type").isin("view", "purchase"))
    val est = e
      .agg(
        hll_sketch_estimate(
          hll_sketch_agg(when(col("event_type") === "view", col("user_id")))
        ).as("ea"),
        hll_sketch_estimate(
          hll_sketch_agg(when(col("event_type") === "purchase", col("user_id")))
        ).as("eb"),
        hll_sketch_estimate(
          hll_union(
            hll_sketch_agg(when(col("event_type") === "view", col("user_id"))),
            hll_sketch_agg(when(col("event_type") === "purchase", col("user_id")))
          )
        ).as("eu")
      )
      .collect()
      .head
    val inter = est.getLong(0) + est.getLong(1) - est.getLong(2)
    assert(
      math.abs(inter - nBoth).toDouble / nBoth <= 0.15,
      s"estimate $inter vs exact $nBoth"
    )
  }

  test("approx_count_distinct within 5% of exact (q12 vs q12b)") {
    import org.apache.spark.sql.functions._
    val exact = SparkEntry
      .queries("q12_distinct_agg")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // raw estimates, same expression the gate folds into its boolean
    val approx = graft.queries.Tables
      .table(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("a"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(
        math.abs(a - e).toDouble / e <= 0.05,
        s"$k: approx $a vs exact $e"
      )
    }
    // the gate's in-plan booleans agree
    SparkEntry.queries("q12b_approx_distinct")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("approx_within_5pct"), s"${r.get(0)} out of bound")
    }
  }

  test("approx_percentile within 5% of exact (q39 vs q39b)") {
    import org.apache.spark.sql.functions._
    val exact = SparkEntry
      .queries("q39_percentiles")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4)))
      .toMap
    val approx = graft.queries.Tables
      .table(spark, sf, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 2).as("a50"),
        round(expr("approx_percentile(o_totalprice, 0.99, 10000)"), 2).as("a99")
      )
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, (p50, p99)) =>
      val (ap50, ap99) = approx(k)
      assert(math.abs(ap50 - p50) / p50 <= 0.05, s"$k p50: $ap50 vs $p50")
      assert(math.abs(ap99 - p99) / p99 <= 0.05, s"$k p99: $ap99 vs $p99")
    }
    SparkEntry.queries("q39b_approx_percentiles")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("ap50_within_5pct") && r.getAs[Boolean]("ap99_within_5pct"),
        s"${r.get(0)} out of bound")
    }
  }

  test("q08c full outer join produces both null sides") {
    val sides = SparkEntry
      .queries("q08c_join_full_outer")(spark, sf)
      .groupBy("side")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(sides.getOrElse("both", 0L) > 0, s"no matched rows: $sides")
    assert(sides.getOrElse("customer_only", 0L) > 0, s"no null order side: $sides")
    assert(sides.getOrElse("order_only", 0L) > 0, s"no null customer side: $sides")
  }

  test("q42 pivot row sums equal q42b unpivot totals per day") {
    val wide = SparkEntry
      .queries("q42_pivot")(spark, sf)
      .collect()
      .map(r => r.getDate(0).toString -> (1 until r.length).map(r.getLong).sum)
      .toMap
    val long = SparkEntry
      .queries("q42b_unpivot")(spark, sf)
      .groupBy("d")
      .agg(sum("cnt").as("s"))
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
      .toMap
    assert(wide == long)
  }

  test("q20 cosine values are in [-1, 1]") {
    val bad = SparkEntry
      .queries("q20_array_cosine")(spark, sf)
      .filter(abs(col("cos_sim")) > 1.0001)
      .count()
    assert(bad == 0)
  }

  test("q49d quantified rewrite honors ALL/ANY empty-set truth values") {
    val rows = SparkEntry.queries("q49d_quantified")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), "x > ALL(empty) must be TRUE")
      assert(!r.getBoolean(5), "x > ANY(empty) must be FALSE")
      // ALL is strictly stronger than ANY over the same non-empty set
      if (r.getBoolean(2)) assert(r.getBoolean(3), "gt_all without gt_any")
    }
    // both truth values must occur on the non-empty set, else the pin is vacuous
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("q13e top-N+other rollup conserves totals and folds the full tail") {
    val byLang = graft.queries.Tables
      .table(spark, sf, "documents")
      .groupBy("lang")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val nSources = graft.queries.Tables
      .table(spark, sf, "documents")
      .select("lang", "source")
      .distinct()
      .groupBy("lang")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val rows = SparkEntry
      .queries("q13e_topn_other")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (lang, vs) =>
      // folding loses nothing: bucket doc counts sum to the lang total
      assert(vs.map(_._3).sum == byLang(lang), s"$lang: docs not conserved")
      assert(vs.map(_._4).sum == nSources(lang), s"$lang: sources not conserved")
      val others = vs.filter(_._2 == "other")
      if (nSources(lang) > 2) assert(others.length == 1 && others.head._5 == 3)
      else assert(others.isEmpty)
      // named buckets outrank the fold and carry more docs than the tail mean
      vs.filter(_._2 != "other").foreach(v => assert(v._5 <= 2))
    }
  }

  test("q59b interpolated gap values lie between their two endpoints") {
    val rows = SparkEntry
      .queries("q59b_resample_interp")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.exists(_._2), "no gaps in the grid?")
    // scan per user: every interpolated gap is bounded by the known
    // centi-values on either side (a floored positively-weighted mean
    // of integer endpoints cannot leave [min, max])
    rows.groupBy(_._1).foreach { case (_, series) =>
      var lastKnown: Option[Long] = None
      var pendingGaps = List.empty[Long]
      series.foreach {
        case (_, false, Some(v)) =>
          lastKnown.foreach { lk =>
            val (lo, hi) = (math.min(lk, v), math.max(lk, v))
            pendingGaps.foreach(g => assert(g >= lo && g <= hi, s"gap $g outside [$lo,$hi]"))
          }
          pendingGaps = Nil
          lastKnown = Some(v)
        case (_, true, g) => pendingGaps = g.toList ::: pendingGaps
        case _            =>
      }
    }
  }

  test("q84b SCD2 versions chain correctly with at most one current per key") {
    val rows = SparkEntry
      .queries("q84b_scd2_history")(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getBoolean(6))
      )
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"key $k version gap")
      sorted.foreach { case (_, _, from, to, current) =>
        to.foreach(t => assert(t > from, s"key $k: empty interval"))
        assert(current == to.isEmpty)
      }
      // versions never overlap; a gap means a DELETE separated them
      sorted.sliding(2).foreach {
        case Array((_, _, _, Some(to1), _), (_, _, from2, _, _)) =>
          assert(from2 >= to1, s"key $k: overlapping versions")
        case Array((_, _, _, None, _), _) => fail(s"key $k: closed version after open one")
        case _                            =>
      }
      assert(vs.count(_._5) <= 1, s"key $k: multiple current versions")
    }
    // the delete-then-reinsert shape exists in the sample: some key has a
    // closed version followed by an open one with a sequence gap
    assert(
      rows.groupBy(_._1).exists { case (_, vs) =>
        val s = vs.sortBy(_._2)
        s.length >= 2 && s.init.forall(_._4.nonEmpty) &&
        s.last._4.isEmpty && s.last._3 > s.init.last._4.get
      },
      "no delete-then-reinsert history in the sample"
    )
  }

  test("q96b scaled features: z-scores centered per group, minmax in [0,1]") {
    val rows = SparkEntry
      .queries("q96b_feature_scale")(spark, sf)
      .collect()
      .map(r => (r.getString(2), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, mm) => assert(mm >= 0.0 && mm <= 1.0) }
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val zs = vs.map(_._2)
      // mean ~0 within the rounding grid noise, extremes span both signs
      assert(math.abs(zs.sum / zs.length) < 0.01, s"group $g z-mean off-center")
      assert(zs.min < 0 && zs.max > 0, s"group $g z-scores one-sided")
      val ms = vs.map(_._3)
      assert(ms.min == 0.0 && ms.max == 1.0, s"group $g minmax not spanning [0,1]")
    }
  }

  test("q84c point-in-time lookup: one row per fact, deleted gaps unmatched") {
    val facts = graft.queries.Tables.table(spark, sf, "orders").count()
    val rows = SparkEntry.queries("q84c_pit_lookup")(spark, sf).collect()
    assert(rows.length.toLong == facts, "PIT join duplicated or dropped facts")
    val unmatched = rows.filter(!_.getBoolean(4))
    assert(unmatched.nonEmpty, "no deleted-gap fact in the sample")
    // unmatched facts are exactly those whose instant falls in a deleted
    // period: key deleted at seq 3, t = 3, not yet reinserted (reinsert
    // opens at 4), or deleted with no reinsert and t >= 3
    unmatched.foreach { r =>
      val (k, t) = (r.getLong(0), r.getLong(1))
      assert(k % 11 == 0 && t >= 3 && (t < 4 || k % 33 != 0), s"fact ($k, $t) wrongly unmatched")
    }
  }

  test("q95 curriculum positions are a permutation ordered by (bucket, hv, id)") {
    val rows = SparkEntry
      .queries("q95_curriculum_order")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // positions 0..N-1 exactly once, emitted in order
    assert(rows.map(_._4).toSeq == (0L until rows.length.toLong))
    rows.foreach { case (_, _, _, pos, shard) => assert(shard == pos % 8) }
    // the distributed two-level scan reproduced the global sort order
    val resorted = rows.sortBy { case (id, b, hv, _, _) => (b, hv, id) }
    assert(resorted.map(_._4).toSeq == (0L until rows.length.toLong), "order key mismatch")
    // curriculum property: bucket is non-decreasing along the schedule
    rows.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _           =>
    }
  }
}
